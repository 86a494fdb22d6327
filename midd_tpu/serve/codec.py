"""Host-side image codec for serving.

Mirrors the reference request path exactly (run.py:193-203): PNG/JPEG bytes ->
PIL grayscale 'L' -> BICUBIC resize to the model size -> fp32 [0,1] NHWC; and
the response path (run.py:143-149): fp32 [0,1] -> uint8 PIL -> BICUBIC resize
back to the original size -> PNG -> base64. PIL is the same library
torchvision delegates to, so preprocessing numerics match the reference
bit-for-bit.
"""

from __future__ import annotations

import base64
import io
from typing import Tuple

import numpy as np
from PIL import Image


def decode_to_tensor(data: bytes, img_size: int = 512) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Returns (NHWC fp32 [0,1] array of shape (1, img_size, img_size, 1),
    original (W, H) size)."""
    img = Image.open(io.BytesIO(data)).convert("L")
    original_size = img.size
    resized = img.resize((img_size, img_size), Image.BICUBIC)
    arr = (np.asarray(resized, np.float32) / 255.0)[None, ..., None]
    return arr, original_size


def tensor_to_base64_png(
    arr: np.ndarray, original_size: Tuple[int, int], compress_level: int = 1
) -> str:
    """(1,H,W,1) or (H,W) fp32 [0,1] -> base64 PNG string at original size.

    ``compress_level=1`` (vs PIL's default 6) because response encoding is
    GIL-holding host work on the serving hot path: on realistic smooth
    denoised 512² outputs level 6 costs 21 ms/image for 26 KB vs level 1 at
    4.7 ms for 44 KB — with 4 model outputs per request that is ~65 ms of
    host CPU per request saved under concurrent load. The HTTP contract is
    unchanged (any compliant PNG); pass 6 to match the reference's exact
    bytes (run.py:143-149 uses PIL defaults)."""
    a = np.asarray(arr)
    a = a.reshape(a.shape[-3], a.shape[-2]) if a.ndim >= 3 else a
    img = Image.fromarray((np.clip(a, 0, 1) * 255).astype(np.uint8), mode="L")
    img = img.resize(original_size, Image.BICUBIC)
    buf = io.BytesIO()
    img.save(buf, format="PNG", compress_level=compress_level)
    return base64.b64encode(buf.getvalue()).decode()
