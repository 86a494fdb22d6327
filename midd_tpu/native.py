"""ctypes bridge to the native C++ data-path kernels (native/midd_native.cc).

Builds the shared library on first use (g++, cached next to the source) and
exposes numpy-friendly wrappers. Every caller has a pure-Python fallback, so
the framework works without a toolchain; with it, image resize and paired
augmentation run GIL-free off the Python thread.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmidd_native.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "midd_native.cc")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
        ):
            if not os.path.exists(_SRC_PATH) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None

        u8 = ctypes.POINTER(ctypes.c_uint8)
        f32 = ctypes.POINTER(ctypes.c_float)
        lib.resize_bicubic_u8.argtypes = [u8, ctypes.c_int, ctypes.c_int, u8, ctypes.c_int, ctypes.c_int]
        lib.resize_bicubic_f32.argtypes = [f32, ctypes.c_int, ctypes.c_int, f32, ctypes.c_int, ctypes.c_int]
        lib.augment_pair_f32.argtypes = [
            f32, f32, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_uint64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def resize_bicubic_u8(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """(H, W) uint8 -> (oh, ow) uint8, PIL-BICUBIC-compatible."""
    lib = load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    oh, ow = size
    out = np.empty((oh, ow), np.uint8)
    lib.resize_bicubic_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0],
        img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        oh,
        ow,
    )
    return out


def resize_bicubic_f32(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    lib = load()
    assert lib is not None
    img = np.ascontiguousarray(img, np.float32)
    oh, ow = size
    out = np.empty((oh, ow), np.float32)
    lib.resize_bicubic_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        img.shape[0],
        img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        oh,
        ow,
    )
    return out


def augment_pair_f32(
    clean: np.ndarray,
    noisy: np.ndarray,
    hflip: bool = False,
    vflip: bool = False,
    brightness: float = 1.0,
    contrast: float = 1.0,
    noise_std: float = 0.0,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """In-place paired augmentation on (H, W) fp32 arrays (copies inputs)."""
    lib = load()
    assert lib is not None
    c = np.ascontiguousarray(clean, np.float32).copy()
    n = np.ascontiguousarray(noisy, np.float32).copy()
    flags = (1 if hflip else 0) | (2 if vflip else 0)
    lib.augment_pair_f32(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        c.shape[0],
        c.shape[1],
        flags,
        ctypes.c_float(brightness),
        ctypes.c_float(contrast),
        ctypes.c_float(noise_std),
        ctypes.c_uint64(seed),
    )
    return c, n
