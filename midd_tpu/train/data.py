"""Host-side data pipeline: paired clean/noisy X-ray loading, matching
heuristics, paired augmentation, synthetic noise generation, and a prefetching
batch iterator feeding the device.

Reference behaviours covered:
- Pair matching: exact filename, ``Gauss_``/``gauss_``/``noisy_``/``speckle_``
  prefixes (DDIM/DDIMModel.py:41-58, NafNet/NafnetModel.py:74-92,
  DirectUNet/DirectUNetModel.py:50-71), and the hybrid's substring-glob variant
  (hybrid3diffusionspeed.py:54-68).
- BICUBIC resize to the training size via PIL (identical library to
  torchvision's PIL path, so numerics match the reference exactly).
- Paired augmentation suite (NafNet:102-144 is the richest variant):
  rotation, h/v flip, brightness, contrast, additive Gaussian noise injection.
- Noise types targeted by the reference datasets (README.md:15): speckle,
  quantum/Poisson, Gaussian — synthesised here so training works from
  clean-only corpora too.

TPU notes: batches are NHWC fp32 in [0,1]; the iterator double-buffers
device_put on a background thread so host IO overlaps device compute (the
reference used torch DataLoader workers + pin_memory,
hybrid3diffusionspeed.py:728-737).
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from dataclasses import dataclass, field
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

import jax


# ---------------------------------------------------------------------------
# Noise synthesis
# ---------------------------------------------------------------------------


def add_gaussian_noise(img: np.ndarray, sigma: float, rng: np.random.Generator) -> np.ndarray:
    return np.clip(img + rng.normal(0.0, sigma, img.shape).astype(np.float32), 0, 1)


def add_speckle_noise(img: np.ndarray, sigma: float, rng: np.random.Generator) -> np.ndarray:
    """Multiplicative speckle: x * (1 + n), n ~ N(0, sigma)."""
    return np.clip(img * (1.0 + rng.normal(0.0, sigma, img.shape).astype(np.float32)), 0, 1)


def add_poisson_noise(img: np.ndarray, peak: float, rng: np.random.Generator) -> np.ndarray:
    """Quantum/Poisson noise: photon counts at the given peak intensity."""
    counts = rng.poisson(np.clip(img, 0, 1) * peak).astype(np.float32)
    return np.clip(counts / peak, 0, 1)


NOISE_FNS = {
    "gaussian": lambda x, rng: add_gaussian_noise(x, 0.1, rng),
    "speckle": lambda x, rng: add_speckle_noise(x, 0.2, rng),
    "poisson": lambda x, rng: add_poisson_noise(x, 30.0, rng),
}


# ---------------------------------------------------------------------------
# Pair discovery
# ---------------------------------------------------------------------------


def match_pairs(
    clear_dir: str,
    noisy_dirs: Sequence[str],
    max_samples: int = 500,
    substring_glob: bool = False,
) -> List[Tuple[str, str]]:
    """Find (clean, noisy) file pairs with the reference's heuristics."""
    clear_files = sorted(glob.glob(os.path.join(clear_dir, "*.*")))[:max_samples]
    if not clear_files:
        raise ValueError(f"No images in {clear_dir}")
    if isinstance(noisy_dirs, str):
        noisy_dirs = [noisy_dirs]

    pairs: List[Tuple[str, str]] = []
    for c in clear_files:
        base = os.path.basename(c)
        stem = os.path.splitext(base)[0]
        found = None
        for nd in noisy_dirs:
            if substring_glob:  # hybrid variant (hybrid3diffusionspeed.py:59-60)
                cands = sorted(glob.glob(os.path.join(nd, f"*{stem}*")))
                if os.path.exists(os.path.join(nd, base)):
                    cands.append(os.path.join(nd, base))
            else:
                cands = [
                    os.path.join(nd, base),
                    os.path.join(nd, f"Gauss_{base}"),
                    os.path.join(nd, f"gauss_{base}"),
                    os.path.join(nd, f"noisy_{base}"),
                    os.path.join(nd, f"speckle_{base}"),
                ]
            for cand in cands:
                if os.path.exists(cand):
                    found = cand
                    break
            if found:
                break
        if found:
            pairs.append((c, found))
    return pairs


def load_image(path: str, img_size: int, use_native: Optional[bool] = None) -> np.ndarray:
    """Grayscale load + BICUBIC resize + [0,1] fp32 HWC(1).

    ``use_native=True`` (or env MIDD_TPU_NATIVE=1) routes the resize through
    the GIL-free C++ kernel (native/midd_native.cc; within 2 LSB of PIL).
    Default is the PIL path for bit-exact parity with the reference."""
    img = Image.open(path).convert("L")
    if use_native is None:
        use_native = os.environ.get("MIDD_TPU_NATIVE", "0") == "1"
    if use_native:
        from midd_tpu import native

        if native.available():
            arr = native.resize_bicubic_u8(
                np.asarray(img, np.uint8), (img_size, img_size)
            )
            return (arr.astype(np.float32) / 255.0)[..., None]
    img = img.resize((img_size, img_size), Image.BICUBIC)
    return (np.asarray(img, np.float32) / 255.0)[..., None]


# ---------------------------------------------------------------------------
# Augmentation
# ---------------------------------------------------------------------------


@dataclass
class AugmentConfig:
    """Defaults = NafNet/NafnetModel.py:52-62."""

    rotation_prob: float = 0.5
    rotation_range: Tuple[float, float] = (-15.0, 15.0)
    flip_prob: float = 0.5
    vflip_prob: float = 0.3
    brightness_prob: float = 0.3
    brightness_range: Tuple[float, float] = (0.9, 1.1)
    contrast_prob: float = 0.3
    contrast_range: Tuple[float, float] = (0.9, 1.1)
    noise_prob: float = 0.2
    noise_std: float = 0.01


def augment_pair(
    clean: np.ndarray, noisy: np.ndarray, cfg: AugmentConfig, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    """Apply identical geometric/photometric transforms to both images
    (noise injection goes to the noisy image only, NafNet:139-142)."""
    if rng.random() < cfg.rotation_prob:
        angle = rng.uniform(*cfg.rotation_range)
        clean = _rotate(clean, angle)
        noisy = _rotate(noisy, angle)
    if rng.random() < cfg.flip_prob:
        clean, noisy = clean[:, ::-1], noisy[:, ::-1]
    if rng.random() < cfg.vflip_prob:
        clean, noisy = clean[::-1], noisy[::-1]
    if rng.random() < cfg.brightness_prob:
        f = rng.uniform(*cfg.brightness_range)
        clean = np.clip(clean * f, 0, 1)
        noisy = np.clip(noisy * f, 0, 1)
    if rng.random() < cfg.contrast_prob:
        f = rng.uniform(*cfg.contrast_range)
        clean = np.clip((clean - clean.mean()) * f + clean.mean(), 0, 1)
        noisy = np.clip((noisy - noisy.mean()) * f + noisy.mean(), 0, 1)
    if rng.random() < cfg.noise_prob:
        noisy = np.clip(
            noisy + rng.normal(0, cfg.noise_std, noisy.shape).astype(np.float32), 0, 1
        )
    return np.ascontiguousarray(clean), np.ascontiguousarray(noisy)


def _rotate(img: np.ndarray, angle: float) -> np.ndarray:
    """torchvision.functional.rotate defaults: nearest resample, no expand,
    zero fill."""
    pil = Image.fromarray((img[..., 0] * 255).astype(np.uint8), mode="L")
    pil = pil.rotate(angle, resample=Image.NEAREST, expand=False, fillcolor=0)
    return (np.asarray(pil, np.float32) / 255.0)[..., None]


# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------


class PairedXRayDataset:
    """Disk-backed paired dataset (the reference's XRayDataset /
    SpeckleXRayDataset family)."""

    def __init__(
        self,
        clear_dir: str,
        noisy_dirs: Sequence[str],
        img_size: int = 512,
        max_samples: int = 500,
        is_train: bool = True,
        augment: Optional[AugmentConfig] = None,
        substring_glob: bool = False,
        seed: int = 42,
    ):
        self.pairs = match_pairs(clear_dir, noisy_dirs, max_samples, substring_glob)
        if not self.pairs:
            raise ValueError("No matching clean/noisy pairs found")
        self.img_size = img_size
        self.is_train = is_train
        self.augment = augment if augment is not None else AugmentConfig()
        self.rng = np.random.default_rng(seed)
        self._rng_lock = threading.Lock()

    def _item_rng(self) -> np.random.Generator:
        # np Generators are not thread-safe; spawn a child seed under a lock
        # so __getitem__ can run on a thread pool (batches(num_workers>0))
        with self._rng_lock:
            return np.random.default_rng(int(self.rng.integers(2**63)))

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        c, n = self.pairs[idx]
        clean = load_image(c, self.img_size)
        noisy = load_image(n, self.img_size)
        if self.is_train:
            clean, noisy = augment_pair(clean, noisy, self.augment, self._item_rng())
        return clean, noisy


class SyntheticPairedDataset:
    """In-memory dataset synthesising noisy images from clean ones — covers
    the clean-only workflow (reference noise types, README.md:15) and all
    tests/benchmarks."""

    def __init__(
        self,
        clean_images: np.ndarray,  # (N,H,W,1) in [0,1]
        noise_type: str = "speckle",
        is_train: bool = True,
        augment: Optional[AugmentConfig] = None,
        seed: int = 42,
    ):
        self.clean = np.asarray(clean_images, np.float32)
        self.noise_fn = NOISE_FNS[noise_type]
        self.is_train = is_train
        self.augment = augment if augment is not None else AugmentConfig()
        self.rng = np.random.default_rng(seed)
        self._rng_lock = threading.Lock()

    def _item_rng(self) -> np.random.Generator:
        with self._rng_lock:
            return np.random.default_rng(int(self.rng.integers(2**63)))

    def __len__(self) -> int:
        return self.clean.shape[0]

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        clean = self.clean[idx]
        rng = self._item_rng()
        noisy = self.noise_fn(clean, rng)
        if self.is_train:
            clean, noisy = augment_pair(clean, noisy, self.augment, rng)
        return clean, noisy


# ---------------------------------------------------------------------------
# Batch iterator with device prefetch
# ---------------------------------------------------------------------------


def batches(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    drop_last: bool = True,
    seed: int = 0,
    num_workers: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """One epoch of (clean, noisy) NHWC batches. ``num_workers > 0`` assembles
    items on a thread pool (PIL decode and the native C++ augmentation release
    the GIL — the DataLoader-workers equivalent, hybrid3diffusionspeed.py:728-737)."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    n = len(order)
    end = n - n % batch_size if drop_last else n

    if num_workers > 0:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=num_workers) as pool:
            for start in range(0, end, batch_size):
                idxs = order[start : start + batch_size]
                items = list(pool.map(lambda i: dataset[int(i)], idxs))
                yield (
                    np.stack([c for c, _ in items]),
                    np.stack([x for _, x in items]),
                )
        return

    for start in range(0, end, batch_size):
        idxs = order[start : start + batch_size]
        items = [dataset[int(i)] for i in idxs]
        clean = np.stack([c for c, _ in items])
        noisy = np.stack([x for _, x in items])
        yield clean, noisy


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Overlap host batch assembly + H2D transfer with device compute: a
    background thread keeps ``size`` batches in flight (the TPU-native
    equivalent of DataLoader workers + pin_memory + prefetch_factor)."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def producer():
        try:
            for item in iterator:
                put = jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, sharding) if sharding is not None else jax.device_put(a),
                    item,
                )
                q.put(put)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item


def visualize_pairs(dataset, out_path: str = "dataset_validation_pairs.png", n: int = 2) -> None:
    """Pre-training dataset sanity figure: the first n (noisy, clean) pairs
    side by side (DirectUNet/DirectUNetModel.py:286-303)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = min(n, len(dataset))
    fig, axes = plt.subplots(n, 2, figsize=(10, 5 * n), squeeze=False)
    for i in range(n):
        clean, noisy = dataset[i]
        axes[i][0].imshow(noisy[..., 0], cmap="gray")
        axes[i][0].set_title(f"Pair {i + 1}: Noisy Input")
        axes[i][1].imshow(clean[..., 0], cmap="gray")
        axes[i][1].set_title(f"Pair {i + 1}: Clean Target")
        for ax in axes[i]:
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
