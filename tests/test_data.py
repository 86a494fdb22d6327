"""Data pipeline tests: pair-matching heuristics, augmentation, noise
synthesis, batching, prefetch."""

import os

import numpy as np
import pytest
from PIL import Image

from midd_tpu.train import data


def _write_png(path, size=(24, 24), seed=0):
    rng = np.random.default_rng(seed)
    arr = (rng.random(size) * 255).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(path)


@pytest.fixture
def paired_dirs(tmp_path):
    clean = tmp_path / "clean"
    noisy = tmp_path / "noisy"
    clean.mkdir()
    noisy.mkdir()
    _write_png(clean / "a.png", seed=1)
    _write_png(noisy / "a.png", seed=2)  # exact match
    _write_png(clean / "b.png", seed=3)
    _write_png(noisy / "Gauss_b.png", seed=4)  # prefix match
    _write_png(clean / "c.png", seed=5)
    _write_png(noisy / "speckle_c.png", seed=6)  # speckle prefix
    _write_png(clean / "d.png", seed=7)  # unmatched
    return str(clean), str(noisy)


def test_match_pairs_heuristics(paired_dirs):
    clean, noisy = paired_dirs
    pairs = data.match_pairs(clean, [noisy])
    assert len(pairs) == 3
    names = {os.path.basename(n) for _, n in pairs}
    assert names == {"a.png", "Gauss_b.png", "speckle_c.png"}


def test_match_pairs_substring_glob(paired_dirs):
    clean, noisy = paired_dirs
    pairs = data.match_pairs(clean, [noisy], substring_glob=True)
    # hybrid variant also finds "speckle_c" and "Gauss_b" via *stem* glob
    assert len(pairs) == 3


def test_dataset_loads_and_augments(paired_dirs):
    clean, noisy = paired_dirs
    ds = data.PairedXRayDataset(clean, [noisy], img_size=32, is_train=True)
    c, n = ds[0]
    assert c.shape == (32, 32, 1) and n.shape == (32, 32, 1)
    assert c.dtype == np.float32
    assert 0 <= c.min() and c.max() <= 1


def test_noise_synthesis_properties(rng):
    img = rng.random((16, 16, 1)).astype(np.float32)
    for name, fn in data.NOISE_FNS.items():
        noisy = fn(img, rng)
        assert noisy.shape == img.shape
        assert noisy.min() >= 0 and noisy.max() <= 1
        assert not np.allclose(noisy, img), name


def test_synthetic_dataset_and_batches(rng):
    clean = rng.random((10, 16, 16, 1)).astype(np.float32)
    ds = data.SyntheticPairedDataset(clean, noise_type="poisson", is_train=False)
    bs = list(data.batches(ds, batch_size=4, drop_last=True))
    assert len(bs) == 2
    c, n = bs[0]
    assert c.shape == (4, 16, 16, 1) and n.shape == (4, 16, 16, 1)


def test_prefetch_to_device(rng):
    clean = rng.random((6, 8, 8, 1)).astype(np.float32)
    ds = data.SyntheticPairedDataset(clean, is_train=False)
    out = list(data.prefetch_to_device(data.batches(ds, 2), size=2))
    assert len(out) == 3
    import jax

    assert isinstance(out[0][0], jax.Array)


def test_augment_pair_consistency(rng):
    """Geometric transforms must be identical for clean and noisy."""
    cfg = data.AugmentConfig(
        rotation_prob=0.0,
        flip_prob=1.0,
        vflip_prob=0.0,
        brightness_prob=0.0,
        contrast_prob=0.0,
        noise_prob=0.0,
    )
    img = rng.random((8, 8, 1)).astype(np.float32)
    c, n = data.augment_pair(img.copy(), img.copy(), cfg, rng)
    np.testing.assert_allclose(c, n)
    np.testing.assert_allclose(c, img[:, ::-1])


def test_batches_with_workers(rng):
    clean = rng.random((8, 8, 8, 1)).astype(np.float32)
    ds = data.SyntheticPairedDataset(clean, is_train=False)
    serial = list(data.batches(ds, 4, shuffle=False, num_workers=0))
    threaded = list(data.batches(ds, 4, shuffle=False, num_workers=4))
    assert len(serial) == len(threaded) == 2
    for (c1, n1), (c2, n2) in zip(serial, threaded):
        assert c1.shape == c2.shape and n1.shape == n2.shape


def test_visualize_pairs(rng, tmp_path):
    clean = rng.random((3, 8, 8, 1)).astype(np.float32)
    ds = data.SyntheticPairedDataset(clean, is_train=False)
    out = tmp_path / "pairs.png"
    data.visualize_pairs(ds, str(out), n=2)
    assert out.exists() and out.stat().st_size > 0
