"""Native C++ data-path kernels vs their Python/PIL references."""

import numpy as np
import pytest
from PIL import Image

from midd_tpu import native


@pytest.fixture(scope="module", autouse=True)
def needs_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_resize_bicubic_matches_pil(rng):
    img = (rng.random((97, 83)) * 255).astype(np.uint8)
    for size in [(512, 512), (48, 64), (97, 83), (200, 31)]:
        ours = native.resize_bicubic_u8(img, size)
        ref = np.asarray(
            Image.fromarray(img, mode="L").resize((size[1], size[0]), Image.BICUBIC)
        )
        assert ours.shape == ref.shape
        # PIL uses fixed-point taps; allow 1 LSB of rounding skew on <1% px
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.max() <= 2
        assert (diff > 1).mean() < 0.01


def test_resize_f32_identity(rng):
    img = rng.random((32, 32)).astype(np.float32)
    out = native.resize_bicubic_f32(img, (32, 32))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_augment_pair_flips_and_photometric(rng):
    c = rng.random((16, 16)).astype(np.float32)
    n = rng.random((16, 16)).astype(np.float32)

    c2, n2 = native.augment_pair_f32(c, n, hflip=True)
    np.testing.assert_allclose(c2, c[:, ::-1])
    np.testing.assert_allclose(n2, n[:, ::-1])

    c3, n3 = native.augment_pair_f32(c, n, vflip=True)
    np.testing.assert_allclose(c3, c[::-1])

    c4, _ = native.augment_pair_f32(c, n, brightness=1.1)
    np.testing.assert_allclose(c4, np.clip(c * 1.1, 0, 1), atol=1e-6)

    c5, _ = native.augment_pair_f32(c, n, contrast=0.9)
    np.testing.assert_allclose(
        c5, np.clip((c - c.mean()) * 0.9 + c.mean(), 0, 1), atol=1e-5
    )

    _, n6 = native.augment_pair_f32(c, n, noise_std=0.05, seed=7)
    assert not np.allclose(n6, n)
    assert n6.min() >= 0 and n6.max() <= 1
    # deterministic per seed
    _, n7 = native.augment_pair_f32(c, n, noise_std=0.05, seed=7)
    np.testing.assert_allclose(n6, n7)
