"""Native host data-path kernels: correctness vs numpy + build availability."""

import numpy as np

from omnitokenizer_tpu.native import available, crop_normalize_u8, normalize_u8

RNG = np.random.RandomState(0)


def test_native_builds():
    # g++ is baked into this image; the extension must compile
    assert available(), "native normalize kernel failed to build"


def test_normalize_matches_numpy():
    x = RNG.randint(0, 256, (3, 17, 21), dtype=np.uint8)
    got = normalize_u8(x)
    want = x.astype(np.float32) / 255.0 - 0.5
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_crop_normalize_matches_numpy():
    v = RNG.randint(0, 256, (4, 20, 24, 3), dtype=np.uint8)
    got = crop_normalize_u8(v, 2, 5, 16, 16)
    want = v[:, 2:18, 5:21].astype(np.float32) / 255.0 - 0.5
    assert got.shape == (4, 16, 16, 3)
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_crop_full_frame():
    v = RNG.randint(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    got = crop_normalize_u8(v, 0, 0, 8, 8)
    want = v.astype(np.float32) / 255.0 - 0.5
    np.testing.assert_allclose(got, want, atol=1e-7)
