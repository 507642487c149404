"""Feature-extractor architecture tests (I3D for FVD, InceptionV3 for FID)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

RNG = np.random.RandomState(0)


@pytest.mark.slow
def test_i3d_shapes_and_preprocess():
    from omnitokenizer_tpu.eval.i3d import (
        InceptionI3d,
        load_i3d_variables,
        preprocess_videos,
    )

    v, pretrained = load_i3d_variables(None)
    assert not pretrained
    vids = (RNG.rand(2, 16, 64, 64, 3) * 255).astype(np.uint8)
    x = preprocess_videos(vids)
    assert x.shape == (2, 16, 224, 224, 3)
    assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0
    out = InceptionI3d().apply(v, x[:1])
    assert out.shape == (1, 400)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_inception_fid_shapes():
    from omnitokenizer_tpu.eval.inception import (
        FIDInceptionV3,
        load_inception_variables,
        preprocess_images,
    )

    v, pretrained = load_inception_variables(None)
    assert not pretrained
    imgs = RNG.rand(2, 64, 64, 3).astype(np.float32)
    x = preprocess_images(imgs)
    assert x.shape == (2, 299, 299, 3)
    out = FIDInceptionV3().apply(v, x)
    assert out.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fvd_pipeline_end_to_end_random_features():
    """Full FVD math over random-init I3D: identical sets -> 0."""
    from omnitokenizer_tpu.eval.frechet import frechet_distance
    from omnitokenizer_tpu.eval.i3d import compute_fvd_logits, load_i3d_variables

    v, _ = load_i3d_variables(None)
    vids = (RNG.rand(4, 16, 64, 64, 3) * 255).astype(np.uint8)
    logits = compute_fvd_logits(vids, v, batch=2)
    assert logits.shape == (4, 400)
    d = frechet_distance(logits, logits)
    assert d < 1e-4
