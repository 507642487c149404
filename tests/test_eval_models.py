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


def test_inception_score_math():
    """IS = 1 for uniform predictions; > 1 for confident diverse ones
    (calculate_is.py:46-57)."""
    from omnitokenizer_tpu.eval.inception import inception_score

    uniform = np.full((16, 10), 0.1)
    m, s = inception_score(uniform, splits=2)
    np.testing.assert_allclose(m, 1.0, rtol=1e-6)

    confident = np.eye(10)[np.arange(16) % 10] * 0.99 + 0.001
    confident /= confident.sum(1, keepdims=True)
    m2, _ = inception_score(confident, splits=1)
    assert m2 > 5.0


def test_styleganv_preprocess_geometry():
    """Shorter side -> 224, center crop, [-1, 1]
    (fvd/styleganv/fvd.py:38-62)."""
    from omnitokenizer_tpu.eval.i3d import preprocess_videos_styleganv

    v = np.random.RandomState(0).randint(0, 255, (1, 3, 112, 200, 3), np.uint8)
    out = np.asarray(preprocess_videos_styleganv(v))
    assert out.shape == (1, 3, 224, 224, 3)
    assert -1.0 <= out.min() and out.max() <= 1.0

    # portrait orientation: width is the shorter side
    v2 = np.random.RandomState(1).randint(0, 255, (1, 3, 300, 150, 3), np.uint8)
    out2 = np.asarray(preprocess_videos_styleganv(v2))
    assert out2.shape == (1, 3, 224, 224, 3)


def test_inception_fc_head_shapes():
    """return_logits emits (B, 1008) pt_inception-head logits."""
    import jax
    import jax.numpy as jnp

    from omnitokenizer_tpu.eval.inception import FIDInceptionV3

    model = FIDInceptionV3()
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    pool = model.apply(variables, x)
    logits = model.apply(variables, x, return_logits=True)
    assert pool.shape == (1, 2048)
    assert logits.shape == (1, 1008)


def test_manifold_radii_knn():
    """Radius = squared distance to the k-th NN, self at index 0
    (evaluator.py:300-332)."""
    from omnitokenizer_tpu.eval.prec_recall import manifold_radii

    # 1-D points 0, 1, 3, 7 -> k=1 squared radii: 1, 1, 4, 16
    feats = np.array([[0.0], [1.0], [3.0], [7.0]], np.float32)
    r = manifold_radii(feats, k=1)
    np.testing.assert_allclose(r, [1.0, 1.0, 4.0, 16.0], rtol=1e-5)


def test_precision_recall_extremes():
    from omnitokenizer_tpu.eval.prec_recall import precision_recall

    rng = np.random.RandomState(0)
    ref = rng.randn(32, 8).astype(np.float32)

    # identical sets: everything covered both ways
    p, r = precision_recall(ref, ref.copy(), k=3)
    assert p == 1.0 and r == 1.0

    # far-away samples: nothing covered
    p2, r2 = precision_recall(ref, ref + 1000.0, k=3)
    assert p2 == 0.0 and r2 == 0.0


def test_precision_recall_partial_overlap():
    """Half the samples sit on the ref manifold -> precision ~0.5; ref fully
    covered by the overlapping half -> recall high."""
    from omnitokenizer_tpu.eval.prec_recall import precision_recall

    rng = np.random.RandomState(1)
    ref = rng.randn(64, 4).astype(np.float32)
    sample = np.concatenate([ref[:32], ref[:32] + 500.0])
    p, r = precision_recall(ref, sample, k=3)
    assert 0.3 < p < 0.7
    assert r >= 0.4


def test_spatial_features_sfid_shape():
    """sFID features = first 7 channels of Mixed_6d branch1x1, 17x17 grid
    -> 2023 dims (evaluator.py:25-26,644-652)."""
    from omnitokenizer_tpu.eval.inception import (
        FIDInceptionV3, compute_spatial_features)

    model = FIDInceptionV3()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    imgs = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    sp = compute_spatial_features(imgs, variables, batch=2)
    assert sp.shape == (2, 7 * 17 * 17)
    assert np.all(np.isfinite(sp))


def test_metrics_eval_npz_batch_mode(tmp_path):
    """OpenAI-evaluator usage: two npz image batches -> IS/FID/prec/recall
    (evaluator.py:69-112); random inception weights exercise the plumbing."""
    import json

    import torch

    rng = np.random.RandomState(0)
    ref = (rng.rand(8, 64, 64, 3) * 255).astype(np.uint8)
    sample = (rng.rand(8, 64, 64, 3) * 255).astype(np.uint8)
    np.savez(tmp_path / "ref.npz", ref)
    np.savez(tmp_path / "sample.npz", sample)

    # tiny random inception weight file via our own converter contract
    from omnitokenizer_tpu.eval.inception import FIDInceptionV3
    import jax

    variables = FIDInceptionV3().init(jax.random.PRNGKey(0),
                                      np.zeros((1, 299, 299, 3), np.float32))
    # build a torch-style state_dict from the flax tree so the converter runs
    sd = {}

    def walk(tree, stats, prefix):
        for k, v in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if k == "conv":
                sd[name + ".weight"] = torch.from_numpy(
                    np.transpose(np.asarray(v["kernel"]), (3, 2, 0, 1)).copy())
            elif k == "bn":
                sd[name + ".weight"] = torch.from_numpy(np.asarray(v["scale"]).copy())
                sd[name + ".bias"] = torch.from_numpy(np.asarray(v["bias"]).copy())
                sd[name + ".running_mean"] = torch.from_numpy(
                    np.asarray(stats[k]["mean"]).copy())
                sd[name + ".running_var"] = torch.from_numpy(
                    np.asarray(stats[k]["var"]).copy())
            elif k == "fc":
                sd["fc.weight"] = torch.from_numpy(
                    np.ascontiguousarray(np.asarray(v["kernel"]).T))
                sd["fc.bias"] = torch.from_numpy(np.asarray(v["bias"]).copy())
            else:
                walk(v, stats[k], name)

    walk(variables["params"], variables["batch_stats"], "")
    torch.save(sd, tmp_path / "inception.pt")

    from omnitokenizer_tpu.cli.metrics_eval import main

    result = main(["--ref_npz", str(tmp_path / "ref.npz"),
                   "--sample_npz", str(tmp_path / "sample.npz"),
                   "--inception_path", str(tmp_path / "inception.pt"),
                   "--metrics", "is,fid,sfid,prec_recall",
                   "--save", str(tmp_path / "out.json")])
    for key in ("is", "fid", "sfid", "precision", "recall"):
        assert result[key] is not None and np.isfinite(result[key]), key
    assert json.load(open(tmp_path / "out.json"))["clips"] == 8
