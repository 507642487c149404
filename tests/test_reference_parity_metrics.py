"""TRUE-ORACLE video-metric parity: our eval/metrics.{psnr,ssim} vs the
vendored calculators the reference evaluates with
(/root/reference/evaluation/common_metrics_on_video_quality/
 calculate_psnr.py, calculate_ssim.py — cv2 is available in this image).
"""

import importlib
import sys

import numpy as np
import torch

sys.path.insert(0, "/root/reference/evaluation/common_metrics_on_video_quality")
sys.path.insert(0, "tests")

import jax.numpy as jnp  # noqa: E402

from omnitokenizer_tpu.eval.metrics import psnr, ssim  # noqa: E402


def _frames(seed=0, n=4, res=48):
    rng = np.random.RandomState(seed)
    a = rng.rand(n, 3, res, res).astype(np.float32)
    b = np.clip(a + rng.randn(n, 3, res, res).astype(np.float32) * 0.05, 0, 1)
    return a, b


def test_psnr_per_frame_parity():
    cp = importlib.import_module("calculate_psnr")
    a, b = _frames(1)
    want = [cp.img_psnr(a[i], b[i]) for i in range(len(a))]
    got = np.asarray(psnr(jnp.asarray(np.moveaxis(a, 1, -1)),
                          jnp.asarray(np.moveaxis(b, 1, -1))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_psnr_video_mean_matches_reference_aggregation():
    """The reference averages per-frame PSNRs (calculate_psnr.py:30-58);
    our CLIs flatten frames before psnr() so the mean is the same statistic."""
    cp = importlib.import_module("calculate_psnr")
    a, b = _frames(2, n=6)
    want = np.mean([cp.img_psnr(a[i], b[i]) for i in range(len(a))])
    got = float(np.mean(np.asarray(psnr(jnp.asarray(np.moveaxis(a, 1, -1)),
                                        jnp.asarray(np.moveaxis(b, 1, -1))))))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_ssim_per_frame_parity():
    cs = importlib.import_module("calculate_ssim")
    a, b = _frames(3, res=64)
    want = [cs.calculate_ssim_function(a[i], b[i]) for i in range(len(a))]
    got = np.asarray(ssim(jnp.asarray(np.moveaxis(a, 1, -1)),
                          jnp.asarray(np.moveaxis(b, 1, -1))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_ssim_calculator_end_to_end():
    """Full calculate_ssim over (B, T, C, H, W) torch videos vs our
    per-frame ssim mean."""
    cs = importlib.import_module("calculate_ssim")
    rng = np.random.RandomState(4)
    v1 = rng.rand(2, 3, 3, 48, 48).astype(np.float32)
    v2 = np.clip(v1 + rng.randn(*v1.shape).astype(np.float32) * 0.08, 0, 1)
    res = cs.calculate_ssim(torch.from_numpy(v1), torch.from_numpy(v2))
    want = np.mean(list(res["value"].values()))  # {timestamp: mean-over-videos}

    flat1 = np.moveaxis(v1.reshape(-1, *v1.shape[2:]), 1, -1)
    flat2 = np.moveaxis(v2.reshape(-1, *v2.shape[2:]), 1, -1)
    got = float(np.mean(np.asarray(ssim(jnp.asarray(flat1), jnp.asarray(flat2)))))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fvd_preprocess_parity():
    """fvd/fvd.py:18-30 preprocess (bilinear 224 resize, [-1,1] scale) vs
    eval/i3d.preprocess_videos — resize semantics shift rFVD if they drift
    (torch align_corners=False == jax half-pixel bilinear)."""
    from reference_oracle import install_stubs

    install_stubs()
    rfvd = importlib.import_module("OmniTokenizer.fvd.fvd")

    rng = np.random.RandomState(7)
    vids = (rng.rand(2, 3, 40, 56, 3) * 255).astype(np.uint8)
    want = rfvd.preprocess(vids, (224, 224)).numpy()  # (b, c, t, h, w)

    from omnitokenizer_tpu.eval.i3d import preprocess_videos

    got = np.asarray(preprocess_videos(vids))  # (b, t, h, w, c)
    got_cf = np.transpose(got, (0, 4, 1, 2, 3))
    np.testing.assert_allclose(got_cf, want, atol=2e-5, rtol=1e-4)
