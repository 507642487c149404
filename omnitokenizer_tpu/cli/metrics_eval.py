"""Standalone generated-vs-ground-truth metrics CLI — analogue of
/root/reference/evaluation/fvd_external.py:61-87 (FVD between a directory
of generated videos and a directory of ground-truth videos) plus the
pairwise PSNR/SSIM calculators from common_metrics_on_video_quality.

Inputs are directories of .npz (key 'video' (T,H,W,C) or (C,T,H,W) float
in [-0.5, 0.5] or uint8), .npy arrays, or per-clip .gif files.  Pairs are
matched by sorted filename order, like the reference's sorted(listdir).

Usage:
    python -m omnitokenizer_tpu.cli.metrics_eval \
        --gen_dir GEN --gt_dir GT [--i3d_path i3d.pt] [--max_clips N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from . import args as A


def _load_clip(path: str, value_range: str) -> np.ndarray:
    """-> float32 (T, H, W, C) in [0, 1].

    Float inputs are interpreted deterministically by --range: 'model'
    ([-0.5, 0.5], this framework's pixel convention) or 'unit' ([0, 1]).
    A data-driven guess would shift paired clips inconsistently."""
    if path.endswith(".npz"):
        arr = np.load(path)["video"]
    elif path.endswith(".npy"):
        arr = np.load(path)
    else:  # gif or other imageio-readable clip
        import imageio.v3 as iio

        arr = iio.imread(path)
    arr = np.asarray(arr)
    if arr.ndim == 3:  # single image (H, W, C)
        arr = arr[None]
    if arr.shape[0] in (1, 3) and arr.shape[-1] not in (1, 3):
        arr = np.moveaxis(arr, 0, -1)  # (C,T,H,W) -> (T,H,W,C)
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    arr = arr.astype(np.float32)
    if value_range == "model":
        arr = arr + 0.5
    return np.clip(arr, 0.0, 1.0)


def _clips(d: str, limit):
    paths = sorted(p for ext in ("npz", "npy", "gif", "mp4", "avi")
                   for p in glob.glob(os.path.join(d, f"*.{ext}")))
    return paths[:limit] if limit else paths


def main(argv=None):
    A.apply_platform_env()
    ap = argparse.ArgumentParser("metrics_eval")
    ap.add_argument("--gen_dir", required=True)
    ap.add_argument("--gt_dir", required=True)
    ap.add_argument("--i3d_path", default=None,
                    help="torch i3d_pretrained_400.pt for FVD")
    ap.add_argument("--max_clips", type=int, default=None)
    ap.add_argument("--range", dest="value_range", default="model",
                    choices=["model", "unit"],
                    help="float input convention: 'model' [-0.5,0.5] "
                         "(this framework's outputs) or 'unit' [0,1]")
    ap.add_argument("--save", default=None, help="write result json here")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..eval.metrics import psnr, ssim

    gen_paths = _clips(args.gen_dir, args.max_clips)
    gt_paths = _clips(args.gt_dir, args.max_clips)
    assert gen_paths and gt_paths, "empty input dirs"
    n = min(len(gen_paths), len(gt_paths))

    psnrs, ssims = [], []
    gen_u8, gt_u8 = [], []
    for gp, tp in zip(gen_paths[:n], gt_paths[:n]):
        g, t = _load_clip(gp, args.value_range), _load_clip(tp, args.value_range)
        tmin = min(g.shape[0], t.shape[0])
        g, t = g[:tmin], t[:tmin]
        psnrs.append(float(np.mean(np.asarray(psnr(jnp.asarray(g), jnp.asarray(t))))))
        ssims.append(float(np.mean(np.asarray(ssim(jnp.asarray(g), jnp.asarray(t))))))
        gen_u8.append((g * 255).astype(np.uint8))
        gt_u8.append((t * 255).astype(np.uint8))

    fvd = None
    if args.i3d_path:
        from ..eval.frechet import frechet_distance
        from ..eval.i3d import compute_fvd_logits, load_i3d_variables

        variables, _ = load_i3d_variables(args.i3d_path)
        # crop every clip to the common (T, H, W) so they stack
        tmin = min(c.shape[0] for c in gen_u8 + gt_u8)
        hmin = min(c.shape[1] for c in gen_u8 + gt_u8)
        wmin = min(c.shape[2] for c in gen_u8 + gt_u8)
        gen_s = np.stack([c[:tmin, :hmin, :wmin] for c in gen_u8])
        gt_s = np.stack([c[:tmin, :hmin, :wmin] for c in gt_u8])
        lg = compute_fvd_logits(gen_s, variables)
        lt = compute_fvd_logits(gt_s, variables)
        fvd = float(frechet_distance(lg, lt))

    result = {"clips": n, "psnr": float(np.mean(psnrs)),
              "ssim": float(np.mean(ssims)), "fvd": fvd}
    print(json.dumps(result))
    if args.save:
        os.makedirs(os.path.dirname(os.path.abspath(args.save)), exist_ok=True)
        with open(args.save, "w") as f:
            json.dump(result, f)
    return result


if __name__ == "__main__":
    main()
