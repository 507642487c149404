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


def _load_clip(path: str, value_range: str, frames=None, sampling="center",
               resolution=None) -> np.ndarray:
    """-> float32 (T, H, W, C) in [0, 1].

    Float inputs are interpreted deterministically by --range: 'model'
    ([-0.5, 0.5], this framework's pixel convention) or 'unit' ([0, 1]).
    A data-driven guess would shift paired clips inconsistently.

    mp4/avi route through the video decoder with the fvd_external.py:31-49
    semantics: decode resized to `resolution`, then sample `frames` frames
    at `sampling` (first/last/center)."""
    if path.endswith(".npz"):
        arr = np.load(path)["video"]
    elif path.endswith(".npy"):
        arr = np.load(path)
    elif path.endswith((".mp4", ".avi", ".webm", ".mkv")):
        from ..data.video import (_read_frames_imageio, _resize_frames,
                                  load_video_frames)

        if frames:
            arr, valid = load_video_frames(path, num_frm=frames,
                                           strategy=sampling,
                                           height=resolution, width=resolution)
            if not valid.all():
                # fvd_external.py asserts len(vr) >= frames; padding black
                # frames would silently corrupt PSNR/SSIM/FVD (ADVICE r4)
                raise ValueError(
                    f"{path}: only {int(valid.sum())} decodable frames "
                    f"< --frames {frames}")
        else:
            arr, _ = _read_frames_imageio(path)
            if resolution:
                arr = _resize_frames(arr, resolution, resolution)
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
    paths = sorted(p for ext in ("npz", "npy", "gif", "mp4", "avi", "webm", "mkv")
                   for p in glob.glob(os.path.join(d, f"*.{ext}")))
    return paths[:limit] if limit else paths


def main(argv=None):
    A.apply_platform_env()
    ap = argparse.ArgumentParser("metrics_eval")
    ap.add_argument("--gen_dir", default=None)
    ap.add_argument("--gt_dir", default=None)
    ap.add_argument("--ref_npz", default=None,
                    help="OpenAI-evaluator-style reference image batch "
                        "(uint8 (N,H,W,3) under arr_0; evaluator.py:69-80)")
    ap.add_argument("--sample_npz", default=None,
                    help="sample image batch npz (pairs with --ref_npz)")
    ap.add_argument("--i3d_path", default=None,
                    help="torch i3d_pretrained_400.pt for FVD")
    ap.add_argument("--inception_path", default=None,
                    help="torch pt_inception-2015-12-05 state_dict for FID/IS")
    ap.add_argument("--metrics", default="psnr,ssim,fvd",
                    help="comma list from psnr,ssim,fvd,lpips,is,fid,sfid,"
                         "prec_recall (mirrors "
                         "evaluation/common_metrics_on_video_quality + "
                         "pytorch-fid dir-vs-dir + the OpenAI evaluator's "
                         "sFID/precision/recall, evaluator.py:82-112)")
    ap.add_argument("--fvd_method", default="videogpt",
                    choices=["videogpt", "styleganv"],
                    help="videogpt: plain 224 resize (fvd/fvd.py:18-29); "
                         "styleganv: shorter-side resize + center crop "
                         "(fvd/styleganv/fvd.py:38-60)")
    ap.add_argument("--max_clips", type=int, default=None)
    ap.add_argument("--frames", type=int, default=None,
                    help="sample exactly N frames per video clip "
                         "(fvd_external.py --frames)")
    ap.add_argument("--sampling", default="center",
                    choices=["first", "last", "center"],
                    help="frame-window position when --frames is set "
                         "(fvd_external.py --sampling)")
    ap.add_argument("--resolution", type=int, default=None,
                    help="decode video clips resized to this square size "
                         "(fvd_external.py: decord VideoReader width/height)")
    ap.add_argument("--range", dest="value_range", default="model",
                    choices=["model", "unit"],
                    help="float input convention: 'model' [-0.5,0.5] "
                         "(this framework's outputs) or 'unit' [0,1]")
    ap.add_argument("--save", default=None, help="write result json here")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..eval.metrics import psnr, ssim

    want = {m.strip() for m in args.metrics.split(",") if m.strip()}

    if args.ref_npz or args.sample_npz:
        # evaluator.py batch mode: unpaired image batches -> inception
        # metrics only (FID/sFID/IS/precision/recall)
        assert args.ref_npz and args.sample_npz, \
            "--ref_npz and --sample_npz must be given together"
        assert not (want & {"psnr", "ssim", "lpips", "fvd"}), \
            "npz batch mode computes unpaired metrics only (is,fid,sfid,prec_recall)"

        def load_npz(path):
            z = np.load(path)
            arr = z[z.files[0]]
            assert arr.dtype == np.uint8 and arr.ndim == 4, arr.shape
            return arr[: args.max_clips] if args.max_clips else arr

        gt_u8 = [load_npz(args.ref_npz)]
        gen_u8 = [load_npz(args.sample_npz)]
        n = len(gen_u8[0])
        psnrs, ssims = [], []
        gen_paths = gt_paths = []
    else:
        assert args.gen_dir and args.gt_dir, "--gen_dir/--gt_dir required"
        gen_paths = _clips(args.gen_dir, args.max_clips)
        gt_paths = _clips(args.gt_dir, args.max_clips)
        assert gen_paths and gt_paths, "empty input dirs"
        n = min(len(gen_paths), len(gt_paths))

        psnrs, ssims = [], []
        gen_u8, gt_u8 = [], []
    for gp, tp in zip(gen_paths[:n], gt_paths[:n]):
        g = _load_clip(gp, args.value_range, frames=args.frames,
                       sampling=args.sampling, resolution=args.resolution)
        t = _load_clip(tp, args.value_range, frames=args.frames,
                       sampling=args.sampling, resolution=args.resolution)
        tmin = min(g.shape[0], t.shape[0])
        g, t = g[:tmin], t[:tmin]
        if "psnr" in want:
            psnrs.append(float(np.mean(np.asarray(psnr(jnp.asarray(g), jnp.asarray(t))))))
        if "ssim" in want:
            ssims.append(float(np.mean(np.asarray(ssim(jnp.asarray(g), jnp.asarray(t))))))
        gen_u8.append((g * 255).astype(np.uint8))
        gt_u8.append((t * 255).astype(np.uint8))

    def _stacked(clips):
        tmin = min(c.shape[0] for c in clips)
        hmin = min(c.shape[1] for c in clips)
        wmin = min(c.shape[2] for c in clips)
        return np.stack([c[:tmin, :hmin, :wmin] for c in clips])

    fvd = None
    if "fvd" in want and args.i3d_path:
        from ..eval.frechet import frechet_distance
        from ..eval.i3d import (compute_fvd_logits, load_i3d_variables,
                                preprocess_videos_styleganv)

        variables, _ = load_i3d_variables(args.i3d_path)
        # crop every clip to the common (T, H, W) so they stack
        gen_s = _stacked(gen_u8 + gt_u8)[:len(gen_u8)]
        gt_s = _stacked(gen_u8 + gt_u8)[len(gen_u8):]
        pre = (preprocess_videos_styleganv
               if args.fvd_method == "styleganv" else None)
        lg = compute_fvd_logits(gen_s, variables, preprocess=pre)
        lt = compute_fvd_logits(gt_s, variables, preprocess=pre)
        fvd = float(frechet_distance(lg, lt))

    lpips_val = None
    if "lpips" in want:
        # per-frame LPIPS averaged over clips (calculate_lpips.py:26-61);
        # [0,1] frames scaled to [-1,1]
        from ..models.lpips import LPIPS, load_lpips_variables

        lp_vars, pretrained = load_lpips_variables()
        if pretrained:
            model = LPIPS()
            import jax as _jax

            apply = _jax.jit(lambda v, a, b: jnp.mean(model.apply(v, a, b)))
            vals = []
            for g, t in zip(gen_u8, gt_u8):
                a = jnp.asarray(g, jnp.float32) / 255.0 * 2.0 - 1.0
                b = jnp.asarray(t, jnp.float32) / 255.0 * 2.0 - 1.0
                vals.append(float(apply(lp_vars, a, b)))
            lpips_val = float(np.mean(vals))
        else:
            print("[metrics_eval] no VGG backbone weights; skipping lpips")

    is_mean = is_std = None
    fid = sfid = prec = recall = None
    inception_metrics = {"is", "fid", "sfid", "prec_recall"} & want
    if inception_metrics and args.inception_path:
        from ..eval.inception import (compute_fid_features,
                                      compute_inception_probs,
                                      compute_spatial_features,
                                      inception_score, load_inception_variables)

        inc_vars, pretrained = load_inception_variables(args.inception_path)
        if pretrained:
            gen_frames = np.concatenate(
                [c.astype(np.float32) / 255.0 for c in gen_u8])
            gt_frames = np.concatenate(
                [c.astype(np.float32) / 255.0 for c in gt_u8])
            if "is" in want:
                probs = compute_inception_probs(gen_frames, inc_vars)
                is_mean, is_std = inception_score(probs, splits=1)
            if "fid" in want or "prec_recall" in want:
                fr = compute_fid_features(gt_frames, inc_vars)
                ff = compute_fid_features(gen_frames, inc_vars)
                if "fid" in want:
                    from ..eval.frechet import frechet_distance

                    fid = float(frechet_distance(ff, fr))
                if "prec_recall" in want:
                    from ..eval.prec_recall import precision_recall

                    prec, recall = precision_recall(fr, ff)
            if "sfid" in want:
                from ..eval.frechet import frechet_distance

                sr = compute_spatial_features(gt_frames, inc_vars)
                sf = compute_spatial_features(gen_frames, inc_vars)
                sfid = float(frechet_distance(sf, sr))
        else:
            print("[metrics_eval] inception weights unreadable; skipping "
                  + ",".join(sorted(inception_metrics)))

    result = {"clips": n,
              "psnr": float(np.mean(psnrs)) if psnrs else None,
              "ssim": float(np.mean(ssims)) if ssims else None,
              "fvd": fvd, "lpips": lpips_val,
              "is": is_mean, "is_std": is_std, "fid": fid, "sfid": sfid,
              "precision": prec, "recall": recall}
    print(json.dumps(result))
    if args.save:
        os.makedirs(os.path.dirname(os.path.abspath(args.save)), exist_ok=True)
        with open(args.save, "w") as f:
            json.dump(result, f)
    return result


if __name__ == "__main__":
    main()
