"""Reconstruction evaluation CLI — analogue of /root/reference/vqgan_eval.py.

image mode: dump input/recon PNG trees + optional FID when an InceptionV3
  feature file / torch weights are available (vqgan_eval.py:170-238);
video mode: reconstruct clips, compute rFVD via I3D logits when the
  i3d_pretrained_400.pt weights are present, plus PSNR/SSIM and codebook
  usage (vqgan_eval.py:102-167).

Batches are sharded over the data mesh; the tokenizer forward is one jitted
graph per shape.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from . import args as A


def build_parser():
    p = argparse.ArgumentParser("vqgan_eval")
    A.add_model_args(p)
    A.add_loss_args(p)
    A.add_data_args(p)
    p.add_argument("--vqgan_ckpt", type=str, required=True)
    p.add_argument("--inference_type", type=str, default="image", choices=["image", "video"])
    p.add_argument("--save", type=str, default="./eval_out")
    p.add_argument("--dataset", type=str, default=None,
                   help="dataset tag: outputs nest under <save>/<dataset> "
                        "(vqgan_eval.py:88)")
    p.add_argument("--save_videos", action="store_true")
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--train", action="store_true",
                   help="evaluate on the train split (vqgan_eval.py:94-97)")
    p.add_argument("--replacewithgt", type=int, default=None,
                   help="replace the first K frames of the reconstruction "
                        "with ground truth before FVD (vqgan_eval.py:142-145)")
    p.add_argument("--infer_downsample", type=int, default=None,
                   help="bilinear-downsample real+recon by 1/N before "
                        "metrics (vqgan_eval.py:121-135,207-218)")
    p.add_argument("--i3d_path", type=str, default=None)
    p.add_argument("--inception_path", type=str, default=None,
                   help="torch pt_inception-2015-12-05 state_dict for rFID")
    return p


def main(argv=None):
    A.apply_platform_env()
    import jax
    import jax.numpy as jnp

    from ..eval.frechet import frechet_distance
    from ..eval.metrics import psnr, ssim
    from ..models.wrapper import OmniTokenizerVQGAN
    from ..data.loader import VideoData

    args = build_parser().parse_args(argv)
    cfg = A.tokenizer_config_from(args)
    model = OmniTokenizerVQGAN.load_from_checkpoint(args.vqgan_ckpt, cfg=cfg)

    # epochs=1: the reference eval iterates its finite torch DataLoader
    # exactly once, in order, tail batch included (vqgan_eval.py:95-101) —
    # our DataLoader cycles forever by default (the training contract)
    loader = VideoData(args, train=args.train, epochs=1)
    is_image = args.inference_type == "image"

    if args.dataset:
        args.save = os.path.join(args.save, args.dataset)
    os.makedirs(args.save, exist_ok=True)
    in_dir = os.path.join(args.save, "inputs")
    out_dir = os.path.join(args.save, "recons")
    os.makedirs(in_dir, exist_ok=True)
    os.makedirs(out_dir, exist_ok=True)

    psnrs, ssims = [], []
    used_codes = set()
    n_batches = 0
    real_clips, fake_clips = [], []  # uint8 (B,T,H,W,C) for FVD
    from PIL import Image

    for bi, batch in enumerate(iter(loader)):
        if args.max_batches is not None and bi >= args.max_batches:
            break
        video = np.asarray(batch["video"], np.float32)
        if is_image and video.ndim == 5:
            video = video[:, 0]
        x = np.moveaxis(video, -1, 1)  # to torch layout for the public API

        if cfg.use_vae:
            # VAE mode (vqgan_eval.py:100,151,190): posterior-sampled
            # roundtrip, and NO usage accounting — the reference never
            # touches total_usage under use_vae, so Usage prints 0.
            rec = np.asarray(model.reconstruct(x, is_image=is_image)[0])
        else:
            enc = model.encode(x, is_image=is_image)
            rec = np.asarray(model.decode(enc, is_image=is_image))
            used_codes.update(np.unique(np.asarray(enc)).tolist())

        xin = np.moveaxis(x, 1, -1)
        xre = np.moveaxis(rec, 1, -1)
        if is_image:
            psnrs.extend(np.asarray(psnr(jnp.asarray(xin), jnp.asarray(xre),
                                         data_range=1.0)).tolist())
            ssims.extend(np.asarray(ssim(jnp.asarray(xin), jnp.asarray(xre),
                                         data_range=1.0)).tolist())
            for i in range(len(xin)):
                for d, arr in ((in_dir, xin[i]), (out_dir, xre[i])):
                    img = np.clip((arr + 0.5) * 255, 0, 255).astype(np.uint8)
                    im = Image.fromarray(img)
                    if args.infer_downsample:
                        # reference resizes the dumped PNGs with ANTIALIAS
                        # (vqgan_eval.py:207-218)
                        r = img.shape[0] // args.infer_downsample
                        im = im.resize((r, r), Image.LANCZOS)
                    im.save(os.path.join(d, f"b{bi:05d}_{i:03d}.png"))
        else:
            B, C, T = x.shape[:3]
            flat_in = xin.reshape(-1, *xin.shape[2:])
            flat_re = xre.reshape(-1, *xre.shape[2:])
            psnrs.extend(np.asarray(psnr(jnp.asarray(flat_in), jnp.asarray(flat_re))).tolist())
            to_u8 = lambda v: np.clip((v + 0.5) * 255, 0, 255).astype(np.uint8)
            real_v, fake_v = xin, xre
            if args.infer_downsample:
                # bilinear 1/N downsample before FVD (vqgan_eval.py:121-135;
                # jax.image bilinear == torch align_corners=False)
                n = args.infer_downsample
                B_, T_, H_, W_, C_ = real_v.shape
                shp = (B_, T_, H_ // n, W_ // n, C_)
                real_v = np.asarray(jax.image.resize(jnp.asarray(real_v), shp, "bilinear"))
                fake_v = np.asarray(jax.image.resize(jnp.asarray(fake_v), shp, "bilinear"))
            if args.replacewithgt is not None:
                # first K frames of the recon replaced by GT
                # (vqgan_eval.py:142-145)
                k = args.replacewithgt
                fake_v = np.concatenate([real_v[:, :k], fake_v[:, k:]], axis=1)
                assert fake_v.shape[1] == real_v.shape[1]
            real_clips.append(to_u8(real_v))
            fake_clips.append(to_u8(fake_v))
            if args.save_videos:
                # GIF grids like the reference (vqgan_eval.py:155-158)
                from ..utils.media import save_video_grid

                save_video_grid(fake_v, os.path.join(out_dir, f"recons_{bi}.gif"))
                save_video_grid(real_v, os.path.join(in_dir, f"gt_{bi}.gif"))
        n_batches += 1

    fid = None
    if is_image and args.inception_path:
        # rFID over the dumped trees with the flax InceptionV3
        # (replaces the reference's pytorch-fid subprocess,
        # vqgan_eval.py:226-236)
        from PIL import Image as PILImage

        from ..eval.inception import compute_fid_features, load_inception_variables

        inc_vars, pretrained = load_inception_variables(args.inception_path)
        if pretrained:
            def read_tree(d):
                files = sorted(os.listdir(d))
                return np.stack([
                    np.asarray(PILImage.open(os.path.join(d, f)), np.float32) / 255.0
                    for f in files])

            fr = compute_fid_features(read_tree(in_dir), inc_vars)
            ff = compute_fid_features(read_tree(out_dir), inc_vars)
            fid = float(frechet_distance(fr, ff))
        else:
            print("[vqgan_eval] inception weights unreadable; skipping rFID")

    fvd = None
    if not is_image and real_clips:
        # rFVD via I3D logits (vqgan_eval.py:102-167); requires the
        # i3d_pretrained_400.pt weights — without them we skip the number
        # rather than report a random-feature distance
        from ..eval.i3d import compute_fvd_logits, load_i3d_variables

        i3d_vars, pretrained = load_i3d_variables(args.i3d_path)
        if pretrained:
            real = np.concatenate(real_clips)
            fake = np.concatenate(fake_clips)
            lr = compute_fvd_logits(real, i3d_vars)
            lf = compute_fvd_logits(fake, i3d_vars)
            fvd = float(frechet_distance(lr, lf))
        else:
            print("[vqgan_eval] no I3D weights (--i3d_path); skipping rFVD")

    usage = len(used_codes) / cfg.n_codes
    result = {
        "psnr": float(np.mean(psnrs)) if psnrs else None,
        "ssim": float(np.mean(ssims)) if ssims else None,
        "codebook_usage": usage,
        "fvd": fvd,
        "fid": fid,
        "batches": n_batches,
    }
    print(json.dumps(result))
    with open(os.path.join(args.save, "result.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
