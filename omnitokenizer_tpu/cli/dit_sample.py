"""DiT sampling CLI — analogue of /root/reference/Diffusion/DiT/sample.py /
sample_ddp.py.

Reference semantics: sample with the EMA weights, classifier-free guidance by
doubling the batch with the null class (sample.py:60-66), p_sample_loop over
`--num_sampling_steps` respaced steps, then vae.decode(latents/0.18215)
(sample_ddp.py:162).  Classes are sharded across processes for parallel
generation (sample_ddp.py 'global batch' pattern).

`latte_sample` reuses `main(video=True)` (reference
Latte/sample/sample_ddp.py:195-210, CFG on the first 4 channels).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from . import args as A
from .diffusion_common import add_common_diffusion_args, build_model, decode_batch_fn, load_vae_adapter


def build_parser(video: bool = False):
    p = argparse.ArgumentParser("latte_sample" if video else "dit_sample")
    add_common_diffusion_args(p, video)
    p.add_argument("--ckpt", type=str, required=True, help="state_*.msgpack from training")
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument("--no_ema", dest="use_ema", action="store_false")
    p.add_argument("--num_sampling_steps", type=int, default=250)
    p.add_argument("--ddim", action="store_true", help="use ddim<N> respacing + DDIM sampler")
    p.add_argument("--cfg_scale", type=float, default=4.0)
    p.add_argument("--cfg_channels", type=int, default=None,
                   help="channels guided (reference quirk: 3 for DiT, 4 for Latte)")
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--per_proc_batch_size", type=int, default=8)
    p.add_argument("--classes", type=int, nargs="+", default=None)
    p.add_argument("--sample_dir", type=str, default="samples_diffusion")
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--noise_schedule", type=str, default="linear")
    return p


def main(argv=None, video: bool = False):
    A.apply_platform_env()
    import jax
    import jax.numpy as jnp

    from ..diffusion import create_diffusion
    from ..models import dit as dit_mod
    from ..models import latte as latte_mod
    from ..utils.media import save_image_grid, save_video_grid

    args = build_parser(video).parse_args(argv)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model, cfg = build_model(args, video, dtype)
    cfg_channels = args.cfg_channels if args.cfg_channels is not None else (4 if video else 3)

    respacing = f"ddim{args.num_sampling_steps}" if args.ddim else str(args.num_sampling_steps)
    diffusion = create_diffusion(respacing, noise_schedule=args.noise_schedule,
                                 diffusion_steps=args.diffusion_steps)

    # load EMA (or raw) params from the training state
    rng = np.random.RandomState(args.seed)
    ex = jnp.zeros((1, cfg.num_frames, cfg.input_size, cfg.input_size, cfg.in_channels)) \
        if video else jnp.zeros((1, cfg.input_size, cfg.input_size, cfg.in_channels))
    variables = model.init(jax.random.PRNGKey(0), ex, jnp.zeros((1,), jnp.int32),
                           jnp.zeros((1,), jnp.int32) if cfg.num_classes else None)
    from flax import serialization

    if args.ckpt.endswith((".pt", ".pth", ".ckpt")):
        # published torch DiT/Latte checkpoint (raw state_dict or train.py
        # {'ema','model'} dict — Diffusion/DiT/download.py:18-29)
        from ..models.dit import load_torch_diffusion_state_dict
        from ..models.dit import convert_dit_state
        from ..models.latte import convert_latte_state

        sd = load_torch_diffusion_state_dict(args.ckpt, use_ema=args.use_ema)
        convert = convert_latte_state if video else convert_dit_state
        params = serialization.from_state_dict(variables["params"], convert(sd))
    else:
        # restore only params/ema from the raw msgpack (the optimizer state's
        # structure depends on training flags and isn't needed for sampling)
        with open(args.ckpt, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        field = "ema_params" if args.use_ema else "params"  # DiffusionTrainState fields
        params = serialization.from_state_dict(variables["params"], raw[field])

    fwd_cfg = latte_mod.forward_with_cfg if video else dit_mod.forward_with_cfg
    null_class = cfg.num_classes  # LabelEmbedder null id

    def model_fn(x, t, y):
        if args.cfg_scale != 1.0:
            return fwd_cfg(lambda p, xx, tt, yy: model.apply(p, xx, tt, yy),
                           {"params": params}, x, t, y, args.cfg_scale, cfg_channels)
        return model.apply({"params": params}, x, t, y)

    adapter = load_vae_adapter(args)
    decode = decode_batch_fn(adapter, video) if adapter else None
    os.makedirs(args.sample_dir, exist_ok=True)

    # shard requested classes over processes (transformer_eval-style)
    pidx, pcount = jax.process_index(), jax.process_count()
    classes = args.classes if args.classes is not None else list(range(cfg.num_classes))
    todo = args.num_samples
    key = jax.random.PRNGKey(args.seed + 1000 * pidx)
    made = 0
    latent_shape = (
        (args.per_proc_batch_size, cfg.num_frames, cfg.input_size, cfg.input_size, cfg.in_channels)
        if video else
        (args.per_proc_batch_size, cfg.input_size, cfg.input_size, cfg.in_channels)
    )
    sample_loop = diffusion.ddim_sample_loop if args.ddim else diffusion.p_sample_loop

    while made < todo:
        n = min(args.per_proc_batch_size, todo - made)
        y_real = np.array([classes[(made + i + pidx) % len(classes)] for i in range(n)], np.int32)
        if args.cfg_scale != 1.0:
            shape = (2 * n, *latent_shape[1:])
            y = jnp.concatenate([jnp.asarray(y_real), jnp.full((n,), null_class, jnp.int32)])
        else:
            shape = (n, *latent_shape[1:])
            y = jnp.asarray(y_real)
        key, sub = jax.random.split(key)
        z = sample_loop(lambda x, t: model_fn(x, t, y), shape, sub,
                        clip_denoised=False)
        if args.cfg_scale != 1.0:
            z = z[:n]
        if decode is not None:
            x = np.asarray(decode(z))  # torch layout, [-0.5, 0.5]
            for i in range(n):
                tag = f"{pidx:02d}_{made + i:05d}_c{int(y_real[i])}"
                if video:
                    save_video_grid(x[i:i + 1] + 0.5, os.path.join(args.sample_dir, tag + ".mp4"))
                else:
                    save_image_grid(x[i:i + 1] + 0.5, os.path.join(args.sample_dir, tag + ".png"))
        else:
            np.save(os.path.join(args.sample_dir, f"latents_{pidx:02d}_{made:05d}.npy"), np.asarray(z))
        made += n
        print(f"[sample] {made}/{todo}")
    return made


if __name__ == "__main__":
    main()
