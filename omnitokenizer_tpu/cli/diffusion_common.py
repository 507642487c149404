"""Shared plumbing for the DiT/Latte train & sample CLIs.

Behavioral reference: /root/reference/Diffusion/DiT/train.py (argparse
:290-312, train loop :220-287) and sample_ddp.py (CFG batching, vae decode
:150-170); Diffusion/Latte/train.py + sample/sample_ddp.py (:195-210).

The VAE seam is `models.diffusion_adapter.DiffusionVAEAdapter` (x0.18215);
when no tokenizer checkpoint is given, `--synthetic_data` trains/samples in
latent space directly so every path is drivable without weights.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Tuple

import numpy as np


def add_common_diffusion_args(p: argparse.ArgumentParser, video: bool):
    p.add_argument("--model", type=str, default="Latte-XL/2-omnitokenizer" if video else "DiT-XL/2")
    p.add_argument("--vae_ckpt", type=str, default=None, help="OmniTokenizer VAE checkpoint")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--in_channels", type=int, default=8, help="latent channels (OmniTokenizer VAE = 8)")
    p.add_argument("--num_classes", type=int, default=1000 if not video else 101)
    p.add_argument("--results_dir", type=str, default="results_diffusion")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true")
    if video:
        p.add_argument("--num_frames", type=int, default=17, help="pixel frames (latent = 1+(T-1)//4)")
        p.add_argument("--extras", type=int, default=2, choices=[1, 2, 78])
    return p


def latent_geometry(args, video: bool) -> Tuple[int, int]:
    """(latent hw, latent frames) — image_size//8 spatial, 1+(T-1)//4 temporal
    (reference DiT/train.py:148-149, Latte/models/__init__.py:46)."""
    latent_hw = args.image_size // 8
    latent_t = 1 + (args.num_frames - 1) // 4 if video else 1
    return latent_hw, latent_t


def build_model(args, video: bool, dtype):
    if video:
        from ..models.latte import Latte, latte_config

        latent_hw, latent_t = latent_geometry(args, video=True)
        cfg = latte_config(
            args.model, input_size=latent_hw, num_frames=latent_t,
            num_classes=args.num_classes, extras=args.extras, dtype=dtype,
        )
        if cfg.in_channels != args.in_channels:
            cfg = cfg.replace(in_channels=args.in_channels)
        return Latte(cfg), cfg
    from ..models.dit import DiT, dit_config

    latent_hw, _ = latent_geometry(args, video=False)
    cfg = dit_config(args.model, input_size=latent_hw, in_channels=args.in_channels,
                     num_classes=args.num_classes, dtype=dtype)
    return DiT(cfg), cfg


def load_vae_adapter(args):
    if not args.vae_ckpt:
        return None
    from ..models.diffusion_adapter import DiffusionVAEAdapter

    return DiffusionVAEAdapter.load_from_checkpoint(args.vae_ckpt)


def encode_batch_fn(adapter, video: bool):
    """pixels (torch layout, [-0.5,0.5] data range) -> channels-last scaled latents."""
    import jax.numpy as jnp

    def encode(x, seed=0):
        # data layer yields [-0.5, 0.5]; the reference diffusion stacks feed
        # [-1, 1] pixels into the SD-style VAE seam (DiT/train.py:242)
        z = adapter.encode(jnp.asarray(x) * 2.0, is_image=not video, seed=seed)
        if video:
            return jnp.transpose(z, (0, 2, 3, 4, 1))  # (B,8,t,h,w)->(B,t,h,w,8)
        return jnp.transpose(z, (0, 2, 3, 1))  # (B,8,h,w)->(B,h,w,8)

    return encode


def decode_batch_fn(adapter, video: bool):
    import jax.numpy as jnp

    def decode(z):
        if video:
            z = jnp.transpose(z, (0, 4, 1, 2, 3))
        else:
            z = jnp.transpose(z, (0, 3, 1, 2))
        x = adapter.decode(z, is_image=not video)
        return jnp.clip(x * 0.5, -0.5, 0.5)  # back to data range

    return decode


def synthetic_latents(rng: np.random.RandomState, n: int, cfg, video: bool):
    shape = (
        (n, cfg.num_frames, cfg.input_size, cfg.input_size, cfg.in_channels)
        if video else (n, cfg.input_size, cfg.input_size, cfg.in_channels)
    )
    return (rng.randn(*shape) * 0.5).astype(np.float32)
