"""Latent-diffusion adapter: the integration seam DiT / Latte consume.

Reference contract (/root/reference/Diffusion/DiT/train.py:242,
sample_ddp.py:162, Diffusion/Latte/train.py:216, sample/sample_ddp.py:203):
a VAE-mode OmniTokenizer replaces the SD-VAE —
    latents = vae.encode(x, is_image=...) * 0.18215       # 8-channel
    pixels  = vae.decode(latents / 0.18215, is_image=...)
with image latents 32x32 and video latents (1+(T-1)/4, 32, 32) for the
canonical config (in_channels=8 DiT/Latte variants, latte.py:520-521,
models/__init__.py:46).

`DiffusionVAEAdapter` wraps an OmniTokenizerVQGAN (use_vae=True) and exposes
exactly that interface, so an external JAX DiT/Latte port plugs in without
knowing about this framework.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..config import TokenizerConfig
from .wrapper import OmniTokenizerVQGAN

SD_LATENT_SCALE = 0.18215


class DiffusionVAEAdapter:
    def __init__(self, vae: OmniTokenizerVQGAN, scale: float = SD_LATENT_SCALE):
        assert vae.cfg.use_vae, "diffusion adapter needs a VAE-mode tokenizer"
        self.vae = vae
        self.scale = scale

    @classmethod
    def load_from_checkpoint(cls, ckpt_path: str, **kw) -> "DiffusionVAEAdapter":
        vae = OmniTokenizerVQGAN.load_from_checkpoint(ckpt_path)
        return cls(vae, **kw)

    # -- the DiT/Latte-facing contract ---------------------------------
    def encode(self, x, is_image: bool, seed: int = 0) -> jnp.ndarray:
        """pixels (torch layout) -> scaled latents (B, 8, h, w) or
        (B, 8, t, h, w)."""
        return self.vae.encode(x, is_image=is_image, seed=seed) * self.scale

    def decode(self, z, is_image: bool) -> jnp.ndarray:
        """scaled latents -> pixels (torch layout).  Accepts the same layout
        encode produces (channels-first); for video this performs the Latte
        rearrange 'b f c h w -> b f h w c' before the wrapper's
        reference-faithful channels-last 5-dim VAE decode
        (Diffusion/Latte/sample/sample_ddp.py:202-203)."""
        z = jnp.asarray(z) / self.scale
        if not is_image and z.ndim == 5:
            z = jnp.transpose(z, (0, 2, 3, 4, 1))  # (B,c,t,h,w) -> (B,t,h,w,c)
        return self.vae.decode(z, is_image=is_image)

    @property
    def latent_channels(self) -> int:
        return self.vae.cfg.codebook_dim

    def latent_shape(self, is_image: bool) -> Tuple[int, ...]:
        cfg = self.vae.cfg
        if is_image:
            return (cfg.codebook_dim, cfg.latent_hw, cfg.latent_hw)
        return (cfg.codebook_dim, cfg.latent_t, cfg.latent_hw, cfg.latent_hw)
