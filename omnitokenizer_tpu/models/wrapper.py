"""User-facing OmniTokenizer API — drop-in for the reference usage:

    from omnitokenizer_tpu import OmniTokenizerVQGAN
    vqgan = OmniTokenizerVQGAN.load_from_checkpoint(ckpt)   # torch .ckpt ok
    tokens = vqgan.encode(img_or_video, is_image)           # torch layout in
    recons = vqgan.decode(tokens, is_image)                 # torch layout out

Matches the contract of /root/reference/README.md:63-71 and
omnitokenizer.py:247-317 (flat/grid indices, image/video, VQ/VAE), including
channels-first (B,C,H,W) / (B,C,T,H,W) tensors at the boundary.  Internally
everything is jitted channels-last JAX.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TokenizerConfig
from .tokenizer import OmniTokenizerNet


def _to_channels_last(x: jnp.ndarray, is_image: bool) -> jnp.ndarray:
    x = jnp.asarray(x)
    if is_image:  # (B, C, H, W) -> (B, 1, H, W, C)
        return jnp.transpose(x, (0, 2, 3, 1))[:, None]
    return jnp.transpose(x, (0, 2, 3, 4, 1))  # (B, C, T, H, W) -> (B, T, H, W, C)


def _to_channels_first(x: jnp.ndarray, is_image: bool) -> jnp.ndarray:
    if is_image:  # (B, 1, H, W, C) -> (B, C, H, W)
        return jnp.transpose(x[:, 0], (0, 3, 1, 2))
    return jnp.transpose(x, (0, 4, 1, 2, 3))


class OmniTokenizerVQGAN:
    """Stateful convenience wrapper around the functional OmniTokenizerNet."""

    def __init__(self, cfg: TokenizerConfig, variables: Dict[str, Any]):
        self.cfg = cfg
        self.net = OmniTokenizerNet(cfg)
        self.variables = variables

    def serving_variables(self) -> Dict[str, Any]:
        """Variables with f32 params pre-cast to the compute dtype, ONCE
        (ops/precision.cast_f32_leaves; shared with the LM samplers).
        Buffers (codebook state) keep their dtype."""
        from ..ops.precision import cast_f32_leaves

        if self.cfg.dtype == jnp.float32:
            return self.variables
        v = dict(self.variables)
        v["params"] = cast_f32_leaves(v["params"], self.cfg.dtype)
        return v

    # -- construction -----------------------------------------------------
    @classmethod
    def from_config(cls, cfg: TokenizerConfig, seed: int = 0) -> "OmniTokenizerVQGAN":
        net = OmniTokenizerNet(cfg)
        t = 1 + cfg.temporal_patch_size
        dummy = jnp.zeros((1, t, 64, 64, cfg.image_channels), jnp.float32)
        variables = net.init(
            {"params": jax.random.PRNGKey(seed), "gaussian": jax.random.PRNGKey(seed + 1)},
            dummy, False)
        return cls(cfg, dict(variables))

    @classmethod
    def load_from_checkpoint(cls, ckpt_path: str, cfg: Optional[TokenizerConfig] = None,
                             strict: bool = False) -> "OmniTokenizerVQGAN":
        """Load either a torch Lightning .ckpt (converted on the fly) or an
        Orbax/msgpack checkpoint written by this framework."""
        from ..utils.checkpoint import load_tokenizer_checkpoint

        cfg, variables = load_tokenizer_checkpoint(ckpt_path, cfg=cfg, strict=strict)
        return cls(cfg, variables)

    # -- jit plumbing -------------------------------------------------------
    @functools.cached_property
    def _encode_fn(self):
        @functools.partial(jax.jit, static_argnames=("is_image", "include_embeddings"))
        def run(variables, x, seed, is_image, include_embeddings):
            rngs = (
                {"gaussian": jax.random.fold_in(jax.random.PRNGKey(0), seed)}
                if self.cfg.use_vae else None
            )
            return self.net.apply(
                variables, x, is_image, include_embeddings,
                method=OmniTokenizerNet.encode, rngs=rngs,
            )
        return run

    @functools.cached_property
    def _decode_fn(self):
        @functools.partial(jax.jit, static_argnames=("is_image",))
        def run(variables, enc, is_image):
            return self.net.apply(variables, enc, is_image, method=OmniTokenizerNet.decode)
        return run

    @functools.cached_property
    def _forward_fn(self):
        @functools.partial(jax.jit, static_argnames=("is_image",))
        def run(variables, x, is_image):
            return self.net.apply(
                variables, x, is_image,
                rngs={"gaussian": jax.random.PRNGKey(0)} if self.cfg.use_vae else None,
            )
        return run

    # -- public API ---------------------------------------------------------
    def encode(self, x, is_image: bool, include_embeddings: bool = False, seed: int = 0):
        """x in torch layout; returns indices (B,t,h,w) [int32] in VQ mode
        (optionally with channels-first embeddings), or channels-first
        latents in VAE mode."""
        xl = _to_channels_last(jnp.asarray(x, jnp.float32), is_image)
        out = self._encode_fn(self.variables, xl, seed, is_image, include_embeddings)
        if self.cfg.use_vae:
            z = out  # (B, t, h, w, c)
            z = jnp.transpose(z, (0, 4, 1, 2, 3))
            return z[:, :, 0] if is_image else z  # b c h w | b c t h w
        if include_embeddings:
            emb, enc = out
            return jnp.transpose(emb, (0, 4, 1, 2, 3)), enc
        return out

    def decode(self, encodings, is_image: bool):
        """encodings: VQ indices flat (B,N)/grid (B,t,h,w), or VAE latents —
        image (B,c,h,w) channels-FIRST (DiT contract,
        Diffusion/DiT/sample_ddp.py:162) but video (B,t,h,w,c) channels-LAST
        (Latte contract, Diffusion/Latte/sample/sample_ddp.py:202-203): the
        reference's 5-dim VAE decode rearranges 'b t h w c -> b c t h w'
        (omnitokenizer.py:305-311) even though its encode returns
        channels-first — we reproduce that asymmetry exactly."""
        enc = jnp.asarray(encodings)
        if self.cfg.use_vae and enc.ndim == 4 and not jnp.issubdtype(enc.dtype, jnp.integer):
            enc = jnp.transpose(enc, (0, 2, 3, 1))  # (B, c, h, w) -> (B, h, w, c)
        recon = self._decode_fn(self.variables, enc, is_image)
        return _to_channels_first(recon, is_image)

    def reconstruct(self, x, is_image: bool):
        xl = _to_channels_last(jnp.asarray(x, jnp.float32), is_image)
        recon, aux = self._forward_fn(self.variables, xl, is_image)
        return _to_channels_first(recon, is_image), aux

    # -- info ---------------------------------------------------------------
    @property
    def latent_shape(self):
        cfg = self.cfg
        return (cfg.latent_t, cfg.latent_hw, cfg.latent_hw)

    def num_params(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.variables["params"]))
