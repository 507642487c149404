"""Latte — latent video diffusion transformer (alternating spatial/temporal
adaLN-Zero blocks).

Behavioral reference: /root/reference/Diffusion/Latte/models/latte.py
  - Latte :215-403 (paired spatial/temporal blocks :350-373, temporal sincos
    embed added once after the first spatial block :360-363, conditioning
    repeat per frame/patch :338-348, final layer on spatial layout :375-381)
  - extras: 1 = unconditional, 2 = class (LabelEmbedder), 78 = text
    (77x768 CLIP embedding -> SiLU+Linear projection :243-247)
  - configs :469-528, incl. 'Latte-XL/2-omnitokenizer' (in_channels=8 :520-521)
  - temporal length for OmniTokenizer latents: 1+(T-1)//4
    (Latte/models/__init__.py:46)

TPU-native design: channels-last (B, F, H, W, C); the spatial<->temporal
alternation is two reshapes between (B*F, N, D) and (B*N, F, D) token
layouts — pure data-movement XLA handles as layout changes, no copies of
parameters; blocks reuse the DiT adaLN-Zero block.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.precision import mm_precision
from .dit import DiTBlock, FinalLayer, LabelEmbedder, TimestepEmbedder, sincos_1d, sincos_2d


@dataclass(frozen=True)
class LatteConfig:
    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_frames: int = 16
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = True
    extras: int = 1  # 1=uncond, 2=class, 78=text embedding
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    def replace(self, **kw) -> "LatteConfig":
        import dataclasses

        return dataclasses.replace(self, **kw)


class Latte(nn.Module):
    """(B, F, H, W, C), t (B,), y (B,) -> (B, F, H, W, out_C)."""

    cfg: LatteConfig

    def patchify(self, x):
        p = self.cfg.patch_size
        BF, H, W, C = x.shape
        h, w = H // p, W // p
        x = x.reshape(BF, h, p, w, p, C).transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(BF, h * w, p * p * C)

    def unpatchify(self, x):
        p, c = self.cfg.patch_size, self.cfg.out_channels
        BF, N, _ = x.shape
        h = w = int(math.isqrt(N))
        x = x.reshape(BF, h, w, p, p, c).transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(BF, h * p, w * p, c)

    @nn.compact
    def __call__(self, x, t, y=None, text_embedding=None, train: bool = False,
                 force_drop_ids=None, y_image=None, use_image_num: int = 0):
        """use_image_num > 0 = the latte_img joint image-video variant
        (Diffusion/Latte/models/latte_img.py:316-400): the trailing
        `use_image_num` entries of the frame axis are INDEPENDENT images —
        they ride the spatial blocks with per-image class conditioning
        (`y_image` (B, use_image_num), :336-346) but BYPASS the temporal
        blocks and the temporal sincos embed (:373-389)."""
        cfg = self.cfg
        assert cfg.depth % 2 == 0, "Latte pairs spatial+temporal blocks; depth must be even"
        prec = mm_precision(cfg.dtype)
        B, F, H, W, C = x.shape
        Fv = F - use_image_num  # video frames (latte_img.py:374-376 split)
        grid = cfg.input_size // cfg.patch_size
        N = grid * grid

        pos = jnp.asarray(sincos_2d(cfg.hidden_size, grid), cfg.dtype)
        temp = jnp.asarray(sincos_1d(cfg.hidden_size, np.arange(cfg.num_frames)), cfg.dtype)

        h = self.patchify(x.astype(cfg.dtype).reshape(B * F, H, W, C))
        h = nn.Dense(
            cfg.hidden_size, dtype=cfg.dtype, precision=prec,
            kernel_init=nn.initializers.xavier_uniform(), name="x_embed",
        )(h)
        h = h + pos[None]  # (B*F, N, D)

        t_emb = TimestepEmbedder(cfg.hidden_size, dtype=cfg.dtype, name="t_embed")(t)  # (B, D)
        cond = None
        cond_spatial = None  # (B*F, D) override when image frames carry own labels
        if cfg.extras == 2:
            embedder = LabelEmbedder(
                cfg.num_classes, cfg.hidden_size, cfg.class_dropout_prob, dtype=cfg.dtype, name="y_embed")
            cond = embedder(y, train=train, force_drop_ids=force_drop_ids)
            if use_image_num and y_image is not None:
                # latte_img.py:336-346: y_spatial = [video y x Fv frames,
                # then each image's own label embedding]
                y_img_emb = embedder(y_image.reshape(-1), train=train,
                                     force_drop_ids=force_drop_ids)
                y_img_emb = y_img_emb.reshape(B, use_image_num, -1)
                y_sp = jnp.concatenate(
                    [jnp.repeat(cond[:, None], Fv, axis=1), y_img_emb], axis=1)
                cond_spatial = y_sp.reshape(B * F, -1)
        elif cfg.extras == 78:
            emb = text_embedding.reshape(B, -1).astype(cfg.dtype)  # (B, 77*768)
            cond = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, precision=prec, name="text_proj")(nn.silu(emb))

        def rep(v, times):  # (B, D) -> (B*times, D), matching einops 'n d -> (n c) d'
            return jnp.repeat(v, times, axis=0)

        t_spatial = rep(t_emb, F)
        if cond_spatial is not None:
            c_spatial = t_spatial + cond_spatial
        else:
            c_spatial = t_spatial if cond is None else rep(t_emb + cond, F)
        c_temp = rep(t_emb if cond is None else t_emb + cond, N)      # (B*N, D)

        for i in range(0, cfg.depth, 2):
            h = DiTBlock(cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio, cfg.dtype, name=f"block_{i}")(h, c_spatial)
            # (B*F, N, D) -> (B*N, F, D)
            h = h.reshape(B, F, N, -1).transpose(0, 2, 1, 3).reshape(B * N, F, -1)
            hv, hi = h[:, :Fv], h[:, Fv:]
            if i == 0:
                hv = hv + temp[None, :Fv]
            hv = DiTBlock(cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio, cfg.dtype, name=f"block_{i + 1}")(hv, c_temp)
            h = jnp.concatenate([hv, hi], axis=1) if use_image_num else hv
            h = h.reshape(B, N, F, -1).transpose(0, 2, 1, 3).reshape(B * F, N, -1)

        # reference quirk (latte.py:375-377 / latte_img.py:393-396): the
        # final layer is conditioned on timestep(+class) only — extras=78
        # text conditioning is NOT added
        c_final = c_spatial if cfg.extras == 2 else t_spatial
        h = FinalLayer(cfg.hidden_size, cfg.patch_size, cfg.out_channels, cfg.dtype, name="final")(h, c_final)
        h = self.unpatchify(h)  # (B*F, H, W, out_C)
        return h.reshape(B, F, H, W, cfg.out_channels)


def forward_with_cfg(apply_fn, params, x, t, y, cfg_scale, cfg_channels: int = 4, **kw):
    """CFG forward (latte.py:384-403; guidance on the first `cfg_channels`
    channels only — the reference splits at channel 4)."""
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out = apply_fn(params, combined, t, y, **kw)
    eps, rest = out[..., :cfg_channels], out[..., cfg_channels:]
    cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
    half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
    eps = jnp.concatenate([half_eps, half_eps], axis=0)
    return jnp.concatenate([eps, rest], axis=-1)


_SIZES = {
    "XL": dict(depth=28, hidden_size=1152, num_heads=16),
    "L": dict(depth=24, hidden_size=1024, num_heads=16),
    "B": dict(depth=12, hidden_size=768, num_heads=12),
    "S": dict(depth=12, hidden_size=384, num_heads=6),
}


def latte_config(name: str, **kw) -> LatteConfig:
    """'Latte-XL/2' / 'Latte-XL/2-omnitokenizer' (in_channels=8) etc."""
    base = name.replace("Latte-", "")
    omni = base.endswith("-omnitokenizer")
    if omni:
        base = base[: -len("-omnitokenizer")]
        kw.setdefault("in_channels", 8)
    arch, patch = base.split("/")
    return LatteConfig(patch_size=int(patch), **_SIZES[arch], **kw)


Latte_models = {
    name: (lambda name=name: latte_config(name))
    for a in _SIZES for p in (2, 4, 8)
    for name in (f"Latte-{a}/{p}",)
}
Latte_models["Latte-XL/2-omnitokenizer"] = lambda: latte_config("Latte-XL/2-omnitokenizer")


# -- torch -> flax conversion (Latte checkpoints, incl. the reference's
#    omnitokenizer-finetuned 8-channel variant) ------------------------------

def convert_latte_state(sd) -> dict:
    """Map a torch Latte state_dict (Diffusion/Latte/models/latte.py names)
    onto the flax Latte params tree.  pos_embed/temp_embed are dropped —
    both sides recompute the same fixed sin-cos tables."""
    from .dit import convert_dit_state

    # identical naming for everything DiT has...
    params = convert_dit_state(sd)
    # ...plus the text-conditioning projection (latte.py:243-247)
    if "text_embedding_projection.1.weight" in sd:
        w = np.asarray(sd["text_embedding_projection.1.weight"], np.float32)
        params["text_proj"] = {
            "kernel": np.ascontiguousarray(w.T),
            "bias": np.asarray(sd["text_embedding_projection.1.bias"], np.float32),
        }
    return params
