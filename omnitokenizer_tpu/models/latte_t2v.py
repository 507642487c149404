"""LatteT2V — text-to-video latent diffusion transformer (PixArt-alpha-style
`ada_norm_single` blocks with T5 caption cross-attention, alternating
spatial/temporal).

Behavioral reference: /root/reference/Diffusion/Latte/models/latte_t2v.py
  - LatteT2V :444-946 (forward :684-941): spatial blocks = diffusers 0.24
    BasicTransformerBlock (self-attn -> caption cross-attn -> FF) under
    `ada_norm_single`, temporal blocks = the file's own
    BasicTransformerBlock_ :126-396 (self-attn -> FF, no cross-attn)
  - AdaLayerNormSingle :398-429 (PixArt adaLN-single: one timestep MLP
    produces a 6*D vector; every block adds its own learned
    scale_shift_table)
  - caption path: CaptionProjection (linear/gelu-tanh/linear) on T5
    features :673-675, video caption broadcast per frame / per-image
    captions in joint mode :791-801
  - joint image-video training (use_image_num>0): trailing frames are
    independent images that bypass temporal blocks :869-887.  Reference
    quirk kept: in this (non-gradient-checkpointing) joint path the
    temp_pos_embed is NEVER added (:869-887 has no i==0 branch, unlike the
    checkpointing path :824-831 and the plain path :880-885).
  - final layer :910-925 (scale_shift_table (2,D) + embedded_timestep),
    unpatchify :927-936
  - the model the reference actually instantiates is
    `from_pretrained_2d(PixArt-alpha transformer config)` :948-989 —
    ada_norm_single, attention_bias=True, gelu-approximate FF,
    caption_channels=4096 (T5-XXL), learn-sigma out_channels=8.

TPU-native design: channels-last (B, F, H, W, C); patch embed is a folded
matmul (no conv); the spatial<->temporal alternation is the same two-layout
dance as models/latte.py; attention runs in one einsum pair with an
additive key bias for the caption mask (diffusers' prepare_attention_mask
pad/repeat collapses to exactly that).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.precision import mm_precision
from .dit import TimestepEmbedder, sincos_1d, sincos_2d


@dataclass(frozen=True)
class LatteT2VConfig:
    """Mirrors LatteT2V.__init__ (latte_t2v.py:475-502) for the supported
    (and only shipped) configuration: patched continuous input with
    `ada_norm_single` conditioning."""

    num_attention_heads: int = 16
    attention_head_dim: int = 88
    in_channels: int = 4
    out_channels: Optional[int] = None
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    attention_bias: bool = False
    sample_size: int = 32
    patch_size: int = 2
    activation_fn: str = "geglu"  # or "gelu-approximate" (PixArt)
    norm_eps: float = 1e-5
    norm_elementwise_affine: bool = True
    caption_channels: Optional[int] = None
    video_length: int = 16
    dtype: Any = jnp.float32

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def out_ch(self) -> int:
        return self.in_channels if self.out_channels is None else self.out_channels

    @property
    def interpolation_scale(self) -> int:
        # latte_t2v.py:575-576: sample_size 64 (512px PixArt) has scale 1
        return max(self.sample_size // 64, 1)

    def replace(self, **kw) -> "LatteT2VConfig":
        import dataclasses

        return dataclasses.replace(self, **kw)


class LayerNormNoAffine(nn.Module):
    eps: float
    affine: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, use_bias=self.affine,
                            use_scale=self.affine, dtype=self.dtype,
                            name="ln")(x)


class MHA(nn.Module):
    """diffusers 0.24 Attention (attention_processor.py): separate
    q/k/v/out projections, optional qkv bias, out proj always biased,
    optional additive key bias mask broadcast over heads+queries."""

    dim: int
    heads: int
    head_dim: int
    qkv_bias: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, ctx=None, bias=None):
        prec = mm_precision(self.dtype)
        H, hd = self.heads, self.head_dim
        inner = H * hd
        B, N, _ = x.shape
        ctx = x if ctx is None else ctx
        L = ctx.shape[1]
        q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     precision=prec, name="to_q")(x)
        k = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     precision=prec, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     precision=prec, name="to_v")(ctx)
        q = q.reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k, precision=prec,
                         preferred_element_type=jnp.float32)
        sim = sim * (1.0 / math.sqrt(hd))
        if bias is not None:  # (B, 1, L) additive bias over keys
            sim = sim + bias[:, None, :, :].astype(sim.dtype)
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        y = jnp.einsum("bhij,bhjd->bhid", attn, v, precision=prec)
        y = y.transpose(0, 2, 1, 3).reshape(B, N, inner)
        return nn.Dense(self.dim, dtype=self.dtype, precision=prec,
                        name="to_out")(y)


class T2VFeedForward(nn.Module):
    """latte_t2v.py:69-126 FeedForward: geglu (exact gelu gate) or PixArt's
    gelu-approximate (linear -> tanh-gelu -> linear)."""

    dim: int
    activation_fn: str
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        prec = mm_precision(self.dtype)
        inner = self.dim * 4
        if self.activation_fn == "geglu":
            h = nn.Dense(inner * 2, dtype=self.dtype, precision=prec,
                         name="proj_in")(x)
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * jax.nn.gelu(gate.astype(jnp.float32),
                                approximate=False).astype(self.dtype)
        elif self.activation_fn == "gelu-approximate":
            h = nn.Dense(inner, dtype=self.dtype, precision=prec,
                         name="proj_in")(x)
            h = jax.nn.gelu(h.astype(jnp.float32),
                            approximate=True).astype(self.dtype)
        else:
            raise NotImplementedError(self.activation_fn)
        return nn.Dense(self.dim, dtype=self.dtype, precision=prec,
                        name="proj_out")(h)


class T2VBlock(nn.Module):
    """`ada_norm_single` transformer block.  cross=True = diffusers
    BasicTransformerBlock (spatial: self-attn, caption cross-attn with NO
    pre-norm — the PixArt quirk — then norm2+FF); cross=False = the file's
    BasicTransformerBlock_ (temporal: self-attn then norm3+FF).  Parameter
    names follow the torch state dict for 1:1 conversion."""

    cfg: LatteT2VConfig
    cross: bool

    @nn.compact
    def __call__(self, x, t6, ctx=None, ctx_bias=None):
        cfg = self.cfg
        D = cfg.inner_dim
        B = x.shape[0]
        table = self.param("scale_shift_table",
                           nn.initializers.normal(1.0 / math.sqrt(D)), (6, D))
        mod = table[None].astype(x.dtype) + t6.reshape(B, 6, D)
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = [
            mod[:, i][:, None] for i in range(6)]

        norm = lambda name: LayerNormNoAffine(
            cfg.norm_eps, cfg.norm_elementwise_affine, cfg.dtype, name=name)
        h = norm("norm1")(x) * (1 + sc_msa) + sh_msa
        attn = MHA(D, cfg.num_attention_heads, cfg.attention_head_dim,
                   cfg.attention_bias, cfg.dtype, name="attn1")(h)
        x = x + g_msa * attn
        if self.cross:
            # PixArt: no norm before cross-attention (attention.py quirk,
            # kept verbatim in the vendored block)
            attn = MHA(D, cfg.num_attention_heads, cfg.attention_head_dim,
                       cfg.attention_bias, cfg.dtype,
                       name="attn2")(x, ctx=ctx, bias=ctx_bias)
            x = x + attn
            h = norm("norm2")(x)  # diffusers reuses norm2 for the FF norm
        else:
            h = norm("norm3")(x)  # BasicTransformerBlock_ names it norm3
        h = h * (1 + sc_mlp) + sh_mlp
        return x + g_mlp * T2VFeedForward(D, cfg.activation_fn, cfg.dtype,
                                          name="ff")(h)


class LatteT2V(nn.Module):
    """x (B, F, H, W, C) channels-last, t (B,), captions
    (B, L, caption_channels) — or (B, 1+use_image_num, L, Cc) in joint
    image-video training — -> (B, F, H, W, out_ch)."""

    cfg: LatteT2VConfig

    @nn.compact
    def __call__(self, x, t, encoder_hidden_states=None,
                 encoder_attention_mask=None, use_image_num: int = 0,
                 enable_temporal_attentions: bool = True,
                 train: bool = False):
        cfg = self.cfg
        prec = mm_precision(cfg.dtype)
        D = cfg.inner_dim
        B, F, H, W, C = x.shape
        Fv = F - use_image_num  # video frames (latte_t2v.py:730-731)
        p = cfg.patch_size
        h_, w_ = H // p, W // p
        N = h_ * w_

        # --- PatchEmbed (diffusers): conv-as-matmul + interpolated 2D sincos
        xp = x.reshape(B * F, h_, p, w_, p, C).transpose(0, 1, 3, 2, 4, 5)
        xp = xp.reshape(B * F, N, p * p * C).astype(cfg.dtype)
        kern = self.param("pos_embed_proj_kernel",
                          nn.initializers.xavier_uniform(),
                          (p * p * C, D))  # rows ordered (p1, p2, c)
        pbias = self.param("pos_embed_proj_bias", nn.initializers.zeros, (D,))
        hid = (jnp.dot(xp, kern.astype(cfg.dtype), precision=prec)
               + pbias.astype(cfg.dtype))
        grid = np.arange(h_, dtype=np.float64) / cfg.interpolation_scale
        gw, gh = np.meshgrid(grid, grid)  # xy indexing, w first
        pos = np.concatenate([sincos_1d(D // 2, gw.reshape(-1)),
                              sincos_1d(D // 2, gh.reshape(-1))], axis=1)
        hid = hid + jnp.asarray(pos, cfg.dtype)[None]

        # --- AdaLayerNormSingle (latte_t2v.py:398-429): one timestep MLP
        t_emb = TimestepEmbedder(D, dtype=cfg.dtype, name="t_embed")(t)  # (B, D)
        t6 = nn.Dense(6 * D, dtype=cfg.dtype, precision=prec,
                      name="adaln_linear")(nn.silu(t_emb))  # (B, 6D)

        # --- caption projection + per-frame broadcast (:791-801)
        ctx_spatial = ctx_bias = None
        if cfg.caption_channels is not None and encoder_hidden_states is not None:
            emb = encoder_hidden_states.astype(cfg.dtype)
            emb = nn.Dense(D, dtype=cfg.dtype, precision=prec,
                           name="caption_linear_1")(emb)
            emb = jax.nn.gelu(emb.astype(jnp.float32),
                              approximate=True).astype(cfg.dtype)
            emb = nn.Dense(D, dtype=cfg.dtype, precision=prec,
                           name="caption_linear_2")(emb)
            if use_image_num and train:  # (B, 1+img, L, D) joint layout
                vid = jnp.repeat(emb[:, :1], Fv, axis=1)
                emb = jnp.concatenate([vid, emb[:, 1:]], axis=1)
                ctx_spatial = emb.reshape(B * F, emb.shape[-2], D)
            else:  # (B, L, D) -> every frame sees the same caption
                ctx_spatial = jnp.repeat(emb, F, axis=0)
        if encoder_attention_mask is not None:
            m = encoder_attention_mask
            if m.ndim == 2:  # (B, L) keep-mask -> bias, repeat per frame
                bias = ((1 - m.astype(jnp.float32)) * -10000.0)[:, None]
                ctx_bias = jnp.repeat(bias, F, axis=0)  # (B*F, 1, L)
            elif m.ndim == 3:  # (B, 1+img, L) joint keep-mask (:755-761)
                bias = (1 - m.astype(jnp.float32)) * -10000.0
                vid = jnp.repeat(bias[:, :1], Fv, axis=1)
                bias = jnp.concatenate([vid, bias[:, 1:]], axis=1)
                ctx_bias = bias.reshape(B * F, 1, -1)

        t_spatial = jnp.repeat(t6, F, axis=0)      # (B*F, 6D)  :804
        t_temp = jnp.repeat(t6, N, axis=0)         # (B*N, 6D)  :805
        temp_pos = jnp.asarray(
            sincos_1d(D, np.arange(cfg.video_length, dtype=np.float64)),
            cfg.dtype)

        for i in range(cfg.num_layers):
            hid = T2VBlock(cfg, cross=True, name=f"spatial_{i}")(
                hid, t_spatial, ctx=ctx_spatial, ctx_bias=ctx_bias)
            if enable_temporal_attentions:
                ht = hid.reshape(B, F, N, D).transpose(0, 2, 1, 3)
                ht = ht.reshape(B * N, F, D)
                if use_image_num and train:
                    # joint path (:869-887): images bypass the temporal
                    # block; reference quirk — temp_pos_embed NOT added
                    hv, hi = ht[:, :Fv], ht[:, Fv:]
                    hv = T2VBlock(cfg, cross=False, name=f"temporal_{i}")(
                        hv, t_temp)
                    ht = jnp.concatenate([hv, hi], axis=1)
                else:
                    if i == 0:
                        ht = ht + temp_pos[None, :F]
                    ht = T2VBlock(cfg, cross=False, name=f"temporal_{i}")(
                        ht, t_temp)
                hid = ht.reshape(B, N, F, D).transpose(0, 2, 1, 3)
                hid = hid.reshape(B * F, N, D)

        # --- final layer (:919-925): scale_shift_table (2, D)
        table = self.param("scale_shift_table",
                           nn.initializers.normal(1.0 / math.sqrt(D)), (2, D))
        emb_t = jnp.repeat(t_emb, F, axis=0)  # (B*F, D)
        mod = table[None].astype(cfg.dtype) + emb_t[:, None]
        shift, scale = mod[:, 0][:, None], mod[:, 1][:, None]
        hid = LayerNormNoAffine(1e-6, False, cfg.dtype, name="norm_out")(hid)
        hid = hid * (1 + scale) + shift
        hid = nn.Dense(p * p * cfg.out_ch, dtype=cfg.dtype, precision=prec,
                       name="proj_out")(hid)

        # --- unpatchify (:927-936)
        hid = hid.reshape(B * F, h_, w_, p, p, cfg.out_ch)
        hid = hid.transpose(0, 1, 3, 2, 4, 5).reshape(B * F, H, W, cfg.out_ch)
        return hid.reshape(B, F, H, W, cfg.out_ch)


# --------------------------------------------------------------------------
# torch -> flax checkpoint conversion


def convert_latte_t2v_state(sd: dict) -> dict:
    """Torch LatteT2V state dict (numpy values) -> flax params tree.

    Name map (latte_t2v.py module tree):
      pos_embed.proj (conv p x p)        -> pos_embed_proj_{kernel,bias}
      adaln_single.emb.timestep_embedder -> t_embed.fc{1,2}
      adaln_single.linear                -> adaln_linear
      caption_projection.linear_{1,2}    -> caption_linear_{1,2}
      transformer_blocks.N.*             -> spatial_N.*
      temporal_transformer_blocks.N.*    -> temporal_N.*
      scale_shift_table / proj_out       -> (root) scale_shift_table / proj_out
    """
    get = lambda k: np.asarray(sd[k])
    lin = lambda k: {"kernel": get(k + ".weight").T, "bias": get(k + ".bias")}
    params: dict = {}

    w = get("pos_embed.proj.weight")  # (D, C, p, p)
    D, C, p, _ = w.shape
    # conv flattens (C, p1, p2) per output; our patch features are (p1, p2, C)
    params["pos_embed_proj_kernel"] = (
        w.transpose(2, 3, 1, 0).reshape(p * p * C, D))
    params["pos_embed_proj_bias"] = get("pos_embed.proj.bias")

    params["t_embed"] = {
        "fc1": lin("adaln_single.emb.timestep_embedder.linear_1"),
        "fc2": lin("adaln_single.emb.timestep_embedder.linear_2"),
    }
    params["adaln_linear"] = lin("adaln_single.linear")
    if "caption_projection.linear_1.weight" in sd:
        params["caption_linear_1"] = lin("caption_projection.linear_1")
        params["caption_linear_2"] = lin("caption_projection.linear_2")

    def attn(prefix, qkv_bias):
        out = {
            "to_q": {"kernel": get(prefix + ".to_q.weight").T},
            "to_k": {"kernel": get(prefix + ".to_k.weight").T},
            "to_v": {"kernel": get(prefix + ".to_v.weight").T},
            "to_out": lin(prefix + ".to_out.0"),
        }
        if qkv_bias:
            for n in ("to_q", "to_k", "to_v"):
                out[n]["bias"] = get(f"{prefix}.{n}.bias")
        return out

    def ff(prefix):
        # geglu: net.0.proj is the doubled projection; gelu-approximate:
        # net.0.proj is the plain one.  net.2 is the output linear.
        return {"proj_in": lin(prefix + ".net.0.proj"),
                "proj_out": lin(prefix + ".net.2")}

    n = 0
    while f"transformer_blocks.{n}.scale_shift_table" in sd:
        n += 1
    qkv_bias = "transformer_blocks.0.attn1.to_q.bias" in sd
    for i in range(n):
        sp = f"transformer_blocks.{i}"
        params[f"spatial_{i}"] = {
            "scale_shift_table": get(sp + ".scale_shift_table"),
            "attn1": attn(sp + ".attn1", qkv_bias),
            "attn2": attn(sp + ".attn2", qkv_bias),
            "ff": ff(sp + ".ff"),
        }
        tp = f"temporal_transformer_blocks.{i}"
        params[f"temporal_{i}"] = {
            "scale_shift_table": get(tp + ".scale_shift_table"),
            "attn1": attn(tp + ".attn1", qkv_bias),
            "ff": ff(tp + ".ff"),
        }
    params["scale_shift_table"] = get("scale_shift_table")
    params["proj_out"] = lin("proj_out")
    return params
