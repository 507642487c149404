"""DiT — diffusion transformer over (latent) images, adaLN-Zero conditioning.

Behavioral reference: /root/reference/Diffusion/DiT/models.py
  - TimestepEmbedder :27-64 (256-dim sinusoid, cat[cos, sin], MLP)
  - LabelEmbedder :67-94 (CFG null-class dropout)
  - DiTBlock :101-122 (adaLN-Zero: 6-way modulation, zero-init -> identity)
  - FinalLayer :125-142, DiT :145-266 (frozen 2D sincos pos embed :174,
    forward_with_cfg 3-channel eps quirk :250-266)
  - configs :328-370 (S/B/L/XL x patch 2/4/8)
  - OmniTokenizer integration: in_channels=8, input 32x32 latents
    (Diffusion/DiT/train.py:148-152)

TPU-native design: channels-LAST (B, H, W, C); patchify is a reshape +
one big Dense (identical math to the reference's conv-as-linear patch embed,
but stays a single MXU matmul); qkv fused into one projection; all blocks
identical -> XLA unrolls into one fused layer pipeline.  The adaLN
modulation of all blocks runs off a shared (B, D) conditioning vector.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.precision import mm_precision


@dataclass(frozen=True)
class DiTConfig:
    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = True
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def num_patches(self) -> int:
        return (self.input_size // self.patch_size) ** 2

    def replace(self, **kw) -> "DiTConfig":
        import dataclasses

        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Fixed sin-cos positional embeddings (reference models.py:274-321; the
# quirky [sin, cos] per-axis concat and w-first meshgrid are kept exactly
# so converted torch checkpoints line up).
# ---------------------------------------------------------------------------


def sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float64), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_2d(embed_dim: int, grid_size: int) -> np.ndarray:
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0).reshape(2, -1)
    emb_h = sincos_1d(embed_dim // 2, grid[0])
    emb_w = sincos_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)  # (H*W, D)


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """(B,) -> (B, dim) sinusoid; cat[cos, sin] ordering (models.py:40-59)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    hidden_size: int
    freq_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        prec = mm_precision(self.dtype)
        init = nn.initializers.normal(0.02)
        h = timestep_embedding(t, self.freq_size).astype(self.dtype)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, precision=prec, kernel_init=init, name="fc1")(h)
        h = nn.silu(h)
        return nn.Dense(self.hidden_size, dtype=self.dtype, precision=prec, kernel_init=init, name="fc2")(h)


class LabelEmbedder(nn.Module):
    """Class-id -> vector, with null-class dropout for CFG (models.py:67-94)."""

    num_classes: int
    hidden_size: int
    dropout_prob: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, labels, train: bool = False, force_drop_ids=None, rng=None):
        use_cfg = self.dropout_prob > 0
        table = nn.Embed(
            self.num_classes + int(use_cfg),
            self.hidden_size,
            dtype=self.dtype,
            embedding_init=nn.initializers.normal(0.02),
            name="table",
        )
        if force_drop_ids is not None:
            labels = jnp.where(force_drop_ids == 1, self.num_classes, labels)
        elif train and use_cfg:
            if rng is None:
                rng = self.make_rng("label_dropout")
            drop = jax.random.uniform(rng, labels.shape) < self.dropout_prob
            labels = jnp.where(drop, self.num_classes, labels)
        return table(labels)


def modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block (models.py:101-122)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        D, H = self.hidden_size, self.num_heads
        hd = D // H
        prec = mm_precision(self.dtype)
        B, N, _ = x.shape

        mod = nn.Dense(
            6 * D, dtype=self.dtype, precision=prec, kernel_init=nn.initializers.zeros, name="adaLN"
        )(nn.silu(c))
        sh_msa, sc_msa, gate_msa, sh_mlp, sc_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)

        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False, dtype=self.dtype, name="norm1")(x)
        h = modulate(h, sh_msa, sc_msa)
        qkv = nn.Dense(3 * D, dtype=self.dtype, precision=prec, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]  # (B, H, N, hd)
        sim = jnp.einsum("bhid,bhjd->bhij", q, k, precision=prec, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim * (1.0 / math.sqrt(hd)), axis=-1).astype(self.dtype)
        y = jnp.einsum("bhij,bhjd->bhid", attn, v, precision=prec)
        y = y.transpose(0, 2, 1, 3).reshape(B, N, D)
        y = nn.Dense(D, dtype=self.dtype, precision=prec, name="proj")(y)
        x = x + gate_msa[:, None, :] * y

        h = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False, dtype=self.dtype, name="norm2")(x)
        h = modulate(h, sh_mlp, sc_mlp)
        h = nn.Dense(int(D * self.mlp_ratio), dtype=self.dtype, precision=prec, name="fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(D, dtype=self.dtype, precision=prec, name="fc2")(h)
        return x + gate_mlp[:, None, :] * h


class FinalLayer(nn.Module):
    hidden_size: int
    patch_size: int
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        prec = mm_precision(self.dtype)
        mod = nn.Dense(
            2 * self.hidden_size, dtype=self.dtype, precision=prec,
            kernel_init=nn.initializers.zeros, name="adaLN",
        )(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False, dtype=self.dtype, name="norm")(x)
        x = modulate(x, shift, scale)
        return nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            dtype=self.dtype, precision=prec, kernel_init=nn.initializers.zeros, name="linear",
        )(x)


class DiT(nn.Module):
    """Channels-last DiT: (B, H, W, C), t (B,), y (B,) -> (B, H, W, out_C)."""

    cfg: DiTConfig

    def patchify(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.cfg.patch_size
        B, H, W, C = x.shape
        h, w = H // p, W // p
        x = x.reshape(B, h, p, w, p, C).transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, h * w, p * p * C)

    def unpatchify(self, x: jnp.ndarray) -> jnp.ndarray:
        p, c = self.cfg.patch_size, self.cfg.out_channels
        B, N, _ = x.shape
        h = w = int(math.isqrt(N))
        x = x.reshape(B, h, w, p, p, c).transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(B, h * p, w * p, c)

    @nn.compact
    def __call__(self, x, t, y=None, train: bool = False, force_drop_ids=None):
        cfg = self.cfg
        prec = mm_precision(cfg.dtype)
        assert x.shape[1] == x.shape[2] == cfg.input_size and x.shape[3] == cfg.in_channels, (
            f"expected (B, {cfg.input_size}, {cfg.input_size}, {cfg.in_channels}) channels-last, got {x.shape}"
        )
        pos = jnp.asarray(
            sincos_2d(cfg.hidden_size, cfg.input_size // cfg.patch_size), cfg.dtype
        )
        h = nn.Dense(
            cfg.hidden_size, dtype=cfg.dtype, precision=prec,
            kernel_init=nn.initializers.xavier_uniform(), name="x_embed",
        )(self.patchify(x.astype(cfg.dtype)))
        h = h + pos[None]
        c = TimestepEmbedder(cfg.hidden_size, dtype=cfg.dtype, name="t_embed")(t)
        if y is not None:
            c = c + LabelEmbedder(
                cfg.num_classes, cfg.hidden_size, cfg.class_dropout_prob, dtype=cfg.dtype, name="y_embed"
            )(y, train=train, force_drop_ids=force_drop_ids)
        for i in range(cfg.depth):
            h = DiTBlock(cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio, cfg.dtype, name=f"block_{i}")(h, c)
        h = FinalLayer(cfg.hidden_size, cfg.patch_size, cfg.out_channels, cfg.dtype, name="final")(h, c)
        return self.unpatchify(h)


def forward_with_cfg(apply_fn, params, x, t, y, cfg_scale, cfg_channels: int = 3, **kw):
    """Classifier-free-guided forward (models.py:250-266).

    `x` is a doubled batch [cond_half; cond_half]; `y` carries real labels in
    the first half and the null class in the second.  Guidance is applied to
    the first `cfg_channels` channels only — the reference's reproducibility
    quirk (models.py:262: eps,rest split at channel 3).
    """
    half = x[: x.shape[0] // 2]
    combined = jnp.concatenate([half, half], axis=0)
    out = apply_fn(params, combined, t, y, **kw)
    eps, rest = out[..., :cfg_channels], out[..., cfg_channels:]
    cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
    half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
    eps = jnp.concatenate([half_eps, half_eps], axis=0)
    return jnp.concatenate([eps, rest], axis=-1)


# -- model registry (reference models.py:328-370) ---------------------------

_SIZES = {
    "XL": dict(depth=28, hidden_size=1152, num_heads=16),
    "L": dict(depth=24, hidden_size=1024, num_heads=16),
    "B": dict(depth=12, hidden_size=768, num_heads=12),
    "S": dict(depth=12, hidden_size=384, num_heads=6),
}


def dit_config(name: str, **kw) -> DiTConfig:
    """'DiT-XL/2' etc.; kw overrides (e.g. in_channels=8 for OmniTokenizer)."""
    arch, patch = name.replace("DiT-", "").split("/")
    return DiTConfig(patch_size=int(patch), **_SIZES[arch], **kw)


DiT_models = {
    f"DiT-{a}/{p}": (lambda a=a, p=p: dit_config(f"DiT-{a}/{p}"))
    for a in _SIZES for p in (2, 4, 8)
}


# -- torch -> flax conversion (published facebookresearch/DiT checkpoints,
#    and the reference's OmniTokenizer-finetuned variants) -------------------

def convert_dit_state(sd) -> dict:
    """Map a torch DiT state_dict (Diffusion/DiT/models.py module names:
    x_embedder.proj conv, t_embedder.mlp Sequential, y_embedder table,
    blocks.{i}.{attn,mlp,adaLN_modulation}, final_layer) onto the flax DiT
    params tree.  pos_embed is dropped: it is the same fixed 2D sin-cos
    table both sides recompute."""
    import numpy as np

    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}

    def t(w):  # torch Linear weight -> flax Dense kernel
        return np.ascontiguousarray(w.T)

    w = sd["x_embedder.proj.weight"]  # (D, C, p, p) conv == dense on (p,p,C)
    D = w.shape[0]
    params = {
        "x_embed": {
            "kernel": np.ascontiguousarray(
                np.transpose(w, (2, 3, 1, 0)).reshape(-1, D)),
            "bias": sd["x_embedder.proj.bias"],
        },
        "t_embed": {
            "fc1": {"kernel": t(sd["t_embedder.mlp.0.weight"]),
                    "bias": sd["t_embedder.mlp.0.bias"]},
            "fc2": {"kernel": t(sd["t_embedder.mlp.2.weight"]),
                    "bias": sd["t_embedder.mlp.2.bias"]},
        },
        "final": {
            "adaLN": {"kernel": t(sd["final_layer.adaLN_modulation.1.weight"]),
                      "bias": sd["final_layer.adaLN_modulation.1.bias"]},
            "linear": {"kernel": t(sd["final_layer.linear.weight"]),
                       "bias": sd["final_layer.linear.bias"]},
        },
    }
    if "y_embedder.embedding_table.weight" in sd:
        params["y_embed"] = {
            "table": {"embedding": sd["y_embedder.embedding_table.weight"]}}

    i = 0
    while f"blocks.{i}.attn.qkv.weight" in sd:
        p = f"blocks.{i}."
        params[f"block_{i}"] = {
            "adaLN": {"kernel": t(sd[p + "adaLN_modulation.1.weight"]),
                      "bias": sd[p + "adaLN_modulation.1.bias"]},
            "qkv": {"kernel": t(sd[p + "attn.qkv.weight"]),
                    "bias": sd[p + "attn.qkv.bias"]},
            "proj": {"kernel": t(sd[p + "attn.proj.weight"]),
                     "bias": sd[p + "attn.proj.bias"]},
            "fc1": {"kernel": t(sd[p + "mlp.fc1.weight"]),
                    "bias": sd[p + "mlp.fc1.bias"]},
            "fc2": {"kernel": t(sd[p + "mlp.fc2.weight"]),
                    "bias": sd[p + "mlp.fc2.bias"]},
        }
        i += 1
    return params


def load_torch_diffusion_state_dict(path: str, use_ema: bool = True) -> dict:
    """Read a torch DiT/Latte checkpoint the way the reference's find_model
    does (Diffusion/DiT/download.py:18-29): a raw state_dict, or a train.py
    dict with 'ema'/'model' entries (EMA preferred)."""
    import numpy as np
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and ("ema" in ckpt or "model" in ckpt):
        key = "ema" if (use_ema and "ema" in ckpt) else "model"
        ckpt = ckpt[key]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in ckpt.items()}
