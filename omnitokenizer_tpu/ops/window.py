"""Swin-style window attention with learned relative-position bias.

Reference: /root/reference/OmniTokenizer/modules/attention.py:170-293.

TPU-first: the partition/reverse are pure reshapes+transposes that XLA fuses
into the surrounding matmuls; windows become the batch dimension so every
window's (ws^2 x ws^2) attention runs as one large batched MXU matmul.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .norms import LayerNormGamma
from .precision import mm_precision


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nH*nW, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """(B*nH*nW, ws*ws, C) -> (B, H, W, C)."""
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(B, H, W, C)


@functools.lru_cache(maxsize=16)
def relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) lookup into the (2*ws-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    """W-MSA over non-overlapping windows of a square token grid.

    Input (B, N, C) with N = H*W square; pre-norm is the gamma-only LayerNorm;
    qkv has no bias (reference default qkv_bias=False), proj has bias; scale
    is head_dim**-0.5.
    """

    dim: int
    window_size: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, C = x.shape
        H = W = int(N ** 0.5)
        ws = self.window_size
        head_dim = C // self.num_heads
        scale = head_dim ** -0.5

        x = LayerNormGamma(self.dim, dtype=self.dtype, name="norm")(x)
        xw = window_partition(x.reshape(B, H, W, C), ws)  # (BW, ws*ws, C)
        BW, NW, _ = xw.shape

        qkv = nn.Dense(3 * self.dim, use_bias=False, dtype=self.dtype,
                       precision=mm_precision(self.dtype), name="qkv")(xw)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(stddev=0.02 / 0.87962566103423978),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
            jnp.float32,
        )
        idx = jnp.asarray(relative_position_index(ws).reshape(-1))
        bias_hnn = jnp.transpose(table[idx].reshape(NW, NW, self.num_heads),
                                 (2, 0, 1))  # (h, NW, NW)

        # NOTE: a fused Pallas kernel for the per-window attentions was
        # A/B'd NEUTRAL-to-worse on the flagship (2277 -> 2263 f/s) and
        # retired: the unrolled 64x64 matmuls don't beat XLA's batched
        # lowering, which already keeps this ~0.7 ms (PERF.md).
        qkv = qkv.reshape(BW, NW, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (BW, NW, h, d)
        fast = self.dtype == jnp.bfloat16
        prec = None if fast else jax.lax.Precision.HIGHEST
        q = jnp.transpose(q, (0, 2, 1, 3)) * scale
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))

        sim = jnp.einsum("bhid,bhjd->bhij", q, k, precision=prec,
                         preferred_element_type=jnp.float32) + bias_hnn[None]
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v, precision=prec,
                         preferred_element_type=jnp.float32)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(BW, NW, C).astype(self.dtype)
        out = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                       precision=mm_precision(self.dtype), name="proj")(out)

        return window_reverse(out, ws, H, W).reshape(B, N, C)
