"""Algebraically-folded patchify / un-patchify fast paths (bf16 serving).

Reference semantics (OmniTokenizer/omnitokenizer.py:791-841, 1089-1097):
  encode: rearrange 'b (t pt) (h p1) (w p2) c -> b t h w (c pt p1 p2)'
          -> LayerNorm(feat) -> Linear(feat, D) -> LayerNorm(D)
  decode: Linear(D, feat) -> rearrange 'b t h w (c pt p1 p2) -> pixels'

Why this module exists (trace-verified on v5e): the einops rearrange of the
full-resolution pixel tensor materializes a fine-grained transpose (the
feature order is channel-major, so the innermost gathered chunk is 3
elements) costing ~1.2 ms per direction, and the pre-projection LayerNorm
adds two more full-resolution passes (~1.1 ms).

Folds:
  * encode — LN1 + Linear fold into ONE strided convolution on the raw
    pixels plus per-patch scalar corrections:
        LN(x) @ W = r * (x @ (gamma*W) - mu * colsum(gamma*W)) + beta @ W + b
    where mu / r = rsqrt(var+eps) are per-patch scalars obtained from two
    window-sum pools (window == stride == patch).  The conv is MXU-native
    and XLA's conv lowering never materializes the patch matrix in HBM.
  * decode — permute the projection's columns from channel-major
    (c,pt,p1,p2) to patch-major (pt,p1,p2,c) (a free weight-side gather),
    so the un-patchify becomes reshape -> ONE coarse transpose whose
    contiguous unit is the (p2,c) chunk -> reshape.

Both paths consume the UNCHANGED parameter tree (`NormParams`/`DenseParams`
materialize the very same flax param names/shapes/initializers as
ops.norms.LayerNorm / nn.Dense), so checkpoints and the torch converter are
oblivious to which path runs.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class NormParams(nn.Module):
    """Param-tree stand-in for ops.norms.LayerNorm (weight/bias)."""

    dim: int

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return w, b


class DenseParams(nn.Module):
    """Param-tree stand-in for nn.Dense (kernel/bias)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        k = self.param("kernel", nn.linear.default_kernel_init,
                       (self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return k, b


def folded_patch_embed(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                       kernel: jnp.ndarray, bias: jnp.ndarray,
                       pt: int, p: int, dtype: Any, eps: float = 1e-5) -> jnp.ndarray:
    """pixels (B, t*pt, h*p, w*p, C) -> tokens (B, t, h, w, D).

    Equals LayerNorm(patchify(x)) @ kernel + bias with the reference's
    channel-major (c, pt, p1, p2) patch-feature order.  The patch matrix is
    built in patch-major (pt, p1, p2, c) order — ONE coarse transpose whose
    contiguous unit is the (p2, c) chunk — and the weight ROWS are permuted
    to match (free); LN folds into the weights plus per-patch (mu, rsqrt)
    scalars computed by a single fused stats pass over the patch matrix.
    """
    B, T, H, W, C = x.shape
    t, h, w = T // pt, H // p, W // p
    feat = C * pt * p * p
    D = kernel.shape[1]
    kf = kernel.astype(jnp.float32)
    kp = kf * gamma.astype(jnp.float32)[:, None]         # gamma folded into W
    s = jnp.sum(kp, axis=0)                              # (D,) colsums for the -mu term
    c0 = beta.astype(jnp.float32) @ kf + bias.astype(jnp.float32)
    # weight rows (c, pt, p1, p2) -> (pt, p1, p2, c)
    kperm = (kp.reshape(C, pt, p, p, D)
             .transpose(1, 2, 3, 0, 4).reshape(feat, D)).astype(dtype)

    xd = x.astype(dtype)
    # transpose+retile in ONE relayout: lax.reshape with `dimensions`
    # fuses the permutation into the reshape (separate transpose/reshape
    # each pay a full physical (8,128)-retiling pass on TPU).  A Mosaic
    # relayout kernel was tried and RETIRED: the (p2, c) cell shuffle is a
    # sub-128-lane shape cast Mosaic cannot express (PERF.md round 3).
    xr = jax.lax.reshape(
        xd.reshape(B, t, pt, h, p, w, p, C), (B, t, h, w, feat),
        dimensions=(0, 1, 3, 5, 2, 4, 6, 7))
    # keep the projection a plain dot on the materialized (…, feat)
    # tensor: without the barrier XLA pattern-matches the reshape+dot
    # back into a convolution and inserts an extra full-res layout copy
    # to feed its conv lowering (trace: +0.53 ms copy.215)
    xr = jax.lax.optimization_barrier(xr)

    y = jax.lax.dot_general(xr, kperm, (((4,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

    # per-patch stats over the contiguous trailing axis (one fused pass)
    xf = xr.astype(jnp.float32)
    m1 = jnp.sum(xf, axis=-1, keepdims=True)
    m2 = jnp.sum(xf * xf, axis=-1, keepdims=True)
    mu = m1 / feat
    var = m2 / feat - mu * mu
    r = jax.lax.rsqrt(var + eps)
    return ((y - mu * s) * r + c0).astype(dtype)


def fast_to_pixels(tok: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                   pt: int, p: int, C: int, dtype: Any,
                   precision=None) -> jnp.ndarray:
    """tokens (B, t, h, w, D) -> pixels (B, t*pt, h*p, w*p, C).

    Equals (tok @ kernel + bias) un-patchified from the reference's
    channel-major feature order; the column permutation to patch-major order
    happens on the WEIGHT side so the data-side transpose moves contiguous
    (p2, c) chunks.
    """
    B, t, h, w, D = tok.shape
    kperm = (kernel.reshape(D, C, pt, p, p)
             .transpose(0, 2, 3, 4, 1).reshape(D, -1)).astype(dtype)
    bperm = (bias.reshape(C, pt, p, p)
             .transpose(1, 2, 3, 0).reshape(-1)).astype(dtype)
    y = jax.lax.dot_general(tok.astype(dtype), kperm,
                            (((4,), (0,)), ((), ())), precision=precision,
                            preferred_element_type=jnp.float32)
    y = (y + bperm).astype(dtype)
    y = jax.lax.optimization_barrier(y)
    # one fused permute+retile: b t h w (pt p1 p2 c) -> b (t pt) (h p1) (w p2) c
    return jax.lax.reshape(
        y.reshape(B, t, h, w, pt, p, p, C), (B, t * pt, h * p, w * p, C),
        dimensions=(0, 1, 4, 2, 5, 3, 6, 7))
