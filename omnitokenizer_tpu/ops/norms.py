"""Normalization layers.

The reference uses a gamma-only LayerNorm (beta is a frozen zero buffer,
/root/reference/OmniTokenizer/modules/attention.py:73-80) inside attention
blocks, and a standard affine LayerNorm inside feed-forwards / patch embeds.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _layer_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Torch-semantics layer norm over the last axis (biased variance).

    f32 inputs: exact f32 math.  bf16 inputs: statistics accumulate in f32
    but the tensor stays bf16 end-to-end — upcasting the input would keep the
    whole upstream chain (e.g. the full-resolution patchify) in f32, which
    trace-profiling showed doubling HBM traffic.
    """
    if x.dtype == jnp.bfloat16:
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32) - mean), axis=-1,
                       keepdims=True)
        return ((x - mean.astype(x.dtype)).astype(jnp.float32)
                * jax.lax.rsqrt(var + eps))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps)


class LayerNormGamma(nn.Module):
    """Gamma-only LayerNorm (beta fixed at zero)."""

    dim: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        y = _layer_norm(x, self.eps) * gamma
        return y.astype(self.dtype)


class LayerNorm(nn.Module):
    """Standard affine LayerNorm with torch defaults (eps=1e-5)."""

    dim: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        y = _layer_norm(x, self.eps) * weight + bias
        return y.astype(self.dtype)
