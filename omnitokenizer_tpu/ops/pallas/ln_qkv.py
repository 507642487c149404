"""Fused LayerNormGamma + q/kv projection Pallas kernel.

The reference attention (/root/reference/OmniTokenizer/modules/attention.py:
404-412) computes q from the *normed* tokens but k/v from the PRE-norm input
(kv_input is bound before x = self.norm(x)).  Unfused, XLA runs the gamma-only
LayerNorm as its own convert+reduce pass over HBM before the two projection
matmuls; this kernel keeps the x tile in VMEM and emits q = LN(x) @ Wq and
kv = x @ Wkv in one pass (f32 LN stats, bf16 MXU matmuls).

bf16 serving path only; the f32 parity path stays unfused.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 512
LANE = 128


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, g_ref, wq_ref, wkv_ref, q_ref, kv_ref):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-5) * g_ref[:]).astype(jnp.bfloat16)
    q_ref[:] = jax.lax.dot(xn, wq_ref[:],
                           preferred_element_type=jnp.float32).astype(q_ref.dtype)
    kv_ref[:] = jax.lax.dot(x, wkv_ref[:],
                            preferred_element_type=jnp.float32).astype(kv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ln_qkv(x: jnp.ndarray, gamma: jnp.ndarray, wq: jnp.ndarray,
           wkv: jnp.ndarray, interpret: bool = False):
    """x (M, D); gamma (D,); wq (D, Dq); wkv (D, Dkv).
    Returns (LN_gamma(x) @ wq, x @ wkv) fused."""
    M, D = x.shape
    dq, dkv = wq.shape[1], wkv.shape[1]
    m_pad = _pad_to(M, TILE_M)
    xp = jnp.pad(x, ((0, m_pad - M), (0, 0))) if m_pad != M else x

    q, kv = pl.pallas_call(
        _kernel,
        grid=(m_pad // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, dq), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, dkv), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_M, dq), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_M, dkv), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, dq), x.dtype),
            jax.ShapeDtypeStruct((m_pad, dkv), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * D * (dq + dkv),
            bytes_accessed=(m_pad * (D + dq + dkv) + D * (dq + dkv)) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp.astype(jnp.bfloat16), gamma.reshape(1, D).astype(jnp.float32),
      wq.astype(jnp.bfloat16), wkv.astype(jnp.bfloat16))
    return q[:M], kv[:M]


def ln_qkv_supported(dtype, dim: int, backend_check: bool = True) -> bool:
    if dtype != jnp.bfloat16 or dim % LANE != 0:
        return False
    return (not backend_check) or jax.default_backend() == "tpu"
