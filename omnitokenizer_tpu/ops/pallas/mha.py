"""Fused multi-head attention Pallas kernel.

The factored OmniTokenizer attention has short sequences (spatial N = h*w <=
1024+, temporal N = t <= 17), so a full (N, N) score tile fits VMEM and no
streaming flash decomposition is needed: one grid program per (batch, head)
computes dot -> softmax -> dot entirely on-chip.  The XLA fallback
materializes the (B, H, N, N) f32 logits in HBM — for the flagship encode
pass that is ~640 MB of traffic per layer; this kernel eliminates it.

Numerics match ops.attention.sdpa: f32 logits/softmax accumulation,
input-dtype second matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9

# full-tile kernel is used when the score matrix fits VMEM comfortably
MAX_FUSED_N = 2048


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool):
    q = q_ref[0]  # (N, D)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    if causal:
        n = s.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col > row + (s.shape[1] - n), NEG_INF, s)
    # stable softmax in f32
    s = s - jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "causal", "interpret"))
def mha_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               scale: float, causal: bool = False,
               interpret: bool = False) -> jnp.ndarray:
    """q, k, v: (B, H, N, D) -> (B, H, N, D)."""
    B, H, N, D = q.shape
    qf = q.reshape(B * H, N, D)
    kf = k.reshape(B * H, N, D)
    vf = v.reshape(B * H, N, D)

    out = pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale, causal=causal),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, N, D), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * D,
            bytes_accessed=4 * B * H * N * D * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, N, D)


def mha_supported(q: jnp.ndarray, bias, causal: bool) -> bool:
    """Kernel applies when there is no additive bias and the score tile fits."""
    B, H, N, D = q.shape
    if bias is not None:
        return False
    if N > MAX_FUSED_N or N < 8:
        return False
    if D % 8 != 0:
        return False
    return jax.default_backend() == "tpu"
