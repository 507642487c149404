"""Fused LayerNorm -> Dense -> GEGLU -> Dense Pallas kernel (the FeedForward
block, reference attention.py:159-168).

XLA runs the two matmuls as separate fusions with the (M, 2*inner) GEGLU
intermediate round-tripping HBM and the LayerNorm as its own pass; this
kernel keeps everything in VMEM per M-tile.  The inner dim (int(4*2/3*dim) =
1365 for dim=512) is not 128-lane aligned, so the val/gate halves are padded
to the next lane-tile multiple with zero columns — zero val columns
contribute nothing after the elementwise gate, and the matching zero rows of
W2 keep the output exact.

bf16 serving path only; params stay in the canonical unpadded layout.
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


def _kernel(x_ref, lnw_ref, lnb_ref, w1_ref, w2_ref, o_ref, *, inner_p: int):
    x = x_ref[:].astype(jnp.float32)  # (TM, D)
    # LayerNorm (torch semantics, f32 stats)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    xn = (xn * lnw_ref[:] + lnb_ref[:]).astype(jnp.bfloat16)

    h = jax.lax.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)  # (TM, 2*inner_p)
    val = h[:, :inner_p]
    gate = h[:, inner_p:]
    # Mosaic has no erf/erfc lowering; the tanh GELU's error (<=3e-4 abs) is
    # far below the bf16 quantization already accepted on this serving path
    act = (jax.nn.gelu(gate, approximate=True) * val).astype(jnp.bfloat16)
    o_ref[:] = jax.lax.dot(act, w2_ref[:],
                           preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def geglu_ff(x: jnp.ndarray, ln_w: jnp.ndarray, ln_b: jnp.ndarray,
             w1: jnp.ndarray, w2: jnp.ndarray,
             interpret: bool = False) -> jnp.ndarray:
    """x (M, D); ln_w/ln_b (D,); w1 (D, 2*inner) [val | gate]; w2 (inner, D).
    Returns LN(x) -> GEGLU -> out, all fused."""
    M, D = x.shape
    inner = w2.shape[0]
    inner_p = _pad_to(inner, LANE)

    # pad val/gate column groups independently so both halves stay aligned
    w1v = jnp.pad(w1[:, :inner], ((0, 0), (0, inner_p - inner)))
    w1g = jnp.pad(w1[:, inner:], ((0, 0), (0, inner_p - inner)))
    w1p = jnp.concatenate([w1v, w1g], axis=1).astype(jnp.bfloat16)
    w2p = jnp.pad(w2, ((0, inner_p - inner), (0, 0))).astype(jnp.bfloat16)

    m_pad = _pad_to(M, TILE_M)
    xp = jnp.pad(x, ((0, m_pad - M), (0, 0))) if m_pad != M else x

    out = pl.pallas_call(
        functools.partial(_kernel, inner_p=inner_p),
        grid=(m_pad // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 2 * inner_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inner_p, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_M, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * m_pad * D * inner_p,
            bytes_accessed=(2 * m_pad * D + 3 * D * inner_p) * 2,
            transcendentals=m_pad * inner_p,
        ),
        interpret=interpret,
    )(xp, ln_w.reshape(1, D).astype(jnp.float32),
      ln_b.reshape(1, D).astype(jnp.float32), w1p, w2p)
    return out[:M]


def geglu_ff_supported(dtype, dim: int, backend_check: bool = True) -> bool:
    if dtype != jnp.bfloat16 or dim % LANE != 0:
        return False
    return (not backend_check) or jax.default_backend() == "tpu"
