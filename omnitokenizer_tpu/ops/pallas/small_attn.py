"""Fused small-N cosine attention Pallas kernel (temporal transformer).

The temporal attention runs on (b*h*w, t, dim) tensors with t <= 8 latent
frames.  Everything here operates on full (TILE_B, H*D) lane tiles — no
per-head slicing, no relayouts:

 * per-head reductions (l2norm sums, score taps) are ONE matmul with a
   block-indicator matrix Eᵀ (H*D, H): columns of ones over each head's
   64-lane segment — the MXU does the segmented reduction;
 * per-head broadcasts (inv-norms, softmax weights) are the transposed
   expansion p @ E (H, H*D);
 * softmax over the N taps runs on (TILE_B, H) tiles in f32.

Numerics match ops.attention: l2norm(q)*q_scale etc., f32 logits/softmax,
optional causal mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_SMALL_N = 8
TILE_B = 128


def _block_indicator(heads: int, dim_head: int) -> np.ndarray:
    """(H*D, H) 0/1 matrix: column h sums lanes of head h."""
    e = np.zeros((heads * dim_head, heads), np.float32)
    for h in range(heads):
        e[h * dim_head:(h + 1) * dim_head, h] = 1.0
    return e


def _kernel(q_ref, kv_ref, qs_ref, ks_ref, e_ref, o_ref, *,
            n: int, heads: int, dim_head: int, scale: float, causal: bool):
    E = e_ref[:]  # (HD, H) f32
    qs = qs_ref[:]  # (1, HD) f32: q_scale tiled across heads
    ks = ks_ref[:]
    HD = heads * dim_head

    def norm(ref, t_scale, lo=0):
        outs = []
        for t in range(n):
            x = ref[:, t, lo:lo + HD].astype(jnp.float32)  # (TB, HD)
            ss = jax.lax.dot_general(x * x, E, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)  # (TB, H)
            inv = jax.lax.rsqrt(ss + 1e-24)
            invf = jax.lax.dot_general(inv, E, (((1,), (1,)), ((), ())),
                                       preferred_element_type=jnp.float32)  # (TB, HD)
            outs.append(x * invf * t_scale)
        return outs  # list of (TB, HD) f32

    qn = norm(q_ref, qs)
    # k lives in the first half of the fused kv tensor (avoids the HBM copy
    # XLA emits when splitting the to_kv projection)
    kn = norm(kv_ref, ks, lo=0)

    # score taps s[i][j]: (TB, H) f32
    s = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(n):
            if causal and j > i:
                continue
            s[i][j] = jax.lax.dot_general(
                qn[i] * kn[j], E, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale

    for i in range(n):
        taps = [t for t in s[i] if t is not None]
        m = taps[0]
        for t in taps[1:]:
            m = jnp.maximum(m, t)
        exps = [jnp.exp(t - m) if t is not None else None for t in s[i]]
        denom = sum(t for t in exps if t is not None)
        inv = 1.0 / denom
        acc = None
        for j, ej in enumerate(exps):
            if ej is None:
                continue
            w = jax.lax.dot_general((ej * inv), E, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)  # (TB, HD)
            term = w * kv_ref[:, j, HD:].astype(jnp.float32)
            acc = term if acc is None else acc + term
        o_ref[:, i, :] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "dim_head", "scale",
                                             "causal", "interpret"))
def small_n_attention(q: jnp.ndarray, kv: jnp.ndarray,
                      q_scale: jnp.ndarray, k_scale: jnp.ndarray,
                      heads: int, dim_head: int, scale: float,
                      causal: bool = False, interpret: bool = False) -> jnp.ndarray:
    """q: (B, N, H*D); kv: (B, N, 2*H*D) fused [k | v] projection.
    Performs l2norm + q/k scaling + softmax(q k^T * scale [causal]) v."""
    B, N, HD = q.shape
    assert kv.shape == (B, N, 2 * HD)
    b_pad = ((B + TILE_B - 1) // TILE_B) * TILE_B
    if b_pad != B:
        q = jnp.pad(q, ((0, b_pad - B), (0, 0), (0, 0)))
        kv = jnp.pad(kv, ((0, b_pad - B), (0, 0), (0, 0)))
    qs = jnp.tile(q_scale.reshape(1, dim_head).astype(jnp.float32), (1, heads))
    ks = jnp.tile(k_scale.reshape(1, dim_head).astype(jnp.float32), (1, heads))
    E = jnp.asarray(_block_indicator(heads, dim_head))

    out = pl.pallas_call(
        functools.partial(_kernel, n=N, heads=heads, dim_head=dim_head,
                          scale=scale, causal=causal),
        grid=(b_pad // TILE_B,),
        in_specs=[
            pl.BlockSpec((TILE_B, N, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, N, 2 * HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HD, heads), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, N, HD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, N, HD), kv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * b_pad * N * N * HD,
            bytes_accessed=4 * b_pad * N * HD * q.dtype.itemsize,
            transcendentals=b_pad * heads * N * N,
        ),
        interpret=interpret,
    )(q, kv, qs, ks, E)
    return out[:B]


def small_n_supported(n: int, bias, backend_check: bool = True) -> bool:
    if bias is not None or n > MAX_SMALL_N:
        return False
    return (not backend_check) or jax.default_backend() == "tpu"
