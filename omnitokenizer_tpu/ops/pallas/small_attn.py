"""Fused small-N cosine attention Pallas kernel (temporal transformer).

The temporal attention runs on (b*h*w, t, dim) tensors with t <= 8 latent
frames.  The XLA path pays for (B, N, H, D) relayouts (sublane=5 tiles) and
f32 l2norm round-trips; per measured PERF.md numbers that is ~3.4 ms/layer —
10x its FLOP cost.  This kernel reads the POST-PROJECTION (B, N, H*D) layout
directly (no relayout), performs l2norm + q/k scaling in registers, and
computes the N^2 score taps as VPU reductions (a 5x64 matmul would waste
>90% of each MXU tile anyway).

Semantics identical to ops.attention: cosine-sim attention, f32
logits/softmax, optional causal mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_SMALL_N = 8
TILE_B = 128


def _kernel(q_ref, k_ref, v_ref, qs_ref, ks_ref, o_ref, *,
            n: int, heads: int, dim_head: int, scale: float, causal: bool):
    qs = qs_ref[:].astype(jnp.float32)  # (1, D)
    ks = ks_ref[:].astype(jnp.float32)

    for h in range(heads):
        sl = slice(h * dim_head, (h + 1) * dim_head)
        # slice per head straight from the refs so only (TB, N, D) tiles are
        # ever live in f32 (upcasting the full (TB, N, H*D) block OOMs VMEM)
        qh = q_ref[:, :, sl].astype(jnp.float32)  # (TB, N, D)
        kh = k_ref[:, :, sl].astype(jnp.float32)
        vh = v_ref[:, :, sl]
        # l2norm + learned per-dim scales (attention.py:435-437)
        qh = qh * jax.lax.rsqrt(jnp.sum(qh * qh, -1, keepdims=True) + 1e-24) * qs
        kh = kh * jax.lax.rsqrt(jnp.sum(kh * kh, -1, keepdims=True) + 1e-24) * ks

        # N^2 score taps as VPU reductions: s[b, i, j]
        rows = []
        for i in range(n):
            taps = []
            for j in range(n):
                if causal and j > i:
                    taps.append(None)
                    continue
                taps.append(jnp.sum(qh[:, i, :] * kh[:, j, :], axis=-1) * scale)
            # stable softmax over the valid taps
            valid = [t for t in taps if t is not None]
            m = valid[0]
            for t in valid[1:]:
                m = jnp.maximum(m, t)
            exps = [jnp.exp(t - m) if t is not None else None for t in taps]
            denom = sum(e for e in exps if e is not None)
            inv = 1.0 / denom
            acc = jnp.zeros_like(vh[:, 0, :], dtype=jnp.float32)
            for j, e in enumerate(exps):
                if e is None:
                    continue
                acc = acc + (e * inv)[:, None] * vh[:, j, :].astype(jnp.float32)
            rows.append(acc)
        oh = jnp.stack(rows, axis=1)  # (TB, N, D)
        o_ref[:, :, sl] = oh.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "dim_head", "scale",
                                             "causal", "interpret"))
def small_n_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      q_scale: jnp.ndarray, k_scale: jnp.ndarray,
                      heads: int, dim_head: int, scale: float,
                      causal: bool = False, interpret: bool = False) -> jnp.ndarray:
    """q, k, v: (B, N, heads*dim_head) post-projection; returns same shape.
    Performs l2norm + q/k scaling + softmax(q k^T * scale [causal]) v."""
    B, N, HD = q.shape
    b_pad = ((B + TILE_B - 1) // TILE_B) * TILE_B
    if b_pad != B:
        pad = ((0, b_pad - B), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    qs = q_scale.reshape(1, dim_head).astype(jnp.float32)
    ks = k_scale.reshape(1, dim_head).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, n=N, heads=heads, dim_head=dim_head,
                          scale=scale, causal=causal),
        grid=(b_pad // TILE_B,),
        in_specs=[
            pl.BlockSpec((TILE_B, N, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, N, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, N, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim_head), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim_head), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, N, HD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, N, HD), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_pad * heads * N * N * dim_head,
            bytes_accessed=4 * b_pad * N * HD * q.dtype.itemsize,
            transcendentals=b_pad * heads * N * N,
        ),
        interpret=interpret,
    )(q, k, v, qs, ks)
    return out[:B]


def small_n_supported(n: int, bias, backend_check: bool = True) -> bool:
    if bias is not None or n > MAX_SMALL_N:
        return False
    return (not backend_check) or jax.default_backend() == "tpu"
