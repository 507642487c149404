"""Fully-fused cosine-sim MHA Pallas kernel for the spatial transformer.

Consumes the POST-PROJECTION layouts directly — q (B, N, H*D) and the fused
kv (B, N, 2*H*D) — and performs per head, entirely in VMEM:

    [optional 2D-RoPE] -> l2norm * learned scale -> q k^T * 8 -> softmax -> @ v

In-kernel RoPE trick: the reference rotates interleaved lane PAIRS
(ops/rotary.py); strided lane access is hostile to Mosaic, so the pair
rotation is expressed as `x * cos + (x @ P) * sin` where P is the constant
(D, D) signed pair-swap permutation — one tiny MXU matmul.  cos/sin tables
are precomputed per position with each angle duplicated across its lane pair.

Replaces (per layer): 3 relayout transposes, the kv split copy, two f32
l2norm round-trips, the f32 rope pass, and the HBM score matrix.

(An in-kernel fused output projection — `wout=` — was A/B'd at 2126-2137 vs
2143 f/s baseline and RETIRED; see PERF.md "cosine_mha experiments".)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rotary import _freqs_cis_2d_np

MIN_N, MAX_N = 16, 2048


def _pair_swap_sign(d: int) -> np.ndarray:
    """P with (x @ P)[2i] = -x[2i+1], (x @ P)[2i+1] = x[2i]."""
    p = np.zeros((d, d), np.float32)
    for i in range(d // 2):
        p[2 * i + 1, 2 * i] = -1.0
        p[2 * i, 2 * i + 1] = 1.0
    return p


@functools.lru_cache(maxsize=32)
def _rope_tables(dim_head: int, n: int):
    """(N, D) cos/sin with each pair's angle duplicated on both lanes."""
    cos, sin = _freqs_cis_2d_np(dim_head, n)  # (N, D/2)
    return np.repeat(cos, 2, axis=1), np.repeat(sin, 2, axis=1)


def _kernel(q_ref, kv_ref, qs_ref, ks_ref, cos_ref, sin_ref, p_ref, o_ref,
            *, n: int, heads: int, dim_head: int, scale: float,
            use_rope: bool):
    HD = heads * dim_head
    P = p_ref[:]  # (D, D) f32
    cos = cos_ref[:]  # (N, D) f32
    sin = sin_ref[:]
    qs = qs_ref[:]  # (1, D) f32
    ks = ks_ref[:]

    # Cosine-sim logits are bounded: q,k rows are unit vectors scaled
    # elementwise, so |s*scale| <= scale * max|q_scale| * max|k_scale|
    # (Cauchy-Schwarz).  Shifting by that per-call scalar replaces the
    # per-row max pass; the -80 floor keeps every exp() strictly positive
    # (a fully-floored row sums to 1024 * e^-80 ~ 1.8e-32 > f32 tiny), so
    # the denominator never underflows to zero even for extreme learned
    # scales.  The denominator itself rides the MXU: e @ [v | 1...] gives
    # the unnormalized output and the row sum in one matmul — the only
    # VPU sweeps over the (N, N) scores are the fused exp and bf16 cast.
    # `scale` is pre-folded into qs host-side, saving one (N, N) multiply
    # pass per head.
    bound = jnp.max(jnp.abs(qs)) * jnp.max(jnp.abs(ks))

    def qk_scores(h):
        sl = slice(h * dim_head, (h + 1) * dim_head)
        qh = q_ref[0, :, sl].astype(jnp.float32)  # (N, D)
        kh = kv_ref[0, :, sl].astype(jnp.float32)
        if use_rope:
            qh = qh * cos + jax.lax.dot(qh, P, preferred_element_type=jnp.float32) * sin
            kh = kh * cos + jax.lax.dot(kh, P, preferred_element_type=jnp.float32) * sin
        qh = qh * jax.lax.rsqrt(jnp.sum(qh * qh, -1, keepdims=True) + 1e-24) * qs
        kh = kh * jax.lax.rsqrt(jnp.sum(kh * kh, -1, keepdims=True) + 1e-24) * ks
        return jax.lax.dot_general(
            qh.astype(jnp.bfloat16), kh.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def emit(h, s):
        vh = kv_ref[0, :, HD + h * dim_head:HD + (h + 1) * dim_head]
        e = jnp.exp(jnp.maximum(s - bound, -80.0)).astype(jnp.bfloat16)
        v_ext = jnp.concatenate(
            [vh, jnp.ones((n, dim_head), vh.dtype)], axis=1)
        oe = jax.lax.dot(e, v_ext, preferred_element_type=jnp.float32)
        oh = oe[:, :dim_head] / oe[:, dim_head:dim_head + 1]
        sl = slice(h * dim_head, (h + 1) * dim_head)
        o_ref[0, :, sl] = oh.astype(o_ref.dtype)

    # software-pipelined over heads: head h+1's QK^T (MXU) is issued before
    # head h's exp sweep (VPU), so the two units overlap across the loop
    s_prev = qk_scores(0)
    for h in range(1, heads):
        s_next = qk_scores(h)
        emit(h - 1, s_prev)
        s_prev = s_next
    emit(heads - 1, s_prev)


@functools.partial(jax.jit, static_argnames=("heads", "dim_head", "scale",
                                             "use_rope", "interpret"))
def cosine_mha(q: jnp.ndarray, kv: jnp.ndarray,
               q_scale: jnp.ndarray, k_scale: jnp.ndarray,
               heads: int, dim_head: int, scale: float,
               use_rope: bool = False, interpret: bool = False) -> jnp.ndarray:
    """q (B, N, H*D), kv (B, N, 2*H*D) -> (B, N, H*D).  Non-causal."""
    B, N, HD = q.shape
    cos_np, sin_np = _rope_tables(dim_head, N)
    cos = jnp.asarray(cos_np)
    sin = jnp.asarray(sin_np)
    P = jnp.asarray(_pair_swap_sign(dim_head))
    # fold the fixed attention scale into the learned per-dim q scale so the
    # kernel's score matrix is already scaled (one fewer (N, N) VPU pass)
    qs = (q_scale.reshape(1, dim_head) * scale).astype(jnp.float32)
    ks = k_scale.reshape(1, dim_head).astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((1, N, HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, 2 * HD), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dim_head), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dim_head), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, dim_head), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N, dim_head), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((dim_head, dim_head), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]

    return pl.pallas_call(
        functools.partial(_kernel, n=N, heads=heads, dim_head=dim_head,
                          scale=scale, use_rope=use_rope),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, N, HD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, HD), kv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * heads * N * N * dim_head,
            bytes_accessed=4 * B * N * HD * q.dtype.itemsize,
            transcendentals=B * heads * N * N,
        ),
        interpret=interpret,
    )(q, kv, qs, ks, cos, sin, P)


def cosine_mha_supported(n: int, bias, causal: bool,
                         backend_check: bool = True) -> bool:
    if bias is not None or causal:
        return False
    if not (MIN_N <= n <= MAX_N) or int(n ** 0.5) ** 2 != n:
        return False
    return (not backend_check) or jax.default_backend() == "tpu"
