"""Fused small-N cosine attention Pallas kernel (temporal transformer).

The temporal attention runs on (b*h*w, t, dim) tensors with t <= 8 latent
frames.  Kernel I/O is TWO-DIMENSIONAL (B, N*lanes): with N=5 a 3D block
would pad the 5-sublane dim to 8 and force XLA to materialize relayout
copies of every operand (trace-verified ~2 ms/layer); the flat layout is a
pure bitcast of the projection outputs.  Inside the kernel everything runs
on full (TILE_B, H*D) lane tiles:

 * per-head reductions (l2norm sums, score taps) are ONE matmul with a
   block-indicator matrix Eᵀ (H*D, H): columns of ones over each head's
   lane segment — the MXU does the segmented reduction;
 * per-head broadcasts (inv-norms, softmax weights) are the transposed
   expansion p @ E (H, H*D);
 * softmax over the N taps runs on (TILE_B, H) tiles in f32.

kv rows keep the projection's flattened (N, 2*H*D) order: k_t occupies lanes
[t*2HD, t*2HD+HD), v_t the following HD lanes.

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

    def l2s(x, t_scale):
        ss = jax.lax.dot_general(x * x, E, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (TB, H)
        inv = jax.lax.rsqrt(ss + 1e-24)
        invf = jax.lax.dot_general(inv, E, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)  # (TB, HD)
        return x * invf * t_scale

    qn = [l2s(q_ref[:, t * HD:(t + 1) * HD].astype(jnp.float32), qs)
          for t in range(n)]
    kn = [l2s(kv_ref[:, t * 2 * HD:t * 2 * HD + HD].astype(jnp.float32), ks)
          for t in range(n)]

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
            vj = kv_ref[:, j * 2 * HD + HD:(j + 1) * 2 * HD].astype(jnp.float32)
            term = w * vj
            acc = term if acc is None else acc + term
        o_ref[:, i * HD:(i + 1) * HD] = acc.astype(o_ref.dtype)


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
    # flatten to 2D: bitcasts, no 5-sublane padding
    q2 = q.reshape(B, N * HD)
    kv2 = kv.reshape(B, N * 2 * HD)

    b_pad = ((B + TILE_B - 1) // TILE_B) * TILE_B
    if b_pad != B:
        q2 = jnp.pad(q2, ((0, b_pad - B), (0, 0)))
        kv2 = jnp.pad(kv2, ((0, b_pad - B), (0, 0)))
    qs = jnp.tile(q_scale.reshape(1, dim_head).astype(jnp.float32), (1, heads))
    ks = jnp.tile(k_scale.reshape(1, dim_head).astype(jnp.float32), (1, heads))
    E = jnp.asarray(_block_indicator(heads, dim_head))

    out = pl.pallas_call(
        functools.partial(_kernel, n=N, heads=heads, dim_head=dim_head,
                          scale=scale, causal=causal),
        grid=(b_pad // TILE_B,),
        in_specs=[
            pl.BlockSpec((TILE_B, N * HD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B, N * 2 * HD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HD, heads), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, N * HD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, N * HD), kv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * b_pad * N * N * HD,
            bytes_accessed=4 * b_pad * N * HD * q.dtype.itemsize,
            transcendentals=b_pad * heads * N * N,
        ),
        interpret=interpret,
    )(q2, kv2, qs, ks, E)
    return out[:B].reshape(B, N, HD)


def small_n_supported(n: int, bias, backend_check: bool = True) -> bool:
    if bias is not None or n > MAX_SMALL_N:
        return False
    return (not backend_check) or jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# token-flat variant: rows in ((b h w) t) order, groups of n contiguous rows
# ---------------------------------------------------------------------------

def _flat_kernel(q_ref, kv_ref, qs_ref, ks_ref, e_ref, o_ref, *,
                 n: int, heads: int, dim_head: int, scale: float, causal: bool):
    """Attention over each contiguous n-row group of a token-flat (M, H*D)
    layout.  Frame taps become masked row shifts: query row m (frame
    t = m % n) attends key row m + d for d in (-(n-1) .. n-1) with
    0 <= t + d < n — shifts never cross a group because tiles are aligned to
    group boundaries, so out-of-frame rows are simply masked out.  This keeps
    the WHOLE temporal stack (PEG / attention / FF / residuals) on one 2D
    buffer with zero relayout copies (the 3D (B', n, D) form pads n to 8
    sublanes and costs a copy at every op boundary)."""
    E = e_ref[:]          # (HD, H) f32
    qs = qs_ref[:]        # (1, HD) f32
    ks = ks_ref[:]
    HD = heads * dim_head
    TG = q_ref.shape[0]

    def l2s(x, t_scale):
        ss = jax.lax.dot_general(x * x, E, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        inv = jax.lax.rsqrt(ss + 1e-24)
        invf = jax.lax.dot_general(inv, E, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        return x * invf * t_scale

    qn = l2s(q_ref[:].astype(jnp.float32), qs)           # (TG, HD)
    kn = l2s(kv_ref[:, :HD].astype(jnp.float32), ks)
    v = kv_ref[:, HD:].astype(jnp.float32)

    tpos = jax.lax.broadcasted_iota(jnp.int32, (TG, 1), 0) % n

    def shift_rows(x, d):
        if d == 0:
            return x
        dd = d % TG
        return jnp.concatenate([x[dd:], x[:dd]], axis=0)

    deltas = [d for d in range(-(n - 1), n) if not (causal and d > 0)]
    scores = []
    for d in deltas:
        sd = jax.lax.dot_general(qn * shift_rows(kn, d), E,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        valid = jnp.logical_and(tpos + d >= 0, tpos + d < n)
        scores.append(jnp.where(valid, sd, -1e9))         # (TG, H)

    m = scores[0]
    for sd in scores[1:]:
        m = jnp.maximum(m, sd)
    exps = [jnp.exp(sd - m) for sd in scores]
    inv = 1.0 / sum(exps)
    acc = None
    for d, ed in zip(deltas, exps):
        w = jax.lax.dot_general(ed * inv, E, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # (TG, HD)
        term = w * shift_rows(v, d)
        acc = term if acc is None else acc + term
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n", "heads", "dim_head",
                                             "scale", "causal", "interpret"))
def small_n_attention_flat(q: jnp.ndarray, kv: jnp.ndarray,
                           q_scale: jnp.ndarray, k_scale: jnp.ndarray,
                           n: int, heads: int, dim_head: int, scale: float,
                           causal: bool = False,
                           interpret: bool = False) -> jnp.ndarray:
    """q: (M, H*D); kv: (M, 2*H*D); M = R*n rows in ((b h w) t) token order.
    Same math as small_n_attention, zero layout changes at the boundary."""
    M, HD = q.shape
    assert M % n == 0 and kv.shape == (M, 2 * HD)
    # tile: multiple of lcm(n, 8) so groups never straddle tiles.  Prefer a
    # tile that divides M exactly — the fallback jnp.pad copies the whole
    # q/kv (63 MB for the flagship shapes) just to append a few rows
    # (trace: ~0.5 ms of pad + ~0.1 ms for the out[:M] slice).
    import math
    unit = n * 8 // math.gcd(n, 8)
    tile = None
    if M % unit == 0:
        for k in range(min(1024 // unit, M // unit), 0, -1):
            if M % (k * unit) == 0:
                tile = k * unit
                break
    # a divide-exact tile below 256 rows (e.g. M with a large prime factor)
    # would mean a grid of tiny matmuls — worse than one padded copy; fall
    # back to the padded ~512-row tile in that case
    if tile is None or (tile < min(256, M) and M > unit):
        tile = max(unit, (512 // unit) * unit)
    m_pad = ((M + tile - 1) // tile) * tile
    if m_pad != M:
        q = jnp.pad(q, ((0, m_pad - M), (0, 0)))
        kv = jnp.pad(kv, ((0, m_pad - M), (0, 0)))
    qs = jnp.tile(q_scale.reshape(1, dim_head).astype(jnp.float32), (1, heads))
    ks = jnp.tile(k_scale.reshape(1, dim_head).astype(jnp.float32), (1, heads))
    E = jnp.asarray(_block_indicator(heads, dim_head))

    out = pl.pallas_call(
        functools.partial(_flat_kernel, n=n, heads=heads, dim_head=dim_head,
                          scale=scale, causal=causal),
        grid=(m_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, HD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 2 * HD), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HD, heads), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, HD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, HD), kv.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * m_pad * (2 * n - 1) * HD,
            bytes_accessed=4 * m_pad * HD * q.dtype.itemsize,
            transcendentals=m_pad * heads * (2 * n - 1),
        ),
        interpret=interpret,
    )(q, kv, qs, ks, E)
    return out[:M]
