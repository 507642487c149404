"""Pallas patchify/un-patchify relayout kernels.

The patch gather `b (t pt) (h p1) (w p2) c -> b t h w (pt p1 p2 c)` is a pure
permutation, but XLA lowers it as copy+reshape running at ~40 GB/s effective
(20x below HBM bandwidth; trace rows copy.138/reshape.129 in PERF.md).  Here
each (b, t, h) grid step DMAs one contiguous (pt, p, W*C) pixel row-band into
VMEM, performs the (pt*p1) x (w) cell transpose (cells are the contiguous
(p2, c) chunks) in-register, and writes one contiguous (w, feat) token block.

Both directions ride the same primitive; the projection matmul and LN-stat
passes stay in XLA (they were already at the MXU/HBM bound).

Serving-path only (no linearization rule): call sites gate on
`not training`, like every other Pallas fast path in this repo.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(x_ref, o_ref, *, pt: int, p: int, w: int, cell: int):
    # x_ref (1, 1, pt, p, w*cell) -> o_ref (1, 1, 1, w, pt*p*cell)
    blk = x_ref[0, 0]                                   # (pt, p, w*cell)
    blk = blk.reshape(pt * p, w, cell)
    o_ref[0, 0, 0] = jnp.swapaxes(blk, 0, 1).reshape(w, pt * p * cell)


def _scatter_kernel(y_ref, o_ref, *, pt: int, p: int, w: int, cell: int):
    # y_ref (1, 1, 1, w, pt*p*cell) -> o_ref (1, 1, pt, p, w*cell)
    blk = y_ref[0, 0, 0]                                # (w, pt*p*cell)
    blk = blk.reshape(w, pt * p, cell)
    o_ref[0, 0] = jnp.swapaxes(blk, 0, 1).reshape(pt, p, w * cell)


@functools.partial(jax.jit, static_argnames=("pt", "p", "C", "interpret"))
def patch_gather(x: jnp.ndarray, pt: int, p: int, C: int,
                 interpret: bool = False) -> jnp.ndarray:
    """pixels (B, t*pt, h*p, w*p, C) -> patch matrix (B, t, h, w, pt*p*p*C)
    with patch-major (pt, p1, p2, c) feature order."""
    B, T, H, W, C_ = x.shape
    assert C_ == C and T % pt == 0 and H % p == 0 and W % p == 0
    t, h, w = T // pt, H // p, W // p
    cell = p * C
    feat = pt * p * p * C
    xv = x.reshape(B, t, pt, H, W * C)
    return pl.pallas_call(
        functools.partial(_gather_kernel, pt=pt, p=p, w=w, cell=cell),
        grid=(B, t, h),
        in_specs=[pl.BlockSpec((1, 1, pt, p, W * C),
                               lambda b, i, j: (b, i, 0, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 1, w, feat),
                               lambda b, i, j: (b, i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, t, h, w, feat), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(xv)


@functools.partial(jax.jit, static_argnames=("pt", "p", "C", "interpret"))
def patch_scatter(y: jnp.ndarray, pt: int, p: int, C: int,
                  interpret: bool = False) -> jnp.ndarray:
    """patch matrix (B, t, h, w, pt*p*p*C) [patch-major feature order] ->
    pixels (B, t*pt, h*p, w*p, C)."""
    B, t, h, w, feat = y.shape
    assert feat == pt * p * p * C
    cell = p * C
    W = w * p
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, pt=pt, p=p, w=w, cell=cell),
        grid=(B, t, h),
        in_specs=[pl.BlockSpec((1, 1, 1, w, feat),
                               lambda b, i, j: (b, i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, pt, p, W * C),
                               lambda b, i, j: (b, i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, t, pt, h * p, W * C), y.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0, bytes_accessed=2 * y.size * y.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(y)
    return out.reshape(B, t * pt, h * p, W, C)


def patch_relayout_supported(W: int, C: int, p: int,
                             backend_check: bool = True) -> bool:
    """Lane-friendly shapes only: the pixel row (W*C lanes) must tile into
    whole vregs, and the (p2, c) cell must divide it.

    Opt-in until A/B-verified on hardware: set OMNITOK_PATCH_KERNEL=1
    (the lax.reshape permutation path is the measured-good default,
    PERF.md round-2 trace pass)."""
    if (W * C) % 128 != 0 or W % p != 0:
        return False
    if backend_check:
        import os

        if os.environ.get("OMNITOK_PATCH_KERNEL", "0") != "1":
            return False
        return jax.default_backend() == "tpu"
    return True
