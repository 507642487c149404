"""Kernel-forward / reference-backward training wrappers.

The fwd-only Pallas serving kernels (ops/pallas: cosine_mha, small_attn,
ln_qkv, geglu_ff) have no linearization rules, so the training step has
historically run plain XLA math for BOTH passes — materializing the
(B', H, N, N) f32 score tensor in HBM (671 MB per spatial attention at the
flagship B=4 GAN step) purely as an autodiff residual, and paying the
unfused LN/projection/GEGLU round-trips the kernels exist to avoid.

`kernel_fwd_ref_bwd(kernel_fn, ref_fn)` runs the serving kernel as the
PRIMAL and defines its vjp by rematerialization: backward replays `ref_fn`
(the reference XLA math) from the saved *inputs* and differentiates that.
Same compute trade as `jax.checkpoint` (one extra forward inside bwd, zero
residual traffic between the passes) but with the cheap fused kernel on the
primal path.  Gradients are exact for `ref_fn`; the primal differs from the
math path only by the kernels' recorded bf16-level deltas.

Enabled per-op via OMNITOK_TRAIN_KERNEL_FWD (comma list of {attn, ff, flat},
or "1" for all, "0"/"" for none) so each op's win is A/B-able on-chip; the
default reflects the measured winners in PERF.md.
"""

from __future__ import annotations

import os
from typing import Callable

import jax

# Default = the measured on-chip winners (PERF.md round-5 "kernel-fwd
# training" A/B: G fwd+bwd 217.7 -> 201.7 ms with all three op groups on,
# flagship 256^2 B=4; ff alone 207.0 ms); overridable for A/B runs.
_DEFAULT = "attn,ff,flat"


def train_kernel_fwd_ops() -> frozenset:
    """Ops routed through kernel-fwd/ref-bwd during training (trace-time)."""
    raw = os.environ.get("OMNITOK_TRAIN_KERNEL_FWD", _DEFAULT).strip()
    if raw in ("", "0"):
        return frozenset()
    if raw == "1":
        return frozenset({"attn", "ff", "flat"})
    return frozenset(p.strip() for p in raw.split(",") if p.strip())


def kernel_fwd_ref_bwd(kernel_fn: Callable, ref_fn: Callable) -> Callable:
    """custom_vjp: primal = `kernel_fn(*args)`, vjp = d`ref_fn`/dargs with
    `ref_fn` recomputed from the saved inputs (rematerialization).

    `kernel_fn` and `ref_fn` must take identical positional jnp args and
    return an identical shape/dtype.
    """

    @jax.custom_vjp
    def f(*args):
        return kernel_fn(*args)

    def fwd(*args):
        return kernel_fn(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(ref_fn, *args)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f
