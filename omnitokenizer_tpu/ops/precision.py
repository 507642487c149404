"""Matmul precision policy.

On TPU, float32 matmuls default to fast bf16x3-pass approximations; that is
fine for the bf16 serving path but breaks numerical parity with the
reference (and accumulates through 16+ transformer layers).  Policy:
  * float32 compute  -> Precision.HIGHEST (true f32 MXU passes)
  * bfloat16 compute -> default (native bf16 multiply, f32 accumulate)
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def mm_precision(dtype: Any) -> Optional[jax.lax.Precision]:
    if dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return None


def cast_f32_leaves(tree, dtype):
    """Pre-cast every f32 leaf of a param tree to the compute dtype, ONCE.

    Models cast their weights to the compute dtype at every apply; callers
    that loop (decode scans, bench/eval loops) otherwise pay the
    multi-hundred-MB f32->bf16 convert per call — XLA does not hoist the
    loop-invariant converts out of while/scan loops.  No-op for f32.
    Shared by the LM samplers (models/gpt.py) and the tokenizer serving
    wrapper (models/wrapper.py) so serving numerics stay in lockstep."""
    if dtype == jnp.float32:
        return tree
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype)
        if getattr(p, "dtype", None) == jnp.float32 else p, tree)
