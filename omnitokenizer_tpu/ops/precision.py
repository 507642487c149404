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
