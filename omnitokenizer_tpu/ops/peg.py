"""PEG: depthwise 3x3x3 Conv3d positional encoding generator.

Reference: /root/reference/OmniTokenizer/modules/attention.py:298-338.

Parity quirk preserved on purpose: the reference reshapes ANY (B', N, d)
token tensor to `video_shape` = (B, T, H, W) row-major — including the
temporal-transformer layout (b h w) t d, which scrambles batch/space/time.
Released checkpoints were trained with this behaviour, so we reproduce it
bit-for-bit rather than "fixing" it.

Temporal padding is (2, 0) when causal else (1, 1); spatial is (1, 1).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn




class PEG(nn.Module):
    dim: int
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, video_shape: Tuple[int, int, int, int],
                 residual: bool = False) -> jnp.ndarray:
        """residual=True returns peg(x) + x fused (bf16 kernel folds the add
        into its output pass)."""
        orig_shape = x.shape
        B, T, H, W = video_shape
        g = x.reshape(B, T, H, W, self.dim)

        # flax Conv kernel layout (3, 3, 3, 1, dim) kept for the converter
        kernel = self.param("dsconv_kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, 1, self.dim), jnp.float32)
        bias = self.param("dsconv_bias", nn.initializers.zeros,
                          (self.dim,), jnp.float32)

        # unrolled shifted multiply-adds: XLA's grouped-conv lowering for
        # feature_group_count=dim runs ~15x slower than its FLOP cost.
        # This kLoop fusion is the measured floor for this op (PERF.md
        # round 3): three Pallas formulations lost on-chip — naive per-tap
        # strided slices, a hoisted-sublane-shift kernel per (b,t,c) block
        # (1.04 vs 0.95 ms microbench), and a T-loop variant sharing shifted
        # planes across the temporal window (2129 vs 2315 f/s in-model; the
        # standalone kernel forfeits XLA's fusion with neighbouring ops and
        # pays a separate full-tensor pad).  Bound analysis: hoisting the
        # W (sublane) rotates saves ~0.17 ms/PEG but costs ~0.2 ms of copies.
        tpad = (2, 0) if self.causal else (1, 1)
        gp = jnp.pad(g, ((0, 0), tpad, (1, 1), (1, 1), (0, 0)))
        k = kernel.astype(self.dtype)
        out = None
        for dt in range(3):
            for dh in range(3):
                for dw in range(3):
                    term = gp[:, dt:dt + T, dh:dh + H, dw:dw + W, :] * k[dt, dh, dw, 0]
                    out = term if out is None else out + term
        out = out + bias.astype(self.dtype)
        if residual:
            out = out + g
        return out.reshape(orig_shape)
