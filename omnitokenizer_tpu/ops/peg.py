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


class _DepthwiseConv3x3x3(nn.Module):
    """Depthwise 3^3 conv as 27 unrolled shifted multiply-adds.

    XLA's grouped-conv lowering for feature_group_count=dim runs ~15x slower
    than its FLOP cost (PERF.md); the unrolled form fuses into one VPU loop.
    Parameters keep the flax Conv layout (3, 3, 3, 1, dim) so checkpoints and
    the torch converter are unaffected.
    """

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, g: jnp.ndarray) -> jnp.ndarray:
        # g is pre-padded: (B, T+2, H+2, W+2, C) -> (B, T, H, W, C)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, 1, self.dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        B, Tp, Hp, Wp, C = g.shape
        T, H, W = Tp - 2, Hp - 2, Wp - 2
        k = kernel.astype(self.dtype)
        out = None
        for dt in range(3):
            for dh in range(3):
                for dw in range(3):
                    term = g[:, dt:dt + T, dh:dh + H, dw:dw + W, :] * k[dt, dh, dw, 0]
                    out = term if out is None else out + term
        return out + bias.astype(self.dtype)


class PEG(nn.Module):
    dim: int
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, video_shape: Tuple[int, int, int, int]) -> jnp.ndarray:
        orig_shape = x.shape
        B, T, H, W = video_shape
        g = x.reshape(B, T, H, W, self.dim)

        tpad = (2, 0) if self.causal else (1, 1)
        g = jnp.pad(g, ((0, 0), tpad, (1, 1), (1, 1), (0, 0)))

        g = _DepthwiseConv3x3x3(self.dim, dtype=self.dtype, name="dsconv")(g)

        return g.reshape(orig_shape)
