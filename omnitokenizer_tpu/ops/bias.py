"""Attention bias builders: AliBi slopes and the continuous relative
position bias MLP.

AliBi: /root/reference/OmniTokenizer/modules/attention.py:490-532.
ContinuousPositionBias (SwinV2-style log-spaced rel-coord MLP):
/root/reference/OmniTokenizer/modules/attention.py:535-583.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def alibi_slopes(heads: int) -> np.ndarray:
    def pow2_slopes(n):
        start = 2 ** (-(2 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(heads).is_integer():
        s = pow2_slopes(heads)
    else:
        closest = 2 ** math.floor(math.log2(heads))
        s = pow2_slopes(closest) + pow2_slopes(2 * closest)[0::2][: heads - closest]
    return np.asarray(s, dtype=np.float32)


@functools.lru_cache(maxsize=32)
def _alibi_bias_np(heads: int, i: int, j: int) -> np.ndarray:
    """(heads, i, j) bias = -|j_pos - i_pos| * slope (i aligned to the end)."""
    i_arange = np.arange(j - i, j)
    j_arange = np.arange(j)
    dist = -np.abs(j_arange[None, None, :] - i_arange[None, :, None]).astype(np.float32)
    return dist * alibi_slopes(heads)[:, None, None]


def alibi_bias(heads: int, i: int, j: int) -> jnp.ndarray:
    return jnp.asarray(_alibi_bias_np(heads, i, j))


@functools.lru_cache(maxsize=32)
def _log_rel_coords_np(h: int, w: int) -> np.ndarray:
    """(h*w, h*w, 2) signed-log relative coordinates."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    grid = np.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1).astype(np.float32)
    rel = grid[:, None, :] - grid[None, :, :]
    return np.sign(rel) * np.log(np.abs(rel) + 1.0)


class ContinuousPositionBias(nn.Module):
    """Two-hidden-layer MLP over log relative coordinates -> per-head bias.

    Param layout matches the torch ModuleList:
      net.0.0 Linear(2, dim), net.1.0 Linear(dim, dim), net.2 Linear(dim, heads)
    with LeakyReLU(0.1) after the first two.
    """

    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        rel = jnp.asarray(_log_rel_coords_np(h, w))  # (N, N, 2)
        x = nn.Dense(self.dim, name="net0", dtype=jnp.float32)(rel)
        x = nn.leaky_relu(x, negative_slope=0.1)
        x = nn.Dense(self.dim, name="net1", dtype=jnp.float32)(x)
        x = nn.leaky_relu(x, negative_slope=0.1)
        x = nn.Dense(self.heads, name="net2", dtype=jnp.float32)(x)
        return jnp.transpose(x, (2, 0, 1)).astype(self.dtype)  # (heads, N, N)
