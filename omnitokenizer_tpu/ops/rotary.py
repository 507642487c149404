"""2D rotary position embeddings.

Reproduces the reference layout exactly
(/root/reference/OmniTokenizer/modules/attention.py:28-70): for a flat h*w
token grid, each head dim is split into dim/4 complex frequency slots; even
complex slots rotate by x-position angles and odd slots by y-position angles
(x/y interleave from the `cat([x_cis, y_cis], dim=-1).reshape(N, -1)` step).

Everything here is static-shape and precomputed on the host so XLA sees only
an elementwise fused multiply inside the attention kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _freqs_cis_2d_np(dim: int, end: int, theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables of shape (end, dim//2), float32.

    `dim` is the per-head dimension; `end` = number of tokens (h*w grid,
    x = n % H, y = n // H with H = floor(sqrt(end)), matching the reference's
    int(end**0.5) including its behaviour on non-square N).
    """
    H = int(end ** 0.5)
    pos = np.arange(0, end, dtype=np.float64)
    x_pos = pos % H
    y_pos = pos // H
    n_freq = dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4, dtype=np.float64)[:n_freq] / dim))
    x_ang = np.outer(x_pos, freqs)  # (N, dim/4)
    y_ang = np.outer(y_pos, freqs)  # (N, dim/4)
    # interleave: complex slot 2k <- x freq k, slot 2k+1 <- y freq k
    ang = np.stack([x_ang, y_ang], axis=-1).reshape(end, 2 * n_freq)  # (N, dim/2)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def freqs_cis_2d(dim: int, end: int, theta: float = 10000.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    cos, sin = _freqs_cis_2d_np(dim, end, theta)
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rotary_emb_2d(q: jnp.ndarray, k: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply 2D RoPE to q, k of shape (B, N, H, D).

    The rotation treats consecutive real pairs (2p, 2p+1) as one complex
    number rotated by angle table column p (reference attention.py:59-70).
    Computed in float32 and cast back, matching `xq.float()` upcast.
    """
    B, N, H, D = q.shape
    cos, sin = freqs_cis_2d(D, N)
    cos = cos[None, :, None, :]  # (1, N, 1, D/2)
    sin = sin[None, :, None, :]

    def rot(x):
        xf = x.astype(jnp.float32).reshape(B, N, H, D // 2, 2)
        a, b = xf[..., 0], xf[..., 1]
        out = jnp.stack([a * cos - b * sin, a * sin + b * cos], axis=-1)
        return out.reshape(B, N, H, D).astype(x.dtype)

    return rot(q), rot(k)
