"""Differentiable GAN augmentation (DiffAugment) in pure JAX.

Reference behaviours: /root/reference/OmniTokenizer/modules/diffaug.py:48-113
(color = brightness/saturation/contrast, translation with zero-pad, cutout).
All randomness flows through explicit PRNG keys; every transform is
batch-vectorized with static shapes (gather-based translation instead of the
reference's pad+index so XLA keeps one fused kernel).

Input layout: channels-last (B, H, W, C).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def rand_brightness(key, x):
    b = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) - 0.5
    return x + b


def rand_saturation(key, x):
    m = x.mean(axis=-1, keepdims=True)
    s = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) * 2.0
    return (x - m) * s + m


def rand_contrast(key, x):
    m = x.mean(axis=(1, 2, 3), keepdims=True)
    c = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) + 0.5
    return (x - m) * c + m


def rand_translation(key, x, ratio: float = 0.125):
    B, H, W, C = x.shape
    sx = int(H * ratio + 0.5)
    sy = int(W * ratio + 0.5)
    kx, ky = jax.random.split(key)
    tx = jax.random.randint(kx, (B, 1, 1), -sx, sx + 1)
    ty = jax.random.randint(ky, (B, 1, 1), -sy, sy + 1)
    gx = jnp.arange(H)[None, :, None] + tx  # (B, H, 1)
    gy = jnp.arange(W)[None, None, :] + ty  # (B, 1, W)
    inb = (gx >= 0) & (gx < H) & (gy >= 0) & (gy < W)  # (B, H, W)
    gxc = jnp.clip(gx, 0, H - 1)
    gyc = jnp.clip(gy, 0, W - 1)
    bidx = jnp.arange(B)[:, None, None]
    shifted = x[bidx, gxc, gyc]  # (B, H, W, C)
    return jnp.where(inb[..., None], shifted, 0.0)


def rand_cutout(key, x, ratio: float = 0.2):
    B, H, W, C = x.shape
    ch = int(H * ratio + 0.5)
    cw = int(W * ratio + 0.5)
    kx, ky = jax.random.split(key)
    ox = jax.random.randint(kx, (B, 1, 1), 0, H + (1 - ch % 2))
    oy = jax.random.randint(ky, (B, 1, 1), 0, W + (1 - cw % 2))
    gx = jnp.arange(H)[None, :, None]
    gy = jnp.arange(W)[None, None, :]
    inx = (gx >= ox - ch // 2) & (gx < ox - ch // 2 + ch)
    iny = (gy >= oy - cw // 2) & (gy < oy - cw // 2 + cw)
    mask = 1.0 - (inx & iny).astype(x.dtype)
    return x * mask[..., None]


_POLICIES = {
    "color": (rand_brightness, rand_saturation, rand_contrast),
    "translation": (rand_translation,),
    "cutout": (rand_cutout,),
}


def diff_augment(key: jax.Array, x: jnp.ndarray,
                 policy: str = "color,translation,cutout") -> jnp.ndarray:
    """Apply the augmentation pipeline; x channels-last (B, H, W, C)."""
    for p in policy.split(","):
        for fn in _POLICIES[p]:
            key, sub = jax.random.split(key)
            x = fn(sub, x)
    return x


def diff_augment_video(key: jax.Array, x: jnp.ndarray,
                       policy: str = "color,translation,cutout") -> jnp.ndarray:
    """(B, T, H, W, C): frames augmented independently as (B*T) images,
    matching base.py:560-563."""
    B, T, H, W, C = x.shape
    out = diff_augment(key, x.reshape(B * T, H, W, C), policy)
    return out.reshape(B, T, H, W, C)
