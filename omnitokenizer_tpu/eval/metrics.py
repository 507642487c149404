"""Pixel metrics: PSNR and SSIM.

Matches the vendored calculators used by
/root/reference/evaluation/common_metrics_on_video_quality (standard
formulations, gaussian-window SSIM with K1=0.01, K2=0.03).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Per-sample PSNR over all non-batch axes; inputs same scale."""
    axes = tuple(range(1, x.ndim))
    mse = jnp.mean(jnp.square(x - y), axis=axes)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    g = np.exp(-0.5 * ((np.arange(size) - size // 2) / sigma) ** 2)
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Per-sample mean SSIM; x, y (B, H, W, C)."""
    k = _gaussian_kernel()[:, :, None, None]
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    def filt(img):
        # depthwise gaussian blur per channel
        c = img.shape[-1]
        kk = jnp.tile(k, (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            img, kk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mu_x, mu_y = filt(x), filt(y)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = filt(x * x) - mu_x2
    sig_y = filt(y * y) - mu_y2
    sig_xy = filt(x * y) - mu_xy

    s = ((2 * mu_xy + c1) * (2 * sig_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2))
    return jnp.mean(s, axis=(1, 2, 3))
