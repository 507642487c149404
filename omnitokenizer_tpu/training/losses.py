"""GAN / reconstruction loss functions.

Reference: /root/reference/OmniTokenizer/omnitokenizer.py:23-60 (logit-laplace,
hinge/vanilla D losses), utils.py:218-222 (adopt_weight warm-up gate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(jax.nn.softplus(logits_fake)))


def logits_laplace(x: jnp.ndarray, x_recon: jnp.ndarray, eps: float = 0.1) -> jnp.ndarray:
    """L1 in logit-laplace space; inputs in [-0.5, 0.5]."""
    xl = (1 - 2 * eps) * (x + 0.5) + eps
    rl = (1 - 2 * eps) * (x_recon + 0.5) + eps
    return jnp.mean(jnp.abs(xl - rl))


def adopt_weight(step: jnp.ndarray, threshold: int = 0, value: float = 0.0) -> jnp.ndarray:
    """1.0 once step >= threshold, else `value` (disc warm-up gate)."""
    return jnp.where(step < threshold, value, 1.0)


def l1(x, y):
    return jnp.mean(jnp.abs(x - y))


def l2(x, y):
    return jnp.mean(jnp.square(x - y))
