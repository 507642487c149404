"""Diagonal Gaussian posterior for VAE mode.

Reference: /root/reference/OmniTokenizer/modules/vae.py:4-43.  Pure functions
over channels-last parameter tensors; sampling takes an explicit PRNG key
(replacing torch.randn at vae.py:16).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DiagonalGaussian(NamedTuple):
    mean: jnp.ndarray
    logvar: jnp.ndarray

    @classmethod
    def from_params(cls, params: jnp.ndarray, axis: int = -1) -> "DiagonalGaussian":
        mean, logvar = jnp.split(params, 2, axis=axis)
        return cls(mean=mean, logvar=jnp.clip(logvar, -30.0, 20.0))

    @property
    def std(self) -> jnp.ndarray:
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> jnp.ndarray:
        return jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(key, self.mean.shape, jnp.float32).astype(self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        """Per-sample KL to N(0, I), summed over all non-batch axes
        (reference sums over dims [1,2,3] of (B, C, T*H*W-ish); we sum over
        everything but the leading batch axis, which is equivalent)."""
        m = self.mean.astype(jnp.float32)
        axes = tuple(range(1, m.ndim))
        return 0.5 * jnp.sum(
            jnp.square(m) + self.var.astype(jnp.float32) - 1.0 - self.logvar.astype(jnp.float32),
            axis=axes,
        )

    def nll(self, sample: jnp.ndarray) -> jnp.ndarray:
        logtwopi = jnp.log(2.0 * jnp.pi)
        axes = tuple(range(1, self.mean.ndim))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=axes,
        )
