"""PatchGAN discriminators (2D image / 3D video) with intermediate-feature
outputs for the feature-matching loss.

Reference: /root/reference/OmniTokenizer/base.py:433-573 and
modules/discriminator.py:7-24 (ApplyNoise).  Notes:
 * `Blur2d(f=None)` in the reference is an identity (discriminator.py:100-117
   with f=None), so apply_blur is represented as a no-op here too;
 * norm_type 'batch' is SyncBatchNorm in the reference (base.py:277); here it
   is flax BatchNorm with `axis_name='data'` so the batch statistics are
   psum-synced across the mesh by XLA;
 * returns (logits, [features...]) where the feature list includes the final
   logits, matching `res[-1], res[1:]` (base.py:495).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Normalize(nn.Module):
    """GroupNorm(32, eps=1e-6) or cross-replica-synced BatchNorm."""

    channels: int
    norm_type: str = "group"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.norm_type == "group":
            return nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            name="norm",
        )(x)


class ApplyNoise(nn.Module):
    """x + per-channel weight * N(0,1) noise shared across channels."""

    channels: int

    @nn.compact
    def __call__(self, x, rng: Optional[jax.Array] = None):
        w = self.param("weight", nn.initializers.zeros, (self.channels,), jnp.float32)
        if rng is None:
            return x
        noise_shape = x.shape[:-1][:1] + (1,) * (x.ndim - 2) + x.shape[-1:]
        # channels-last: noise (B, ..., 1) broadcast over channel axis
        noise = jax.random.normal(rng, x.shape[:-1] + (1,), x.dtype)
        return x + w * noise


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class NLayerDiscriminator(nn.Module):
    """2D PatchGAN.  Input channels-last (B, H, W, C)."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    norm_type: str = "batch"
    use_sigmoid: bool = False
    activation: str = "leaky_relu"
    apply_noise: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, noise_rng: Optional[jax.Array] = None,
                 ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        act = _leaky if self.activation == "leaky_relu" else jnp.tanh
        if self.apply_noise:
            x = ApplyNoise(self.input_nc, name="noise")(x, noise_rng)

        feats = [x]
        h = nn.Conv(self.ndf, (4, 4), strides=2, padding=[(2, 2), (2, 2)],
                    dtype=self.dtype, name="model0_conv")(x)
        h = act(h)
        feats.append(h)

        nf = self.ndf
        for n in range(1, self.n_layers):
            nf_prev, nf = nf, min(nf * 2, 512)
            h = nn.Conv(nf, (4, 4), strides=2, padding=[(2, 2), (2, 2)],
                        dtype=self.dtype, name=f"model{n}_conv")(h)
            h = Normalize(nf, self.norm_type, self.axis_name, name=f"model{n}_norm")(h, train)
            h = act(h)
            feats.append(h)

        nf_prev, nf = nf, min(nf * 2, 512)
        n = self.n_layers
        h = nn.Conv(nf, (4, 4), strides=1, padding=[(2, 2), (2, 2)],
                    dtype=self.dtype, name=f"model{n}_conv")(h)
        h = Normalize(nf, self.norm_type, self.axis_name, name=f"model{n}_norm")(h, train)
        h = act(h)
        feats.append(h)

        h = nn.Conv(1, (4, 4), strides=1, padding=[(2, 2), (2, 2)],
                    dtype=self.dtype, name=f"model{self.n_layers + 1}_conv")(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        feats.append(h)

        return h, feats[1:]


class NLayerDiscriminator3D(nn.Module):
    """3D PatchGAN for video.  Input channels-last (B, T, H, W, C).

    Mirrors the 2D stack with Conv3d; the last conv block also carries a
    Normalize+activation (base.py:538-542)."""

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    norm_type: str = "batch"
    use_sigmoid: bool = False
    activation: str = "leaky_relu"
    apply_noise: bool = False
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, noise_rng: Optional[jax.Array] = None,
                 ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        act = _leaky if self.activation == "leaky_relu" else jnp.tanh
        if self.apply_noise:
            x = ApplyNoise(self.input_nc, name="noise")(x, noise_rng)

        pad = [(2, 2), (2, 2), (2, 2)]
        feats = [x]
        h = nn.Conv(self.ndf, (4, 4, 4), strides=2, padding=pad,
                    dtype=self.dtype, name="model0_conv")(x)
        h = act(h)
        feats.append(h)

        nf = self.ndf
        for n in range(1, self.n_layers):
            nf_prev, nf = nf, min(nf * 2, 512)
            h = nn.Conv(nf, (4, 4, 4), strides=2, padding=pad,
                        dtype=self.dtype, name=f"model{n}_conv")(h)
            h = Normalize(nf, self.norm_type, self.axis_name, name=f"model{n}_norm")(h, train)
            h = act(h)
            feats.append(h)

        nf_prev, nf = nf, min(nf * 2, 512)
        n = self.n_layers
        h = nn.Conv(nf, (4, 4, 4), strides=1, padding=pad,
                    dtype=self.dtype, name=f"model{n}_conv")(h)
        h = Normalize(nf, self.norm_type, self.axis_name, name=f"model{n}_norm")(h, train)
        h = act(h)
        feats.append(h)

        n = self.n_layers + 1
        h = nn.Conv(1, (4, 4, 4), strides=1, padding=pad,
                    dtype=self.dtype, name=f"model{n}_conv")(h)
        h = Normalize(1, self.norm_type, self.axis_name, name=f"model{n}_norm")(h, train)
        h = act(h)
        if self.use_sigmoid:
            h = nn.sigmoid(h)
        feats.append(h)

        return h, feats[1:]
