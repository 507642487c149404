"""LPIPS perceptual metric (VGG16 features + learned linear heads).

Reference: /root/reference/OmniTokenizer/modules/lpips.py:53-166.

The five linear-head weights ship with the reference
(modules/cache/vgg.pth) and are converted directly.  The VGG16 backbone
weights come from torchvision's pretrained model when available on disk
(`load_lpips_variables(vgg16_torch_path=...)`); without them the backbone is
randomly initialized and `pretrained=False` is reported — training still
runs, but perceptual numbers are only meaningful with real weights.

Input convention: channels-last (B, H, W, 3) in [-1, 1] (the reference
scaling layer's shift/scale are baked in below, lpips.py:101-108).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 feature config: conv channels per slice, with maxpool between slices
_SLICES = [
    [64, 64],            # relu1_2
    [128, 128],          # relu2_2
    [256, 256, 256],     # relu3_3
    [512, 512, 512],     # relu4_3
    [512, 512, 512],     # relu5_3
]
CHNS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk emitting the 5 relu slice outputs."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        outs = []
        conv_i = 0
        for si, chans in enumerate(_SLICES):
            if si > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for c in chans:
                x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                conv_i += 1
            outs.append(x)
        return outs


class LPIPS(nn.Module):
    """Perceptual distance; returns (B, 1, 1, 1)-shaped per-sample values."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        net = VGG16Features(dtype=self.dtype, name="net")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)

        total = 0.0
        for i in range(len(CHNS)):
            nx = _unit_normalize(fx[i])
            ny = _unit_normalize(fy[i])
            diff = jnp.square(nx - ny)
            w = self.param(f"lin{i}", nn.initializers.ones, (CHNS[i],), jnp.float32)
            # 1x1 conv with non-negative effective weights is a weighted
            # channel sum; spatial average afterwards (lpips.py:92)
            val = jnp.mean(jnp.sum(diff * w[None, None, None, :], axis=-1, keepdims=True),
                           axis=(1, 2), keepdims=True)
            total = total + val
        return total  # (B, 1, 1, 1)


def _unit_normalize(x: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


# --------------------------------------------------------------------------
# weight loading
# --------------------------------------------------------------------------

REFERENCE_LIN_PATH = "/root/reference/OmniTokenizer/modules/cache/vgg.pth"


def load_lpips_variables(
    vgg16_torch_path: Optional[str] = None,
    lin_path: str = REFERENCE_LIN_PATH,
    seed: int = 0,
) -> Tuple[Dict[str, Any], bool]:
    """Build LPIPS variables.  Returns (variables, fully_pretrained).

    * lin heads: from the reference's shipped vgg.pth (keys lin{i}.model.1.weight,
      shape (1, C, 1, 1));
    * backbone: from a torchvision vgg16 state_dict file if provided/found.
    """
    model = LPIPS()
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    # jitted init: one compiled program instead of eager per-op dispatch
    variables = jax.tree_util.tree_map(
        np.asarray,
        jax.device_get(jax.jit(model.init)(jax.random.PRNGKey(seed), dummy, dummy)))
    params = dict(variables["params"])

    pretrained = True
    # linear heads
    if os.path.exists(lin_path):
        import torch

        lins = torch.load(lin_path, map_location="cpu")
        for i in range(5):
            w = lins[f"lin{i}.model.1.weight"].detach().numpy().reshape(-1)
            params[f"lin{i}"] = jnp.asarray(w, jnp.float32)
    else:
        pretrained = False

    # backbone
    if vgg16_torch_path is None:
        cand = os.path.expanduser("~/.cache/torch/hub/checkpoints/vgg16-397923af.pth")
        vgg16_torch_path = cand if os.path.exists(cand) else None
    if vgg16_torch_path and os.path.exists(vgg16_torch_path):
        import torch

        sd = torch.load(vgg16_torch_path, map_location="cpu")
        net = dict(params["net"])
        conv_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        for ci, ti in enumerate(conv_indices):
            w = sd[f"features.{ti}.weight"].detach().numpy()  # (out, in, kh, kw)
            b = sd[f"features.{ti}.bias"].detach().numpy()
            net[f"conv{ci}"] = {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": jnp.asarray(b),
            }
        params["net"] = net
    else:
        pretrained = False

    return {"params": params}, pretrained
