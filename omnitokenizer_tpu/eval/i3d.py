"""InceptionI3d (Kinetics-400) in flax — the FVD feature extractor.

Reference: /root/reference/OmniTokenizer/fvd/pytorch_i3d.py (Unit3D :59,
InceptionModule :135, InceptionI3d :163) and fvd.py:18-34 preprocessing.

Weights: convert a torch `i3d_pretrained_400.pt` state_dict with
`load_i3d_variables(path)` (the file is not distributable with this repo);
without it the architecture still runs (random init) so the FVD plumbing is
fully exercisable, but reported FVD numbers are only meaningful with real
weights.

Layout: channels-last (B, T, H, W, C); eval-only (BatchNorm uses running
stats; torch momentum 0.001 is irrelevant at inference).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _same_pad(size: int, k: int, s: int) -> Tuple[int, int]:
    """TF-style SAME pad for one dim (pytorch_i3d.py:93-98)."""
    if size % s == 0:
        pad = max(k - s, 0)
    else:
        pad = max(k - (size % s), 0)
    return pad // 2, pad - pad // 2


def _pad_same_3d(x: jnp.ndarray, ks, strides) -> jnp.ndarray:
    _, t, h, w, _ = x.shape
    pt = _same_pad(t, ks[0], strides[0])
    ph = _same_pad(h, ks[1], strides[1])
    pw = _same_pad(w, ks[2], strides[2])
    return jnp.pad(x, ((0, 0), pt, ph, pw, (0, 0)))


def max_pool_same(x: jnp.ndarray, ks, strides) -> jnp.ndarray:
    x = _pad_same_3d(x, ks, strides)
    return nn.max_pool(x, tuple(ks), strides=tuple(strides), padding="VALID")


class Unit3D(nn.Module):
    out_channels: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_bn: bool = True
    use_bias: bool = False
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = _pad_same_3d(x, self.kernel, self.stride)
        x = nn.Conv(self.out_channels, tuple(self.kernel), strides=tuple(self.stride),
                    padding="VALID", use_bias=self.use_bias, dtype=self.dtype,
                    name="conv3d")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             dtype=self.dtype, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class InceptionModule(nn.Module):
    out: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3b]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        o = self.out
        b0 = Unit3D(o[0], (1, 1, 1), dtype=self.dtype, name="b0")(x)
        b1 = Unit3D(o[1], (1, 1, 1), dtype=self.dtype, name="b1a")(x)
        b1 = Unit3D(o[2], (3, 3, 3), dtype=self.dtype, name="b1b")(b1)
        b2 = Unit3D(o[3], (1, 1, 1), dtype=self.dtype, name="b2a")(x)
        b2 = Unit3D(o[4], (3, 3, 3), dtype=self.dtype, name="b2b")(b2)
        b3 = max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = Unit3D(o[5], (1, 1, 1), dtype=self.dtype, name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


_MIXED = {
    "Mixed_3b": [64, 96, 128, 16, 32, 32],
    "Mixed_3c": [128, 128, 192, 32, 96, 64],
    "Mixed_4b": [192, 96, 208, 16, 48, 64],
    "Mixed_4c": [160, 112, 224, 24, 64, 64],
    "Mixed_4d": [128, 128, 256, 24, 64, 64],
    "Mixed_4e": [112, 144, 288, 32, 64, 64],
    "Mixed_4f": [256, 160, 320, 32, 128, 128],
    "Mixed_5b": [256, 160, 320, 32, 128, 128],
    "Mixed_5c": [384, 192, 384, 48, 128, 128],
}


class InceptionI3d(nn.Module):
    num_classes: int = 400
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T, H, W, 3) in [-1, 1] -> (B, num_classes) logits
        (time-averaged, matching pytorch_i3d.py:354-364)."""
        d = self.dtype
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), dtype=d, name="Conv3d_1a_7x7")(x)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, (1, 1, 1), dtype=d, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), dtype=d, name="Conv3d_2c_3x3")(x)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = InceptionModule(_MIXED["Mixed_3b"], dtype=d, name="Mixed_3b")(x)
        x = InceptionModule(_MIXED["Mixed_3c"], dtype=d, name="Mixed_3c")(x)
        x = max_pool_same(x, (3, 3, 3), (2, 2, 2))
        for k in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = InceptionModule(_MIXED[k], dtype=d, name=k)(x)
        x = max_pool_same(x, (2, 2, 2), (2, 2, 2))
        x = InceptionModule(_MIXED["Mixed_5b"], dtype=d, name="Mixed_5b")(x)
        x = InceptionModule(_MIXED["Mixed_5c"], dtype=d, name="Mixed_5c")(x)

        # avg_pool kernel (2,7,7) stride 1, then 1x1x1 logits conv
        x = nn.avg_pool(x, (2, 7, 7), strides=(1, 1, 1), padding="VALID")
        x = Unit3D(self.num_classes, (1, 1, 1), use_bn=False, use_bias=True,
                   relu=False, dtype=d, name="logits")(x)
        # (B, t', 1, 1, C) -> mean over time
        return jnp.mean(x[:, :, 0, 0, :], axis=1)


def preprocess_videos(videos_uint8: np.ndarray, target: int = 224) -> np.ndarray:
    """(B, T, H, W, 3) uint8 -> bilinear-resized (B, T, target, target, 3)
    float32 in [-1, 1] (fvd.py:18-29)."""
    x = jnp.asarray(videos_uint8, jnp.float32)
    B, T, H, W, C = x.shape
    x = jax.image.resize(x, (B, T, target, target, C), method="bilinear")
    return 2.0 * x / 255.0 - 1.0


def preprocess_videos_styleganv(videos_uint8: np.ndarray, target: int = 224) -> np.ndarray:
    """styleganv-protocol preprocessing (fvd/styleganv/fvd.py:38-62):
    scale the SHORTER side to `target` (bilinear), center-crop target^2,
    then [0,1] -> [-1,1].  (videogpt squashes straight to 224x224.)"""
    x = jnp.asarray(videos_uint8, jnp.float32) / 255.0
    B, T, H, W, C = x.shape
    scale = target / min(H, W)
    nh, nw = (target, math.ceil(W * scale)) if H < W else (math.ceil(H * scale), target)
    x = jax.image.resize(x, (B, T, nh, nw, C), method="bilinear")
    h0 = (nh - target) // 2
    w0 = (nw - target) // 2
    x = x[:, :, h0:h0 + target, w0:w0 + target]
    return (x - 0.5) * 2.0


def load_i3d_variables(path: Optional[str] = None, num_classes: int = 400,
                       seed: int = 0) -> Tuple[Dict[str, Any], bool]:
    """Init the flax tree; fill from a torch i3d state_dict when available.

    Torch names: '<EndPoint>.conv3d.{weight,bias}', '<EndPoint>.bn.{weight,
    bias,running_mean,running_var}', inception branches
    '<Mixed_*>.{b0,b1a,b1b,b2a,b2b,b3b}.conv3d...', final 'logits.conv3d.*'.
    """
    model = InceptionI3d(num_classes=num_classes)
    dummy = jnp.zeros((1, 16, 224, 224, 3), jnp.float32)
    variables = jax.device_get(model.init(jax.random.PRNGKey(seed), dummy))
    if path is None:
        return variables, False

    import torch

    sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu").items()}
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    stats = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))

    def fill_unit(tree_p, tree_s, prefix):
        w = sd[f"{prefix}.conv3d.weight"]  # (O, I, kt, kh, kw)
        tree_p["conv3d"]["kernel"] = np.transpose(w, (2, 3, 4, 1, 0))
        if f"{prefix}.conv3d.bias" in sd:
            tree_p["conv3d"]["bias"] = sd[f"{prefix}.conv3d.bias"]
        if f"{prefix}.bn.weight" in sd:
            tree_p["bn"]["scale"] = sd[f"{prefix}.bn.weight"]
            tree_p["bn"]["bias"] = sd[f"{prefix}.bn.bias"]
            tree_s["bn"]["mean"] = sd[f"{prefix}.bn.running_mean"]
            tree_s["bn"]["var"] = sd[f"{prefix}.bn.running_var"]

    units = ["Conv3d_1a_7x7", "Conv3d_2b_1x1", "Conv3d_2c_3x3", "logits"]
    for u in units:
        fill_unit(params[u], stats.get(u, {}), u)
    for mixed in _MIXED:
        for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
            fill_unit(params[mixed][b], stats[mixed][b], f"{mixed}.{b}")

    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)}
    return variables, True


def compute_fvd_logits(videos_uint8: np.ndarray, variables, batch: int = 16,
                       preprocess=None) -> np.ndarray:
    """I3D logits for FVD (fvd.py:31-34,131-139), chunked to bound memory.
    `preprocess` overrides the videogpt 224-resize (e.g.
    preprocess_videos_styleganv for the styleganv protocol)."""
    model = InceptionI3d()
    apply = jax.jit(lambda v, x: model.apply(v, x))
    pre = preprocess or preprocess_videos
    outs = []
    for i in range(0, len(videos_uint8), batch):
        x = pre(videos_uint8[i:i + batch])
        outs.append(np.asarray(apply(variables, x)))
    return np.concatenate(outs, axis=0)
