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


class _Conv3d(nn.Module):
    """3D conv with flax nn.Conv's exact param layout ((kt,kh,kw,I,O) kernel
    under this module's scope) and a CPU fast path: XLA's CPU Conv3D
    lowering is ~100x off oneDNN (a naive loop), so on the cpu backend the
    conv runs as ONE 2D conv over time-taps stacked into channels —
    x[:, dt::st] slices concatenated on C, kernel reshaped
    (kh, kw, kt*I, O) — which hits the fast Eigen conv2d path.  Bitwise
    equivalent contraction order per output element."""

    features: int
    kernel: Sequence[int]
    stride: Sequence[int]
    use_bias: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        st, sh, sw = self.stride
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (kt, kh, kw, x.shape[-1], self.features), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros,
                        (self.features,), jnp.float32)
             if self.use_bias else None)
        x = x.astype(self.dtype)
        k = k.astype(self.dtype)
        if jax.default_backend() == "cpu":
            B, T, H, W, C = x.shape
            t_out = (T - kt) // st + 1
            taps = [x[:, dt:dt + (t_out - 1) * st + 1:st] for dt in range(kt)]
            xc = taps[0] if kt == 1 else jnp.concatenate(taps, axis=-1)
            xc = xc.reshape(B * t_out, H, W, kt * C)
            kc = jnp.transpose(k, (1, 2, 0, 3, 4)).reshape(
                kh, kw, kt * C, self.features)
            y = jax.lax.conv_general_dilated(
                xc, kc, (sh, sw), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y.reshape(B, t_out, y.shape[1], y.shape[2], self.features)
        else:
            y = jax.lax.conv_general_dilated(
                x, k, (st, sh, sw), "VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if b is not None:
            y = y + b.astype(self.dtype)
        return y


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
        x = _Conv3d(self.out_channels, tuple(self.kernel), tuple(self.stride),
                    self.use_bias, dtype=self.dtype, name="conv3d")(x)
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
    # shape-only init: eval_shape traces without running a 224^2 forward
    # (an EAGER init dispatches every conv op-by-op — minutes on 1 CPU core
    # or over the tunneled dev chip); the leaves are then filled/randomized
    # host-side.
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(seed),
                            jax.ShapeDtypeStruct((1, 16, 224, 224, 3),
                                                 jnp.float32))
    rng = np.random.RandomState(seed)

    def init_leaf(path, s):
        name = str(path[-1].key) if path else ""
        if name == "kernel":  # lecun_normal over fan_in
            fan_in = int(np.prod(s.shape[:-1]))
            return (rng.standard_normal(s.shape) / math.sqrt(fan_in)
                    ).astype(s.dtype)
        if name in ("scale", "var"):
            return np.ones(s.shape, s.dtype)
        return np.zeros(s.shape, s.dtype)

    variables = jax.tree_util.tree_map_with_path(init_leaf, shapes)
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
