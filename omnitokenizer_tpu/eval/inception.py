"""FID InceptionV3 (pool3, 2048-d) in flax — the pytorch-fid feature
extractor (/root/reference/evaluation/pytorch-fid/.../inception.py variant:
TF-ported weights, avg-pools with count_include_pad=False, max-pool branch in
the last InceptionE).

`load_inception_variables(path)` converts a torch `pt_inception-2015-12-05`
state_dict when available; otherwise the architecture runs with random init
(plumbing exercisable, numbers meaningless).

Layout: channels-last (B, H, W, 3); inputs in [0, 1] are resized to 299 and
scaled to [-1, 1] by `preprocess_images`.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv2d(nn.Module):
    out: int
    kernel: Sequence[int] = (1, 1)
    stride: int = 1
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        elif isinstance(pad, tuple):
            pad = [(pad[0], pad[0]), (pad[1], pad[1])]
        x = nn.Conv(self.out, tuple(self.kernel), strides=self.stride,
                    padding=pad, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _avg_pool_nip(x: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """3x3 stride-1 avg pool, pad 1, count_include_pad=False."""
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    s = nn.avg_pool(x, (k, k), strides=(1, 1), padding=[(1, 1), (1, 1)])
    c = nn.avg_pool(ones, (k, k), strides=(1, 1), padding=[(1, 1), (1, 1)])
    return s / c  # sum/valid-count (flax avg_pool divides by full k^2)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, dtype=d, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=d, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, dtype=d, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nip(x)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), stride=2, dtype=d, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, dtype=d, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, dtype=d, name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: Any = jnp.float32
    sow_branch1x1: bool = False  # Mixed_6d taps its 1x1 branch for sFID

    @nn.compact
    def __call__(self, x):
        d, c7 = self.dtype, self.c7
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x)
        if self.sow_branch1x1:
            self.sow("intermediates", "spatial_tap", b1)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d, name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nip(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, dtype=d, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d, name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d, name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, dtype=d, name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_type: str = "avg"  # Mixed_7b: 'avg' (count_include_pad=False); 7c: 'max'
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, dtype=d, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d, name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d, name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_type == "avg":
            bp = _avg_pool_nip(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    dtype: Any = jnp.float32
    num_classes: int = 1008  # pt_inception-2015-12-05 head size

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_logits: bool = False) -> jnp.ndarray:
        """(B, 299, 299, 3) in [-1, 1] -> (B, 2048) pool3 features, or
        (B, num_classes) logits for Inception Score when return_logits."""
        d = self.dtype
        x = BasicConv2d(32, (3, 3), stride=2, dtype=d, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, dtype=d, name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x)
        x = InceptionB(dtype=d, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6d", sow_branch1x1=True)(x)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x)
        x = InceptionD(dtype=d, name="Mixed_7a")(x)
        x = InceptionE("avg", dtype=d, name="Mixed_7b")(x)
        x = InceptionE("max", dtype=d, name="Mixed_7c")(x)
        pool = jnp.mean(x, axis=(1, 2))  # global avg pool -> (B, 2048)
        # classification head — used only by the Inception Score path
        # (evaluation/common_metrics_on_video_quality/calculate_is.py)
        logits = nn.Dense(self.num_classes, dtype=d, name="fc")(pool)
        return logits if return_logits else pool


def preprocess_images(images01: np.ndarray, size: int = 299) -> jnp.ndarray:
    """(B, H, W, 3) in [0, 1] -> bilinear 299^2 in [-1, 1]."""
    x = jnp.asarray(images01, jnp.float32)
    B, H, W, C = x.shape
    if (H, W) != (size, size):
        x = jax.image.resize(x, (B, size, size, C), method="bilinear")
    return 2.0 * x - 1.0


def load_inception_variables(path: Optional[str] = None, seed: int = 0,
                             ) -> Tuple[Dict[str, Any], bool]:
    """Convert a torch pt_inception-2015-12-05 state_dict if present."""
    model = FIDInceptionV3()
    dummy = jnp.zeros((1, 299, 299, 3), jnp.float32)
    # jitted init: one compiled program instead of eager per-op dispatch
    # (slow on 1 CPU core / over the tunneled dev chip)
    variables = jax.device_get(jax.jit(model.init)(jax.random.PRNGKey(seed), dummy))
    if path is None:
        return variables, False

    import torch

    sd = {k: v.numpy() for k, v in torch.load(path, map_location="cpu").items()}
    params = jax.tree_util.tree_map(np.asarray, dict(variables["params"]))
    stats = jax.tree_util.tree_map(np.asarray, dict(variables["batch_stats"]))

    def walk(tp, ts, prefix):
        if "conv" in tp and "bn" in tp:  # BasicConv2d leaf
            w = sd[f"{prefix}.conv.weight"]
            tp["conv"]["kernel"] = np.transpose(w, (2, 3, 1, 0))
            tp["bn"]["scale"] = sd[f"{prefix}.bn.weight"]
            tp["bn"]["bias"] = sd[f"{prefix}.bn.bias"]
            ts["bn"]["mean"] = sd[f"{prefix}.bn.running_mean"]
            ts["bn"]["var"] = sd[f"{prefix}.bn.running_var"]
            return
        for k in tp:
            if k == "fc":
                if "fc.weight" in sd and sd["fc.weight"].shape[0] == tp[k]["kernel"].shape[1]:
                    tp[k]["kernel"] = np.ascontiguousarray(sd["fc.weight"].T)
                    tp[k]["bias"] = sd["fc.bias"]
                continue
            walk(tp[k], ts[k], f"{prefix}.{k}" if prefix else k)

    walk(params, stats, "")
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, stats)}
    return variables, True


def compute_fid_features(images01: np.ndarray, variables, batch: int = 32) -> np.ndarray:
    model = FIDInceptionV3()
    apply = jax.jit(lambda v, x: model.apply(v, x))
    outs = []
    for i in range(0, len(images01), batch):
        outs.append(np.asarray(apply(variables, preprocess_images(images01[i:i + batch]))))
    return np.concatenate(outs, axis=0)


def compute_spatial_features(images01: np.ndarray, variables, batch: int = 32) -> np.ndarray:
    """First 7 channels of the Mixed_6d 1x1 branch (TF node 'mixed_6/conv:0'),
    flattened to (B, 7*17*17) = (B, 2023) — the sFID feature space
    (evaluator.py:25-26,644-652; sFID = Frechet distance on these)."""
    model = FIDInceptionV3()

    @jax.jit
    def apply(v, x):
        _, inter = model.apply(v, x, mutable=["intermediates"])
        sp = inter["intermediates"]["Mixed_6d"]["spatial_tap"][0][..., :7]
        return sp.reshape(sp.shape[0], -1)

    outs = []
    for i in range(0, len(images01), batch):
        outs.append(np.asarray(apply(variables, preprocess_images(images01[i:i + batch]))))
    return np.concatenate(outs, axis=0)


def compute_inception_probs(images01: np.ndarray, variables, batch: int = 32) -> np.ndarray:
    """Softmax class probabilities for Inception Score
    (calculate_is.py:28-33 uses softmax(inception(x)))."""
    model = FIDInceptionV3()
    apply = jax.jit(lambda v, x: jax.nn.softmax(
        model.apply(v, x, return_logits=True), axis=-1))
    outs = []
    for i in range(0, len(images01), batch):
        outs.append(np.asarray(apply(variables, preprocess_images(images01[i:i + batch]))))
    return np.concatenate(outs, axis=0)


def inception_score(probs: np.ndarray, splits: int = 1) -> Tuple[float, float]:
    """IS = exp(E_x KL(p(y|x) || p(y))) averaged over `splits` chunks
    (calculate_is.py:46-57)."""
    n = probs.shape[0]
    scores = []
    for k in range(splits):
        part = probs[k * (n // splits):(k + 1) * (n // splits)]
        py = np.mean(part, axis=0, keepdims=True)
        kl = np.sum(part * (np.log(part + 1e-12) - np.log(py + 1e-12)), axis=1)
        scores.append(float(np.exp(np.mean(kl))))
    return float(np.mean(scores)), float(np.std(scores))
