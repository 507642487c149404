"""Legacy CNN (TATS-style) 3D-conv VQGAN — kept for checkpoint compatibility
with the pre-transformer models and as the home of the SamePad conv blocks.

Reference: /root/reference/OmniTokenizer/base.py:38-431 — Encoder :280,
Decoder :315, ResBlock :353, SamePadConv3d :385, SamePadConvTranspose3d :409,
assembly + encode/decode :38-94.

Channels-last throughout; `downsample` is the (t, h, w) reduction tuple
(default 4, 8, 8).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import TokenizerConfig
from ..ops.codebook import Codebook

_PAD_MODES = {"replicate": "edge", "constant": "constant",
              "reflect": "reflect", "circular": "wrap"}


def _same_pad_amounts(kernel, stride):
    """total pad k - s per dim, front-heavy (base.py:393-398)."""
    out = []
    for k, s in zip(kernel, stride):
        p = k - s
        out.append((p // 2 + p % 2, p // 2))
    return out


class SamePadConv3d(nn.Module):
    out_channels: int
    kernel_size: Any = 3
    stride: Any = 1
    use_bias: bool = True
    padding_type: str = "replicate"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = (self.kernel_size,) * 3 if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        s = (self.stride,) * 3 if isinstance(self.stride, int) else tuple(self.stride)
        pads = [(0, 0)] + _same_pad_amounts(k, s) + [(0, 0)]
        x = jnp.pad(x, pads, mode=_PAD_MODES[self.padding_type])
        return nn.Conv(self.out_channels, k, strides=s, padding="VALID",
                       use_bias=self.use_bias, dtype=self.dtype, name="conv")(x)


class SamePadConvTranspose3d(nn.Module):
    out_channels: int
    kernel_size: Any = 3
    stride: Any = 1
    use_bias: bool = True
    padding_type: str = "replicate"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = (self.kernel_size,) * 3 if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        s = (self.stride,) * 3 if isinstance(self.stride, int) else tuple(self.stride)
        pads = [(0, 0)] + _same_pad_amounts(k, s) + [(0, 0)]
        x = jnp.pad(x, pads, mode=_PAD_MODES[self.padding_type])
        # torch ConvTranspose3d(stride=s, padding=k-1) == zero-dilate the
        # input by s then VALID conv with the flipped kernel (the converter
        # flips torch weights into this layout).
        in_ch = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*k, in_ch, self.out_channels), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1, 1, 1), padding=[(0, 0)] * 3,
            lhs_dilation=s,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.out_channels,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def _normalize(x, norm_type: str, name: str):
    if norm_type == "group":
        return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name)(x)
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5, name=name)(x)


class ResBlock(nn.Module):
    out_channels: int
    norm_type: str = "group"
    padding_type: str = "replicate"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _normalize(x, self.norm_type, "norm1")
        h = nn.silu(h)
        h = SamePadConv3d(self.out_channels, 3, padding_type=self.padding_type,
                          dtype=self.dtype, name="conv1")(h)
        h = _normalize(h, self.norm_type, "norm2")
        h = nn.silu(h)
        h = SamePadConv3d(self.out_channels, 3, padding_type=self.padding_type,
                          dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = SamePadConv3d(self.out_channels, 3, padding_type=self.padding_type,
                              dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class CnnEncoder(nn.Module):
    n_hiddens: int
    downsample: Sequence[int] = (4, 8, 8)
    norm_type: str = "group"
    padding_type: str = "replicate"
    dtype: Any = jnp.float32

    @property
    def out_channels(self):
        max_ds = max(int(math.log2(d)) for d in self.downsample)
        return self.n_hiddens * 2 ** max_ds

    @nn.compact
    def __call__(self, x):
        n_times = np.array([int(math.log2(d)) for d in self.downsample])
        max_ds = n_times.max()
        h = SamePadConv3d(self.n_hiddens, 3, padding_type=self.padding_type,
                          dtype=self.dtype, name="conv_first")(x)
        for i in range(max_ds):
            out_ch = self.n_hiddens * 2 ** (i + 1)
            stride = tuple(2 if d > 0 else 1 for d in n_times)
            h = SamePadConv3d(out_ch, 4, stride, padding_type=self.padding_type,
                              dtype=self.dtype, name=f"down{i}")(h)
            h = ResBlock(out_ch, self.norm_type, self.padding_type,
                         dtype=self.dtype, name=f"res{i}")(h)
            n_times = n_times - 1
        h = _normalize(h, self.norm_type, "final_norm")
        return nn.silu(h)


class CnnDecoder(nn.Module):
    n_hiddens: int
    upsample: Sequence[int] = (4, 8, 8)
    image_channel: int = 3
    norm_type: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n_times = np.array([int(math.log2(d)) for d in self.upsample])
        max_us = n_times.max()
        h = _normalize(x, self.norm_type, "final_norm")
        h = nn.silu(h)
        for i in range(max_us):
            out_ch = self.n_hiddens * 2 ** (max_us - i)
            stride = tuple(2 if d > 0 else 1 for d in n_times)
            h = SamePadConvTranspose3d(out_ch, 4, stride, dtype=self.dtype,
                                       name=f"up{i}")(h)
            h = ResBlock(out_ch, self.norm_type, dtype=self.dtype, name=f"res{i}a")(h)
            h = ResBlock(out_ch, self.norm_type, dtype=self.dtype, name=f"res{i}b")(h)
            n_times = n_times - 1
        return SamePadConv3d(self.image_channel, 3, dtype=self.dtype,
                             name="conv_last")(h)


class CnnVQGAN(nn.Module):
    """base.py:38-94 assembly: encoder -> 1x1x1 pre-vq conv -> codebook ->
    1x1x1 post-vq conv -> decoder."""

    cfg: TokenizerConfig
    n_hiddens: int = 512
    downsample: Sequence[int] = (4, 8, 8)

    def setup(self):
        cfg = self.cfg
        self.encoder = CnnEncoder(self.n_hiddens, self.downsample,
                                  cfg.norm_type, name="encoder")
        self.decoder = CnnDecoder(self.n_hiddens, self.downsample,
                                  cfg.image_channels, cfg.norm_type, name="decoder")
        self.pre_vq_conv = SamePadConv3d(cfg.embedding_dim, 1, name="pre_vq_conv")
        self.post_vq_conv = SamePadConv3d(self.encoder.out_channels, 1,
                                          name="post_vq_conv")
        self.codebook = Codebook(
            n_codes=cfg.n_codes, embedding_dim=cfg.embedding_dim,
            no_random_restart=cfg.no_random_restart, restart_thres=cfg.restart_thres)

    def encode(self, x, include_embeddings: bool = False):
        h = self.pre_vq_conv(self.encoder(x))
        vq = self.codebook(h)
        if include_embeddings:
            return vq["embeddings"], vq["encodings"]
        return vq["encodings"]

    def decode(self, encodings):
        z = self.codebook.lookup(encodings)
        return self.decoder(self.post_vq_conv(z))

    def __call__(self, x, training: bool = False, axis_name=None):
        z = self.pre_vq_conv(self.encoder(x))
        vq = self.codebook(z, training=training, axis_name=axis_name)
        x_recon = self.decoder(self.post_vq_conv(vq["embeddings"]))
        return x_recon, vq


# --------------------------------------------------------------------------
# torch -> flax conversion (the reference's TATS-style `VQGAN` checkpoints)
# --------------------------------------------------------------------------

def _conv3d(w):  # torch (O, I, kt, kh, kw) -> flax (kt, kh, kw, I, O)
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convt3d(w):
    """torch ConvTranspose3d (I, O, kt, kh, kw) -> the lhs-dilated-conv
    kernel layout (kt, kh, kw, I, O) with spatially flipped taps (a
    transposed conv is a dilated conv with the flipped kernel)."""
    return np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1))


def convert_cnn_vqgan_state(sd, norm_type: str = "group"):
    """Map a reference `base.VQGAN` state_dict (base.py:38-94 module names:
    encoder.conv_blocks.{i}.{down,res}, decoder.conv_blocks.{i}.{up,res1,res2},
    final_block Sequential index 0 = Normalize, SamePadConv3d '.conv',
    SamePadConvTranspose3d '.convt') onto the CnnVQGAN variable tree."""
    params: dict = {}
    stats: dict = {}
    buffers: dict = {"codebook": {}}

    def put(tree, path, leaf, val):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = jnp.asarray(np.ascontiguousarray(val))

    def put_norm(path, leaf, v):
        if leaf == "weight":
            put(params, path, "scale", v)
        elif leaf == "bias":
            put(params, path, "bias", v)
        elif leaf == "running_mean":
            put(stats, path, "mean", v)
        elif leaf == "running_var":
            put(stats, path, "var", v)
        # num_batches_tracked dropped

    def res_leaf(flax_res, parts, v):
        sub, rest = parts[0], parts[1:]
        if sub in ("norm1", "norm2"):
            put_norm(flax_res + [sub], rest[0], v)
        else:  # conv1/conv2/conv_shortcut -> SamePadConv3d '.conv'
            assert rest[0] == "conv"
            val = _conv3d(v) if rest[1] == "weight" else v
            put(params, flax_res + [sub, "conv"],
                "kernel" if rest[1] == "weight" else "bias", val)

    for k, v in sd.items():
        v = np.asarray(v, np.float32)
        parts = k.split(".")
        root = parts[0]
        if root == "codebook":
            if parts[1] in ("embeddings", "N", "z_avg", "codebook_usage"):
                buffers["codebook"][parts[1]] = jnp.asarray(v)
        elif root in ("pre_vq_conv", "post_vq_conv"):
            assert parts[1] == "conv"
            val = _conv3d(v) if parts[2] == "weight" else v
            put(params, [root, "conv"], "kernel" if parts[2] == "weight" else "bias", val)
        elif root == "encoder":
            if parts[1] == "conv_first":
                val = _conv3d(v) if parts[3] == "weight" else v
                put(params, ["encoder", "conv_first", "conv"],
                    "kernel" if parts[3] == "weight" else "bias", val)
            elif parts[1] == "final_block":
                put_norm(["encoder", "final_norm"], parts[3], v)
            elif parts[1] == "conv_blocks":
                i, sub = parts[2], parts[3]
                if sub == "down":
                    val = _conv3d(v) if parts[5] == "weight" else v
                    put(params, ["encoder", f"down{i}", "conv"],
                        "kernel" if parts[5] == "weight" else "bias", val)
                else:  # res
                    res_leaf(["encoder", f"res{i}"], parts[4:], v)
        elif root == "decoder":
            if parts[1] == "final_block":
                put_norm(["decoder", "final_norm"], parts[3], v)
            elif parts[1] == "conv_last":
                val = _conv3d(v) if parts[3] == "weight" else v
                put(params, ["decoder", "conv_last", "conv"],
                    "kernel" if parts[3] == "weight" else "bias", val)
            elif parts[1] == "conv_blocks":
                i, sub = parts[2], parts[3]
                if sub == "up":  # SamePadConvTranspose3d '.convt'
                    val = _convt3d(v) if parts[5] == "weight" else v
                    put(params, ["decoder", f"up{i}"],
                        "kernel" if parts[5] == "weight" else "bias", val)
                elif sub == "res1":
                    res_leaf(["decoder", f"res{i}a"], parts[4:], v)
                elif sub == "res2":
                    res_leaf(["decoder", f"res{i}b"], parts[4:], v)
        # discriminators / perceptual model are separate trees (utils/inflate)

    cb = buffers["codebook"]
    n_codes = cb["embeddings"].shape[0]
    cb.setdefault("codebook_usage", jnp.zeros((n_codes,), jnp.float32))
    cb["initialized"] = jnp.ones((), jnp.int32)
    cb["call_cnt"] = jnp.ones((), jnp.int32)
    variables = {"params": params, "buffers": buffers}
    if stats:
        variables["batch_stats"] = stats
    return variables


def load_cnn_vqgan_checkpoint(path: str) -> Tuple["CnnVQGAN", dict]:
    """Build a CnnVQGAN + converted variables from a reference Lightning
    ckpt (hparams-embedded args: n_hiddens/downsample/embedding_dim/n_codes,
    base.py:245-269)."""
    from ..utils.checkpoint import load_torch_state_dict

    sd, args = load_torch_state_dict(path)

    def get(name, default):
        return getattr(args, name, default) if args is not None else default

    cfg = TokenizerConfig(
        embedding_dim=get("embedding_dim", 256),
        codebook_dim=get("embedding_dim", 256),
        n_codes=get("n_codes", 2048),
        norm_type=get("norm_type", "group"),
        no_random_restart=get("no_random_restart", False),
        restart_thres=get("restart_thres", 1.0),
    )
    model = CnnVQGAN(cfg, n_hiddens=get("n_hiddens", 240),
                     downsample=tuple(get("downsample", (4, 4, 4))))
    return model, convert_cnn_vqgan_state(sd, cfg.norm_type)
