"""Checkpoint IO: torch Lightning .ckpt -> flax variables converter, plus
native msgpack save/load.

The released OmniTokenizer checkpoints are Lightning dicts
{"state_dict", "hyper_parameters": {"args": argparse.Namespace}}
(/root/reference/OmniTokenizer/omnitokenizer.py:208).  `config_from_args`
reproduces the reference's hasattr-defaulting (:70-237) so any released ckpt
self-describes its architecture; `convert_tokenizer_state` maps every
state_dict tensor onto the flax tree (Linear weights transposed, depthwise
Conv3d kernels laid out (kt,kh,kw,1,dim), codebook buffers copied verbatim).
"""

from __future__ import annotations

import dataclasses
import io
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization
from flax.core import freeze, unfreeze

from ..config import TokenizerConfig


# --------------------------------------------------------------------------
# torch .ckpt reading
# --------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], Any]:
    """Returns (state_dict as numpy, hparams-args namespace or None)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in ckpt:
        sd = ckpt["state_dict"]
        args = None
        hp = ckpt.get("hyper_parameters", {})
        if isinstance(hp, dict) and "args" in hp:
            args = hp["args"]
    else:
        sd, args = ckpt, None
    sd_np = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
             for k, v in sd.items()}
    return sd_np, args


def config_from_args(args: Any) -> TokenizerConfig:
    """Map a reference argparse namespace to TokenizerConfig, reproducing the
    hasattr defaults of omnitokenizer.py:70-237."""

    def get(name, default):
        return getattr(args, name, default)

    spatial_depth = get("spatial_depth", 4)
    return TokenizerConfig(
        embedding_dim=get("embedding_dim", 512),
        n_codes=get("n_codes", 8192),
        codebook_dim=get("codebook_dim", 8),
        resolution=get("resolution", 256),
        sequence_length=get("sequence_length", 17),
        image_channels=get("image_channels", 3),
        patch_embed=get("patch_embed", "linear"),
        patch_size=get("patch_size", 8),
        temporal_patch_size=get("temporal_patch_size", 2),
        defer_temporal_pool=get("defer_temporal_pool", False),
        defer_spatial_pool=get("defer_spatial_pool", False),
        enc_block=get("enc_block", "t" * spatial_depth),
        dec_block=get("dec_block", "t" * spatial_depth),
        spatial_depth=spatial_depth,
        temporal_depth=get("temporal_depth", 4),
        twod_window_size=get("twod_window_size", 4),
        spatial_pos=get("spatial_pos", "rel"),
        causal_in_temporal_transformer=get("causal_in_temporal_transformer", False),
        causal_in_peg=get("causal_in_peg", False),
        dim_head=get("dim_head", 64),
        heads=get("heads", 8),
        ff_mult=get("ff_mult", 4.0),
        norm_type=get("norm_type", "group"),
        gen_upscale=get("gen_upscale", None),
        use_vae=get("use_vae", False),
        l2_code=get("l2_code", False),
        use_external_codebook=get("use_external_codebook", False),
        no_random_restart=get("no_random_restart", False),
        restart_thres=get("restart_thres", 1.0),
        commitment_weight=get("commitment_weight", 0.25),
        kl_weight=get("kl_weight", 1e-6),
    )


# --------------------------------------------------------------------------
# name mapping
# --------------------------------------------------------------------------

def _t(w):  # torch Linear weight -> flax Dense kernel
    return np.ascontiguousarray(w.T)


def _conv3d_dw(w):  # (dim, 1, kt, kh, kw) -> (kt, kh, kw, 1, dim)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _conv3d(w):  # torch Conv3d (O, I, kt, kh, kw) -> flax (kt, kh, kw, I, O)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _map_cnn_norm(base_path, leaf):
    """SyncBatchNorm/GroupNorm inside a cnn patch-embed Sequential
    (omnitokenizer.py:823-838 + base.py:272-277) -> _CnnNormalize('norm')."""
    if leaf == "weight":
        return (base_path + ["norm", "scale"], None)
    if leaf == "bias":
        return (base_path + ["norm", "bias"], None)
    if leaf == "running_mean":
        return (["__batch_stats__"] + base_path + ["norm", "mean"], None)
    if leaf == "running_var":
        return (["__batch_stats__"] + base_path + ["norm", "var"], None)
    if leaf == "num_batches_tracked":
        return None, None
    raise KeyError(f"unmapped cnn-norm leaf {leaf}")


def _map_transformer_key(parts, block_str):
    """['layers', i, j, ...rest] inside a Transformer -> (flax path, tf)."""
    i = int(parts[1])
    j = parts[2]
    rest = parts[3:]
    blk = block_str[i]
    if j == "0":  # PEG
        assert rest[0] == "dsconv"
        leaf = {"weight": "kernel", "bias": "bias"}[rest[1]]
        return ([f"layers_{i}_peg", f"dsconv_{leaf}"],
                "dwconv" if rest[1] == "weight" else None)
    if j == "1":  # self-attn / window-attn / pool / up
        base = f"layers_{i}_attn"
        if blk == "t":
            if rest[0] == "norm":
                if rest[1] == "beta":
                    return None, None  # frozen zero buffer
                return ([base, "norm_gamma"], None)
            if rest[0] == "context_norm":
                return None, None  # unused in self-attention
            if rest[0] in ("to_q", "to_kv", "to_out"):
                return ([base, f"{rest[0]}_kernel"], "T")
            if rest[0] in ("q_scale", "k_scale"):
                return ([base, rest[0]], None)
            if rest[0] == "spatial_rel_pos_bias":
                # net.0.0 / net.1.0 / net.2
                layer = {"0": "net0", "1": "net1", "2": "net2"}[rest[2]]
                leaf = rest[-1]
                return ([base, "spatial_rel_pos_bias", layer,
                         {"weight": "kernel", "bias": "bias"}[leaf]],
                        "T" if leaf == "weight" else None)
        elif blk == "w":
            if rest[0] == "norm":
                if rest[1] == "beta":
                    return None, None
                return ([base, "norm", "gamma"], None)
            if rest[0] == "relative_position_bias_table":
                return ([base, "relative_position_bias_table"], None)
            if rest[0] == "relative_position_index":
                return None, None  # static buffer, recomputed
            if rest[0] in ("qkv", "proj"):
                leaf = {"weight": "kernel", "bias": "bias"}[rest[1]]
                return ([base, rest[0], leaf], "T" if leaf == "kernel" else None)
        elif blk == "l":
            leaf = {"weight": "kernel", "bias": "bias"}[rest[-1]]
            return ([base, "pool", leaf], "T" if leaf == "kernel" else None)
        elif blk == "r":
            leaf = {"weight": "kernel", "bias": "bias"}[rest[-1]]
            return ([base, "up", leaf], "T" if leaf == "kernel" else None)
        raise KeyError(f"unmapped attn key {parts}")
    if j == "3":  # FeedForward Sequential: 0 LayerNorm, 1 Linear, 4 Linear
        sub = rest[0]
        leaf = rest[1]
        if sub == "0":
            return ([f"layers_{i}_ff", f"norm_{leaf}"], None)
        if sub == "1":
            return ([f"layers_{i}_ff", "proj_in_kernel"], "T")
        if sub == "4":
            return ([f"layers_{i}_ff", "proj_out_kernel"], "T")
    raise KeyError(f"unmapped transformer key {parts}")


def map_tokenizer_key(key: str, cfg: TokenizerConfig):
    """torch state_dict key -> (flax path list or None-to-skip, transform)."""
    parts = key.split(".")
    root = parts[0]

    skip_roots = ("image_discriminator", "video_discriminator", "perceptual_model")
    if root in skip_roots:
        return None, None

    if root == "codebook":
        name = parts[1]
        if name in ("embeddings", "N", "z_avg", "codebook_usage"):
            return (["__buffers__", "codebook", name], None)
        return None, None

    if root in ("pre_vq_conv", "post_vq_conv"):
        # Sequential: 0 Rearrange, 1 Linear, 2 Rearrange
        leaf = {"weight": "kernel", "bias": "bias"}[parts[2]]
        return ([root, leaf], "T" if leaf == "kernel" else None)

    if root in ("encoder", "decoder"):
        sub = parts[1]
        if sub in ("to_patch_emb_first_frame", "to_patch_emb"):
            idx, leaf = parts[2], parts[3]
            if cfg.patch_embed == "cnn":
                # Sequential: 0 Conv3d, 1 Normalize, 2 Rearrange
                # (omnitokenizer.py:823-838)
                if idx == "0":
                    if leaf == "weight":
                        return ([root, f"{sub}_conv", "kernel"], "conv3d")
                    return ([root, f"{sub}_conv", "bias"], None)
                if idx == "1":
                    path, tf = _map_cnn_norm([f"{sub}_cnorm"], leaf)
                    if path is None:
                        return None, None
                    if path[0] == "__batch_stats__":
                        return ([path[0], root] + path[1:], tf)
                    return ([root] + path, tf)
            if idx in ("1", "3"):  # LayerNorms around the patch Linear
                name = f"{sub}_norm1" if idx == "1" else f"{sub}_norm2"
                return ([root, name, leaf], None)
            if idx == "2":  # the patch Linear
                fl = "kernel" if leaf == "weight" else "bias"
                return ([root, f"{sub}_proj", fl], "T" if leaf == "weight" else None)
        if sub in ("to_pixels_first_frame", "to_pixels"):
            if cfg.patch_embed == "cnn":
                # Sequential: 0 Rearrange, 1 ConvTranspose3d, 2 Normalize
                # (omnitokenizer.py:1019-1035); our decoder keeps the torch
                # ConvTranspose3d kernel layout (dim, C, kt, p, p) verbatim
                idx, leaf = parts[2], parts[3]
                if idx == "1":
                    if leaf == "weight":
                        return ([root, f"{sub}_conv_kernel"], None)
                    return ([root, f"{sub}_conv_bias"], None)
                if idx == "2":
                    path, tf = _map_cnn_norm([f"{sub}_conv_cnorm"], leaf)
                    if path is None:
                        return None, None
                    if path[0] == "__batch_stats__":
                        return ([path[0], root] + path[1:], tf)
                    return ([root] + path, tf)
            leaf = {"weight": "kernel", "bias": "bias"}[parts[3]]
            return ([root, sub, leaf], "T" if leaf == "kernel" else None)
        if sub.endswith("_transformer"):
            block = cfg.enc_block if root == "encoder" else cfg.dec_block
            if "temporal" in sub:
                block = "t" * cfg.temporal_depth
            if parts[2] == "norm_out":
                if parts[3] == "beta":
                    return None, None
                return ([root, sub, "norm_out", "gamma"], None)
            path, tf = _map_transformer_key(parts[2:], block)
            if path is None:
                return None, None
            return ([root, sub] + path, tf)
        if sub in ("temporal_pool", "spatial_pool", "temporal_up", "spatial_up"):
            return None, None  # parameter-free
    raise KeyError(f"unmapped tokenizer key: {key}")


def _apply_tf(val: np.ndarray, tf: Optional[str]) -> np.ndarray:
    if tf is None:
        return val
    if tf == "T":
        return _t(val)
    if tf == "dwconv":
        return _conv3d_dw(val)
    if tf == "conv3d":
        return _conv3d(val)
    raise ValueError(tf)


def convert_tokenizer_state(
    sd: Dict[str, np.ndarray],
    cfg: TokenizerConfig,
    template: Optional[Dict[str, Any]] = None,
    strict: bool = False,
) -> Dict[str, Any]:
    """Build flax variables {'params', 'buffers'} from a torch state_dict.

    If `template` (an init()-produced variables dict) is given, shapes are
    validated against it and any template leaves missing from the torch side
    keep their init values (strict=False mirrors Lightning strict=False).
    """
    params: Dict[str, Any] = {}
    buffers: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def insert(tree, path, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(val)

    unmapped = []
    for key, val in sd.items():
        try:
            path, tf = map_tokenizer_key(key, cfg)
        except KeyError:
            unmapped.append(key)
            continue
        if path is None:
            continue
        val = _apply_tf(np.asarray(val, np.float32), tf)
        if path[0] == "__buffers__":
            insert(buffers, path[1:], val)
        elif path[0] == "__batch_stats__":
            insert(batch_stats, path[1:], val)
        else:
            insert(params, path, val)

    if unmapped and strict:
        raise KeyError(f"unmapped torch keys: {unmapped[:10]} (+{max(0, len(unmapped)-10)} more)")

    if "codebook" in buffers:
        buffers["codebook"]["initialized"] = jnp.ones((), jnp.int32)
        buffers["codebook"]["call_cnt"] = jnp.ones((), jnp.int32)

    variables = {"params": params, "buffers": buffers}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    if template is not None:
        variables = _merge_into_template(template, variables, strict=strict)
    return variables


def _merge_into_template(template, loaded, strict=False):
    template = unfreeze(template)

    def merge(tpl, src, path=""):
        out = {}
        for k, tv in tpl.items():
            p = f"{path}/{k}"
            if isinstance(tv, dict):
                out[k] = merge(tv, src.get(k, {}), p)
            else:
                if k in src:
                    sv = src[k]
                    if sv.shape != tv.shape:
                        raise ValueError(f"shape mismatch at {p}: ckpt {sv.shape} vs model {tv.shape}")
                    out[k] = sv.astype(tv.dtype)
                else:
                    if strict:
                        raise KeyError(f"missing ckpt value for {p}")
                    out[k] = tv
        return out

    out = {}
    for col in template:
        out[col] = merge(template[col], loaded.get(col, {}), col)
    return out


# --------------------------------------------------------------------------
# top-level load / native save
# --------------------------------------------------------------------------

def load_tokenizer_checkpoint(
    path: str,
    cfg: Optional[TokenizerConfig] = None,
    strict: bool = False,
) -> Tuple[TokenizerConfig, Dict[str, Any]]:
    from ..models.tokenizer import OmniTokenizerNet

    if path.endswith(".msgpack"):
        if cfg is None and os.path.exists(_cfg_sidecar_path(path)):
            import json

            with open(_cfg_sidecar_path(path)) as f:
                cfg = config_from_json(json.load(f))
        assert cfg is not None, \
            "native checkpoint without a .cfg.json sidecar needs an explicit config"
        from ..models.wrapper import OmniTokenizerVQGAN

        tmp = OmniTokenizerVQGAN.from_config(cfg)
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        if "params_g" in raw:
            # full training-state checkpoint (training/loop.save_state) —
            # extract the generator variables, like the reference evaluating
            # straight from a Lightning training ckpt
            raw = {"params": raw["params_g"], "buffers": raw["buffers"]}
        variables = serialization.from_state_dict(tmp.variables, raw)
        return cfg, variables

    sd, args = load_torch_state_dict(path)
    if cfg is None:
        if args is None:
            raise ValueError("checkpoint has no embedded hparams; pass cfg explicitly")
        cfg = config_from_args(args)

    from ..models.wrapper import OmniTokenizerVQGAN

    template = OmniTokenizerVQGAN.from_config(cfg).variables
    variables = convert_tokenizer_state(sd, cfg, template=template, strict=strict)
    return cfg, variables


def _cfg_sidecar_path(path: str) -> str:
    return path + ".cfg.json"


def config_to_json(cfg: TokenizerConfig) -> dict:
    d = dataclasses.asdict(cfg)
    d["dtype"] = jnp.dtype(cfg.dtype).name
    return d


def config_from_json(d: dict) -> TokenizerConfig:
    d = dict(d)
    d["dtype"] = jnp.dtype(d.get("dtype", "float32"))
    return TokenizerConfig(**d)


def save_tokenizer_checkpoint(path: str, variables: Dict[str, Any],
                              cfg: Optional[TokenizerConfig] = None):
    """Native msgpack save.  With `cfg`, a JSON sidecar (<path>.cfg.json)
    makes the checkpoint self-describing — the analogue of the reference's
    hparams namespace embedded in Lightning ckpts (omnitokenizer.py:208),
    so `load_from_checkpoint(path)` needs no explicit config."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(variables))
    if cfg is not None:
        import json

        with open(_cfg_sidecar_path(path), "w") as f:
            json.dump(config_to_json(cfg), f, indent=1)
