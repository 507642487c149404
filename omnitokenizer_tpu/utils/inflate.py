"""Weight inflation / cross-stage surgery + discriminator conversion.

Reference: /root/reference/OmniTokenizer/utils.py:11-121 (inflate_gen /
inflate_dis) and the surgery driver in vqgan_train.py:36-99.  All transforms
operate on torch-style state_dict name/ndarray maps BEFORE flax conversion so
the rules stay byte-compatible with the reference recipes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def inflate_gen(sd: Dict[str, np.ndarray], temporal_patch_size: int,
                strategy: str = "average") -> Dict[str, np.ndarray]:
    """image-stage -> video-stage generator inflation (utils.py:11-75):
    build to_patch_emb.* / to_pixels.0.* from the first-frame versions by
    tiling across the temporal patch ('average' divides by pt, 'first'
    zero-pads the non-leading slots)."""
    out = dict(sd)
    pt = temporal_patch_size

    pe0_w = sd["encoder.to_patch_emb_first_frame.1.weight"]
    pe0_b = sd["encoder.to_patch_emb_first_frame.1.bias"]
    pe1_w = sd["encoder.to_patch_emb_first_frame.2.weight"]
    pe1_b = sd["encoder.to_patch_emb_first_frame.2.bias"]
    pe2_w = sd["encoder.to_patch_emb_first_frame.3.weight"]
    pe2_b = sd["encoder.to_patch_emb_first_frame.3.bias"]
    pd0_w = sd["decoder.to_pixels_first_frame.0.weight"]
    pd0_b = sd["decoder.to_pixels_first_frame.0.bias"]

    if strategy == "average":
        tile0 = lambda t: np.concatenate([t / pt] * pt, axis=0)
        tile1 = lambda t: np.concatenate([t / pt] * pt, axis=-1)
    elif strategy == "first":
        tile0 = lambda t: np.concatenate([t] + [np.zeros_like(t)] * (pt - 1), axis=0)
        tile1 = lambda t: np.concatenate([t] + [np.zeros_like(t)] * (pt - 1), axis=-1)
    else:
        raise NotImplementedError(strategy)

    out["encoder.to_patch_emb.1.weight"] = tile0(pe0_w)
    out["encoder.to_patch_emb.1.bias"] = tile0(pe0_b)
    out["encoder.to_patch_emb.2.weight"] = tile1(pe1_w)  # (dim, in) cat on in
    out["encoder.to_patch_emb.2.bias"] = pe1_b
    out["encoder.to_patch_emb.3.weight"] = pe2_w
    out["encoder.to_patch_emb.3.bias"] = pe2_b
    out["decoder.to_pixels.0.weight"] = tile0(pd0_w)  # (out, dim) cat on out
    out["decoder.to_pixels.0.bias"] = tile0(pd0_b)
    return out


def inflate_dis(sd: Dict[str, np.ndarray], strategy: str = "center",
                kt: int = 4) -> Dict[str, np.ndarray]:
    """2D image discriminator -> 3D video discriminator (utils.py:78-121):
    conv kernels (O,I,K,K) -> (O,I,kt,K,K) by 'average' tiling or placing the
    2D kernel at one temporal slot."""
    out = {k: v for k, v in sd.items() if "video_discriminator" not in k}
    for k, v in sd.items():
        if not k.startswith("image_discriminator"):
            continue
        nk = "video_discriminator" + k[len("image_discriminator"):]
        if "weight" in k and v.ndim == 4:
            if strategy == "average":
                nv = np.repeat(v[:, :, None], kt, axis=2) / kt
            else:
                slot = {"center": 1, "first": 0, "last": kt - 1}[strategy]
                nv = np.zeros((v.shape[0], v.shape[1], kt, v.shape[2], v.shape[3]),
                              v.dtype)
                nv[:, :, slot] = v
            out[nk] = nv
        else:
            out[nk] = v
    return out


# --------------------------------------------------------------------------
# discriminator torch -> flax conversion
# --------------------------------------------------------------------------

def convert_discriminator_state(
    sd: Dict[str, np.ndarray], prefix: str, n_layers: int = 3, is_3d: bool = False,
):
    """Map `prefix`.model{n}.{i}.* to the flax NLayerDiscriminator tree.

    Torch Sequential layouts (base.py:450-542): block0 [conv, act]; middle
    blocks [blur/id, conv, norm, act]; penultimate [conv, norm, act]; final
    2D [conv] / 3D [conv, norm, act].  Conv kernels (O,I,*K) -> (*K,I,O).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, name, leaf, val):
        tree.setdefault(name, {})[leaf] = val

    def conv_kernel(v):
        if is_3d:
            return np.transpose(v, (2, 3, 4, 1, 0))
        return np.transpose(v, (2, 3, 1, 0))

    n_blocks = n_layers + 2
    for k, v in sd.items():
        if not k.startswith(prefix + "."):
            continue
        rest = k[len(prefix) + 1:]
        v = np.asarray(v, np.float32)
        if rest.startswith("noise."):
            params["noise"] = {"weight": v}
            continue
        parts = rest.split(".")
        block = int(parts[0][len("model"):])
        idx = int(parts[1])
        leaf = parts[2]
        # which sub-layer is the conv / norm for this block?
        if block == 0:
            conv_idx, norm_idx = 0, None
        elif block < n_layers:
            conv_idx, norm_idx = 1, 2
        elif block == n_layers:
            conv_idx, norm_idx = 0, 1
        else:  # final block
            conv_idx, norm_idx = 0, (1 if is_3d else None)

        if idx == conv_idx:
            if leaf == "weight":
                put(params, f"model{block}_conv", "kernel", conv_kernel(v))
            else:
                put(params, f"model{block}_conv", "bias", v)
        elif norm_idx is not None and idx == norm_idx:
            name = f"model{block}_norm"
            if leaf == "weight":
                params.setdefault(name, {}).setdefault("norm", {})["scale"] = v
            elif leaf == "bias":
                params.setdefault(name, {}).setdefault("norm", {})["bias"] = v
            elif leaf == "running_mean":
                stats.setdefault(name, {}).setdefault("norm", {})["mean"] = v
            elif leaf == "running_var":
                stats.setdefault(name, {}).setdefault("norm", {})["var"] = v
            # num_batches_tracked dropped
    return params, stats


# --------------------------------------------------------------------------
# pretrained-load surgery driver (vqgan_train.py:36-99)
# --------------------------------------------------------------------------

def load_pretrained_into_state(trainer, path: str,
                               init_vgen: Optional[str] = None,
                               init_vdis: Optional[str] = None,
                               no_init_idis: bool = False,
                               seed: int = 0):
    """Build a TokenizerTrainState seeded from a (possibly image-stage)
    torch checkpoint, applying the reference's cross-stage surgery:
      * init_vgen 'average'/'first': inflate patch-embed/to-pixels weights
        to the current temporal_patch_size; 'keep': use ckpt weights as-is;
      * init_vdis 'center'/'average'/'first'/'last': inflate the 2D
        discriminator into the 3D one; 'keep': use ckpt video disc; None:
        fresh video disc;
      * VAE stage: a VQ-stage pre_vq_conv (codebook_dim outputs) cannot seed
        the 2*codebook_dim VAE head and is dropped (vqgan_train.py:57-59).
    """
    from .checkpoint import convert_tokenizer_state, load_torch_state_dict

    cfg = trainer.cfg
    sd, _ = load_torch_state_dict(path)

    if init_vgen and init_vgen != "keep":
        sd = inflate_gen(sd, cfg.temporal_patch_size, strategy=init_vgen)
    if init_vdis and init_vdis != "keep":
        sd = inflate_dis(sd, strategy=init_vdis)

    if cfg.use_vae:
        expected = cfg.codebook_dim * 2
        w = sd.get("pre_vq_conv.1.weight")
        if w is not None and w.shape[0] != expected:
            sd.pop("pre_vq_conv.1.weight", None)
            sd.pop("pre_vq_conv.1.bias", None)

    state = trainer.init_state(seed=seed)
    template = {"params": state.params_g, "buffers": state.buffers}
    variables = convert_tokenizer_state(sd, cfg, template=template, strict=False)

    params_d = dict(state.params_d)
    stats_d = dict(state.batch_stats_d)
    if not no_init_idis:
        p, s = convert_discriminator_state(
            sd, "image_discriminator", trainer.loss_cfg.disc_layers, is_3d=False)
        if p:
            params_d["image"] = _merge_partial(params_d["image"], p)
            stats_d["image"] = _merge_partial(stats_d["image"], s)
    if init_vdis is not None:
        p, s = convert_discriminator_state(
            sd, "video_discriminator", trainer.loss_cfg.disc_layers, is_3d=True)
        if p:
            params_d["video"] = _merge_partial(params_d["video"], p)
            stats_d["video"] = _merge_partial(stats_d["video"], s)

    return state.replace(
        params_g=variables["params"], buffers=variables["buffers"],
        params_d=params_d, batch_stats_d=stats_d,
    )


def _merge_partial(template, loaded):
    """Recursively overwrite template leaves present in `loaded` (shape-checked)."""
    import jax.numpy as jnp

    if not isinstance(template, dict):
        return template
    out = {}
    for k, tv in template.items():
        if k in loaded:
            lv = loaded[k]
            if isinstance(tv, dict):
                out[k] = _merge_partial(tv, lv)
            else:
                assert tuple(lv.shape) == tuple(tv.shape), \
                    f"shape mismatch for {k}: {lv.shape} vs {tv.shape}"
                out[k] = jnp.asarray(lv, tv.dtype)
        else:
            out[k] = tv
    return out
