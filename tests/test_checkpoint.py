"""Checkpoint-converter coverage: generate a synthetic torch state_dict with
the reference's exact naming scheme, convert it, and prove every flax
parameter leaf was filled from the torch side (no silent init leftovers)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from omnitokenizer_tpu import OmniTokenizerVQGAN, TokenizerConfig
from omnitokenizer_tpu.utils.checkpoint import convert_tokenizer_state

SMALL = TokenizerConfig(
    embedding_dim=32, n_codes=64, codebook_dim=8, resolution=32,
    sequence_length=5, patch_size=4, temporal_patch_size=2,
    enc_block="tw", dec_block="tt", spatial_depth=2, temporal_depth=2,
    twod_window_size=4, dim_head=8, heads=4, spatial_pos="rope",
)

FILL = 7.0


def _t(shape):
    return np.full(shape, FILL, np.float32)


def synthetic_torch_state_dict(cfg: TokenizerConfig):
    """Emit the torch state_dict keys the reference model would produce for
    this config (linear patch embed, EMA codebook)."""
    d = cfg.embedding_dim
    dh, H = cfg.dim_head, cfg.heads
    inner = dh * H
    ff_inner = int(cfg.ff_mult * 2 / 3 * d)
    p, pt, c = cfg.patch_size, cfg.temporal_patch_size, cfg.image_channels
    ws = cfg.twod_window_size
    sd = {}

    def attn_keys(prefix, spatial_pos):
        sd[f"{prefix}.norm.gamma"] = _t((d,))
        sd[f"{prefix}.norm.beta"] = np.zeros((d,), np.float32)
        sd[f"{prefix}.context_norm.gamma"] = _t((d,))
        sd[f"{prefix}.context_norm.beta"] = np.zeros((d,), np.float32)
        sd[f"{prefix}.to_q.weight"] = _t((inner, d))
        sd[f"{prefix}.to_kv.weight"] = _t((2 * inner, d))
        sd[f"{prefix}.to_out.weight"] = _t((d, inner))
        sd[f"{prefix}.q_scale"] = _t((dh,))
        sd[f"{prefix}.k_scale"] = _t((dh,))
        if spatial_pos == "rel":
            sd[f"{prefix}.spatial_rel_pos_bias.net.0.0.weight"] = _t((d, 2))
            sd[f"{prefix}.spatial_rel_pos_bias.net.0.0.bias"] = _t((d,))
            sd[f"{prefix}.spatial_rel_pos_bias.net.1.0.weight"] = _t((d, d))
            sd[f"{prefix}.spatial_rel_pos_bias.net.1.0.bias"] = _t((d,))
            sd[f"{prefix}.spatial_rel_pos_bias.net.2.weight"] = _t((H, d))
            sd[f"{prefix}.spatial_rel_pos_bias.net.2.bias"] = _t((H,))

    def window_keys(prefix):
        sd[f"{prefix}.norm.gamma"] = _t((d,))
        sd[f"{prefix}.norm.beta"] = np.zeros((d,), np.float32)
        sd[f"{prefix}.relative_position_bias_table"] = _t(((2 * ws - 1) ** 2, H))
        sd[f"{prefix}.relative_position_index"] = np.zeros((ws * ws, ws * ws), np.int64)
        sd[f"{prefix}.qkv.weight"] = _t((3 * d, d))
        sd[f"{prefix}.proj.weight"] = _t((d, d))
        sd[f"{prefix}.proj.bias"] = _t((d,))

    def ff_keys(prefix):
        sd[f"{prefix}.0.weight"] = _t((d,))
        sd[f"{prefix}.0.bias"] = _t((d,))
        sd[f"{prefix}.1.weight"] = _t((2 * ff_inner, d))
        sd[f"{prefix}.4.weight"] = _t((d, ff_inner))

    def transformer_keys(prefix, block, spatial_pos):
        for i, blk in enumerate(block):
            if blk == "t":
                sd[f"{prefix}.layers.{i}.0.dsconv.weight"] = _t((d, 1, 3, 3, 3))
                sd[f"{prefix}.layers.{i}.0.dsconv.bias"] = _t((d,))
                attn_keys(f"{prefix}.layers.{i}.1", spatial_pos)
            elif blk == "w":
                window_keys(f"{prefix}.layers.{i}.1")
            ff_keys(f"{prefix}.layers.{i}.3")
        sd[f"{prefix}.norm_out.gamma"] = _t((d,))
        sd[f"{prefix}.norm_out.beta"] = np.zeros((d,), np.float32)

    # patch embeds (Sequential indices 1..3)
    sd["encoder.to_patch_emb_first_frame.1.weight"] = _t((c * p * p,))
    sd["encoder.to_patch_emb_first_frame.1.bias"] = _t((c * p * p,))
    sd["encoder.to_patch_emb_first_frame.2.weight"] = _t((d, c * p * p))
    sd["encoder.to_patch_emb_first_frame.2.bias"] = _t((d,))
    sd["encoder.to_patch_emb_first_frame.3.weight"] = _t((d,))
    sd["encoder.to_patch_emb_first_frame.3.bias"] = _t((d,))
    sd["encoder.to_patch_emb.1.weight"] = _t((c * pt * p * p,))
    sd["encoder.to_patch_emb.1.bias"] = _t((c * pt * p * p,))
    sd["encoder.to_patch_emb.2.weight"] = _t((d, c * pt * p * p))
    sd["encoder.to_patch_emb.2.bias"] = _t((d,))
    sd["encoder.to_patch_emb.3.weight"] = _t((d,))
    sd["encoder.to_patch_emb.3.bias"] = _t((d,))

    transformer_keys("encoder.enc_spatial_transformer", cfg.enc_block, cfg.spatial_pos)
    transformer_keys("encoder.enc_temporal_transformer", "t" * cfg.temporal_depth, "rel")
    transformer_keys("decoder.dec_spatial_transformer", cfg.dec_block, cfg.spatial_pos)
    transformer_keys("decoder.dec_temporal_transformer", "t" * cfg.temporal_depth, "rel")

    sd["decoder.to_pixels_first_frame.0.weight"] = _t((c * p * p, d))
    sd["decoder.to_pixels_first_frame.0.bias"] = _t((c * p * p,))
    sd["decoder.to_pixels.0.weight"] = _t((c * pt * p * p, d))
    sd["decoder.to_pixels.0.bias"] = _t((c * pt * p * p,))

    sd["pre_vq_conv.1.weight"] = _t((cfg.codebook_dim, d))
    sd["pre_vq_conv.1.bias"] = _t((cfg.codebook_dim,))
    sd["post_vq_conv.1.weight"] = _t((d, cfg.codebook_dim))
    sd["post_vq_conv.1.bias"] = _t((d,))

    sd["codebook.embeddings"] = np.random.RandomState(0).randn(
        cfg.n_codes, cfg.codebook_dim).astype(np.float32)
    sd["codebook.N"] = np.ones((cfg.n_codes,), np.float32)
    sd["codebook.z_avg"] = sd["codebook.embeddings"].copy()
    sd["codebook.codebook_usage"] = np.zeros((cfg.n_codes,), np.float32)

    # things the converter must skip
    sd["image_discriminator.model0.0.weight"] = _t((64, 3, 4, 4))
    sd["video_discriminator.model0.0.weight"] = _t((64, 3, 4, 4, 4))
    sd["perceptual_model.lin0.model.1.weight"] = _t((1, 64, 1, 1))
    return sd


def test_converter_fills_every_param_leaf():
    wrapper = OmniTokenizerVQGAN.from_config(SMALL, seed=0)
    template = wrapper.variables
    sd = synthetic_torch_state_dict(SMALL)
    variables = convert_tokenizer_state(sd, SMALL, template=template, strict=True)

    unfilled = []

    def walk(node, path):
        for k, v in node.items():
            p = f"{path}/{k}"
            if isinstance(v, dict):
                walk(v, p)
            else:
                if not np.allclose(np.asarray(v), FILL):
                    unfilled.append(p)

    walk(variables["params"], "params")
    assert unfilled == [], f"param leaves not filled from torch ckpt: {unfilled}"

    cb = variables["buffers"]["codebook"]
    np.testing.assert_array_equal(np.asarray(cb["embeddings"]), sd["codebook.embeddings"])
    assert int(cb["initialized"]) == 1


def test_converted_model_runs():
    wrapper = OmniTokenizerVQGAN.from_config(SMALL, seed=0)
    sd = synthetic_torch_state_dict(SMALL)
    variables = convert_tokenizer_state(sd, SMALL, template=wrapper.variables)
    model = OmniTokenizerVQGAN(SMALL, variables)
    x = np.random.RandomState(0).randn(1, 3, 32, 32).astype(np.float32) * 0.2
    enc = model.encode(x, is_image=True)
    rec = model.decode(enc, is_image=True)
    assert rec.shape == (1, 3, 32, 32)
    assert np.all(np.isfinite(np.asarray(rec)))


def test_transpose_semantics():
    """Linear weights must be transposed, depthwise conv kernels relaid."""
    wrapper = OmniTokenizerVQGAN.from_config(SMALL, seed=0)
    sd = synthetic_torch_state_dict(SMALL)
    w = np.arange(8 * 32, dtype=np.float32).reshape(8, 32)
    sd["pre_vq_conv.1.weight"] = w
    dw = np.arange(32 * 27, dtype=np.float32).reshape(32, 1, 3, 3, 3)
    sd["encoder.enc_spatial_transformer.layers.0.0.dsconv.weight"] = dw

    variables = convert_tokenizer_state(sd, SMALL, template=wrapper.variables)
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["pre_vq_conv"]["kernel"]), w.T)
    got = np.asarray(
        variables["params"]["encoder"]["enc_spatial_transformer"]["layers_0_peg"]["dsconv_kernel"])
    np.testing.assert_array_equal(got, np.transpose(dw, (2, 3, 4, 1, 0)))


def test_native_msgpack_roundtrip(tmp_path):
    from omnitokenizer_tpu.utils.checkpoint import (
        load_tokenizer_checkpoint,
        save_tokenizer_checkpoint,
    )

    wrapper = OmniTokenizerVQGAN.from_config(SMALL, seed=3)
    path = str(tmp_path / "tok.msgpack")
    save_tokenizer_checkpoint(path, wrapper.variables)
    cfg2, variables2 = load_tokenizer_checkpoint(path, cfg=SMALL)
    a = jax.tree_util.tree_leaves(wrapper.variables)
    b = jax.tree_util.tree_leaves(variables2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
