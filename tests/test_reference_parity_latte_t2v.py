"""True-oracle parity for LatteT2V: the ACTUAL reference
Diffusion/Latte/models/latte_t2v.py runs on CPU via the faithful
diffusers-0.24 primitive stub (tests/diffusers_stub.py) and must agree with
omnitokenizer_tpu/models/latte_t2v.py on converted weights.

Covered: plain T2V forward with caption mask, enable_temporal_attentions
off, the joint image-video training path (4-dim captions + 3-dim masks,
temporal bypass), and both shipped FF/bias flavors (PixArt
gelu-approximate+bias and geglu no-bias)."""

import importlib
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusers_stub import install_diffusers_stub

D_MODELS = "/root/reference/Diffusion/Latte/models"


def _ref_module():
    install_diffusers_stub()
    if D_MODELS not in sys.path:
        sys.path.insert(0, D_MODELS)
    return importlib.import_module("latte_t2v")


COMMON = dict(num_attention_heads=4, attention_head_dim=16, in_channels=4,
              out_channels=8, num_layers=2, cross_attention_dim=64,
              sample_size=16, patch_size=2, norm_elementwise_affine=False,
              norm_eps=1e-6, caption_channels=24, video_length=4)


def _build_pair(activation_fn="gelu-approximate", attention_bias=True):
    mod = _ref_module()
    torch.manual_seed(80)
    ref = mod.LatteT2V(norm_type="ada_norm_single", dropout=0.0,
                       activation_fn=activation_fn,
                       attention_bias=attention_bias, **COMMON)
    g = torch.Generator().manual_seed(81)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    from omnitokenizer_tpu.models.latte_t2v import (LatteT2V, LatteT2VConfig,
                                                    convert_latte_t2v_state)

    cfg = LatteT2VConfig(activation_fn=activation_fn,
                         attention_bias=attention_bias, **COMMON)
    params = convert_latte_t2v_state(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    return ref, LatteT2V(cfg), params


def _ours(model, params, *args, **kw):
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, *args, **kw)
    # ours: (B, F, H, W, C) channels-last -> torch (B, C, F, H, W)
    return np.transpose(np.asarray(out), (0, 4, 1, 2, 3))


def _inputs(B=2, F=4, img=0, L=7, seed=82):
    g = torch.Generator().manual_seed(seed)
    x = torch.randn(B, 4, F + img, 16, 16, generator=g)
    t = torch.tensor([3, 77][:B])
    if img:
        cap = torch.randn(B, 1 + img, L, COMMON["caption_channels"], generator=g)
        mask = torch.ones(B, 1 + img, L)
        mask[:, 0, 5:] = 0  # video caption padded
        mask[:, 1:, 4:] = 0  # image captions padded differently
    else:
        cap = torch.randn(B, L, COMMON["caption_channels"], generator=g)
        mask = torch.ones(B, L)
        mask[:, 5:] = 0
    return x, t, cap, mask


@pytest.mark.slow
@pytest.mark.parametrize("activation_fn,attention_bias",
                         [("gelu-approximate", True), ("geglu", False)])
def test_t2v_forward_parity(activation_fn, attention_bias):
    """latte_t2v.py:684-941 plain video path: caption cross-attn with key
    mask, temporal self-attn with temp_pos_embed at block 0."""
    ref, ours, params = _build_pair(activation_fn, attention_bias)
    ref.eval()
    x, t, cap, mask = _inputs()
    with torch.no_grad():
        out_t = ref(x, t, encoder_hidden_states=cap,
                    encoder_attention_mask=mask, return_dict=False)[0].numpy()
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    out_j = _ours(ours, params, xj, jnp.asarray(t.numpy()),
                  encoder_hidden_states=jnp.asarray(cap.numpy()),
                  encoder_attention_mask=jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(out_j, out_t, atol=3e-5, rtol=1e-4)


@pytest.mark.slow
def test_t2v_spatial_only_parity():
    """enable_temporal_attentions=False: spatial-only graph (:816 flag)."""
    ref, ours, params = _build_pair()
    ref.eval()
    x, t, cap, mask = _inputs(seed=83)
    with torch.no_grad():
        out_t = ref(x, t, encoder_hidden_states=cap,
                    encoder_attention_mask=mask,
                    enable_temporal_attentions=False,
                    return_dict=False)[0].numpy()
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    out_j = _ours(ours, params, xj, jnp.asarray(t.numpy()),
                  encoder_hidden_states=jnp.asarray(cap.numpy()),
                  encoder_attention_mask=jnp.asarray(mask.numpy()),
                  enable_temporal_attentions=False)
    np.testing.assert_allclose(out_j, out_t, atol=3e-5, rtol=1e-4)


@pytest.mark.slow
def test_t2v_joint_image_video_parity():
    """Joint training path (:791-801 caption split, :869-887 temporal
    bypass — incl. the reference quirk that temp_pos_embed is never added
    in this branch): trailing use_image_num frames carry their own
    captions/masks and skip temporal blocks."""
    use_image_num = 2
    ref, ours, params = _build_pair()
    ref.train()
    x, t, cap, mask = _inputs(img=use_image_num, seed=84)
    with torch.no_grad():
        out_t = ref(x, t, encoder_hidden_states=cap,
                    encoder_attention_mask=mask, use_image_num=use_image_num,
                    return_dict=False)[0].numpy()
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    out_j = _ours(ours, params, xj, jnp.asarray(t.numpy()),
                  encoder_hidden_states=jnp.asarray(cap.numpy()),
                  encoder_attention_mask=jnp.asarray(mask.numpy()),
                  use_image_num=use_image_num, train=True)
    np.testing.assert_allclose(out_j, out_t, atol=3e-5, rtol=1e-4)
