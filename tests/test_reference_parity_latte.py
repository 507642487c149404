"""TRUE-ORACLE Latte parity: the actual vendored Latte
(/root/reference/Diffusion/Latte/models/latte.py, against the faithful timm
stub) with random weights, converted by models/latte.convert_latte_state,
must match our flax Latte forward — paired spatial/temporal blocks, the
one-time temporal sincos add, per-frame/per-patch conditioning repeats,
extras 1/2/78, and the CFG 4-channel split.
"""

import importlib
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
from reference_oracle import install_stubs  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _ref_latte_module():
    install_stubs()
    path = "/root/reference/Diffusion/Latte/models"
    if path not in sys.path:
        sys.path.insert(0, path)
    return importlib.import_module("latte")


def _build_pair(extras=1, in_channels=4, num_classes=10, frames=4):
    latte_mod = _ref_latte_module()
    torch.manual_seed(60)
    ref = latte_mod.Latte(input_size=16, patch_size=2, in_channels=in_channels,
                          hidden_size=64, depth=4, num_heads=4,
                          num_frames=frames, class_dropout_prob=0.1,
                          num_classes=num_classes, extras=extras).eval()
    g = torch.Generator().manual_seed(61)
    with torch.no_grad():
        for p in ref.parameters():
            if p.requires_grad:
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    from omnitokenizer_tpu.models.latte import Latte, LatteConfig, convert_latte_state

    cfg = LatteConfig(input_size=16, patch_size=2, in_channels=in_channels,
                      hidden_size=64, depth=4, num_heads=4, num_frames=frames,
                      num_classes=num_classes, extras=extras)
    params = convert_latte_state(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    return ref, Latte(cfg), params


def _run_ours(ours, params, x, t, y=None, text=None):
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 1, 3, 4, 2)))  # b f c h w -> b f h w c
    kw = {}
    if y is not None:
        kw["y"] = jnp.asarray(y.numpy())
    if text is not None:
        kw["text_embedding"] = jnp.asarray(text.numpy())
    out = ours.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                     xj, jnp.asarray(t.numpy()), **kw)
    return np.transpose(np.asarray(out), (0, 1, 4, 2, 3))  # back to b f c h w


@pytest.mark.slow
@pytest.mark.parametrize("extras", [1, 2, 78])
def test_latte_forward_parity(extras):
    ref, ours, params = _build_pair(extras=extras)
    g = torch.Generator().manual_seed(62)
    x = torch.randn(2, 4, 4, 16, 16, generator=g)  # (B, F, C, H, W)
    t = torch.tensor([3, 77])
    y = torch.tensor([1, 7]) if extras == 2 else None
    text = torch.randn(2, 77, 768, generator=g) * 0.1 if extras == 78 else None
    with torch.no_grad():
        out_t = ref(x, t, y=y, text_embedding=text).numpy()
    out_j = _run_ours(ours, params, x, t, y=y, text=text)
    np.testing.assert_allclose(out_j, out_t, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_latte_cfg_forward_parity():
    ref, ours, params = _build_pair(extras=2)
    g = torch.Generator().manual_seed(63)
    half = torch.randn(1, 4, 4, 16, 16, generator=g)
    x = torch.cat([half, half], 0)
    t = torch.tensor([5, 5])
    y = torch.tensor([3, 10])
    with torch.no_grad():
        out_t = ref.forward_with_cfg(x, t, y=y, cfg_scale=4.0).numpy()

    from omnitokenizer_tpu.models.latte import forward_with_cfg

    pj = jax.tree_util.tree_map(jnp.asarray, params)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 1, 3, 4, 2)))

    def apply_fn(p, xx, tt, yy, **kw):
        return ours.apply({"params": p}, xx, tt, yy, **kw)

    out_j = forward_with_cfg(apply_fn, pj, xj, jnp.asarray(t.numpy()),
                             jnp.asarray(y.numpy()), cfg_scale=4.0)
    np.testing.assert_allclose(np.transpose(np.asarray(out_j), (0, 1, 4, 2, 3)),
                               out_t, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_latte_omnitokenizer_8ch():
    """Latte-XL/2-omnitokenizer seam: 8 latent channels, 5 latent frames =
    1+(17-1)//4 (Latte/models/__init__.py:46)."""
    ref, ours, params = _build_pair(extras=1, in_channels=8, frames=5)
    g = torch.Generator().manual_seed(64)
    x = torch.randn(1, 5, 8, 16, 16, generator=g)
    t = torch.tensor([11])
    with torch.no_grad():
        out_t = ref(x, t).numpy()
    out_j = _run_ours(ours, params, x, t)
    np.testing.assert_allclose(out_j, out_t, atol=2e-5, rtol=1e-4)


# -- latte_img: joint image-video variant ------------------------------------

def _ref_latte_img_module():
    install_stubs()
    path = "/root/reference/Diffusion/Latte/models"
    if path not in sys.path:
        sys.path.insert(0, path)
    return importlib.import_module("latte_img")


def _build_img_pair(extras=1, num_classes=10, frames=4, use_image_num=2):
    """frames = VIDEO frames; the input carries frames+use_image_num entries
    (latte_img.py:316-400; temp_embed len == video frames)."""
    latte_mod = _ref_latte_img_module()
    torch.manual_seed(70)
    ref = latte_mod.Latte(input_size=16, patch_size=2, in_channels=4,
                          hidden_size=64, depth=4, num_heads=4,
                          num_frames=frames, class_dropout_prob=0.0,
                          num_classes=num_classes, extras=extras)
    g = torch.Generator().manual_seed(71)
    with torch.no_grad():
        for p in ref.parameters():
            if p.requires_grad:
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    from omnitokenizer_tpu.models.latte import Latte, LatteConfig, convert_latte_state

    cfg = LatteConfig(input_size=16, patch_size=2, in_channels=4,
                      hidden_size=64, depth=4, num_heads=4, num_frames=frames,
                      num_classes=num_classes, extras=extras,
                      class_dropout_prob=0.0)
    params = convert_latte_state(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    return ref, Latte(cfg), params


@pytest.mark.slow
@pytest.mark.parametrize("extras", [1, 2])
def test_latte_img_joint_forward_parity(extras):
    """latte_img.py:316-400: trailing use_image_num frames are independent
    images — spatial blocks with per-image labels, temporal blocks bypassed."""
    use_image_num = 2
    ref, ours, params = _build_img_pair(extras=extras,
                                        use_image_num=use_image_num)
    ref.train()  # the reference's image-label path is training-only (:336)
    g = torch.Generator().manual_seed(72)
    x = torch.randn(2, 4 + use_image_num, 4, 16, 16, generator=g)
    t = torch.tensor([3, 77])
    y = torch.tensor([1, 7]) if extras == 2 else None
    # reference consumes y_image as an iterable of per-sample label tensors
    y_image_t = [torch.tensor([2, 5]), torch.tensor([0, 9])] if extras == 2 else None
    with torch.no_grad():
        out_t = ref(x, t, y=y, y_image=y_image_t,
                    use_image_num=use_image_num).numpy()

    xj = jnp.asarray(np.transpose(x.numpy(), (0, 1, 3, 4, 2)))
    kw = dict(use_image_num=use_image_num, train=True)
    if extras == 2:
        kw["y"] = jnp.asarray(y.numpy())
        kw["y_image"] = jnp.asarray(torch.stack(y_image_t).numpy())
    out_j = ours.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        xj, jnp.asarray(t.numpy()), **kw)
    out_j = np.transpose(np.asarray(out_j), (0, 1, 4, 2, 3))
    np.testing.assert_allclose(out_j, out_t, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_latte_img_zero_images_matches_plain_latte():
    """use_image_num=0 must be the plain video Latte graph."""
    ref, ours, params = _build_img_pair(extras=2, use_image_num=0)
    g = torch.Generator().manual_seed(73)
    x = torch.randn(1, 4, 4, 16, 16, generator=g)
    t = torch.tensor([11])
    y = torch.tensor([4])
    ref.eval()
    with torch.no_grad():
        out_t = ref(x, t, y=y, use_image_num=0).numpy()
    pj = jax.tree_util.tree_map(jnp.asarray, params)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 1, 3, 4, 2)))
    out_a = ours.apply({"params": pj}, xj, jnp.asarray(t.numpy()),
                       y=jnp.asarray(y.numpy()))
    out_b = ours.apply({"params": pj}, xj, jnp.asarray(t.numpy()),
                       y=jnp.asarray(y.numpy()), use_image_num=0,
                       y_image=None)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out_a), (0, 1, 4, 2, 3)), out_t,
        atol=2e-5, rtol=1e-4)
