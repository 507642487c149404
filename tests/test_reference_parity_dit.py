"""TRUE-ORACLE DiT parity: the actual vendored DiT
(/root/reference/Diffusion/DiT/models.py, run against the faithful timm
vision_transformer stub) with random weights, converted by
models/dit.convert_dit_state, must match our flax DiT forward — pos-embed
table, timestep/label embedders, adaLN-Zero blocks, final layer, unpatchify,
and the CFG 3-channel-split forward.
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


def _ref_dit_module():
    install_stubs()
    if "/root/reference/Diffusion/DiT" not in sys.path:
        sys.path.insert(0, "/root/reference/Diffusion/DiT")
    return importlib.import_module("models")


def _build_pair(in_channels=4, learn_sigma=True, num_classes=10):
    models = _ref_dit_module()
    torch.manual_seed(50)
    ref = models.DiT(input_size=16, patch_size=2, in_channels=in_channels,
                     hidden_size=64, depth=2, num_heads=4,
                     class_dropout_prob=0.1, num_classes=num_classes,
                     learn_sigma=learn_sigma).eval()
    # DiT zero-initializes adaLN/final weights; randomize so conversion
    # mistakes cannot hide behind zeros
    g = torch.Generator().manual_seed(51)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    # keep pos_embed at its sin-cos value (it is not converted)
    ref.pos_embed.copy_(torch.from_numpy(
        models.get_2d_sincos_pos_embed(64, 8)).float().unsqueeze(0))

    from omnitokenizer_tpu.models.dit import DiT, DiTConfig, convert_dit_state

    cfg = DiTConfig(input_size=16, patch_size=2, in_channels=in_channels,
                    hidden_size=64, depth=2, num_heads=4,
                    num_classes=num_classes, learn_sigma=learn_sigma)
    params = convert_dit_state({k: v.numpy() for k, v in ref.state_dict().items()})
    return ref, DiT(cfg), params


@pytest.mark.slow
def test_dit_forward_parity():
    ref, ours, params = _build_pair()
    g = torch.Generator().manual_seed(52)
    x = torch.randn(2, 4, 16, 16, generator=g)
    t = torch.tensor([3, 77])
    y = torch.tensor([1, 7])
    with torch.no_grad():
        out_t = ref(x, t, y).numpy()  # (B, 8, 16, 16)

    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out_j = ours.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                       xj, jnp.asarray(t.numpy()), jnp.asarray(y.numpy()))
    np.testing.assert_allclose(np.transpose(np.asarray(out_j), (0, 3, 1, 2)),
                               out_t, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_dit_cfg_forward_parity():
    """forward_with_cfg incl. the reference's 3-channel guidance split
    (models.py:250-266)."""
    ref, ours, params = _build_pair()
    g = torch.Generator().manual_seed(53)
    half = torch.randn(2, 4, 16, 16, generator=g)
    x = torch.cat([half, half], 0)
    t = torch.tensor([5, 9, 5, 9])
    y = torch.tensor([3, 6, 10, 10])  # null class = num_classes
    with torch.no_grad():
        out_t = ref.forward_with_cfg(x, t, y, cfg_scale=4.0).numpy()

    from omnitokenizer_tpu.models.dit import forward_with_cfg

    pj = jax.tree_util.tree_map(jnp.asarray, params)
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))

    def apply_fn(p, xx, tt, yy, **kw):
        return ours.apply({"params": p}, xx, tt, yy, **kw)

    out_j = forward_with_cfg(apply_fn, pj, xj, jnp.asarray(t.numpy()),
                             jnp.asarray(y.numpy()), cfg_scale=4.0)
    np.testing.assert_allclose(np.transpose(np.asarray(out_j), (0, 3, 1, 2)),
                               out_t, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_dit_unconditional_8ch():
    """The OmniTokenizer-VAE configuration: 8 latent channels
    (Diffusion/DiT/train.py:152), label path exercised with all-null ids."""
    ref, ours, params = _build_pair(in_channels=8)
    g = torch.Generator().manual_seed(54)
    x = torch.randn(2, 8, 16, 16, generator=g)
    t = torch.tensor([0, 49])
    y = torch.tensor([10, 10])
    with torch.no_grad():
        out_t = ref(x, t, y).numpy()
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    out_j = ours.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                       xj, jnp.asarray(t.numpy()), jnp.asarray(y.numpy()))
    np.testing.assert_allclose(np.transpose(np.asarray(out_j), (0, 3, 1, 2)),
                               out_t, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_torch_ckpt_load_path(tmp_path):
    """find_model-style torch checkpoints ({'ema','model'} dicts and raw
    state_dicts) load through load_torch_diffusion_state_dict + converter
    into a tree flax can restore (the dit_sample --ckpt .pt path)."""
    ref, ours, params = _build_pair()
    sd = ref.state_dict()
    path = str(tmp_path / "dit.pt")
    torch.save({"ema": sd, "model": sd, "opt": {}, "args": None}, path)

    from flax import serialization

    from omnitokenizer_tpu.models.dit import (convert_dit_state,
                                              load_torch_diffusion_state_dict)

    loaded = load_torch_diffusion_state_dict(path, use_ema=True)
    restored = serialization.from_state_dict(params, convert_dit_state(loaded))
    a = jax.tree_util.tree_leaves(restored)
    b = jax.tree_util.tree_leaves(params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))

    torch.save(sd, path)  # raw state_dict form
    loaded2 = load_torch_diffusion_state_dict(path)
    assert set(loaded2) == set(loaded)
