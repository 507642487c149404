"""DiT + Latte model tests: shapes, adaLN-Zero init identity, pos embeds vs
closed-form, CFG batching semantics, label dropout, diffusion integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnitokenizer_tpu.diffusion import create_diffusion
from omnitokenizer_tpu.models import dit as dit_mod
from omnitokenizer_tpu.models import latte as latte_mod
from omnitokenizer_tpu.models.dit import DiT, DiTConfig, dit_config, sincos_1d, sincos_2d, timestep_embedding
from omnitokenizer_tpu.models.latte import Latte, LatteConfig, latte_config

SMALL = DiTConfig(input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=2,
                  num_heads=2, num_classes=10)


@pytest.fixture(scope="module")
def dit_params():
    m = DiT(SMALL)
    x = jnp.zeros((2, 8, 8, 4))
    return m.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32))["params"]


def test_dit_shapes(dit_params):
    m = DiT(SMALL)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    out = m.apply({"params": dit_params}, x, jnp.array([3, 7]), jnp.array([1, 2]))
    assert out.shape == (2, 8, 8, 8)  # learn_sigma doubles channels


def test_dit_zero_init_outputs_zero(dit_params):
    """adaLN-Zero: final layer zero-init => exactly zero output at init."""
    m = DiT(SMALL)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    out = m.apply({"params": dit_params}, x, jnp.array([5]), jnp.array([0]))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_timestep_embedding_closed_form():
    t = jnp.array([0.0, 17.0])
    emb = np.asarray(timestep_embedding(t, 8))
    half = 4
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    want = np.concatenate([np.cos(17.0 * freqs), np.sin(17.0 * freqs)])
    np.testing.assert_allclose(emb[1], want, rtol=1e-5)
    np.testing.assert_allclose(emb[0], np.concatenate([np.ones(4), np.zeros(4)]), atol=1e-6)


def test_sincos_2d_structure():
    pe = sincos_2d(16, 4)
    assert pe.shape == (16, 16)
    # first half encodes the w-first meshgrid axis: constant across rows of 4
    np.testing.assert_allclose(pe[0, :8], pe[4, :8], atol=1e-12)  # same w -> same first half? no:
    # position 0 and 4 share w=0 (w-major flattening: idx = h*4 + w)
    # (grid[0] is w varying fastest), so emb_h(grid[0]) equal at same w
    np.testing.assert_allclose(pe[1, :8], pe[5, :8], atol=1e-12)
    # second half (h axis) equal along same h row
    np.testing.assert_allclose(pe[0, 8:], pe[1, 8:], atol=1e-12)


def test_patchify_unpatchify_roundtrip(dit_params):
    m = DiT(SMALL.replace(learn_sigma=False))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 4))
    p = m.patchify(x)
    assert p.shape == (2, 16, 2 * 2 * 4)
    back = m.unpatchify(p)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_label_dropout_uses_null_class(dit_params):
    m = DiT(SMALL)
    x = jnp.zeros((2, 8, 8, 4))
    t = jnp.array([1, 1])
    # force-drop both labels -> same as passing the null class explicitly
    out_forced = m.apply({"params": dit_params}, x, t, jnp.array([3, 4]),
                         force_drop_ids=jnp.array([1, 1]))
    out_null = m.apply({"params": dit_params}, x, t, jnp.array([10, 10]))
    np.testing.assert_allclose(np.asarray(out_forced), np.asarray(out_null), atol=1e-6)


def test_forward_with_cfg_mixes_eps_channels(dit_params):
    m = DiT(SMALL)
    apply = lambda p, x, t, y: m.apply(p, x, t, y)
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 8, 8, 4))
    t = jnp.zeros((4,), jnp.int32)
    y = jnp.array([1, 2, 10, 10])
    out = dit_mod.forward_with_cfg(apply, {"params": dit_params}, x, t, y, cfg_scale=4.0, cfg_channels=3)
    assert out.shape == (4, 8, 8, 8)
    # guided eps identical across the two halves
    np.testing.assert_allclose(np.asarray(out[:2, ..., :3]), np.asarray(out[2:, ..., :3]), atol=1e-6)


def test_dit_registry():
    cfg = dit_config("DiT-S/8", in_channels=8)
    assert cfg.hidden_size == 384 and cfg.patch_size == 8 and cfg.in_channels == 8
    assert dit_mod.DiT_models["DiT-XL/2"]().depth == 28


def test_dit_trains_with_diffusion():
    """One end-to-end grad step through training_losses."""
    cfg = SMALL
    m = DiT(cfg)
    x0 = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 8, 4)) * 0.2
    y = jnp.array([1, 2])
    t = jnp.array([3, 7])
    params = m.init(jax.random.PRNGKey(0), x0, t, y)["params"]
    diff = create_diffusion(None, noise_schedule="squaredcos_cap_v2", diffusion_steps=10)

    def loss_fn(p):
        model = lambda xx, tt, **kw: m.apply({"params": p}, xx, tt, y)
        terms = diff.training_losses(model, x0, t, jax.random.PRNGKey(1))
        return terms["loss"].mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in flat)


# ---------------------------------------------------------------------------
# Latte
# ---------------------------------------------------------------------------

LSMALL = LatteConfig(input_size=8, patch_size=2, in_channels=4, hidden_size=32, depth=4,
                     num_heads=2, num_frames=3, num_classes=10, extras=2)


@pytest.fixture(scope="module")
def latte_params():
    m = Latte(LSMALL)
    x = jnp.zeros((2, 3, 8, 8, 4))
    return m.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32))["params"]


def test_latte_shapes(latte_params):
    m = Latte(LSMALL)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 8, 4))
    out = m.apply({"params": latte_params}, x, jnp.array([1, 2]), jnp.array([3, 4]))
    assert out.shape == (2, 3, 8, 8, 8)


def test_latte_zero_init(latte_params):
    m = Latte(LSMALL)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 8, 8, 4))
    out = m.apply({"params": latte_params}, x, jnp.array([5]), jnp.array([0]))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_latte_unconditional_and_text():
    m = Latte(LSMALL.replace(extras=1))
    x = jnp.zeros((1, 3, 8, 8, 4))
    p = m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))["params"]
    out = m.apply({"params": p}, x, jnp.array([1]))
    assert out.shape == (1, 3, 8, 8, 8)

    mt = Latte(LSMALL.replace(extras=78))
    emb = jnp.zeros((1, 77, 768))
    pt = mt.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), text_embedding=emb)["params"]
    out = mt.apply({"params": pt}, x, jnp.array([1]), text_embedding=emb)
    assert out.shape == (1, 3, 8, 8, 8)


def test_latte_temporal_mixing(latte_params):
    """Perturbing one frame must change other frames' outputs (temporal
    attention mixes frames) — using non-zero params."""
    # re-init with small noise on the final layer so output isn't identically 0
    m = Latte(LSMALL)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.02 * np.random.RandomState(0).randn(*a.shape).astype(np.float32),
        latte_params,
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 8, 8, 4))
    t, y = jnp.array([1]), jnp.array([2])
    base = m.apply({"params": params}, x, t, y)
    x2 = x.at[:, 2].add(1.0)
    pert = m.apply({"params": params}, x2, t, y)
    assert not np.allclose(np.asarray(base[:, 0]), np.asarray(pert[:, 0]), atol=1e-6)


def test_latte_registry():
    cfg = latte_config("Latte-XL/2-omnitokenizer")
    assert cfg.in_channels == 8 and cfg.depth == 28 and cfg.hidden_size == 1152
    assert latte_mod.Latte_models["Latte-S/4"]().num_heads == 6


def test_latte_cfg_channels(latte_params):
    m = Latte(LSMALL)
    apply = lambda p, x, t, y: m.apply(p, x, t, y)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 3, 8, 8, 4))
    t = jnp.zeros((4,), jnp.int32)
    y = jnp.array([1, 2, 10, 10])
    out = latte_mod.forward_with_cfg(apply, {"params": latte_params}, x, t, y, cfg_scale=7.0, cfg_channels=4)
    assert out.shape == (4, 3, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(out[:2, ..., :4]), np.asarray(out[2:, ..., :4]), atol=1e-6)
