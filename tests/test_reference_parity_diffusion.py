"""TRUE-ORACLE IDDPM parity: our diffusion/gaussian.py vs the vendored
OpenAI-derived implementation the reference's DiT/Latte stacks train with
(/root/reference/Diffusion/DiT/diffusion/{gaussian_diffusion,respace}.py),
imported directly (pure torch+numpy).

A deterministic fake denoiser (same closed form in numpy/torch and jnp)
stands in for the network, so every distributional quantity — q/posterior
moments, p_mean_variance with LEARNED_RANGE sigma, training losses
(MSE + frozen-mean vb term), and the full respaced DDIM loop — must agree.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "/root/reference/Diffusion/DiT")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffusion import create_diffusion as ref_create  # noqa: E402

from omnitokenizer_tpu.diffusion.gaussian import create_diffusion  # noqa: E402

SHAPE = (2, 3, 8, 8)  # channel axis 1 on BOTH sides so arrays are identical


def _np_model(x, t):
    """Deterministic fake denoiser: 2*C output channels on axis 1."""
    tt = (np.asarray(t, np.float32) / 100.0).reshape(-1, 1, 1, 1)
    mean = 0.1 * np.sin(x) + 0.05 * x * (1.0 + tt)
    var = 0.2 * np.cos(x) - 0.1 * tt * np.ones_like(x)
    return np.concatenate([mean, var], axis=1)


def _torch_model(x, t, **kw):
    return torch.from_numpy(_np_model(x.numpy(), t.numpy()))


def _jax_model(x, t, **kw):
    tt = (t.astype(jnp.float32) / 100.0).reshape(-1, 1, 1, 1)
    mean = 0.1 * jnp.sin(x) + 0.05 * x * (1.0 + tt)
    var = 0.2 * jnp.cos(x) - 0.1 * tt * jnp.ones_like(x)
    return jnp.concatenate([mean, var], axis=1)


def _pair(respacing="25", **kw):
    ref = ref_create(timestep_respacing=respacing, diffusion_steps=100, **kw)
    ours = create_diffusion(timestep_respacing=respacing, diffusion_steps=100,
                            channel_axis=1, **kw)
    return ref, ours


def test_coefficient_tables_match():
    ref, ours = _pair()
    np.testing.assert_allclose(ours.betas, ref.betas, rtol=1e-12)
    np.testing.assert_allclose(ours.alphas_cumprod, ref.alphas_cumprod, rtol=1e-12)
    np.testing.assert_allclose(ours.posterior_variance, ref.posterior_variance, rtol=1e-12)
    np.testing.assert_allclose(ours.posterior_mean_coef1, ref.posterior_mean_coef1, rtol=1e-12)
    np.testing.assert_allclose(ours.posterior_mean_coef2, ref.posterior_mean_coef2, rtol=1e-12)
    assert list(ours.timestep_map) == list(ref.timestep_map)
    # unspaced + cosine schedule too
    ref2, ours2 = _pair(respacing="", noise_schedule="squaredcos_cap_v2")
    np.testing.assert_allclose(ours2.betas, ref2.betas, rtol=1e-12)


def test_q_process_parity():
    ref, ours = _pair()
    rng = np.random.RandomState(0)
    x0 = rng.randn(*SHAPE).astype(np.float32)
    xt = rng.randn(*SHAPE).astype(np.float32)
    noise = rng.randn(*SHAPE).astype(np.float32)
    t = np.array([3, 17], np.int64)

    qs_t = ref.q_sample(torch.from_numpy(x0), torch.from_numpy(t),
                        torch.from_numpy(noise)).numpy()
    qs_j = np.asarray(ours.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise)))
    np.testing.assert_allclose(qs_j, qs_t, atol=1e-5, rtol=1e-5)

    m_t, v_t, lv_t = ref.q_posterior_mean_variance(
        torch.from_numpy(x0), torch.from_numpy(xt), torch.from_numpy(t))
    m_j, v_j, lv_j = ours.q_posterior_mean_variance(
        jnp.asarray(x0), jnp.asarray(xt), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(m_j), m_t.numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(v_j), v_t.shape), v_t.numpy(), atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(lv_j), lv_t.shape), lv_t.numpy(), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("clip", [True, False])
def test_p_mean_variance_parity(clip):
    ref, ours = _pair()
    rng = np.random.RandomState(1)
    x = rng.randn(*SHAPE).astype(np.float32)
    t = np.array([0, 20], np.int64)

    out_t = ref.p_mean_variance(_torch_model, torch.from_numpy(x),
                                torch.from_numpy(t), clip_denoised=clip)
    out_j = ours.p_mean_variance(_jax_model, jnp.asarray(x), jnp.asarray(t),
                                 clip_denoised=clip)
    for k in ("mean", "variance", "log_variance", "pred_xstart"):
        np.testing.assert_allclose(np.asarray(out_j[k]), out_t[k].numpy(),
                                   atol=2e-5, rtol=1e-4, err_msg=k)


def test_training_losses_parity():
    ref, ours = _pair()
    rng = np.random.RandomState(2)
    x0 = (rng.rand(*SHAPE).astype(np.float32) * 2 - 1) * 0.8
    noise = rng.randn(*SHAPE).astype(np.float32)
    t = np.array([0, 13], np.int64)

    terms_t = ref.training_losses(_torch_model, torch.from_numpy(x0),
                                  torch.from_numpy(t), noise=torch.from_numpy(noise))
    terms_j = ours.training_losses(_jax_model, jnp.asarray(x0), jnp.asarray(t),
                                   key=jax.random.PRNGKey(0), noise=jnp.asarray(noise))
    for k in ("mse", "vb", "loss"):
        np.testing.assert_allclose(np.asarray(terms_j[k]), terms_t[k].numpy(),
                                   atol=2e-4, rtol=2e-4, err_msg=k)


def test_vb_only_losses_parity():
    ref, ours = _pair(use_kl=True)
    rng = np.random.RandomState(3)
    x0 = (rng.rand(*SHAPE).astype(np.float32) * 2 - 1) * 0.8
    noise = rng.randn(*SHAPE).astype(np.float32)
    t = np.array([5, 0], np.int64)
    terms_t = ref.training_losses(_torch_model, torch.from_numpy(x0),
                                  torch.from_numpy(t), noise=torch.from_numpy(noise))
    terms_j = ours.training_losses(_jax_model, jnp.asarray(x0), jnp.asarray(t),
                                   key=jax.random.PRNGKey(0), noise=jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(terms_j["loss"]), terms_t["loss"].numpy(),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("respacing", ["25", "ddim10"])
def test_ddim_loop_parity(respacing):
    """Full respaced deterministic DDIM trajectory from pinned init noise:
    covers timestep_map plumbing end to end (respace.py:117-129)."""
    ref, ours = _pair(respacing)
    rng = np.random.RandomState(4)
    z = rng.randn(*SHAPE).astype(np.float32)

    with torch.no_grad():
        final_t = ref.ddim_sample_loop(_torch_model, SHAPE,
                                       noise=torch.from_numpy(z),
                                       device="cpu",  # fake model has no .parameters()
                                       progress=False, eta=0.0).numpy()
    final_j = np.asarray(ours.ddim_sample_loop(
        _jax_model, SHAPE, key=jax.random.PRNGKey(0), noise=jnp.asarray(z), eta=0.0))
    np.testing.assert_allclose(final_j, final_t, atol=5e-4, rtol=1e-3)
