"""Gaussian-diffusion math tests: schedules, q/p process identities,
learned-variance interpolation, respacing, training losses, scan samplers.

Oracles are independent closed-form DDPM/IDDPM equations computed in-test
with numpy (float64), mirroring the semantics of
/root/reference/Diffusion/DiT/diffusion/gaussian_diffusion.py without
importing or copying it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnitokenizer_tpu.diffusion import (
    GaussianDiffusion,
    LossSecondMomentResampler,
    LossType,
    MeanType,
    UniformSampler,
    VarType,
    create_diffusion,
    get_named_beta_schedule,
    space_timesteps,
)

T = 40
BETAS = get_named_beta_schedule("linear", T)


def make(**kw):
    kw.setdefault("betas", BETAS)
    return GaussianDiffusion(**kw)


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------


def test_linear_schedule_scaling():
    # Ho et al. schedule scaled by 1000/T at both ends
    assert np.isclose(BETAS[0], (1000 / T) * 1e-4)
    assert np.isclose(BETAS[-1], (1000 / T) * 0.02)
    b1000 = get_named_beta_schedule("linear", 1000)
    assert np.isclose(b1000[0], 1e-4) and np.isclose(b1000[-1], 0.02)


def test_cosine_schedule_capped():
    b = get_named_beta_schedule("squaredcos_cap_v2", 100)
    assert (b <= 0.999).all() and (b > 0).all()
    # alpha_bar implied by betas matches cos^2 formula
    acp = np.cumprod(1 - b)
    f = lambda s: np.cos((s + 0.008) / 1.008 * np.pi / 2) ** 2
    want = np.array([f((i + 1) / 100) / f(0.0) for i in range(99)])
    np.testing.assert_allclose(acp[:99], want, rtol=1e-10)


def test_coefficient_tables_match_closed_form():
    d = make()
    alphas = 1 - BETAS
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    np.testing.assert_allclose(d.alphas_cumprod, acp)
    np.testing.assert_allclose(d.posterior_variance, BETAS * (1 - acp_prev) / (1 - acp))
    np.testing.assert_allclose(d.posterior_mean_coef1, BETAS * np.sqrt(acp_prev) / (1 - acp))
    np.testing.assert_allclose(d.posterior_mean_coef2, (1 - acp_prev) * np.sqrt(alphas) / (1 - acp))
    np.testing.assert_allclose(d.fixed_large_variance, np.append(d.posterior_variance[1], BETAS[1:]))


# ---------------------------------------------------------------------------
# q / p process identities
# ---------------------------------------------------------------------------


def test_q_sample_statistics():
    d = make()
    x0 = jnp.ones((4, 2, 2, 3)) * 0.5
    t = jnp.array([0, 10, 20, 39])
    noise = jnp.zeros_like(x0)
    xt = d.q_sample(x0, t, noise)
    want = np.sqrt(d.alphas_cumprod)[np.array(t)] * 0.5
    np.testing.assert_allclose(np.asarray(xt)[:, 0, 0, 0], want, rtol=1e-5)


def test_eps_xstart_roundtrip():
    d = make()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 4, 4, 3))
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([5, 30])
    xt = d.q_sample(x0, t, eps)
    x0_hat = d.predict_xstart_from_eps(xt, t, eps)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)
    eps_hat = d.predict_eps_from_xstart(xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(eps), atol=1e-4)


def test_oracle_eps_model_recovers_x0():
    """A model that returns the true noise makes pred_xstart exact."""
    d = make(var_type=VarType.FIXED_SMALL)
    key = jax.random.PRNGKey(1)
    x0 = jnp.clip(jax.random.normal(key, (2, 4, 4, 3)) * 0.3, -1, 1)
    eps = jax.random.normal(jax.random.fold_in(key, 2), x0.shape)
    t = jnp.array([15, 25])
    xt = d.q_sample(x0, t, eps)
    out = d.p_mean_variance(lambda x, tt: eps, xt, t)
    np.testing.assert_allclose(np.asarray(out["pred_xstart"]), np.asarray(x0), atol=1e-4)
    # the p-mean then equals the true q-posterior mean
    tm, _, _ = d.q_posterior_mean_variance(x0, xt, t)
    np.testing.assert_allclose(np.asarray(out["mean"]), np.asarray(tm), atol=1e-4)


def test_learned_range_interpolation_endpoints():
    d = make(var_type=VarType.LEARNED_RANGE)
    x = jnp.zeros((2, 2, 2, 3))
    t = jnp.array([7, 21])
    for v, table in [(-1.0, d.posterior_log_variance_clipped), (1.0, np.log(d.betas))]:
        model = lambda xx, tt, v=v: jnp.concatenate([jnp.zeros_like(xx), jnp.full_like(xx, v)], -1)
        out = d.p_mean_variance(model, x, t)
        want = table[np.array(t)]
        np.testing.assert_allclose(np.asarray(out["log_variance"])[:, 0, 0, 0], want, rtol=1e-5)


def test_fixed_large_variance_at_t():
    d = make(var_type=VarType.FIXED_LARGE)
    x = jnp.zeros((3, 2, 2, 1))
    t = jnp.array([0, 1, 20])
    out = d.p_mean_variance(lambda xx, tt: jnp.zeros_like(xx), x, t)
    want = d.fixed_large_variance[np.array(t)]
    np.testing.assert_allclose(np.asarray(out["variance"])[:, 0, 0, 0], want, rtol=1e-5)


# ---------------------------------------------------------------------------
# respacing
# ---------------------------------------------------------------------------


def test_space_timesteps_ddim():
    steps = space_timesteps(1000, "ddim25")
    assert len(steps) == 25 and 0 in steps
    assert steps == set(range(0, 1000, 40))


def test_respaced_alphas_match_base():
    base = make()
    kept = space_timesteps(T, [10])
    d = make(use_timesteps=kept)
    assert d.num_timesteps == 10
    for new_i, orig_i in enumerate(d.timestep_map):
        np.testing.assert_allclose(d.alphas_cumprod[new_i], base.alphas_cumprod[orig_i], rtol=1e-12)


def test_respaced_model_sees_original_timesteps():
    kept = space_timesteps(T, [10])
    d = make(use_timesteps=kept, var_type=VarType.FIXED_SMALL)
    seen = []

    def model(x, t):
        seen.append(np.asarray(t))
        return jnp.zeros_like(x)

    d.p_mean_variance(model, jnp.zeros((1, 2, 2, 1)), jnp.array([3]))
    assert seen[0][0] == d.timestep_map[3]


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def test_mse_loss_matches_manual():
    d = make(var_type=VarType.FIXED_SMALL, loss_type=LossType.MSE)
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, (2, 4, 4, 3)) * 0.2
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([5, 30])

    def model(x, tt):
        return x * 0.1

    terms = d.training_losses(model, x0, t, key, noise=noise)
    xt = d.q_sample(x0, t, noise)
    want = np.mean(np.asarray((noise - xt * 0.1) ** 2), axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(terms["loss"]), want, rtol=1e-4)


def test_learned_sigma_loss_has_vb_and_grads_split():
    d = make(var_type=VarType.LEARNED_RANGE, loss_type=LossType.MSE)
    key = jax.random.PRNGKey(4)
    x0 = jax.random.normal(key, (2, 4, 4, 3)) * 0.2
    t = jnp.array([5, 30])

    def model_from_param(p, x, tt):
        return jnp.concatenate([x * p, jnp.zeros_like(x)], axis=-1)

    def vb_only(p):
        terms = d.training_losses(lambda x, tt: model_from_param(p, x, tt), x0, t, key)
        return terms["vb"].sum()

    # vb must not backprop into the mean prediction (stop_gradient)
    g = jax.grad(vb_only)(0.3)
    assert abs(float(g)) < 1e-8
    terms = d.training_losses(lambda x, tt: model_from_param(0.3, x, tt), x0, t, key)
    assert terms["loss"].shape == (2,)
    np.testing.assert_allclose(
        np.asarray(terms["loss"]), np.asarray(terms["mse"] + terms["vb"]), rtol=1e-5
    )
    assert np.isfinite(np.asarray(terms["vb"])).all()


def test_rescaled_mse_vb_scaling():
    key = jax.random.PRNGKey(5)
    x0 = jax.random.normal(key, (1, 4, 4, 2)) * 0.1
    t = jnp.array([9])
    model = lambda x, tt: jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1)
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    plain = make(var_type=VarType.LEARNED_RANGE, loss_type=LossType.MSE)
    resc = make(var_type=VarType.LEARNED_RANGE, loss_type=LossType.RESCALED_MSE)
    a = plain.training_losses(model, x0, t, key, noise=noise)["vb"]
    b = resc.training_losses(model, x0, t, key, noise=noise)["vb"]
    np.testing.assert_allclose(np.asarray(b), np.asarray(a) * (T / 1000.0), rtol=1e-5)


def test_vb_decoder_nll_at_t0():
    d = make(var_type=VarType.FIXED_SMALL)
    key = jax.random.PRNGKey(6)
    x0 = jnp.clip(jax.random.normal(key, (2, 2, 2, 1)) * 0.3, -1, 1)
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.array([0, 0])
    xt = d.q_sample(x0, t, eps)
    out = d.vb_terms_bpd(lambda x, tt: eps, x0, xt, t)
    assert np.isfinite(np.asarray(out["output"])).all()
    # with the oracle model at t>0 KL is ~0 (predicted posterior == true)
    t2 = jnp.array([10, 20])
    xt2 = d.q_sample(x0, t2, eps)
    out2 = d.vb_terms_bpd(lambda x, tt: eps, x0, xt2, t2, clip_denoised=False)
    np.testing.assert_allclose(np.asarray(out2["output"]), 0.0, atol=1e-6)


def test_kl_loss_types():
    d = make(var_type=VarType.FIXED_SMALL, loss_type=LossType.RESCALED_KL)
    key = jax.random.PRNGKey(7)
    x0 = jnp.zeros((1, 2, 2, 1))
    t = jnp.array([3])
    terms = d.training_losses(lambda x, tt: jnp.zeros_like(x), x0, t, key)
    assert terms["loss"].shape == (1,) and np.isfinite(np.asarray(terms["loss"])).all()


# ---------------------------------------------------------------------------
# samplers (compiled scan loops)
# ---------------------------------------------------------------------------


def test_ddim_oracle_deterministic_recovery():
    """eta=0 DDIM with a perfect eps-oracle for a *fixed* x0 walks the exact
    deterministic path back to x0."""
    d = make(var_type=VarType.FIXED_SMALL, use_timesteps=space_timesteps(T, [10]))
    key = jax.random.PRNGKey(8)
    x0 = jnp.clip(jax.random.normal(key, (2, 4, 4, 3)) * 0.3, -0.9, 0.9)

    def oracle(x, t_orig):
        # infer eps implied by x (exact inversion for known x0)
        # x = sqrt(acp) x0 + sqrt(1-acp) eps  ->  eps = (x - sqrt(acp) x0)/sqrt(1-acp)
        acp = jnp.take(jnp.asarray(np.cumprod(1 - BETAS), jnp.float32), t_orig)
        acp = acp.reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(acp) * x0) / jnp.sqrt(1 - acp)

    final = d.ddim_sample_loop(oracle, x0.shape, key, eta=0.0)
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=1e-3)


def test_p_sample_loop_runs_and_is_keyed():
    d = make(var_type=VarType.FIXED_LARGE, use_timesteps=space_timesteps(T, [5]))
    model = lambda x, t: jnp.zeros_like(x)
    s1 = d.p_sample_loop(model, (1, 4, 4, 2), jax.random.PRNGKey(0))
    s2 = d.p_sample_loop(model, (1, 4, 4, 2), jax.random.PRNGKey(1))
    assert s1.shape == (1, 4, 4, 2)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))
    assert np.isfinite(np.asarray(s1)).all()


def test_p_sample_loop_jits():
    d = make(var_type=VarType.FIXED_SMALL, use_timesteps=space_timesteps(T, [4]))
    model = lambda x, t: jnp.zeros_like(x)
    f = jax.jit(lambda k: d.p_sample_loop(model, (1, 2, 2, 1), k))
    out = f(jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()


def test_create_diffusion_defaults():
    d = create_diffusion("ddim10", diffusion_steps=100)
    assert d.num_timesteps == 10
    assert d.var_type == VarType.LEARNED_RANGE and d.mean_type == MeanType.EPSILON
    d2 = create_diffusion(None, diffusion_steps=50, learn_sigma=False)
    assert d2.num_timesteps == 50 and d2.var_type == VarType.FIXED_LARGE


# ---------------------------------------------------------------------------
# timestep samplers
# ---------------------------------------------------------------------------


def test_uniform_sampler():
    s = UniformSampler(100)
    rng = np.random.RandomState(0)
    idx, w = s.sample(512, rng)
    assert idx.shape == (512,) and (idx < 100).all()
    np.testing.assert_allclose(w, 1.0)


def test_loss_second_moment_resampler():
    s = LossSecondMomentResampler(10, history_per_term=2, uniform_prob=0.0)
    rng = np.random.RandomState(0)
    # before warm-up: uniform
    assert np.allclose(s.weights(), 1.0)
    for _ in range(2):
        s.update_with_all_losses(np.arange(10), np.arange(10, dtype=np.float64))
    assert s._warmed_up()
    w = s.weights()
    assert w[9] > w[1]  # high-loss timesteps get more weight
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-9)
    idx, iw = s.sample(1000, rng)
    assert (idx > 0).all()  # t=0 has zero loss -> zero weight
