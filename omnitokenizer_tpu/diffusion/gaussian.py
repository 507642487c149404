"""Gaussian (IDDPM-family) diffusion: schedules, losses, DDPM/DDIM sampling.

Behavioral reference: /root/reference/Diffusion/DiT/diffusion/
  - gaussian_diffusion.py (schedules :65-141, coefficient tables :166-201,
    q/p math :203-344, p_sample :376-417, ddim :513-598, vb terms :682-713,
    training_losses :715-787)
  - respace.py (space_timesteps :12-62, SpacedDiffusion beta rebuild :79-87,
    timestep remap :117-129)
  - diffusion_utils.py (normal_kl, discretized_gaussian_log_likelihood)
  - __init__.py create_diffusion defaults :10-46

TPU-native design (not a port):
  * All per-timestep coefficient tables live in ONE (T, K) float32 matrix so
    a single `jnp.take` gather per step fetches every coefficient — one HBM
    read instead of ~10 scattered 1-D gathers.
  * Sampling loops are `lax.scan` over a *concrete* descending index vector:
    one compiled graph with static shapes, not a Python loop of dispatches.
    Timestep respacing folds into the scanned index vector + an on-device
    `timestep_map` gather, so "250-step DDPM" and "ddim50" reuse the same
    compiled scan body.
  * Everything is a pure function over explicit PRNG keys; x is channels-LAST
    and the learned-variance split happens on the trailing axis (lane axis),
    which XLA fuses with the surrounding elementwise math.
"""

from __future__ import annotations

import enum
import math
from typing import Any, Callable, Dict, Optional, Sequence, Set, Union

import jax
import jax.numpy as jnp
import numpy as np


class MeanType(enum.Enum):
    """What the network predicts (reference ModelMeanType :25-33)."""

    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class VarType(enum.Enum):
    """Output-variance handling (reference ModelVarType :36-46)."""

    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType(enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"

    def is_vb(self):
        return self in (LossType.KL, LossType.RESCALED_KL)


# ---------------------------------------------------------------------------
# Beta schedules (reference gaussian_diffusion.py:65-141)
# ---------------------------------------------------------------------------


def get_beta_schedule(name: str, *, beta_start: float, beta_end: float, num_steps: int) -> np.ndarray:
    if name == "quad":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_steps, dtype=np.float64) ** 2
    elif name == "linear":
        betas = np.linspace(beta_start, beta_end, num_steps, dtype=np.float64)
    elif name == "const":
        betas = beta_end * np.ones(num_steps, dtype=np.float64)
    elif name == "jsd":
        betas = 1.0 / np.linspace(num_steps, 1, num_steps, dtype=np.float64)
    else:
        raise NotImplementedError(name)
    assert betas.shape == (num_steps,)
    return betas


def betas_for_alpha_bar(num_steps: int, alpha_bar: Callable[[float], float], max_beta: float = 0.999) -> np.ndarray:
    t = np.arange(num_steps, dtype=np.float64)
    a1 = np.array([alpha_bar(float(i) / num_steps) for i in t])
    a2 = np.array([alpha_bar(float(i + 1) / num_steps) for i in t])
    return np.minimum(1.0 - a2 / a1, max_beta)


def get_named_beta_schedule(schedule_name: str, num_steps: int) -> np.ndarray:
    """Named schedules kept bit-identical to the reference (:98-122)."""
    if schedule_name == "linear":
        scale = 1000.0 / num_steps
        return get_beta_schedule("linear", beta_start=scale * 1e-4, beta_end=scale * 0.02, num_steps=num_steps)
    if schedule_name == "squaredcos_cap_v2":
        return betas_for_alpha_bar(num_steps, lambda s: math.cos((s + 0.008) / 1.008 * math.pi / 2) ** 2)
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def space_timesteps(num_timesteps: int, section_counts: Union[str, Sequence[int]]) -> Set[int]:
    """Subset of original timesteps to retain (reference respace.py:12-62)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(f"cannot create exactly {desired} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx, all_steps = 0, []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        frac_stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return set(all_steps)


# ---------------------------------------------------------------------------
# Probability helpers (reference diffusion_utils.py)
# ---------------------------------------------------------------------------


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1||N2) in nats, elementwise."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a 255-bin discretized Gaussian; x in [-1, 1]."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )
    return log_probs


def mean_flat(x):
    """Mean over all non-batch axes."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def _bcast(v, ndim):
    """(B,) -> (B, 1, 1, ...) for broadcasting against a (B, ...) tensor."""
    return v.reshape(v.shape[0], *([1] * (ndim - 1)))


# Column indices into the stacked coefficient matrix.
_COLS = (
    "betas",
    "alphas_cumprod",
    "alphas_cumprod_prev",
    "alphas_cumprod_next",
    "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod",
    "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod",
    "sqrt_recipm1_alphas_cumprod",
    "posterior_variance",
    "posterior_log_variance_clipped",
    "posterior_mean_coef1",
    "posterior_mean_coef2",
    "fixed_large_variance",
    "fixed_large_log_variance",
    "log_betas",
)
_COL = {name: i for i, name in enumerate(_COLS)}

ModelFn = Callable[..., jnp.ndarray]


class GaussianDiffusion:
    """Diffusion process utilities over channels-last arrays.

    `model_fn(x, t, **kwargs) -> out` where out has 2*C trailing channels when
    var_type is LEARNED/LEARNED_RANGE.  When constructed with respacing
    (`use_timesteps`), indices 0..S-1 address the *spaced* process and the
    model automatically receives original-process timesteps via
    `timestep_map` (reference respace.py:117-129).
    """

    def __init__(
        self,
        *,
        betas: np.ndarray,
        mean_type: MeanType = MeanType.EPSILON,
        var_type: VarType = VarType.LEARNED_RANGE,
        loss_type: LossType = LossType.MSE,
        use_timesteps: Optional[Set[int]] = None,
        channel_axis: int = -1,
    ):
        betas = np.asarray(betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        self.original_num_steps = len(betas)

        if use_timesteps is not None:
            # Rebuild betas over the retained steps so alphas_cumprod matches
            # the base process at every kept index (respace.py:79-87).
            base_acp = np.cumprod(1.0 - betas)
            timestep_map, new_betas, last = [], [], 1.0
            for i, acp in enumerate(base_acp):
                if i in set(use_timesteps):
                    new_betas.append(1.0 - acp / last)
                    last = acp
                    timestep_map.append(i)
            betas = np.array(new_betas, dtype=np.float64)
            self.timestep_map = np.array(timestep_map, dtype=np.int32)
        else:
            self.timestep_map = np.arange(len(betas), dtype=np.int32)

        self.mean_type = mean_type
        self.var_type = var_type
        self.loss_type = loss_type
        self.channel_axis = channel_axis
        self.num_timesteps = int(betas.shape[0])

        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        acp_next = np.append(acp[1:], 0.0)
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        post_logvar = (
            np.log(np.append(post_var[1], post_var[1:])) if len(post_var) > 1 else np.array([])
        )
        tables = {
            "betas": betas,
            "alphas_cumprod": acp,
            "alphas_cumprod_prev": acp_prev,
            "alphas_cumprod_next": acp_next,
            "sqrt_alphas_cumprod": np.sqrt(acp),
            "sqrt_one_minus_alphas_cumprod": np.sqrt(1.0 - acp),
            "log_one_minus_alphas_cumprod": np.log(1.0 - acp),
            "sqrt_recip_alphas_cumprod": np.sqrt(1.0 / acp),
            "sqrt_recipm1_alphas_cumprod": np.sqrt(1.0 / acp - 1.0),
            "posterior_variance": post_var,
            "posterior_log_variance_clipped": post_logvar,
            "posterior_mean_coef1": betas * np.sqrt(acp_prev) / (1.0 - acp),
            "posterior_mean_coef2": (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp),
            # FIXED_LARGE variance (gaussian_diffusion.py:296-301)
            "fixed_large_variance": np.append(post_var[1], betas[1:]),
            "fixed_large_log_variance": np.log(np.append(post_var[1], betas[1:])),
            "log_betas": np.log(betas),
        }
        # numpy copies kept for tests/inspection
        for k, v in tables.items():
            setattr(self, k, v)
        # the single stacked (T, K) device table
        self._coef = jnp.asarray(
            np.stack([tables[name] for name in _COLS], axis=1), jnp.float32
        )
        self._tmap = jnp.asarray(self.timestep_map)

    # -- coefficient access -------------------------------------------------

    def _c(self, t: jnp.ndarray, name: str, ndim: int) -> jnp.ndarray:
        """Gather one coefficient column at (B,) timesteps, broadcastable."""
        return _bcast(jnp.take(self._coef[:, _COL[name]], t, axis=0), ndim)

    def _row(self, t: jnp.ndarray) -> jnp.ndarray:
        """One gather for the whole coefficient row: (B, K)."""
        return jnp.take(self._coef, t, axis=0)

    def map_t(self, t: jnp.ndarray) -> jnp.ndarray:
        """Spaced index -> original-process timestep fed to the model."""
        return jnp.take(self._tmap, t, axis=0)

    def _call_model(self, model_fn: ModelFn, x, t, model_kwargs):
        return model_fn(x, self.map_t(t), **(model_kwargs or {}))

    # -- q process ----------------------------------------------------------

    def q_mean_variance(self, x_start, t):
        mean = self._c(t, "sqrt_alphas_cumprod", x_start.ndim) * x_start
        variance = 1.0 - self._c(t, "alphas_cumprod", x_start.ndim)
        log_variance = self._c(t, "log_one_minus_alphas_cumprod", x_start.ndim)
        return mean, variance, log_variance

    def q_sample(self, x_start, t, noise):
        assert noise.shape == x_start.shape
        return (
            self._c(t, "sqrt_alphas_cumprod", x_start.ndim) * x_start
            + self._c(t, "sqrt_one_minus_alphas_cumprod", x_start.ndim) * noise
        )

    def q_posterior_mean_variance(self, x_start, x_t, t):
        mean = (
            self._c(t, "posterior_mean_coef1", x_t.ndim) * x_start
            + self._c(t, "posterior_mean_coef2", x_t.ndim) * x_t
        )
        variance = self._c(t, "posterior_variance", x_t.ndim)
        log_variance = self._c(t, "posterior_log_variance_clipped", x_t.ndim)
        return mean, variance, log_variance

    # -- p process ----------------------------------------------------------

    def predict_xstart_from_eps(self, x_t, t, eps):
        return (
            self._c(t, "sqrt_recip_alphas_cumprod", x_t.ndim) * x_t
            - self._c(t, "sqrt_recipm1_alphas_cumprod", x_t.ndim) * eps
        )

    def predict_eps_from_xstart(self, x_t, t, pred_xstart):
        return (
            self._c(t, "sqrt_recip_alphas_cumprod", x_t.ndim) * x_t - pred_xstart
        ) / self._c(t, "sqrt_recipm1_alphas_cumprod", x_t.ndim)

    def _split_learned_var(self, model_output, x):
        ax = self.channel_axis % model_output.ndim
        c = x.shape[ax]
        assert model_output.shape[ax] == 2 * c, (
            f"learned-variance model must output 2x channels on axis {ax}; "
            f"got {model_output.shape} for x {x.shape}"
        )
        return jnp.split(model_output, 2, axis=ax)

    def p_mean_variance(
        self,
        model_fn: ModelFn,
        x,
        t,
        clip_denoised: bool = True,
        denoised_fn=None,
        model_kwargs=None,
        model_output=None,
    ) -> Dict[str, jnp.ndarray]:
        """Distribution p(x_{t-1} | x_t) + pred_xstart.

        `model_output` short-circuits the network call (used by the frozen-out
        vb term in training_losses, reference :758-765).
        """
        if model_output is None:
            model_output = self._call_model(model_fn, x, t, model_kwargs)

        if self.var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
            model_output, model_var_values = self._split_learned_var(model_output, x)
            if self.var_type == VarType.LEARNED:
                model_log_variance = model_var_values
                model_variance = jnp.exp(model_log_variance)
            else:
                min_log = self._c(t, "posterior_log_variance_clipped", x.ndim)
                max_log = self._c(t, "log_betas", x.ndim)
                frac = (model_var_values + 1.0) / 2.0
                model_log_variance = frac * max_log + (1.0 - frac) * min_log
                model_variance = jnp.exp(model_log_variance)
        elif self.var_type == VarType.FIXED_LARGE:
            model_variance = self._c(t, "fixed_large_variance", x.ndim)
            model_log_variance = self._c(t, "fixed_large_log_variance", x.ndim)
        else:  # FIXED_SMALL
            model_variance = self._c(t, "posterior_variance", x.ndim)
            model_log_variance = self._c(t, "posterior_log_variance_clipped", x.ndim)
        model_variance = jnp.broadcast_to(model_variance, x.shape)
        model_log_variance = jnp.broadcast_to(model_log_variance, x.shape)

        def process_xstart(x0):
            if denoised_fn is not None:
                x0 = denoised_fn(x0)
            if clip_denoised:
                x0 = jnp.clip(x0, -1.0, 1.0)
            return x0

        if self.mean_type == MeanType.START_X:
            pred_xstart = process_xstart(model_output)
        elif self.mean_type == MeanType.EPSILON:
            pred_xstart = process_xstart(self.predict_xstart_from_eps(x, t, model_output))
        else:  # PREVIOUS_X: model outputs the posterior mean directly
            pred_xstart = process_xstart(self._predict_xstart_from_xprev(x, t, model_output))
        model_mean, _, _ = self.q_posterior_mean_variance(pred_xstart, x, t)
        return {
            "mean": model_mean,
            "variance": model_variance,
            "log_variance": model_log_variance,
            "pred_xstart": pred_xstart,
        }

    def _predict_xstart_from_xprev(self, x_t, t, xprev):
        c1 = self._c(t, "posterior_mean_coef1", x_t.ndim)
        c2 = self._c(t, "posterior_mean_coef2", x_t.ndim)
        return (xprev - c2 * x_t) / c1

    # -- single reverse steps ------------------------------------------------

    def p_sample(self, model_fn, x, t, key, clip_denoised=True, denoised_fn=None, model_kwargs=None):
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn, model_kwargs)
        noise = jax.random.normal(key, x.shape, x.dtype)
        nonzero = _bcast((t != 0).astype(x.dtype), x.ndim)
        sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_sample(
        self, model_fn, x, t, key, clip_denoised=True, denoised_fn=None, model_kwargs=None, eta=0.0
    ):
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn, model_kwargs)
        eps = self.predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar = self._c(t, "alphas_cumprod", x.ndim)
        alpha_bar_prev = self._c(t, "alphas_cumprod_prev", x.ndim)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(jnp.clip(1 - alpha_bar_prev - sigma ** 2, min=0.0)) * eps
        )
        noise = jax.random.normal(key, x.shape, x.dtype)
        nonzero = _bcast((t != 0).astype(x.dtype), x.ndim)
        sample = mean_pred + nonzero * sigma * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_reverse_sample(self, model_fn, x, t, clip_denoised=True, denoised_fn=None, model_kwargs=None):
        out = self.p_mean_variance(model_fn, x, t, clip_denoised, denoised_fn, model_kwargs)
        eps = self.predict_eps_from_xstart(x, t, out["pred_xstart"])
        alpha_bar_next = self._c(t, "alphas_cumprod_next", x.ndim)
        mean_pred = out["pred_xstart"] * jnp.sqrt(alpha_bar_next) + jnp.sqrt(1 - alpha_bar_next) * eps
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    # -- compiled sampling loops ---------------------------------------------

    def _scan_loop(self, step_fn, model_fn, shape, key, noise, model_kwargs):
        model_kwargs = model_kwargs or {}
        key, nkey = jax.random.split(key)
        img = noise if noise is not None else jax.random.normal(nkey, shape, jnp.float32)
        indices = jnp.arange(self.num_timesteps - 1, -1, -1)
        keys = jax.random.split(key, self.num_timesteps)

        def body(img, it):
            i, k = it
            t = jnp.full((shape[0],), i, jnp.int32)
            out = step_fn(model_fn, img, t, k, model_kwargs)
            return out["sample"], None

        final, _ = jax.lax.scan(body, img, (indices, keys))
        return final

    def p_sample_loop(
        self, model_fn, shape, key, noise=None, clip_denoised=True, denoised_fn=None, model_kwargs=None
    ):
        """Ancestral (DDPM) sampling as one lax.scan graph."""
        def step(mf, x, t, k, kw):
            return self.p_sample(mf, x, t, k, clip_denoised, denoised_fn, kw)

        return self._scan_loop(step, model_fn, shape, key, noise, model_kwargs)

    def ddim_sample_loop(
        self,
        model_fn,
        shape,
        key,
        noise=None,
        clip_denoised=True,
        denoised_fn=None,
        model_kwargs=None,
        eta=0.0,
    ):
        def step(mf, x, t, k, kw):
            return self.ddim_sample(mf, x, t, k, clip_denoised, denoised_fn, kw, eta)

        return self._scan_loop(step, model_fn, shape, key, noise, model_kwargs)

    # -- losses ----------------------------------------------------------------

    def vb_terms_bpd(self, model_fn, x_start, x_t, t, clip_denoised=True, model_kwargs=None, model_output=None):
        """KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)) in bits, decoder NLL at t=0."""
        true_mean, _, true_logvar = self.q_posterior_mean_variance(x_start, x_t, t)
        out = self.p_mean_variance(
            model_fn, x_t, t, clip_denoised=clip_denoised, model_kwargs=model_kwargs, model_output=model_output
        )
        kl = mean_flat(normal_kl(true_mean, true_logvar, out["mean"], out["log_variance"])) / np.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
        )
        decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
        output = jnp.where(t == 0, decoder_nll, kl)
        return {"output": output, "pred_xstart": out["pred_xstart"]}

    def training_losses(self, model_fn, x_start, t, key, model_kwargs=None, noise=None):
        """Per-example loss dict (reference training_losses :715-787)."""
        if noise is None:
            noise = jax.random.normal(key, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        terms: Dict[str, Any] = {}

        if self.loss_type.is_vb():
            terms["loss"] = self.vb_terms_bpd(
                model_fn, x_start, x_t, t, clip_denoised=False, model_kwargs=model_kwargs
            )["output"]
            if self.loss_type == LossType.RESCALED_KL:
                terms["loss"] = terms["loss"] * self.num_timesteps
            return terms

        model_output = self._call_model(model_fn, x_t, t, model_kwargs)
        if self.var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
            mean_out, var_values = self._split_learned_var(model_output, x_t)
            # variance learns through the vb term only; the mean path is frozen
            ax = self.channel_axis % model_output.ndim
            frozen = jnp.concatenate([jax.lax.stop_gradient(mean_out), var_values], axis=ax)
            terms["vb"] = self.vb_terms_bpd(
                None, x_start, x_t, t, clip_denoised=False, model_output=frozen
            )["output"]
            if self.loss_type == LossType.RESCALED_MSE:
                terms["vb"] = terms["vb"] * (self.num_timesteps / 1000.0)
            model_output = mean_out

        target = {
            MeanType.PREVIOUS_X: self.q_posterior_mean_variance(x_start, x_t, t)[0],
            MeanType.START_X: x_start,
            MeanType.EPSILON: noise,
        }[self.mean_type]
        assert model_output.shape == target.shape == x_start.shape
        terms["mse"] = mean_flat((target - model_output) ** 2)
        terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
        return terms

    def prior_bpd(self, x_start):
        t = jnp.full((x_start.shape[0],), self.num_timesteps - 1, jnp.int32)
        qt_mean, _, qt_logvar = self.q_mean_variance(x_start, t)
        return mean_flat(normal_kl(qt_mean, qt_logvar, 0.0, 0.0)) / np.log(2.0)


def create_diffusion(
    timestep_respacing: Optional[Union[str, Sequence[int]]] = None,
    noise_schedule: str = "linear",
    use_kl: bool = False,
    sigma_small: bool = False,
    predict_xstart: bool = False,
    learn_sigma: bool = True,
    rescale_learned_sigmas: bool = False,
    diffusion_steps: int = 1000,
    channel_axis: int = -1,
) -> GaussianDiffusion:
    """Factory matching reference create_diffusion defaults (__init__.py:10-46)."""
    betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    if timestep_respacing is None or timestep_respacing == "":
        timestep_respacing = [diffusion_steps]
    return GaussianDiffusion(
        betas=betas,
        mean_type=MeanType.START_X if predict_xstart else MeanType.EPSILON,
        var_type=(
            VarType.LEARNED_RANGE
            if learn_sigma
            else (VarType.FIXED_SMALL if sigma_small else VarType.FIXED_LARGE)
        ),
        loss_type=loss_type,
        use_timesteps=space_timesteps(diffusion_steps, timestep_respacing),
        channel_axis=channel_axis,
    )
