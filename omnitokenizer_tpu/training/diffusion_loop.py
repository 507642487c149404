"""DiT/Latte diffusion training utilities.

Behavioral reference: /root/reference/Diffusion/DiT/train.py
  - update_ema decay 0.9999 :47-56, EMA init synced :220, AdamW(1e-4, wd=0)
    :181, uniform timesteps :233, latents pre-scaled by 0.18215 :242
and /root/reference/Diffusion/Latte/train.py (same recipe on video latents,
gradient clipping :261-ish, OmniTokenizer VAE seam :216).

TPU-native: one jitted train step over Mesh(('data',)) — batch sharded on
'data', params/EMA replicated, XLA inserts the grad all-reduce; the EMA
update is part of the same compiled step (no separate host pass).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import numpy as np


class DiffusionTrainState(NamedTuple):
    params: Any
    ema_params: Any
    opt_state: Any
    step: Any  # int32 scalar


def make_diffusion_train_step(
    loss_model_fn: Callable,
    diffusion,
    tx,
    ema_decay: float = 0.9999,
):
    """Build the jitted train step.

    `loss_model_fn(params, x_t, t, rng, **cond) -> model_output` must handle
    conditioning dropout internally (LabelEmbedder CFG dropout).
    """
    import jax
    import jax.numpy as jnp
    import optax

    def step_fn(state: DiffusionTrainState, x0, t, weights, key, cond: Dict[str, Any]):
        key_noise, key_drop = jax.random.split(key)

        def loss_fn(params):
            model = lambda x_t, tt, **kw: loss_model_fn(params, x_t, tt, key_drop, **kw)
            terms = diffusion.training_losses(model, x0, t, key_noise, model_kwargs=cond)
            loss = jnp.mean(terms["loss"] * weights)
            aux = {k: jnp.mean(v) for k, v in terms.items()}
            aux["per_t_loss"] = terms["loss"]
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA inside the same compiled graph (reference update_ema :47-56)
        ema = jax.tree_util.tree_map(
            lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
            state.ema_params, params)
        aux["grad_norm"] = optax.global_norm(grads)
        return DiffusionTrainState(params, ema, opt_state, state.step + 1), loss, aux

    return jax.jit(step_fn)


def save_diffusion_state(path: str, state: DiffusionTrainState) -> None:
    from flax import serialization

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(state))
    os.replace(tmp, path)


def load_diffusion_state(path: str, template: DiffusionTrainState) -> DiffusionTrainState:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
