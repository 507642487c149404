"""Training loop driver: metrics logging, periodic checkpoints, auto-resume,
reconstruction-grid dumps.

Replaces the Lightning Trainer + callbacks of the reference:
 * ModelCheckpoint every N steps + auto-resume from the newest checkpoint
   (/root/reference/vqgan_train.py:101-147);
 * ImageLogger/VideoLogger recon grids (modules/callbacks.py:12-114),
   written as PNG strips under <root>/images/;
 * wandb scalar logging replaced by metrics.jsonl (+stdout every log_every).
"""

from __future__ import annotations

import glob
import json
import os
import re
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from .trainer import TokenizerTrainState, TokenizerTrainer, dealias_state


def _cached_by_trainer(fn):
    cache: Dict[int, Any] = {}

    def wrapper(trainer):
        key = id(trainer)
        if key not in cache:
            cache[key] = fn(trainer)
        return cache[key]

    return wrapper


def save_state(path: str, state: TokenizerTrainState):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))


def load_state(path: str, template: TokenizerTrainState) -> TokenizerTrainState:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def find_latest_checkpoint(root: str) -> Optional[str]:
    """Newest step_*.msgpack under root (auto-resume, vqgan_train.py:122-147)."""
    cands = glob.glob(os.path.join(root, "checkpoints", "step_*.msgpack"))
    if not cands:
        return None
    return max(cands, key=lambda p: int(re.findall(r"step_(\d+)", p)[0]))


def _to_uint8(img: np.ndarray) -> np.ndarray:
    return np.clip((img + 0.5) * 255.0, 0, 255).astype(np.uint8)


def dump_recon_grid(root: str, split: str, step: int,
                    inputs: np.ndarray, recons: np.ndarray):
    """Side-by-side input|recon strip; video (B,T,H,W,C) flattens frames
    horizontally (callbacks.py behaviour)."""
    from PIL import Image

    def strip(x):
        x = np.asarray(x)
        if x.ndim == 5:  # B,T,H,W,C -> first sample, frames side by side
            x = x[0]
            return np.concatenate(list(x), axis=1)
        return x[0]

    top, bottom = _to_uint8(strip(inputs)), _to_uint8(strip(recons))
    grid = np.concatenate([top, bottom], axis=0)
    out_dir = os.path.join(root, "images", split)
    os.makedirs(out_dir, exist_ok=True)
    Image.fromarray(grid).save(os.path.join(out_dir, f"step_{step:08d}.png"))


class MetricsLogger:
    def __init__(self, root: str, log_every: int = 50,
                 wandb_project: str = None, wandb_config: Dict[str, Any] = None):
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, "metrics.jsonl")
        self.log_every = log_every
        self._f = open(self.path, "a")
        self._t0 = time.time()
        self._wandb = None
        if wandb_project:
            from ..utils.wandb_logger import WandbRun

            self._wandb = WandbRun(project=wandb_project, config=wandb_config, root=root)

    def log(self, step: int, metrics: Dict[str, Any]):
        rec = {"step": step, "time": round(time.time() - self._t0, 2)}
        rec.update({k: float(v) for k, v in metrics.items()
                    if np.ndim(v) == 0})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in rec.items() if k != "step"}, step=step)
        if step % self.log_every == 0:
            keys = ("recon_loss", "perceptual_loss", "discloss",
                    "perplexity", "avg_usage", "g_total")
            short = {k: round(v, 4) for k, v in rec.items() if k in keys}
            if not short:  # e.g. LM metrics (loss/acc1/acc5)
                short = {k: round(v, 4) for k, v in rec.items()
                         if k not in ("step", "time")}
            print(f"[step {step}] {short}", flush=True)


@_cached_by_trainer
def _eval_forward(trainer):
    net = trainer.net

    @jax.jit
    def fwd(params, buffers, v):
        rngs = ({"gaussian": jax.random.PRNGKey(0)}
                if trainer.cfg.use_vae else None)
        return net.apply({"params": params, "buffers": buffers},
                         v, v.shape[1] == 1, rngs=rngs)

    return fwd


def _log_schedule(every: int):
    """Exponential-then-periodic logging steps (callbacks.py:17-19):
    1, 2, 4, ..., every, then every N."""
    import math

    exp = {2 ** n for n in range(int(math.log2(max(every, 2))) + 1)}

    def should_log(step: int) -> bool:
        return step in exp or (every > 0 and step % every == 0)

    return should_log


def train_tokenizer(
    trainer: TokenizerTrainer,
    batches: Iterable[Dict[str, np.ndarray]],
    root_dir: str,
    max_steps: int,
    mesh=None,
    ckpt_every: int = 3000,
    img_every: int = 1000,
    log_every: int = 50,
    resume: bool = True,
    seed: int = 0,
    initial_state: Optional[TokenizerTrainState] = None,
    val_batches: Optional[Iterable[Dict[str, np.ndarray]]] = None,
    val_every: int = 2000,
    val_steps: int = 8,
    wandb_project: Optional[str] = None,
    wandb_config: Optional[Dict[str, Any]] = None,
    ckpt_backend: str = "msgpack",
):
    """Run the jitted GAN step over a batch stream.  Batches are dicts with
    'video' (B, T, H, W, C) channels-last float32."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    state = initial_state if initial_state is not None else trainer.init_state(seed=seed)
    orbax = None
    if ckpt_backend == "orbax":
        from ..utils.orbax_io import OrbaxCheckpointer

        orbax = OrbaxCheckpointer(root_dir)
        latest = orbax.latest_step() if resume else None
        if latest is not None:
            print(f"auto-resuming from orbax step {latest}")
            state = orbax.restore(jax.device_get(state), step=latest)
    else:
        ckpt = find_latest_checkpoint(root_dir) if resume else None
        if ckpt:
            print(f"auto-resuming from {ckpt}")
            state = load_state(ckpt, state)

    def write_ckpt(step_label: int, st: TokenizerTrainState):
        if orbax is not None:
            orbax.save(step_label, st)  # async: file write overlaps training
        else:
            save_state(os.path.join(root_dir, "checkpoints",
                                    f"step_{step_label:08d}.msgpack"), st)

    # donated step: params + both opt states update in place (no per-step
    # params+opt HBM copy). The loop only ever holds the newest state, so
    # donating the previous one is safe; dealias first (see trainer).
    step_fn = trainer.jit_train_step()
    state = dealias_state(state)
    logger = MetricsLogger(root_dir, log_every,
                           wandb_project=wandb_project, wandb_config=wandb_config)

    if mesh is not None:
        state = jax.device_put(state, NamedSharding(mesh, P()))

    # multi-resolution training (omnitokenizer.py:334-355): pick a random
    # scale per step and bilinear-resize; each distinct resolution compiles
    # its own step once and is cached thereafter
    res_scales = list(trainer.train_cfg.resolution_scale or [])
    res_rng = np.random.RandomState(seed + 17)

    should_log_img = _log_schedule(img_every)
    val_it = iter(val_batches) if val_batches is not None else None

    start = int(state.step)
    it = iter(batches)
    recon_fn = None
    for step in range(start, max_steps):
        batch = next(it)
        video = jnp.asarray(batch["video"], jnp.float32)
        if video.ndim == 4:
            video = video[:, None]
        if res_scales:
            s = float(res_rng.choice(res_scales))
            if s != 1.0:
                B, T, H, W, C = video.shape
                tgt = int(H * s)
                video = jax.image.resize(video, (B, T, tgt, tgt, C), "bilinear")
        if mesh is not None:
            video = jax.device_put(video, NamedSharding(mesh, P("data")))
        state, metrics = step_fn(state, video)

        logger.log(step, metrics)

        if step % ckpt_every == 0 and step > start:
            write_ckpt(step, state)

        # validation pass (reference validation_step, omnitokenizer.py:608-618)
        if val_it is not None and step > start and step % val_every == 0:
            val_metrics = []
            for _ in range(val_steps):
                vb = next(val_it)
                vv = jnp.asarray(vb["video"], jnp.float32)
                if vv.ndim == 4:
                    vv = vv[:, None]
                if mesh is not None:
                    vv = jax.device_put(vv, NamedSharding(mesh, P("data")))
                recon, aux = _eval_forward(trainer)(state.params_g, state.buffers, vv)
                val_metrics.append({
                    "val/recon_loss": float(jnp.mean(jnp.abs(recon - vv))),
                    "val/commitment_loss": float(aux["commitment_loss"]),
                })
            agg = {k: float(np.mean([m[k] for m in val_metrics]))
                   for k in val_metrics[0]}
            logger.log(step, agg)
            print(f"[val @ {step}] {agg}", flush=True)

        if img_every and should_log_img(step):
            if recon_fn is None:
                net = trainer.net

                @jax.jit
                def recon_fn(params, buffers, v):
                    out, _ = net.apply({"params": params, "buffers": buffers},
                                       v, v.shape[1] == 1,
                                       rngs={"gaussian": jax.random.PRNGKey(0)}
                                       if trainer.cfg.use_vae else None)
                    return out

            recons = recon_fn(state.params_g, state.buffers, video)
            dump_recon_grid(root_dir, "train", step,
                            jax.device_get(video), jax.device_get(recons))

    write_ckpt(int(state.step), state)
    if orbax is not None:
        orbax.wait()
        orbax.close()
    return state
