"""Profile the flagship GAN train step on the attached chip and print the
per-op device-time table (utils/trace_analysis) — the training-side
counterpart of profile_roundtrip.py, covering the workload of
/root/reference/scripts/recons/train.sh: 2 generator forwards
(ema_advances=2 cadence) + backward + both discriminators + LPIPS + both
optimizers, donated buffers.

Usage: python scripts/profile_train_step.py [--calls 3] [--batch 2]
       [--mode gan|lm]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _gan(args, profiling, trace_analysis):
    import jax
    import jax.numpy as jnp

    from omnitokenizer_tpu import imagenet_k600_config
    from omnitokenizer_tpu.config import LossConfig, TrainConfig
    from omnitokenizer_tpu.training.trainer import (TokenizerTrainer,
                                                    dealias_state)

    cfg = imagenet_k600_config().replace(dtype=jnp.bfloat16)
    loss = LossConfig(perceptual_weight=1.0, image_gan_weight=1.0,
                      video_gan_weight=1.0, gan_feat_weight=4.0,
                      discriminator_iter_start=0)
    tc = TrainConfig(lr=1e-4, warmup_steps=10, max_steps=1000,
                     warmup_lr_init=1e-5, ema_advances_per_step=2)
    trainer = TokenizerTrainer(cfg, loss, tc)
    state = dealias_state(trainer.init_state(seed=0, image_size=256,
                                             frames=args.frames))
    step = trainer.jit_train_step()
    video = jnp.asarray(np.random.RandomState(0).randn(
        args.batch, args.frames, 256, 256, 3), jnp.float32) * 0.2

    state, m = step(state, video)  # compile + warmup
    jax.block_until_ready(m)
    with profiling.trace(args.out):
        for _ in range(args.calls):
            state, m = step(state, video)
        jax.block_until_ready(m)
    return args.calls


def _lm(args, profiling, trace_analysis):
    from functools import partial

    import jax
    import jax.numpy as jnp
    import optax

    from omnitokenizer_tpu.config import GPTConfig
    from omnitokenizer_tpu.models.gpt import GPT

    cfg = GPTConfig(vocab_size=9219, block_size=1025, n_layer=24, n_head=16,
                    n_embd=1536, dtype=jnp.bfloat16)
    model = GPT(cfg)
    B = args.batch
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (B, cfg.block_size), 0, cfg.vocab_size)
    params = model.init(rng, ids[:, :-1])["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(1e-4, b1=0.9, b2=0.95, weight_decay=0.01))
    opt_state = tx.init(params)

    def loss_fn(p, ids):
        logits, _ = model.apply({"params": p}, ids[:, :-1])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), ids[:, 1:]).mean()

    @partial(jax.jit, donate_argnums=0)
    def step(carry, ids):
        p, o = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, ids)
        upd, o = tx.update(grads, o, p)
        return (optax.apply_updates(p, upd), o), loss

    carry = (params, opt_state)
    carry, loss = step(carry, ids)
    jax.block_until_ready(loss)
    with profiling.trace(args.out):
        for _ in range(args.calls):
            carry, loss = step(carry, ids)
        jax.block_until_ready(loss)
    return args.calls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--out", default="/tmp/omni-train-trace")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--mode", default="gan", choices=["gan", "lm"])
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from omnitokenizer_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()

    from omnitokenizer_tpu.utils import profiling, trace_analysis

    if args.mode == "lm" and args.batch == 2:
        args.batch = 8  # bench.py train_lm default
    calls = (_gan if args.mode == "gan" else _lm)(args, profiling,
                                                  trace_analysis)

    events = trace_analysis.load_trace_events(args.out)
    rows = trace_analysis.op_table(events, calls=calls)
    total = sum(r["ms"] for r in rows)
    print(f"total device ms/step: {total:.2f}")
    for row in rows[:args.top]:
        print(f"{row['ms']:8.3f} ms  x{row['count']:<4} "
              f"{row['name'][:60]:60s} {row.get('source', '')[:50]}")


if __name__ == "__main__":
    main()
