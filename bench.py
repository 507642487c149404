"""Benchmark: 256^2 frames/sec/chip for encode+decode (the BASELINE.json
north-star: >= 2000 on TPU v5e).

Default mode runs the flagship imagenet_k600 architecture in bfloat16 on
video clips (17 frames -> 5 latent frames), measuring the full tokenize
round-trip (encode -> VQ -> decode) as used by vqgan_eval.py.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Extra modes (OMNITOK_BENCH_MODE):
  serve      (default) encode+VQ+decode round-trip
  train_gan  full tokenizer GAN train step — 2 G forwards (ema_advances=2
             reference cadence) + backward + both discriminators + LPIPS +
             both optimizers, donated buffers (the /root/reference
             scripts/recons/train.sh workload)
  train_lm   LM train step — 24L/16H/1536 GPT fwd+bwd+AdamW on 1024-token
             class-cond sequences (scripts/lm_train/train_imagenet_class.sh)
Both train modes also report an MFU estimate from XLA's own per-step flop
count vs the v5e bf16 peak.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_FPS = 2000.0
V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e: 197 bf16 TFLOP/s per chip


def _serve():
    import jax
    import jax.numpy as jnp

    from omnitokenizer_tpu import OmniTokenizerVQGAN, imagenet_k600_config
    from omnitokenizer_tpu.models.tokenizer import OmniTokenizerNet

    cfg = imagenet_k600_config().replace(dtype=jnp.bfloat16)
    if os.environ.get("OMNITOK_BENCH_FP32_QUANT", "1") == "0":
        cfg = cfg.replace(fp32_quant=False)  # A/B knob, default untouched
    wrapper = OmniTokenizerVQGAN.from_config(cfg, seed=0)
    net = wrapper.net
    variables = wrapper.serving_variables()

    B = int(os.environ.get("OMNITOK_BENCH_BATCH", "4"))
    T = 17

    def roundtrip(variables, x, acc):
        recon, aux = net.apply(variables, x, False)
        # scalar accumulator chains iterations on-device and forces full
        # execution on async/tunneled backends (block_until_ready returns at
        # enqueue time there); one host fetch at the end keeps tunnel RTT
        # out of the measurement
        return acc + jnp.sum(recon.astype(jnp.float32))

    x = jnp.asarray(np.random.RandomState(0).randn(B, T, 256, 256, 3), jnp.float32) * 0.2

    iters = int(os.environ.get("OMNITOK_BENCH_ITERS", "20"))

    @jax.jit
    def run(variables, x):
        # the iteration loop lives on-device (lax.scan) so the measurement is
        # pure execution throughput; per-dispatch host/tunnel overhead (~2ms
        # on the tunneled dev chip, absent on a production-attached host)
        # would otherwise pollute a ~33ms step
        def body(acc, _):
            # data-dependence on acc (value-identical: acc*1e-30 underflows
            # against x in f32) stops XLA hoisting the loop-invariant body
            xi = x * (1.0 + acc * 1e-30)
            return roundtrip(variables, xi, acc), ()
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              None, length=iters)
        return acc

    float(run(variables, x))  # warmup / compile

    t0 = time.perf_counter()
    acc = run(variables, x)
    assert np.isfinite(float(acc))  # single fetch = completion barrier
    dt = time.perf_counter() - t0

    frames = B * T * iters
    fps = frames / dt
    n_chips = jax.device_count()
    fps_per_chip = fps / n_chips

    print(json.dumps({
        "metric": "encode_decode_256px_frames_per_sec_per_chip",
        "value": round(fps_per_chip, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps_per_chip / BASELINE_FPS, 4),
    }))


def _xla_flops(compiled) -> float:
    """Per-execution flop count from XLA's own cost model (0 if absent)."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return 0.0
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    try:
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _timed_steps(step, state, batch, iters):
    """Warm up, then time `iters` sequential donated steps wall-clock.

    The donated state threads through the loop exactly as training does;
    the final VALUE FETCH is the completion barrier (valid on async/tunneled
    backends because step N+1 consumes step N's buffers on-device;
    block_until_ready returns at enqueue time on the tunneled dev chip and
    would time dispatch, not execution)."""
    import jax

    def fetch(m):
        leaf = jax.tree_util.tree_leaves(m)[0]
        return float(np.asarray(jax.device_get(leaf)).ravel()[0])

    state, m = step(state, batch)          # compile + warmup
    fetch(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    fetch(m)
    dt = (time.perf_counter() - t0) / iters
    return dt, state


def _train_gan():
    import jax
    import jax.numpy as jnp

    from omnitokenizer_tpu import imagenet_k600_config
    from omnitokenizer_tpu.config import LossConfig, TrainConfig
    from omnitokenizer_tpu.training.trainer import TokenizerTrainer, dealias_state

    cfg = imagenet_k600_config().replace(dtype=jnp.bfloat16)
    # the reference training losses (scripts/recons/train.sh):
    # perceptual + image/video GAN + feature-matching, disc warm active
    loss = LossConfig(perceptual_weight=1.0, image_gan_weight=1.0,
                      video_gan_weight=1.0, gan_feat_weight=4.0,
                      discriminator_iter_start=0)
    tc = TrainConfig(lr=1e-4, warmup_steps=10, max_steps=1000,
                     warmup_lr_init=1e-5, ema_advances_per_step=2)
    trainer = TokenizerTrainer(cfg, loss, tc)

    # B=4 beats B=2 on-chip (184.5 vs 181.8 f/s, round-5 A/B in PERF.md)
    B = int(os.environ.get("OMNITOK_BENCH_BATCH", "4"))
    T = 17
    state = dealias_state(trainer.init_state(seed=0, image_size=256, frames=T))
    step = trainer.jit_train_step()

    video = jnp.asarray(
        np.random.RandomState(0).randn(B, T, 256, 256, 3), jnp.float32) * 0.2

    iters = int(os.environ.get("OMNITOK_BENCH_ITERS", "10"))
    dt, state = _timed_steps(step, state, video, iters)

    flops = _xla_flops(step.lower(state, video).compile())

    n_chips = jax.device_count()
    fps_per_chip = B * T / dt / n_chips
    mfu = flops / dt / (V5E_BF16_PEAK_FLOPS * n_chips) if flops else None
    print(json.dumps({
        "metric": "train_gan_256px_frames_per_sec_per_chip",
        "value": round(fps_per_chip, 2),
        "unit": "frames/s/chip",
        "vs_baseline": None,
        "step_ms": round(dt * 1e3, 2),
        "batch": B,
        "mfu": round(mfu, 4) if mfu is not None else None,
    }))


def _train_lm():
    import jax
    import jax.numpy as jnp
    import optax

    from omnitokenizer_tpu.config import GPTConfig
    from omnitokenizer_tpu.models.gpt import GPT

    # scripts/lm_train/train_imagenet_class.sh flagship: 24L 16H 1536,
    # 1024 image tokens + 1 class token
    cfg = GPTConfig(vocab_size=9219, block_size=1025, n_layer=24, n_head=16,
                    n_embd=1536, dtype=jnp.bfloat16,
                    flash_attention=os.environ.get(
                        "OMNITOK_BENCH_NO_FLASH") != "1")
    model = GPT(cfg)
    B = int(os.environ.get("OMNITOK_BENCH_BATCH", "8"))
    L = cfg.block_size

    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (B, L), 0, cfg.vocab_size)
    params = model.init(rng, ids[:, :-1])["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(1e-4, b1=0.9, b2=0.95, weight_decay=0.01))
    opt_state = tx.init(params)

    def loss_fn(p, ids):
        logits, _ = model.apply({"params": p}, ids[:, :-1])
        tgt = ids[:, 1:]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), tgt).mean()

    from functools import partial

    # donate the carry like the production path: without it every timed
    # step pays a full params+AdamW-state HBM copy (ADVICE r4)
    @partial(jax.jit, donate_argnums=0)
    def step(carry, ids):
        p, o = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, ids)
        upd, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, upd)
        return (p, o), loss

    iters = int(os.environ.get("OMNITOK_BENCH_ITERS", "10"))
    carry = (params, opt_state)
    carry, loss = step(carry, ids)
    float(loss)  # value fetch = completion barrier (see _timed_steps)
    t0 = time.perf_counter()
    for _ in range(iters):
        carry, loss = step(carry, ids)
    float(loss)
    dt = (time.perf_counter() - t0) / iters

    flops = _xla_flops(step.lower(carry, ids).compile())

    n_chips = jax.device_count()
    tok_per_s = B * (L - 1) / dt / n_chips
    mfu = flops / dt / (V5E_BF16_PEAK_FLOPS * n_chips) if flops else None
    print(json.dumps({
        "metric": "train_lm_tokens_per_sec_per_chip",
        "value": round(tok_per_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": None,
        "step_ms": round(dt * 1e3, 2),
        "batch": B,
        "mfu": round(mfu, 4) if mfu is not None else None,
    }))


def main():
    from omnitokenizer_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()

    mode = os.environ.get("OMNITOK_BENCH_MODE", "serve")
    {"serve": _serve, "train_gan": _train_gan, "train_lm": _train_lm}[mode]()


if __name__ == "__main__":
    main()
