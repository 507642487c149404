"""AR sampling throughput for the canonical LM (24L/16H/1536, vocab 9193)
with the fused dual-stream CFG decoder — tokens/sec/chip.

The per-token cost is weight-bandwidth-bound: ~680M params read per decode
step; batching amortizes the read across rows, and the fused [cond|uncond]
cache amortizes it across the two CFG streams.

Usage: python scripts/bench_lm_sampling.py [--steps 256] [--batch 8] [--no_cfg]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--no_cfg", action="store_true")
    ap.add_argument("--bucket", type=int, default=0)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--n_layer", type=int, default=24)
    ap.add_argument("--n_head", type=int, default=16)
    ap.add_argument("--n_embd", type=int, default=1536)
    ap.add_argument("--block_size", type=int, default=1025)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from omnitokenizer_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()

    from omnitokenizer_tpu.config import GPTConfig
    from omnitokenizer_tpu.models.gpt import GPT, make_cfg_sampler, make_sampler

    cfg = GPTConfig(vocab_size=9193, block_size=args.block_size, n_layer=args.n_layer,
                    n_head=args.n_head, n_embd=args.n_embd, dtype=jnp.bfloat16,
                    int8_decode=args.int8)
    gpt = GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))["params"]
    quant = None
    if args.int8:
        from omnitokenizer_tpu.ops.int8 import quantize_gpt_decode_params
        quant = quantize_gpt_decode_params(params, cfg.n_layer)
    cls = jnp.asarray(np.arange(args.batch)[:, None] % 1000, jnp.int32)

    if args.no_cfg:
        sample = make_sampler(cfg, steps=args.steps, top_k=100,
                              bucket=args.bucket or None)
        run = lambda key: sample(params, jnp.concatenate(
            [jnp.zeros_like(cls), cls + 1], axis=1), key, quant=quant)
    else:
        sample = make_cfg_sampler(cfg, steps=args.steps, top_k=100, cfg_ratio=1.5,
                                  bucket=args.bucket or None)
        run = lambda key: sample(params, cls, key, quant=quant)

    toks = run(jax.random.PRNGKey(0))
    assert int(jnp.max(toks)) >= 0  # completion barrier incl. compile

    t0 = time.perf_counter()
    reps = args.reps
    for r in range(reps):
        toks = run(jax.random.PRNGKey(1 + r))
        assert int(jnp.max(toks)) >= 0
    dt = (time.perf_counter() - t0) / reps

    total = args.batch * args.steps
    print(f"steps={args.steps} batch={args.batch} cfg={not args.no_cfg} int8={args.int8}: "
          f"{dt*1000:.1f} ms/seq-batch, {total/dt:.1f} tok/s, "
          f"{dt/args.steps*1000:.2f} ms/step")


if __name__ == "__main__":
    main()
