"""Profile the compiled AR decode loop (24L/16H/1536) and print per-op
device time — finds where the per-token milliseconds go.

Usage: python scripts/profile_lm_decode.py [--steps 16] [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/lm-decode-trace")
    ap.add_argument("--cfg", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from omnitokenizer_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()

    from omnitokenizer_tpu.config import GPTConfig
    from omnitokenizer_tpu.models.gpt import GPT, make_cfg_sampler, make_sampler
    from omnitokenizer_tpu.utils import profiling, trace_analysis

    cfg = GPTConfig(vocab_size=9193, block_size=1025, n_layer=24,
                    n_head=16, n_embd=1536, dtype=jnp.bfloat16)
    gpt = GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))["params"]
    cls = jnp.asarray(np.arange(args.batch)[:, None] % 1000, jnp.int32)
    prefix = jnp.concatenate([jnp.zeros_like(cls), cls + 1], axis=1)

    if args.cfg:
        sample = make_cfg_sampler(cfg, steps=args.steps, top_k=100)
        prefix = cls
    else:
        sample = make_sampler(cfg, steps=args.steps, top_k=100)
    toks = sample(params, prefix, jax.random.PRNGKey(0))
    assert int(jnp.max(toks)) >= 0

    with profiling.trace(args.out):
        toks = sample(params, prefix, jax.random.PRNGKey(1))
        assert int(jnp.max(toks)) >= 0

    events = trace_analysis.load_trace_events(args.out)
    # divide by decode steps to get per-step numbers
    for row in trace_analysis.op_table(events, calls=args.steps - 1)[:20]:
        print(f"{row['ms']:8.3f} ms  x{row['count']:<5} {row['name'][:58]:58s} "
              f"{row.get('source', '')[-42:]}")


if __name__ == "__main__":
    main()
