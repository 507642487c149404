"""Profile the flagship encode->VQ->decode roundtrip on the attached chip
and print the per-op device-time table (utils/trace_analysis).

Usage: python scripts/profile_roundtrip.py [--calls 3] [--out /tmp/omni-trace]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--out", default="/tmp/omni-trace")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=17)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from omnitokenizer_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()

    from omnitokenizer_tpu import OmniTokenizerVQGAN, imagenet_k600_config
    from omnitokenizer_tpu.utils import profiling
    from omnitokenizer_tpu.utils import trace_analysis

    cfg = imagenet_k600_config().replace(dtype=jnp.bfloat16)
    wrapper = OmniTokenizerVQGAN.from_config(cfg, seed=0)
    # same precast graph as bench.py, so the op table explains the benchmark
    net, variables = wrapper.net, wrapper.serving_variables()

    @jax.jit
    def roundtrip(variables, x):
        recon, aux = net.apply(variables, x, False)
        return jnp.sum(recon.astype(jnp.float32))

    x = jnp.asarray(np.random.RandomState(0).randn(
        args.batch, args.frames, 256, 256, 3), jnp.float32) * 0.2

    float(roundtrip(variables, x))  # compile
    with profiling.trace(args.out):
        for _ in range(args.calls):
            float(roundtrip(variables, x))

    events = trace_analysis.load_trace_events(args.out)
    for row in trace_analysis.op_table(events, calls=args.calls)[:28]:
        print(f"{row['ms']:8.3f} ms  x{row['count']:<4} {row['name'][:60]:60s} "
              f"{row.get('source', '')[:50]}")


if __name__ == "__main__":
    main()
