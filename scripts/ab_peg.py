"""PEG microbench + HLO-dump harness (round-3 perf pass).

Times the kLoop PEG formulation on-chip at the shapes the flagship
roundtrip actually runs (trace: 14 fusions, ~3.9 ms total) and can dump
the optimized HLO of the fusion for inspection.  Historical note: this
harness drove the round-3 Pallas peg_conv A/B (negative, kernel deleted
— PERF.md "PEG hoisted-shift kernel" section is the record).

Usage: python scripts/ab_peg.py [--hlo] [--shape B T H W C]
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
    ap.add_argument("--hlo", action="store_true")
    ap.add_argument("--shape", type=int, nargs=5, default=[4, 5, 32, 32, 512])
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from omnitokenizer_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()
    from omnitokenizer_tpu.ops.peg import PEG

    B, T, H, W, C = args.shape
    mod = PEG(dim=C, causal=args.causal, dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(0).randn(B, T * H * W, C), jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(0), x, (B, T, H, W))

    @jax.jit
    def run(variables, x):
        def body(acc, _):
            xi = x + (acc * 1e-30).astype(x.dtype)
            y = mod.apply(variables, xi, (B, T, H, W), residual=True)
            return acc + jnp.sum(y.astype(jnp.float32)), ()
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=args.reps)
        return acc

    if args.hlo:
        txt = jax.jit(lambda v, x: mod.apply(v, x, (B, T, H, W), residual=True)
                      ).lower(variables, x).compile().as_text()
        print(txt[:12000])
        return

    float(run(variables, x))  # compile
    t0 = time.perf_counter()
    float(run(variables, x))
    dt = time.perf_counter() - t0
    per = dt / args.reps * 1e3
    gb = (2 * B * T * H * W * C * 2) / 1e9  # in+out bf16
    fl = 27 * 2 * B * T * H * W * C / 1e9
    print(f"shape {args.shape} causal={args.causal}: {per:.4f} ms/call  "
          f"{gb / (per / 1e3):.0f} GB/s (2-pass equiv)  "
          f"{fl / (per / 1e3) / 1e3:.2f} TFLOP/s")


if __name__ == "__main__":
    main()
