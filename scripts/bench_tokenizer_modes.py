"""Split tokenizer serving benchmarks: encode-only (LM-training data prep),
decode-only (generation rendering), and the full roundtrip — frames/s/chip.

Usage: python scripts/bench_tokenizer_modes.py [--batch 4] [--frames 17]
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=17)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from omnitokenizer_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()

    from omnitokenizer_tpu import OmniTokenizerVQGAN, imagenet_k600_config
    from omnitokenizer_tpu.models.tokenizer import OmniTokenizerNet

    cfg = imagenet_k600_config().replace(dtype=jnp.bfloat16)
    wrapper = OmniTokenizerVQGAN.from_config(cfg, seed=0)
    net, variables = wrapper.net, wrapper.serving_variables()

    B, T = args.batch, args.frames
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, 256, 256, 3),
                    jnp.float32) * 0.2
    lt, hw = cfg.latent_t, cfg.latent_hw
    ids = jnp.asarray(np.random.RandomState(1).randint(
        0, cfg.n_codes, (B, lt, hw, hw)), jnp.int32)

    def encode_scan(variables, x):
        def body(acc, _):
            xi = x * (1.0 + acc * 1e-30)
            enc = net.apply(variables, xi, False, False,
                            method=OmniTokenizerNet.encode)
            return acc + jnp.sum(enc).astype(jnp.float32), ()
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=args.iters)
        return acc

    def decode_scan(variables, ids):
        def body(acc, _):
            # value-identical data dependence the compiler can't fold away
            # (acc*1e-30 truncates to int 0 at runtime for our magnitudes,
            # but is not provably zero, so the loop body is not hoisted)
            ii = jnp.clip(ids + (acc * 1e-30).astype(jnp.int32),
                          0, cfg.n_codes - 1)
            rec = net.apply(variables, ii, False,
                            method=OmniTokenizerNet.decode)
            return acc + jnp.sum(rec.astype(jnp.float32)), ()
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=args.iters)
        return acc

    def roundtrip_scan(variables, x):
        def body(acc, _):
            xi = x * (1.0 + acc * 1e-30)
            recon, _ = net.apply(variables, xi, False)
            return acc + jnp.sum(recon.astype(jnp.float32)), ()
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None,
                              length=args.iters)
        return acc

    # decode always renders full-length clips from the latent grid
    # (1 + (latent_t - 1) * pt frames), independent of --frames
    t_dec = 1 + (lt - 1) * cfg.temporal_patch_size
    for name, fn, inp, t_out in (("encode", encode_scan, x, T),
                                 ("decode", decode_scan, ids, t_dec),
                                 ("roundtrip", roundtrip_scan, x, T)):
        run = jax.jit(fn)
        float(run(variables, inp))  # compile
        t0 = time.perf_counter()
        assert np.isfinite(float(run(variables, inp)))
        dt = time.perf_counter() - t0
        frames = B * t_out * args.iters
        print(f"{name:10s}: {frames / dt:8.1f} frames/s/chip "
              f"({dt / args.iters * 1000:.2f} ms / {B}x{t_out}-frame batch)")


if __name__ == "__main__":
    main()
