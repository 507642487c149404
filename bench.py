"""Benchmark: 256^2 frames/sec/chip for encode+decode (the BASELINE.json
north-star: >= 2000 on TPU v5e).

Runs the flagship imagenet_k600 architecture in bfloat16 on video clips
(17 frames -> 5 latent frames), measuring the full tokenize round-trip
(encode -> VQ -> decode) as used by vqgan_eval.py.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_FPS = 2000.0


def main():
    import jax
    import jax.numpy as jnp

    from omnitokenizer_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()

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


if __name__ == "__main__":
    main()
