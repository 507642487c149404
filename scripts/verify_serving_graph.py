"""On-chip validation of the composed bf16 TPU serving graph.

The graph that produces BENCH numbers (bf16 + flat-temporal + fast_patchify
+ every Pallas kernel live on the real TPU backend) must be provably the
same model as the oracle-proven f32 graph (the one the torch-parity tests
certify).  CPU tests (tests/test_serving_graph.py) prove the flat/fast
composition; this script closes the last gap — the Pallas kernels only
dispatch on hardware.

Asserts, on the flagship imagenet_k600 architecture with random weights:
  * encode indices: serving bf16 graph vs on-chip f32 exact graph agree at
    or above the bf16 noise floor (f32-vs-bf16-no-kernels agreement);
  * decode pixels: serving graph within bf16 tolerance of the f32 graph.

Run:  python scripts/verify_serving_graph.py    (requires a TPU)
Exit code 0 = the benched graph is numerically certified.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", (
        "this script certifies the on-chip kernel graph; run on TPU "
        f"(got {jax.default_backend()})")

    from omnitokenizer_tpu import OmniTokenizerVQGAN, imagenet_k600_config
    from omnitokenizer_tpu.models.tokenizer import OmniTokenizerNet

    cfg32 = imagenet_k600_config()
    wrapper = OmniTokenizerVQGAN.from_config(cfg32, seed=0)
    variables = wrapper.serving_variables()

    net32 = OmniTokenizerNet(cfg32)  # f32, exact oracle-proven path
    # full serving composition (what bench.py runs)
    net_serve = OmniTokenizerNet(cfg32.replace(
        dtype=jnp.bfloat16, flat_temporal="auto", fast_patchify=True))
    # bf16 WITHOUT the layout/kernel fast paths = the bf16 noise floor
    net_floor = OmniTokenizerNet(cfg32.replace(
        dtype=jnp.bfloat16, flat_temporal="off", fast_patchify=False))

    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 17, 256, 256, 3) * 0.2, jnp.float32)

    enc32 = jax.jit(lambda v, x: net32.apply(v, x, False, method="encode"))
    encS = jax.jit(lambda v, x: net_serve.apply(v, x, False, method="encode"))
    encF = jax.jit(lambda v, x: net_floor.apply(v, x, False, method="encode"))

    idx32 = np.asarray(enc32(variables, x))
    idxS = np.asarray(encS(variables, x))
    idxF = np.asarray(encF(variables, x))

    agree_serve = float((idxS == idx32).mean())
    agree_floor = float((idxF == idx32).mean())
    print(f"encode idx agreement vs f32: serving={agree_serve:.4f} "
          f"bf16-floor={agree_floor:.4f}")
    ok = agree_serve >= agree_floor - 0.015

    dec32 = jax.jit(lambda v, i: net32.apply(v, i, False, method="decode"))
    decS = jax.jit(lambda v, i: net_serve.apply(v, i, False, method="decode"))
    decF = jax.jit(lambda v, i: net_floor.apply(v, i, False, method="decode"))

    idx = jnp.asarray(idx32)
    px32 = np.asarray(dec32(variables, idx), np.float32)
    pxS = np.asarray(decS(variables, idx), np.float32)
    pxF = np.asarray(decF(variables, idx), np.float32)

    scale = np.abs(px32).mean()
    rel_serve = float(np.abs(pxS - px32).mean() / scale)
    rel_floor = float(np.abs(pxF - px32).mean() / scale)
    corr = float(np.corrcoef(pxS.ravel(), px32.ravel())[0, 1])
    print(f"decode pixel rel-err vs f32: serving={rel_serve:.5f} "
          f"bf16-floor={rel_floor:.5f} corr={corr:.6f}")
    ok = ok and rel_serve <= max(2 * rel_floor, 0.02) and corr > 0.999

    print("SERVING GRAPH", "CERTIFIED" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
