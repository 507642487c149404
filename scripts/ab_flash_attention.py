"""On-chip parity check for the GPT flash-attention training path (round 5).

GPT training forward (models/gpt.py `_flash_ok` branch): loss + grad
parity vs the materialized XLA math at the REAL flagship shape quirk
(T=1025, not a 128-multiple -> exercises the pad-to-block path).

The corresponding TOKENIZER training branch was tried and DELETED after an
on-chip loss (PERF.md round 5): 181.8 -> 158.2 f/s at B=2 — dim_head 64
fills only half of the kernel's 128-lane tiles, while the LM's dim_head 96
plus its OOM-forcing (B,H,1024,1024) f32 scores make flash the right call
there.

Run on the attached TPU: python scripts/ab_flash_attention.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gpt_parity_and_ab():
    import jax
    import jax.numpy as jnp
    import optax

    from omnitokenizer_tpu.config import GPTConfig
    from omnitokenizer_tpu.models.gpt import GPT

    cfg_f = GPTConfig(vocab_size=1200, block_size=1025, n_layer=2, n_head=16,
                      n_embd=768, dtype=jnp.bfloat16, flash_attention=True)
    cfg_n = dataclasses.replace(cfg_f, flash_attention=False)
    rng = jax.random.PRNGKey(0)
    ids = jax.random.randint(rng, (2, 1025), 0, 1200)
    params = GPT(cfg_f).init(rng, ids[:, :-1])["params"]

    def lossf(m):
        def f(p):
            logits, _ = m.apply({"params": p}, ids[:, :-1])
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), ids[:, 1:]).mean()
        return f

    lf, gf = jax.jit(jax.value_and_grad(lossf(GPT(cfg_f))))(params)
    ln, gn = jax.jit(jax.value_and_grad(lossf(GPT(cfg_n))))(params)
    print(f"[gpt] loss flash {float(lf):.6f} naive {float(ln):.6f}")
    assert abs(float(lf) - float(ln)) < 2e-2
    worst = ("", 0.0)
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(gf)[0],
                            jax.tree_util.tree_leaves(gn)):
        a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
        # relative to the leaf's grad scale; skip noise-level leaves (the
        # key-projection bias grad is mathematically 0 by softmax shift
        # invariance and compares as pure rounding noise)
        scale = float(jnp.max(jnp.abs(b32)))
        if scale < 1e-5:
            continue
        rel = float(jnp.max(jnp.abs(a32 - b32))) / scale
        if rel > worst[1]:
            worst = (jax.tree_util.keystr(path), rel)
    print(f"[gpt] worst grad rel err {worst[1]:.4f} at {worst[0]}")
    assert worst[1] < 0.1, worst


def main():
    from omnitokenizer_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()
    gpt_parity_and_ab()
    print("ALL OK")


if __name__ == "__main__":
    main()
