"""On-chip parity + A/B for the kernel-forward training branch (round 5).

ops/kernel_grad.py routes the tokenizer TRAINING forward through the
fwd-only Pallas serving kernels (ln_qkv + cosine_mha / small_n / geglu_ff)
with the backward defined as rematerialized XLA math.  This script:

  parity  — loss + grad parity vs the all-XLA training path on a real graph
            (spatial N=256, flat temporal t=5) with every op group enabled;
  sweep   — bench.py train_gan wall-clock across op-group combos/batches
            (fresh process per combo: the env gate is read at trace time).

Run on the attached TPU:
  python scripts/ab_train_kernel_fwd.py parity
  python scripts/ab_train_kernel_fwd.py sweep
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def parity():
    import jax
    import jax.numpy as jnp

    from omnitokenizer_tpu import imagenet_k600_config
    from omnitokenizer_tpu.models.tokenizer import OmniTokenizerNet

    cfg = imagenet_k600_config().replace(dtype=jnp.bfloat16, resolution=128)
    net = OmniTokenizerNet(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 17, 128, 128, 3), jnp.float32) * 0.2
    variables = net.init({"params": rng, "codebook": rng, "gaussian": rng},
                         x, False, training=True)

    def loss(p):
        (recon, aux), _ = net.apply(
            {"params": p, "buffers": variables["buffers"]}, x, False,
            training=True, rngs={"codebook": rng}, mutable=["buffers"])
        return jnp.mean(jnp.abs(recon - x)) + aux["commitment_loss"]

    results = {}
    for combo in ("0", "attn,ff,flat"):
        os.environ["OMNITOK_TRAIN_KERNEL_FWD"] = combo
        l, g = jax.jit(jax.value_and_grad(loss))(variables["params"])
        results[combo] = (float(l), g)

    l0, g0 = results["0"]
    l1, g1 = results["attn,ff,flat"]
    print(f"[parity] loss xla {l0:.6f} kernel-fwd {l1:.6f} "
          f"delta {abs(l1 - l0):.2e}", flush=True)
    assert abs(l1 - l0) < 2e-2
    # per-op isolation (`diag`) measures 0.6-1.3% per wrapped op; through
    # the full 8-layer enc + VQ + dec composite the bf16 forward deltas
    # cascade, so the bound here is looser — l2-rel per leaf, not max-abs
    worst = _grad_report(g1, g0, "parity")
    assert worst < 0.35, worst
    print("PARITY OK")


def _grad_report(g1, g0, tag):
    import jax

    worst_max = ("", 0.0)
    worst_l2 = ("", 0.0)
    for (path, a), b in zip(jax.tree_util.tree_flatten_with_path(g1)[0],
                            jax.tree_util.tree_leaves(g0)):
        a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = float(np.max(np.abs(b32)))
        if scale < 1e-5:
            continue
        rel = float(np.max(np.abs(a32 - b32))) / scale
        l2 = float(np.linalg.norm(a32 - b32)) / max(float(np.linalg.norm(b32)), 1e-12)
        if rel > worst_max[1]:
            worst_max = (jax.tree_util.keystr(path), rel)
        if l2 > worst_l2[1]:
            worst_l2 = (jax.tree_util.keystr(path), l2)
    print(f"[{tag}] worst grad max-rel {worst_max[1]:.4f} at {worst_max[0]}", flush=True)
    print(f"[{tag}] worst grad l2-rel  {worst_l2[1]:.4f} at {worst_l2[0]}", flush=True)
    return worst_l2[1]


def diag():
    """Per-op isolation: grad parity of each wrapped module on its own."""
    import jax
    import jax.numpy as jnp

    from omnitokenizer_tpu.ops.attention import Attention, FeedForward

    rng = jax.random.PRNGKey(0)

    def run(tag, module, x, combo, **kw):
        params = module.init(rng, x, **kw)["params"]

        def loss(p, x):
            return jnp.sum(module.apply({"params": p}, x, training=True, **kw) ** 2)

        out = {}
        for c in ("0", combo):
            os.environ["OMNITOK_TRAIN_KERNEL_FWD"] = c
            l, g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))(params, x)
            out[c] = (float(l), g)
        l0, g0 = out["0"]
        l1, g1 = out[combo]
        print(f"[{tag}] loss xla {l0:.5f} kern {l1:.5f} rel "
              f"{abs(l1 - l0) / abs(l0):.2e}", flush=True)
        _grad_report(g1, g0, tag)

    D = 512
    ff = FeedForward(D, dtype=jnp.bfloat16)
    x = (jax.random.normal(rng, (4, 256, D)) * 0.5).astype(jnp.bfloat16)
    run("ff", ff, x, "ff")

    attn_rope = Attention(dim=D, spatial_pos="rope", attn_bias_mode="sdpa",
                          dtype=jnp.bfloat16)
    run("attn-rope", attn_rope, x, "attn", is_spatial=True)

    attn_rel = Attention(dim=D, spatial_pos="rel", attn_bias_mode="sdpa",
                         dtype=jnp.bfloat16)
    run("attn-rel", attn_rel, x, "attn", is_spatial=True)

    attn_flat = Attention(dim=D, causal=True, attn_bias_mode="sdpa",
                          dtype=jnp.bfloat16)
    xf = (jax.random.normal(rng, (1280, D)) * 0.5).astype(jnp.bfloat16)
    run("flat-t", attn_flat, xf, "flat", is_spatial=False, n_frames=5)


def sweep():
    """Lean A/B: generator fwd+bwd only (recon L1 + commitment through the
    flagship net at 256^2, B=4) — the only region the kernel-fwd wrappers
    touch.  One process, one param build; each combo gets a fresh jit
    wrapper (the env gate is read at trace time).  A full bench.py
    train_gan compile is 25-45 min PER COMBO on the tunneled chip, so the
    full-step effect is validated once on the winner via `sweep_full`."""
    import time

    import jax
    import jax.numpy as jnp

    from omnitokenizer_tpu import imagenet_k600_config
    from omnitokenizer_tpu.models.tokenizer import OmniTokenizerNet

    cfg = imagenet_k600_config().replace(dtype=jnp.bfloat16)
    net = OmniTokenizerNet(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 17, 256, 256, 3),
                    jnp.float32) * 0.2
    variables = net.init({"params": rng, "codebook": rng, "gaussian": rng},
                         x, False, training=True)
    params, buffers = variables["params"], variables["buffers"]

    def loss(p, x):
        (recon, aux), _ = net.apply(
            {"params": p, "buffers": buffers}, x, False, training=True,
            rngs={"codebook": rng}, mutable=["buffers"])
        return jnp.mean(jnp.abs(recon - x)) + aux["commitment_loss"]

    combos = sys.argv[2:] or ["0", "ff", "attn", "flat", "attn,ff,flat", "0"]
    for combo in combos:
        os.environ["OMNITOK_TRAIN_KERNEL_FWD"] = combo
        step = jax.jit(jax.value_and_grad(loss))
        l, g = step(params, x)  # compile + warmup
        float(l)
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            l, g = step(params, x)
        # scalar fetch = completion barrier on the tunneled chip
        float(l), float(np.asarray(jax.tree_util.tree_leaves(g)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{combo or '(off)':>14}: G fwd+bwd {dt:.1f} ms "
              f"({4 * 17 / dt * 1e3:.1f} f/s)", flush=True)


def sweep_full():
    """One full bench.py train_gan run per combo (fresh process per combo —
    the env gate is read at trace time).  Use only to validate the final
    default end-to-end; see `sweep` for why."""
    combos = sys.argv[2:] or ["attn,ff,flat"]
    for combo in combos:
        env = dict(os.environ, OMNITOK_TRAIN_KERNEL_FWD=combo,
                   OMNITOK_BENCH_MODE="train_gan")
        try:
            out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                                 env=env, capture_output=True, text=True,
                                 timeout=3600)
        except subprocess.TimeoutExpired:
            print(f"{combo or '(off)':>14}: TIMEOUT (3600s)", flush=True)
            continue
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(f"{combo or '(off)':>14}: FAILED\n{out.stderr[-2000:]}", flush=True)
            continue
        r = json.loads(lines[-1])
        print(f"{combo or '(off)':>14}: {r['value']} f/s  "
              f"step {r['step_ms']} ms  mfu {r['mfu']}", flush=True)


if __name__ == "__main__":
    {"parity": parity, "sweep": sweep, "sweep_full": sweep_full, "diag": diag}[
        sys.argv[1] if len(sys.argv) > 1 else "parity"]()
