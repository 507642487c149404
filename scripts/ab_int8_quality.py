"""int8 W8A8 decode quality A/B (VERDICT r2 item 4).

`--int8` serving (ops/int8.py) was benched (2884 tok/s) but never
quality-validated.  No released weights exist in this env, so: train a small
GPT on synthetic structured sequences (noisy Markov chain over a 512-code
vocab, class-conditional) until CE clearly descends, then measure int8 vs
bf16 on the SAME trained weights and sampling keys:

  * greedy token agreement rate (plain + CFG samplers)
  * sampled (t=1.0 top-k) token agreement rate
  * prefill logit max-delta / rel-delta
  * decoded-pixel PSNR between the two CFG sample streams through a small
    tokenizer decoder (pixel-level effect of the flipped tokens)

Prints a markdown table for ABLATION.md plus one JSON line.
Run on TPU (int8 dispatch) or CPU (slower):  python scripts/ab_int8_quality.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CODES = 512
N_CLASSES = 8
SEQ = 256  # 16x16 token image
STEPS = 300


def synth_batch(rng, b):
    """Noisy Markov sequences: tok_{n+1} = (7*tok_n + 13*cls + e) % N_CODES,
    e ~ {0,1,2}.  Learnable structure with entropy, conditional on class."""
    cls = rng.randint(0, N_CLASSES, size=(b,))
    toks = np.empty((b, SEQ), np.int32)
    toks[:, 0] = rng.randint(0, N_CODES, size=(b,))
    for n in range(1, SEQ):
        e = rng.randint(0, 3, size=(b,))
        toks[:, n] = (7 * toks[:, n - 1] + 13 * cls + e) % N_CODES
    return cls.astype(np.int32), toks


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from omnitokenizer_tpu.config import GPTConfig
    from omnitokenizer_tpu.models.gpt import (GPT, make_cfg_sampler,
                                              make_sampler)
    from omnitokenizer_tpu.ops.int8 import quantize_gpt_decode_params
    from omnitokenizer_tpu.utils.jit_cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = GPTConfig(vocab_size=N_CODES + N_CLASSES + 1, block_size=SEQ + 1,
                    n_layer=4, n_head=4, n_embd=256, dtype=jnp.bfloat16)
    gpt = GPT(cfg)
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    params = gpt.init(key, jnp.zeros((1, 8), jnp.int32))["params"]
    tx = optax.adamw(3e-4)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, cls, toks):
        # [sos=0 shift: class token = cls+1, codes offset by N_CLASSES+1]
        inp = jnp.concatenate([cls[:, None] + 1, toks + N_CLASSES + 1], axis=1)

        def loss_fn(p):
            logits, _ = gpt.apply({"params": p}, inp[:, :-1])
            tgt = inp[:, 1:]
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), tgt)
            return ce.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    first = last = None
    for i in range(STEPS):
        cls, toks = synth_batch(rng, 32)
        params, opt, loss = train_step(params, opt, jnp.asarray(cls),
                                       jnp.asarray(toks))
        if i == 0:
            first = float(loss)
        if i % 50 == 0:
            print(f"step {i}: ce={float(loss):.4f}")
    last = float(loss)
    assert last < first * 0.7, f"LM did not train ({first:.3f} -> {last:.3f})"

    quant = quantize_gpt_decode_params(jax.device_get(params), cfg.n_layer)
    cfg8 = GPTConfig(**{**cfg.__dict__, "int8_decode": True})

    results = {"train_ce_first": round(first, 4), "train_ce_last": round(last, 4)}
    B = 8
    cls = jnp.asarray(rng.randint(0, N_CLASSES, size=(B, 1)), jnp.int32)
    skey = jax.random.PRNGKey(42)

    # ---- plain sampler: cond prefix = class token ----------------------
    for mode, kw in (("greedy", dict(greedy=True)),
                     ("topk64_t1", dict(top_k=64, temperature=1.0))):
        s_bf = make_sampler(cfg, SEQ, **kw)
        s_i8 = make_sampler(cfg8, SEQ, **kw)
        tb = np.asarray(s_bf(params, cls + 1, skey))
        ti = np.asarray(s_i8(params, cls + 1, skey, quant=quant))
        results[f"agree_{mode}"] = round(float((tb == ti).mean()), 4)

    # ---- CFG sampler ---------------------------------------------------
    c_bf = make_cfg_sampler(cfg, SEQ, cfg_ratio=1.5, greedy=True)
    c_i8 = make_cfg_sampler(cfg8, SEQ, cfg_ratio=1.5, greedy=True)
    tb_cfg = np.asarray(c_bf(params, cls, skey))
    ti_cfg = np.asarray(c_i8(params, cls, skey, quant=quant))
    results["agree_cfg_greedy"] = round(float((tb_cfg == ti_cfg).mean()), 4)

    # ---- first divergence of the AR streams ----------------------------
    # positional agreement understates quality for autoregressive decoding:
    # one flipped token makes every later position differ even when both
    # streams are valid samples.  Record where they first split.
    div = np.where(tb_cfg != ti_cfg)
    first_div = (int(np.min(div[1])) if div[0].size else SEQ)
    results["cfg_first_divergence_pos"] = first_div

    # ---- teacher-forced agreement + prefill logit delta -----------------
    # the compounding-free measure: same ground-truth prefix into both
    # models, compare next-token argmax at every position
    _, toks = synth_batch(rng, 64)
    inp = jnp.asarray(toks + N_CLASSES + 1)
    lb, _ = jax.jit(lambda p, x: gpt.apply({"params": p}, x))(params, inp)
    li, _ = jax.jit(lambda p, x: GPT(cfg8).apply(
        {"params": p, "quant": quant}, x))(params, inp)
    lb = np.asarray(lb, np.float32)
    li = np.asarray(li, np.float32)
    results["tf_argmax_agree"] = round(
        float((lb.argmax(-1) == li.argmax(-1)).mean()), 4)
    results["logit_max_delta"] = round(float(np.abs(lb - li).max()), 4)
    results["logit_rel_delta"] = round(
        float(np.abs(lb - li).mean() / np.abs(lb).mean()), 5)

    # ---- decoded-pixel PSNR of the two CFG streams ---------------------
    from omnitokenizer_tpu.config import TokenizerConfig
    from omnitokenizer_tpu.models.tokenizer import OmniTokenizerNet

    tok_cfg = TokenizerConfig(
        embedding_dim=64, n_codes=N_CODES, codebook_dim=8, resolution=128,
        sequence_length=5, patch_size=8, temporal_patch_size=4,
        enc_block="tt", dec_block="tt", spatial_depth=2, temporal_depth=2,
        dim_head=16, heads=4)
    net = OmniTokenizerNet(tok_cfg)
    tvars = net.init(jax.random.PRNGKey(1),
                     jnp.zeros((1, 1, 128, 128, 3)), True)
    dec = jax.jit(lambda idx: net.apply(tvars, idx.reshape(B, 1, 16, 16),
                                        True, method="decode"))
    # map LM tokens back to code ids (offset removal, clamp like
    # transformer_eval.py)
    to_codes = lambda t: jnp.clip(jnp.asarray(t) - (N_CLASSES + 1), 0,
                                  N_CODES - 1)
    px_b = np.asarray(dec(to_codes(tb_cfg)), np.float32)
    px_i = np.asarray(dec(to_codes(ti_cfg)), np.float32)
    mse = np.mean((px_b - px_i) ** 2)
    psnr = float("inf") if mse == 0 else float(10 * np.log10(1.0 / mse))
    results["cfg_decode_psnr_db"] = round(psnr, 2) if np.isfinite(psnr) else "inf"

    print("\n| metric | value |\n|---|---|")
    for k, v in results.items():
        print(f"| {k} | {v} |")
    print()
    print(json.dumps({"ab": "int8_decode_quality", **results}))


if __name__ == "__main__":
    main()
