"""Int8 W8A8 decode path (ops/int8.py): quantization error bounds and the
quantized sampler end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from omnitokenizer_tpu.config import GPTConfig
from omnitokenizer_tpu.models.gpt import GPT, make_cfg_sampler, make_sampler
from omnitokenizer_tpu.ops.int8 import (int8_matmul, quantize_gpt_decode_params,
                                        quantize_weight)

RNG = np.random.RandomState(0)


def test_int8_matmul_error_bound():
    x = jnp.asarray(RNG.randn(16, 64).astype(np.float32))
    w = jnp.asarray(RNG.randn(64, 32).astype(np.float32) * 0.2)
    wq, ws = quantize_weight(w)
    assert wq.dtype == jnp.int8
    got = np.asarray(int8_matmul(x, wq, ws))
    want = np.asarray(x @ w)
    rel = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert rel.mean() < 0.02, f"mean rel err {rel.mean()}"


def test_int8_sampler_runs_and_tracks_f32():
    cfg = GPTConfig(vocab_size=64, block_size=24, n_layer=2, n_head=2,
                    n_embd=32, int8_decode=True)
    gpt = GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))["params"]
    quant = quantize_gpt_decode_params(params, cfg.n_layer)

    # quantized full forward tracks the f32 forward closely
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, cfg.vocab_size)
    ref_logits, _ = GPT(cfg.__class__(**{**cfg.__dict__, "int8_decode": False})
                        ).apply({"params": params}, toks)
    q_logits, _ = gpt.apply({"params": params, "quant": quant}, toks)
    err = np.abs(np.asarray(q_logits - ref_logits)).mean()
    scale = np.abs(np.asarray(ref_logits)).mean() + 1e-6
    assert err / scale < 0.1, f"relative logit error {err / scale}"

    # samplers accept quant and produce valid tokens
    sample = make_sampler(cfg, steps=5, top_k=10)
    prefix = jnp.asarray([[1, 2]], jnp.int32)
    out = sample(params, prefix, jax.random.PRNGKey(0), quant=quant)
    assert out.shape == (1, 5)
    assert 0 <= int(out.min()) and int(out.max()) < 64

    csample = make_cfg_sampler(cfg, steps=5, top_k=10, bucket=2)
    out = csample(params, jnp.asarray([[3]], jnp.int32), jax.random.PRNGKey(0),
                  quant=quant)
    assert out.shape == (1, 5)
