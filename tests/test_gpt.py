"""GPT + sampler tests: full-forward vs cached decode consistency, causal
masking, top-k/top-p filtering, Net2Net loss plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnitokenizer_tpu.config import GPTConfig, Net2NetConfig
from omnitokenizer_tpu.models.gpt import (
    GPT,
    init_cache,
    make_cfg_sampler,
    make_sampler,
    top_k_top_p_filtering,
)

CFG = GPTConfig(vocab_size=50, block_size=24, n_layer=2, n_head=2, n_embd=32)
RNG = np.random.RandomState(0)


@pytest.fixture(scope="module")
def gpt_params():
    gpt = GPT(CFG)
    idx = jnp.zeros((1, 4), jnp.int32)
    return gpt.init(jax.random.PRNGKey(0), idx)["params"]


def test_full_forward_shapes(gpt_params):
    gpt = GPT(CFG)
    idx = jnp.asarray(RNG.randint(0, 50, (2, 10)), jnp.int32)
    logits, _ = gpt.apply({"params": gpt_params}, idx)
    assert logits.shape == (2, 10, 50)


def test_causal_masking(gpt_params):
    gpt = GPT(CFG)
    idx = jnp.asarray(RNG.randint(0, 50, (1, 10)), jnp.int32)
    l1, _ = gpt.apply({"params": gpt_params}, idx)
    idx2 = idx.at[0, -1].set((idx[0, -1] + 1) % 50)
    l2, _ = gpt.apply({"params": gpt_params}, idx2)
    np.testing.assert_allclose(np.asarray(l1)[:, :9], np.asarray(l2)[:, :9],
                               rtol=1e-4, atol=1e-5)


def test_cached_decode_matches_full_forward(gpt_params):
    """Incremental KV-cache decode must reproduce full-forward logits."""
    gpt = GPT(CFG)
    T = 8
    idx = jnp.asarray(RNG.randint(0, 50, (2, T)), jnp.int32)
    full, _ = gpt.apply({"params": gpt_params}, idx)

    caches = init_cache(CFG, 2)
    # prefill with first 4 tokens
    l, caches = gpt.apply({"params": gpt_params}, idx[:, :4], caches, 0)
    np.testing.assert_allclose(np.asarray(l), np.asarray(full[:, :4]), rtol=2e-3, atol=1e-3)
    # decode one token at a time
    for t in range(4, T):
        l, caches = gpt.apply({"params": gpt_params}, idx[:, t:t + 1], caches, t)
        np.testing.assert_allclose(np.asarray(l[:, 0]), np.asarray(full[:, t]),
                                   rtol=2e-3, atol=1e-3)


def test_top_k_filtering():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0, 4.0]])
    out = np.asarray(top_k_top_p_filtering(logits, top_k=2))
    assert np.isfinite(out[0, 1]) and np.isfinite(out[0, 4])
    assert out[0, 0] < -1e8 and out[0, 2] < -1e8 and out[0, 3] < -1e8


def test_top_p_filtering():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.1, 0.05, 0.05]]))
    out = np.asarray(top_k_top_p_filtering(logits, top_p=0.7))
    # cumulative: 0.5, 0.8 -> keep first two (first-above-threshold kept)
    assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
    assert out[0, 2] < -1e8 and out[0, 3] < -1e8


def test_sampler_runs_and_respects_range(gpt_params):
    sample = make_sampler(CFG, steps=6, top_k=10)
    cond = jnp.asarray(RNG.randint(0, 50, (2, 3)), jnp.int32)
    toks = sample(gpt_params, cond, jax.random.PRNGKey(0))
    assert toks.shape == (2, 6)
    assert int(toks.min()) >= 0 and int(toks.max()) < 50


def test_sampler_greedy_matches_eager(gpt_params):
    """Greedy scan sampling == greedy eager loop with full forwards."""
    gpt = GPT(CFG)
    sample = make_sampler(CFG, steps=5, greedy=True)
    cond = jnp.asarray(RNG.randint(0, 50, (1, 3)), jnp.int32)
    toks = np.asarray(sample(gpt_params, cond, jax.random.PRNGKey(0)))

    seq = cond
    for _ in range(5):
        logits, _ = gpt.apply({"params": gpt_params}, seq)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
    want = np.asarray(seq[:, 3:])
    np.testing.assert_array_equal(toks, want)


def test_cfg_sampler_runs(gpt_params):
    sample = make_cfg_sampler(CFG, steps=4, top_k=10)
    cls = jnp.asarray([[3], [7]], jnp.int32)
    toks = sample(gpt_params, cls, jax.random.PRNGKey(1))
    assert toks.shape == (2, 4)
    assert int(toks.min()) >= 0 and int(toks.max()) < 50


def test_cfg_sampler_fused_matches_dual_stream(gpt_params):
    """The fused 2B-cache CFG decode must equal running the cond and uncond
    streams separately with the reference semantics: dense uncond past
    (sos at slot 0/pe 0, token i at slot 1+i) with pe index 2+i, blended
    logits (1+t)*cond - t*uncond, greedy."""
    gpt = GPT(CFG)
    steps, B, t = 6, 2, 1.5
    cls = jnp.asarray([[3], [7]], jnp.int32)
    c = cls + 1
    sos = jnp.zeros_like(c)
    prefix = jnp.concatenate([sos, c], axis=1)

    cache_c = init_cache(CFG, B)
    cache_u = init_cache(CFG, B)
    lc, cache_c = gpt.apply({"params": gpt_params}, prefix, cache_c, 0)
    lu, cache_u = gpt.apply({"params": gpt_params}, sos, cache_u, 0)

    def blend(lc, lu):
        return (1 + t) * lc - t * lu

    toks = []
    tok = jnp.argmax(blend(lc[:, -1], lu[:, -1]), axis=-1)
    for i in range(steps - 1):
        toks.append(tok)
        lc, cache_c = gpt.apply({"params": gpt_params}, tok[:, None],
                                cache_c, 2 + i, slot=2 + i)
        lu, cache_u = gpt.apply({"params": gpt_params}, tok[:, None],
                                cache_u, 2 + i, slot=1 + i)
        tok = jnp.argmax(blend(lc[:, -1], lu[:, -1]), axis=-1)
    toks.append(tok)
    want = np.stack([np.asarray(x) for x in toks], axis=1)

    sample = make_cfg_sampler(CFG, steps=steps, cfg_ratio=t, greedy=True)
    got = np.asarray(sample(gpt_params, cls, jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(got, want)


def test_bucketed_sampler_matches_full_window(gpt_params):
    """Segmented attention windows must not change greedy outputs."""
    cls = jnp.asarray([[3], [7]], jnp.int32)
    prefix = jnp.concatenate([jnp.zeros_like(cls), cls + 1], axis=1)
    full = make_sampler(CFG, steps=7, greedy=True)
    seg = make_sampler(CFG, steps=7, greedy=True, bucket=2)
    np.testing.assert_array_equal(
        np.asarray(full(gpt_params, prefix, jax.random.PRNGKey(0))),
        np.asarray(seg(gpt_params, prefix, jax.random.PRNGKey(0))))

    full_cfg = make_cfg_sampler(CFG, steps=7, greedy=True)
    seg_cfg = make_cfg_sampler(CFG, steps=7, greedy=True, bucket=3)
    np.testing.assert_array_equal(
        np.asarray(full_cfg(gpt_params, cls, jax.random.PRNGKey(0))),
        np.asarray(seg_cfg(gpt_params, cls, jax.random.PRNGKey(0))))


def test_bucketed_sampler_single_step(gpt_params):
    """steps=1 means zero scan iterations; bucketing must not crash."""
    sample = make_sampler(CFG, steps=1, greedy=True, bucket=4)
    prefix = jnp.asarray([[0, 4]], jnp.int32)
    toks = sample(gpt_params, prefix, jax.random.PRNGKey(0))
    assert toks.shape == (1, 1)


def test_net2net_loss():
    from omnitokenizer_tpu.models.net2net import Net2NetTransformer

    cfg = Net2NetConfig(
        gpt=GPTConfig(vocab_size=75, block_size=32, n_layer=2, n_head=2, n_embd=32),
        class_cond_dim=10, first_stage_vocab_size=64, starts_with_sos=True)
    n2n = Net2NetTransformer.__new__(Net2NetTransformer)
    n2n.cfg = cfg
    from omnitokenizer_tpu.models.gpt import GPT as _G

    n2n.gpt = _G(cfg.gpt)
    n2n.gpt_params = n2n.gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))["params"]

    z_ids = jnp.asarray(RNG.randint(0, 64, (2, 16)), jnp.int32)
    labels = jnp.asarray([1, 2], jnp.int32)
    loss, metrics = n2n.loss_fn(n2n.gpt_params, z_ids, labels)
    assert np.isfinite(float(loss))
    assert 0 <= float(metrics["acc1"]) <= 100
