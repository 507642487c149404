"""Pallas kernel correctness in interpreter mode (runs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

RNG = np.random.RandomState(0)


def _sdpa_ref(q, k, v, scale, causal):
    s = np.einsum("bhid,bhjd->bhij", q.astype(np.float64), k.astype(np.float64)) * scale
    if causal:
        n = s.shape[-2]
        mask = np.triu(np.ones((n, n), bool), 1)
        s = np.where(mask, -1e9, s)
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhij,bhjd->bhid", p, v.astype(np.float64))


def test_mha_kernel_matches_reference():
    from omnitokenizer_tpu.ops.pallas.mha import mha_pallas

    B, H, N, D = 2, 3, 64, 16
    q = RNG.randn(B, H, N, D).astype(np.float32)
    k = RNG.randn(B, H, N, D).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    k /= np.linalg.norm(k, axis=-1, keepdims=True)
    v = RNG.randn(B, H, N, D).astype(np.float32)

    for causal in (False, True):
        got = np.asarray(mha_pallas(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                    scale=8.0, causal=causal, interpret=True))
        want = _sdpa_ref(q, k, v, 8.0, causal)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_vq_kernel_matches_xla_in_interpret_mode():
    from omnitokenizer_tpu.ops.codebook import vq_argmin_xla
    from omnitokenizer_tpu.ops.pallas import vq_kernel

    flat = RNG.randn(300, 8).astype(np.float32)
    emb = RNG.randn(64, 8).astype(np.float32)

    # run the pallas kernel in interpreter mode by rebuilding the call
    import functools

    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, d = flat.shape
    k = emb.shape[0]
    TM = vq_kernel.TILE_M
    m_pad = ((m + TM - 1) // TM) * TM
    x = jnp.pad(jnp.asarray(flat), ((0, m_pad - m), (0, 0)))
    e = jnp.asarray(emb)
    esq = jnp.sum(e * e, axis=1)[None, :]
    out = pl.pallas_call(
        vq_kernel._vq_kernel,
        grid=(m_pad // TM,),
        in_specs=[
            pl.BlockSpec((TM, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.int32),
        interpret=True,
    )(x, e, esq)[:m, 0]

    want = np.asarray(vq_argmin_xla(jnp.asarray(flat), jnp.asarray(emb)))
    np.testing.assert_array_equal(np.asarray(out), want)


def test_geglu_ff_interpret_matches_unfused():
    """Fused LN->GEGLU->Dense kernel vs the unfused bf16 reference path,
    including the non-lane-aligned inner dim (1365 for dim=512)."""
    from omnitokenizer_tpu.ops.pallas.geglu_ff import geglu_ff

    M, D = 300, 512
    inner = int(4.0 * 2 / 3 * D)
    x = RNG.randn(M, D).astype(np.float32)
    ln_w = RNG.randn(D).astype(np.float32)
    ln_b = RNG.randn(D).astype(np.float32)
    w1 = (RNG.randn(D, inner * 2) * 0.02).astype(np.float32)
    w2 = (RNG.randn(inner, D) * 0.02).astype(np.float32)

    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    xn = jnp.asarray((x - mean) / np.sqrt(var + 1e-5) * ln_w + ln_b, jnp.bfloat16)
    h = jnp.dot(xn, jnp.asarray(w1, jnp.bfloat16), preferred_element_type=jnp.float32)
    val, gate = jnp.split(h, 2, axis=-1)
    act = (jax.nn.gelu(gate, approximate=False) * val).astype(jnp.bfloat16)
    want = np.asarray(jnp.dot(act, jnp.asarray(w2, jnp.bfloat16),
                              preferred_element_type=jnp.float32), np.float32)

    got = np.asarray(
        geglu_ff(jnp.asarray(x, jnp.bfloat16), jnp.asarray(ln_w), jnp.asarray(ln_b),
                 jnp.asarray(w1), jnp.asarray(w2), interpret=True),
        np.float32)
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert got.shape == (M, D)
    assert rel < 0.05, rel


def test_ln_qkv_interpret_matches_unfused():
    """Fused LNG+q/kv projection vs unfused math, incl. the pre-norm-kv
    quirk (k/v project the raw input, only q sees the normed tokens)."""
    from omnitokenizer_tpu.ops.pallas.ln_qkv import ln_qkv

    M, D = 300, 512
    x = RNG.randn(M, D).astype(np.float32)
    gamma = RNG.randn(D).astype(np.float32)
    wq = (RNG.randn(D, D) * 0.02).astype(np.float32)
    wkv = (RNG.randn(D, 2 * D) * 0.02).astype(np.float32)

    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    xn = jnp.asarray((x - mean) / np.sqrt(var + 1e-5) * gamma, jnp.bfloat16)
    xb = jnp.asarray(x, jnp.bfloat16)
    want_q = np.asarray(jnp.dot(xn, jnp.asarray(wq, jnp.bfloat16),
                                preferred_element_type=jnp.float32), np.float32)
    want_kv = np.asarray(jnp.dot(xb, jnp.asarray(wkv, jnp.bfloat16),
                                 preferred_element_type=jnp.float32), np.float32)

    q, kv = ln_qkv(xb, jnp.asarray(gamma), jnp.asarray(wq), jnp.asarray(wkv),
                   interpret=True)
    q, kv = np.asarray(q, np.float32), np.asarray(kv, np.float32)
    assert q.shape == (M, D) and kv.shape == (M, 2 * D)
    for got, want in ((q, want_q), (kv, want_kv)):
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.05, rel


def test_training_path_never_dispatches_pallas(monkeypatch):
    """Pallas kernels have no linearization rules — jax.grad through one
    CRASHES on real TPU (found live in round 2: vq_argmin + mha under the
    GAN train step).  Force every 'supported' gate open and make each
    kernel raise: the training=True path must still run, the serving path
    must dispatch (and therefore raise here)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import omnitokenizer_tpu.ops.pallas.mha as mha
    import omnitokenizer_tpu.ops.pallas.cosine_mha as cmha
    import omnitokenizer_tpu.ops.pallas.small_attn as sattn
    import omnitokenizer_tpu.ops.pallas.ln_qkv as lnq
    import omnitokenizer_tpu.ops.pallas.geglu_ff as gff

    def boom(*a, **k):
        raise AssertionError("pallas kernel dispatched under training")

    monkeypatch.setattr(mha, "mha_supported", lambda *a, **k: True)
    monkeypatch.setattr(mha, "mha_pallas", boom)
    monkeypatch.setattr(cmha, "cosine_mha_supported", lambda *a, **k: True)
    monkeypatch.setattr(cmha, "cosine_mha", boom)
    monkeypatch.setattr(sattn, "small_n_supported", lambda *a, **k: True)
    monkeypatch.setattr(sattn, "small_n_attention", boom)
    monkeypatch.setattr(sattn, "small_n_attention_flat", boom)
    monkeypatch.setattr(lnq, "ln_qkv_supported", lambda *a, **k: True)
    monkeypatch.setattr(lnq, "ln_qkv", boom)
    monkeypatch.setattr(gff, "geglu_ff_supported", lambda *a, **k: True)
    monkeypatch.setattr(gff, "geglu_ff", boom)

    from omnitokenizer_tpu.config import TokenizerConfig
    from omnitokenizer_tpu.models.tokenizer import OmniTokenizerNet

    cfg = TokenizerConfig(
        embedding_dim=16, n_codes=32, codebook_dim=4, resolution=16,
        sequence_length=3, patch_size=4, temporal_patch_size=2,
        enc_block="t", dec_block="t", spatial_depth=1, temporal_depth=1,
        dim_head=8, heads=2, dtype=jnp.bfloat16)
    net = OmniTokenizerNet(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 16, 16, 3),
                    jnp.float32) * 0.2
    variables = net.init({"params": jax.random.PRNGKey(0),
                          "codebook": jax.random.PRNGKey(1)}, x, False,
                         training=True)

    # training path: must NOT touch any kernel, and must differentiate
    def loss(p):
        recon, aux = net.apply(
            {"params": p, "buffers": variables["buffers"]}, x, False,
            training=True, rngs={"codebook": jax.random.PRNGKey(2)},
            mutable=["buffers"])[0]
        return jnp.mean(jnp.abs(recon - x)) + aux["commitment_loss"]

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(v).all() for v in jax.tree_util.tree_leaves(g))

    # serving path: the same forced-open gates MUST dispatch -> boom
    import pytest as _pytest

    with _pytest.raises(Exception, match="pallas kernel dispatched"):
        net.apply(variables, x, False, training=False)
