"""Unit tests for the op library against independent torch/numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from omnitokenizer_tpu.ops import (
    Attention,
    ContinuousPositionBias,
    FeedForward,
    LayerNorm,
    LayerNormGamma,
    PEG,
    Pooling,
    Transformer,
    Up,
    WindowAttention,
    alibi_slopes,
    apply_rotary_emb_2d,
    freqs_cis_2d,
    sdpa,
    vq_argmin_xla,
    vq_distances,
)

RNG = np.random.RandomState(0)


def test_layernorm_matches_torch():
    x = RNG.randn(2, 7, 16).astype(np.float32)
    ln = LayerNorm(16)
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    gamma = RNG.randn(16).astype(np.float32)
    beta = RNG.randn(16).astype(np.float32)
    params = {"params": {"weight": jnp.asarray(gamma), "bias": jnp.asarray(beta)}}
    got = ln.apply(params, jnp.asarray(x))
    want = TF.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(gamma), torch.from_numpy(beta))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5)


def test_layernorm_gamma_zero_beta():
    x = RNG.randn(3, 5, 8).astype(np.float32)
    ln = LayerNormGamma(8)
    gamma = RNG.randn(8).astype(np.float32)
    got = ln.apply({"params": {"gamma": jnp.asarray(gamma)}}, jnp.asarray(x))
    want = TF.layer_norm(torch.from_numpy(x), (8,), torch.from_numpy(gamma), torch.zeros(8))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5)


def test_rotary_2d_matches_complex_reference_math():
    """Independent oracle: complex polar multiply per the published RoPE-2D
    construction (x/y interleaved frequency slots)."""
    dim, N, H = 16, 9, 3
    B, heads = 2, 2
    q = RNG.randn(B, N, heads, dim).astype(np.float32)
    k = RNG.randn(B, N, heads, dim).astype(np.float32)

    # oracle in numpy complex
    pos = np.arange(N)
    x_pos, y_pos = pos % H, pos // H
    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 4)[: dim // 4] / dim))
    x_cis = np.exp(1j * np.outer(x_pos, freqs))
    y_cis = np.exp(1j * np.outer(y_pos, freqs))
    cis = np.stack([x_cis, y_cis], axis=-1).reshape(N, dim // 2)

    def apply_np(t):
        tc = t.reshape(B, N, heads, dim // 2, 2)
        tc = tc[..., 0] + 1j * tc[..., 1]
        out = tc * cis[None, :, None, :]
        return np.stack([out.real, out.imag], axis=-1).reshape(B, N, heads, dim)

    got_q, got_k = apply_rotary_emb_2d(jnp.asarray(q), jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(got_q), apply_np(q).astype(np.float32), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_k), apply_np(k).astype(np.float32), rtol=1e-5, atol=1e-5)


def test_alibi_slopes_power_of_two():
    s = alibi_slopes(8)
    np.testing.assert_allclose(s, [2.0 ** -(i + 1) for i in range(8)])


def test_sdpa_matches_torch_sdpa():
    B, H, N, D = 2, 3, 10, 8
    # l2-normalized q,k as in real cosine-sim usage (unnormalized inputs at
    # scale=8 saturate the softmax and amplify benign rounding differences)
    q = RNG.randn(B, H, N, D).astype(np.float32)
    k = RNG.randn(B, H, N, D).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    k /= np.linalg.norm(k, axis=-1, keepdims=True)
    v = RNG.randn(B, H, N, D).astype(np.float32)
    for causal in (False, True):
        got = sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=8.0, causal=causal)
        want = TF.scaled_dot_product_attention(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            is_causal=causal, scale=8.0)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


def test_geglu_feedforward_matches_torch():
    dim = 12
    x = RNG.randn(2, 5, dim).astype(np.float32)
    ff = FeedForward(dim, mult=4.0)
    variables = ff.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]
    got = np.asarray(ff.apply(variables, jnp.asarray(x)))

    # torch oracle with the same weights
    inner = int(4.0 * 2 / 3 * dim)
    xt = torch.from_numpy(x)
    ln = TF.layer_norm(xt, (dim,), torch.from_numpy(np.asarray(p["norm_weight"])),
                       torch.from_numpy(np.asarray(p["norm_bias"])))
    h = ln @ torch.from_numpy(np.asarray(p["proj_in_kernel"]))
    val, gate = h.chunk(2, dim=-1)
    h = TF.gelu(gate) * val
    want = (h @ torch.from_numpy(np.asarray(p["proj_out_kernel"]))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_window_partition_reverse_roundtrip():
    from omnitokenizer_tpu.ops import window_partition, window_reverse

    x = jnp.asarray(RNG.randn(2, 8, 8, 4).astype(np.float32))
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 4)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_vq_argmin_matches_bruteforce():
    flat = RNG.randn(133, 8).astype(np.float32)
    emb = RNG.randn(64, 8).astype(np.float32)
    got = np.asarray(vq_argmin_xla(jnp.asarray(flat), jnp.asarray(emb)))
    d = ((flat[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(got, d.argmin(1))
    # distance values too
    dd = np.asarray(vq_distances(jnp.asarray(flat), jnp.asarray(emb)))
    np.testing.assert_allclose(dd, d, rtol=1e-3, atol=1e-3)


def test_pooling_and_up():
    x = jnp.asarray(RNG.randn(2, 16, 6).astype(np.float32))
    pa = Pooling("a", 6)
    out = pa.apply({"params": {}}, x)
    assert out.shape == (2, 4, 6)
    grid = np.asarray(x).reshape(2, 4, 4, 6)
    want = grid.reshape(2, 2, 2, 2, 2, 6).mean(axis=(2, 4)).reshape(2, 4, 6)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)

    un = Up("n", 6)
    out = un.apply({"params": {}}, x)
    assert out.shape == (2, 64, 6)
    # nearest upsample: every source pixel appears 4x
    og = np.asarray(out).reshape(2, 8, 8, 6)
    np.testing.assert_array_equal(og[:, ::2, ::2], grid)
    np.testing.assert_array_equal(og[:, 1::2, ::2], grid)
    np.testing.assert_array_equal(og[:, ::2, 1::2], grid)


def test_peg_causal_padding():
    """Causal PEG must not let future frames affect past outputs."""
    B, T, H, W, d = 1, 4, 4, 4, 6
    x = RNG.randn(B, T, H, W, d).astype(np.float32)
    peg = PEG(dim=d, causal=True)
    variables = peg.init(jax.random.PRNGKey(0), jnp.asarray(x).reshape(B, T * H * W, d), (B, T, H, W))

    y1 = peg.apply(variables, jnp.asarray(x).reshape(B, T * H * W, d), (B, T, H, W))
    x2 = x.copy()
    x2[:, -1] += 100.0  # perturb the last frame
    y2 = peg.apply(variables, jnp.asarray(x2).reshape(B, T * H * W, d), (B, T, H, W))
    y1g = np.asarray(y1).reshape(B, T, H, W, d)
    y2g = np.asarray(y2).reshape(B, T, H, W, d)
    np.testing.assert_allclose(y1g[:, :3], y2g[:, :3], rtol=1e-5, atol=1e-5)
    assert np.abs(y1g[:, 3] - y2g[:, 3]).max() > 1e-3


def test_attention_causal_property():
    """Causal attention: prefix outputs are unaffected by suffix tokens."""
    attn = Attention(dim=16, dim_head=4, heads=2, causal=True, spatial_pos="rel")
    x = RNG.randn(2, 6, 16).astype(np.float32)
    variables = attn.init(jax.random.PRNGKey(0), jnp.asarray(x), is_spatial=False)
    y1 = attn.apply(variables, jnp.asarray(x), is_spatial=False)
    x2 = x.copy()
    x2[:, -2:] += 50.0
    y2 = attn.apply(variables, jnp.asarray(x2), is_spatial=False)
    np.testing.assert_allclose(np.asarray(y1)[:, :4], np.asarray(y2)[:, :4], rtol=1e-4, atol=1e-4)


def test_attention_kv_from_prenorm_input():
    """Reference quirk: k/v project the PRE-norm tokens. Scaling the input
    by a constant must change the output (it wouldn't if kv were post-norm,
    since q,k are l2-normalized and LayerNorm is scale-invariant)."""
    attn = Attention(dim=16, dim_head=4, heads=2, causal=False, spatial_pos="rel",
                     attn_bias_mode="einsum")
    x = RNG.randn(1, 6, 16).astype(np.float32)
    variables = attn.init(jax.random.PRNGKey(0), jnp.asarray(x), is_spatial=False)
    y1 = np.asarray(attn.apply(variables, jnp.asarray(x), is_spatial=False))
    y2 = np.asarray(attn.apply(variables, jnp.asarray(10 * x), is_spatial=False))
    # v comes from pre-norm input -> output scales (approximately) with input
    assert np.abs(y2).mean() > 3 * np.abs(y1).mean()


def test_window_attention_shapes_and_locality():
    wa = WindowAttention(dim=8, window_size=2, num_heads=2)
    x = RNG.randn(1, 16, 8).astype(np.float32)  # 4x4 grid, 2x2 windows
    variables = wa.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y1 = np.asarray(wa.apply(variables, jnp.asarray(x)))
    assert y1.shape == (1, 16, 8)
    # perturbing a token in one window must not change other windows
    x2 = x.copy().reshape(1, 4, 4, 8)
    # perturb one channel only: a uniform shift across channels would be
    # cancelled by the pre-norm's mean subtraction
    x2[:, 0, 0, 3] += 100.0
    y2 = np.asarray(wa.apply(variables, jnp.asarray(x2.reshape(1, 16, 8))))
    y1g, y2g = y1.reshape(1, 4, 4, 8), y2.reshape(1, 4, 4, 8)
    np.testing.assert_allclose(y1g[:, 2:, 2:], y2g[:, 2:, 2:], rtol=1e-4, atol=1e-4)
    assert np.abs(y1g[:, :2, :2] - y2g[:, :2, :2]).max() > 1e-3


def test_cpb_bias_shape():
    cpb = ContinuousPositionBias(dim=16, heads=4)
    variables = cpb.init(jax.random.PRNGKey(0), 3, 3)
    b = cpb.apply(variables, 3, 3)
    assert b.shape == (4, 9, 9)


def test_transformer_block_string():
    tr = Transformer(dim=16, depth=3, block="twa", heads=2, dim_head=8,
                     window_size=2, spatial_pos="rel")
    x = RNG.randn(2, 16, 16).astype(np.float32)  # (b*t=2, 4x4 grid)
    variables = tr.init(jax.random.PRNGKey(0), jnp.asarray(x), (2, 1, 4, 4), is_spatial=True)
    y = tr.apply(variables, jnp.asarray(x), (2, 1, 4, 4), is_spatial=True)
    assert y.shape == (2, 4, 16)  # 'a' block pooled 16 -> 4 tokens


def test_l2norm_zero_vector_grad():
    """jnp.linalg.norm's vjp is NaN at zero vectors; l2norm must give torch
    F.normalize's zero gradient there (zero tokens DO reach the attention
    k/v projections: constant patches pass the patch-embed LN as exactly 0
    and k/v read the pre-norm input, reference attention.py:404-412)."""
    from omnitokenizer_tpu.ops.attention import l2norm

    x = jnp.concatenate([jnp.zeros((2, 8)), jnp.ones((2, 8))])
    g = jax.grad(lambda t: jnp.sum(l2norm(t) * jnp.arange(8.0)))(x)
    assert np.all(np.isfinite(np.asarray(g)))
    # forward still matches x / max(||x||, eps)
    np.testing.assert_allclose(
        np.asarray(l2norm(x)[2:]), np.asarray(x[2:] / np.sqrt(8.0)), rtol=1e-6)
    assert np.all(np.asarray(l2norm(x)[:2]) == 0.0)
