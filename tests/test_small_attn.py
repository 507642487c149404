"""Small-N fused attention kernel vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from omnitokenizer_tpu.ops.attention import l2norm, sdpa
from omnitokenizer_tpu.ops.pallas.small_attn import small_n_attention

RNG = np.random.RandomState(0)


def _reference(q, k, v, qs, ks, heads, dim_head, scale, causal):
    B, N, HD = q.shape
    qr = q.reshape(B, N, heads, dim_head).transpose(0, 2, 1, 3)
    kr = k.reshape(B, N, heads, dim_head).transpose(0, 2, 1, 3)
    vr = v.reshape(B, N, heads, dim_head).transpose(0, 2, 1, 3)
    qr = np.asarray(l2norm(jnp.asarray(qr))) * qs
    kr = np.asarray(l2norm(jnp.asarray(kr))) * ks
    out = sdpa(jnp.asarray(qr), jnp.asarray(kr), jnp.asarray(vr),
               scale=scale, causal=causal)
    return np.asarray(out).transpose(0, 2, 1, 3).reshape(B, N, HD)


def test_small_n_attention_matches_reference():
    B, N, H, D = 16, 5, 4, 8
    q = RNG.randn(B, N, H * D).astype(np.float32)
    k = RNG.randn(B, N, H * D).astype(np.float32)
    v = RNG.randn(B, N, H * D).astype(np.float32)
    qs = RNG.rand(D).astype(np.float32) + 0.5
    ks = RNG.rand(D).astype(np.float32) + 0.5

    for causal in (False, True):
        kv = np.concatenate([k, v], axis=-1)
        got = np.asarray(small_n_attention(
            jnp.asarray(q), jnp.asarray(kv),
            jnp.asarray(qs), jnp.asarray(ks),
            heads=H, dim_head=D, scale=8.0, causal=causal, interpret=True))
        want = _reference(q, k, v, qs, ks, H, D, 8.0, causal)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_small_n_attention_padding():
    """B not a multiple of TILE_B pads and un-pads correctly."""
    B, N, H, D = 7, 3, 2, 8
    q = RNG.randn(B, N, H * D).astype(np.float32)
    k = RNG.randn(B, N, H * D).astype(np.float32)
    v = RNG.randn(B, N, H * D).astype(np.float32)
    qs = np.ones(D, np.float32)
    ks = np.ones(D, np.float32)
    kv = np.concatenate([k, v], axis=-1)
    got = np.asarray(small_n_attention(
        jnp.asarray(q), jnp.asarray(kv),
        jnp.asarray(qs), jnp.asarray(ks),
        heads=H, dim_head=D, scale=8.0, causal=False, interpret=True))
    assert got.shape == (B, N, H * D)
    want = _reference(q, k, v, qs, ks, H, D, 8.0, False)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
