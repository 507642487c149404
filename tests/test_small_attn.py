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


def test_flat_kernel_matches_grouped():
    """Token-flat variant must reproduce the grouped kernel exactly: frame
    taps as masked row shifts within contiguous n-row groups."""
    from omnitokenizer_tpu.ops.pallas.small_attn import (
        small_n_attention, small_n_attention_flat)

    rng = np.random.RandomState(3)
    R, n, H, D = 48, 5, 4, 32
    HD = H * D
    q3 = rng.randn(R, n, HD).astype(np.float32)
    kv3 = rng.randn(R, n, 2 * HD).astype(np.float32)
    qs = rng.rand(D).astype(np.float32) + 0.5
    ks = rng.rand(D).astype(np.float32) + 0.5

    for causal in (False, True):
        want = np.asarray(small_n_attention(
            jnp.asarray(q3, jnp.bfloat16), jnp.asarray(kv3, jnp.bfloat16),
            jnp.asarray(qs), jnp.asarray(ks), heads=H, dim_head=D, scale=8.0,
            causal=causal, interpret=True), np.float32)
        got = np.asarray(small_n_attention_flat(
            jnp.asarray(q3.reshape(R * n, HD), jnp.bfloat16),
            jnp.asarray(kv3.reshape(R * n, 2 * HD), jnp.bfloat16),
            jnp.asarray(qs), jnp.asarray(ks), n=n, heads=H, dim_head=D,
            scale=8.0, causal=causal, interpret=True), np.float32)
        rel = np.abs(got.reshape(R, n, HD) - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 0.03, rel
