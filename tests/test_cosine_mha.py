"""Fused cosine-MHA kernel vs the XLA reference path (interpret mode),
including the in-kernel pair-swap RoPE."""

import jax
import jax.numpy as jnp
import numpy as np

from omnitokenizer_tpu.ops.attention import l2norm, sdpa
from omnitokenizer_tpu.ops.pallas.cosine_mha import cosine_mha
from omnitokenizer_tpu.ops.rotary import apply_rotary_emb_2d

RNG = np.random.RandomState(0)


def _reference(q, k, v, qs, ks, heads, dim_head, scale, use_rope):
    B, N, HD = q.shape
    qr = jnp.asarray(q.reshape(B, N, heads, dim_head))
    kr = jnp.asarray(k.reshape(B, N, heads, dim_head))
    vr = jnp.asarray(v.reshape(B, N, heads, dim_head))
    if use_rope:
        qr, kr = apply_rotary_emb_2d(qr, kr)
    qr = l2norm(qr) * qs
    kr = l2norm(kr) * ks
    qr = jnp.transpose(qr, (0, 2, 1, 3))
    kr = jnp.transpose(kr, (0, 2, 1, 3))
    vr = jnp.transpose(vr, (0, 2, 1, 3))
    out = sdpa(qr, kr, vr, scale=scale)
    return np.asarray(jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, HD))


def test_cosine_mha_matches_reference():
    B, N, H, D = 2, 16, 2, 8  # 4x4 grid for rope
    q = RNG.randn(B, N, H * D).astype(np.float32)
    k = RNG.randn(B, N, H * D).astype(np.float32)
    v = RNG.randn(B, N, H * D).astype(np.float32)
    qs = RNG.rand(D).astype(np.float32) + 0.5
    ks = RNG.rand(D).astype(np.float32) + 0.5
    kv = np.concatenate([k, v], axis=-1)

    for use_rope in (False, True):
        got = np.asarray(cosine_mha(
            jnp.asarray(q), jnp.asarray(kv), jnp.asarray(qs), jnp.asarray(ks),
            heads=H, dim_head=D, scale=8.0, use_rope=use_rope, interpret=True))
        want = _reference(q, k, v, qs, ks, H, D, 8.0, use_rope)
        # kernel runs the score matmul in bf16 (serving numerics)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
        # and is not trivially equal between modes
    got_r = np.asarray(cosine_mha(
        jnp.asarray(q), jnp.asarray(kv), jnp.asarray(qs), jnp.asarray(ks),
        heads=H, dim_head=D, scale=8.0, use_rope=True, interpret=True))
    got_n = np.asarray(cosine_mha(
        jnp.asarray(q), jnp.asarray(kv), jnp.asarray(qs), jnp.asarray(ks),
        heads=H, dim_head=D, scale=8.0, use_rope=False, interpret=True))
    assert np.abs(got_r - got_n).max() > 1e-3


