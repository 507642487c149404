"""Quantizer library tests: FSQ/LFQ/VQ round-trips and invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from omnitokenizer_tpu.ops.quantizers import (
    FSQ,
    LFQ,
    ResidualFSQ,
    ResidualLFQ,
    ResidualVQ,
    VectorQuantize,
)

RNG = np.random.RandomState(0)


def test_fsq_roundtrip():
    fsq = FSQ((8, 5, 5, 5))
    assert fsq.codebook_size == 1000
    z = jnp.asarray(RNG.randn(64, 4).astype(np.float32))
    out = fsq(z)
    idx = out["encodings"]
    assert int(idx.min()) >= 0 and int(idx.max()) < 1000
    codes = fsq.indices_to_codes(idx)
    np.testing.assert_allclose(np.asarray(codes),
                               np.asarray(jax.lax.stop_gradient(out["embeddings"])),
                               atol=1e-6)


def test_fsq_gradient_flows():
    fsq = FSQ((5, 5))
    z = jnp.asarray(RNG.randn(16, 2).astype(np.float32))
    g = jax.grad(lambda z: jnp.sum(fsq.quantize(z)))(z)
    assert float(jnp.abs(g).sum()) > 0  # straight-through


def test_lfq_roundtrip_and_losses():
    lfq = LFQ(dim=8)
    assert lfq.codebook_size == 256
    z = jnp.asarray(RNG.randn(32, 8).astype(np.float32))
    out = lfq(z, training=True)
    codes = lfq.indices_to_codes(out["encodings"])
    np.testing.assert_array_equal(np.asarray(codes),
                                  np.sign(np.asarray(z)).astype(np.float32))
    assert np.isfinite(float(out["commitment_loss"]))


def test_vq_euclidean_and_cosine():
    for cosine in (False, True):
        vq = VectorQuantize(dim=8, codebook_size=16, use_cosine_sim=cosine)
        state = vq.init_state(jax.random.PRNGKey(0))
        z = jnp.asarray(RNG.randn(128, 8).astype(np.float32))
        out, new_state = vq(z, state, training=True, key=jax.random.PRNGKey(1))
        assert out["encodings"].shape == (128,)
        assert int(new_state.initialized) == 1
        assert float(jnp.sum(new_state.cluster_size)) > 0
        # eval path
        out2, st2 = vq(z, new_state, training=False)
        assert np.isfinite(float(out2["commitment_loss"]))
        if cosine:
            norms = np.linalg.norm(np.asarray(new_state.embed), axis=-1)
            np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_residual_stacks_reduce_error():
    z = jnp.asarray(RNG.randn(64, 6).astype(np.float32))
    r1 = ResidualFSQ((5, 5, 5, 5, 5, 5), num_quantizers=1)(z)
    r3 = ResidualFSQ((5, 5, 5, 5, 5, 5), num_quantizers=3)(z)
    e1 = float(jnp.mean(jnp.square(z - r1["embeddings"])))
    e3 = float(jnp.mean(jnp.square(z - r3["embeddings"])))
    assert e3 < e1  # more residual stages -> lower reconstruction error

    rl = ResidualLFQ(dim=6, num_quantizers=2)(z, training=True)
    assert rl["encodings"].shape == (64, 2)

    rvq = ResidualVQ(dim=6, codebook_size=32, num_quantizers=2)
    states = rvq.init_state(jax.random.PRNGKey(0))
    out, new_states = rvq(z, states, training=True, key=jax.random.PRNGKey(1))
    assert out["encodings"].shape == (64, 2)
    assert len(new_states) == 2
