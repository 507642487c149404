"""TRUE-ORACLE external-quantizer parity: ops/quantizers.py vs the vendored
lucidrains library the reference ships
(/root/reference/OmniTokenizer/quantizer/):

* FSQ — bounded-grid round, code/index bijection
* LFQ — sign quantization, index packing, commitment; per-sample entropy
  (our factorized Bernoulli form is exact: the 2^d softmax factorizes)
* VectorQuantize euclidean + cosine — nearest-code indices, quantized
  values, commitment loss, and one EMA codebook update step
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
from reference_oracle import ref_module  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def test_fsq_parity():
    fsq_mod = ref_module("quantizer.finite_scalar_quantization")
    levels = [8, 5, 5, 5]
    ref = fsq_mod.FSQ(levels=levels).eval()

    from omnitokenizer_tpu.ops.quantizers import FSQ

    ours = FSQ(levels)
    g = torch.Generator().manual_seed(70)
    z = torch.randn(2, 11, 4, generator=g)
    with torch.no_grad():
        out_t, idx_t = ref(z)

    out = ours(jnp.asarray(z.numpy()))
    np.testing.assert_allclose(np.asarray(out["embeddings"]), out_t.numpy(),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["encodings"]), idx_t.numpy())

    # index<->code bijection matches the reference's implicit codebook
    idx = jnp.arange(ours.codebook_size)
    codes = ours.indices_to_codes(idx)
    np.testing.assert_array_equal(
        np.asarray(ours.codes_to_indices(codes)), np.asarray(idx))
    # ref treats (1, K, 1) as image layout and returns channels-first
    ref_codes = ref.indices_to_codes(torch.arange(ours.codebook_size)[None, :, None])
    np.testing.assert_allclose(np.asarray(codes),
                               ref_codes.squeeze().numpy().T, atol=1e-6)


def test_lfq_parity():
    lfq_mod = ref_module("quantizer.lookup_free_quantization")
    dim = 6
    ref = lfq_mod.LFQ(dim=dim, codebook_size=2 ** dim).eval()

    from omnitokenizer_tpu.ops.quantizers import LFQ

    ours = LFQ(dim)
    g = torch.Generator().manual_seed(71)
    z = torch.randn(2, 9, dim, generator=g)
    with torch.no_grad():
        ret = ref(z)  # the vendored copy is modified to return a dict

    out = ours(jnp.asarray(z.numpy()), training=False)
    np.testing.assert_allclose(np.asarray(out["embeddings"]),
                               ret["embeddings"].numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["encodings"]),
                                  ret["encodings"].numpy())

    # per-sample entropy: our factorized Bernoulli form == the reference's
    # full-2^d softmax entropy (the joint distribution factorizes per bit)
    flat = z.reshape(-1, dim).numpy()
    beta = 100.0
    codebook = np.asarray(ref.codebook)  # (2^d, d) in {-scale, scale}
    logits = 2 * beta * flat @ codebook.T  # == -distance * inv_temp
    p_full = torch.softmax(torch.from_numpy(logits), dim=-1).numpy()
    h_full = -np.sum(p_full * np.log(p_full + 1e-12), axis=-1).mean()
    # per-bit posterior: the logit gap between the +1 and -1 code values is
    # 2*beta*z_i*(+1) - 2*beta*z_i*(-1) = 4*beta*z_i
    p_bit = 1.0 / (1.0 + np.exp(-4 * beta * flat))
    h_fact = np.mean(np.sum(-(p_bit * np.log(p_bit + 1e-8)
                              + (1 - p_bit) * np.log(1 - p_bit + 1e-8)), -1))
    np.testing.assert_allclose(h_fact, h_full, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("cosine", [False, True])
def test_vector_quantize_parity(cosine):
    vq_mod = ref_module("quantizer.vector_quantize_pytorch")
    dim, K = 16, 32
    torch.manual_seed(72)
    ref = vq_mod.VectorQuantize(
        dim=dim, codebook_size=K, decay=0.8, commitment_weight=1.0,
        use_cosine_sim=cosine, kmeans_init=False).eval()

    from omnitokenizer_tpu.ops.quantizers import VectorQuantize, VQState

    ours = VectorQuantize(dim, K, decay=0.8, commitment_weight=1.0,
                          use_cosine_sim=cosine, kmeans_init=False)

    embed_t = ref._codebook.embed  # (1, K, D) or (K, D)
    embed = embed_t.detach().squeeze(0).numpy().copy()
    state = VQState(jnp.asarray(embed),
                    jnp.asarray(ref._codebook.cluster_size.detach().squeeze(0).numpy().copy()),
                    jnp.asarray((ref._codebook.embed_avg.detach().squeeze(0).numpy().copy()
                                 if hasattr(ref._codebook, "embed_avg") else embed)),
                    jnp.ones((), jnp.int32))

    g = torch.Generator().manual_seed(73)
    z = torch.randn(2, 7, dim, generator=g)
    with torch.no_grad():
        ret = ref(z)  # modified vendored copy returns a dict

    out, _ = ours(jnp.asarray(z.numpy()), state, training=False)
    np.testing.assert_array_equal(np.asarray(out["encodings"]),
                                  ret["encodings"].numpy())
    np.testing.assert_allclose(np.asarray(out["embeddings"]),
                               ret["embeddings"].numpy(), atol=2e-5, rtol=1e-4)
    # the vendored VQ computes its loss only in training mode
    assert float(ret["commitment_loss"]) == 0.0


def test_vector_quantize_ema_update_parity():
    """One training forward: the EMA buffers (cluster_size/embed_avg) and the
    re-normalized codebook must match the vendored EuclideanCodebook update
    (vector_quantize_pytorch.py:239-360)."""
    vq_mod = ref_module("quantizer.vector_quantize_pytorch")
    dim, K = 8, 16
    torch.manual_seed(74)
    ref = vq_mod.VectorQuantize(
        dim=dim, codebook_size=K, decay=0.8, commitment_weight=1.0,
        use_cosine_sim=False, kmeans_init=False).train()

    from omnitokenizer_tpu.ops.quantizers import VectorQuantize, VQState

    ours = VectorQuantize(dim, K, decay=0.8, commitment_weight=1.0,
                          use_cosine_sim=False, kmeans_init=False)
    embed = ref._codebook.embed.detach().squeeze(0).numpy().copy()
    state = VQState(jnp.asarray(embed),
                    jnp.asarray(ref._codebook.cluster_size.detach().squeeze(0).numpy().copy()),
                    jnp.asarray(ref._codebook.embed_avg.detach().squeeze(0).numpy().copy()),
                    jnp.ones((), jnp.int32))

    g = torch.Generator().manual_seed(75)
    z = torch.randn(2, 13, dim, generator=g)
    with torch.no_grad():
        ret = ref(z)  # training forward: updates buffers in place

    out, new_state = ours(jnp.asarray(z.numpy()), state, training=True)
    np.testing.assert_allclose(float(out["commitment_loss"]),
                               float(ret["commitment_loss"]), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_state.cluster_size),
        ref._codebook.cluster_size.detach().squeeze(0).numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.embed_avg),
        ref._codebook.embed_avg.detach().squeeze(0).numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.embed),
        ref._codebook.embed.detach().squeeze(0).numpy(), atol=2e-5, rtol=1e-4)
