"""End-to-end tokenizer tests on a small config (CPU-fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnitokenizer_tpu import OmniTokenizerVQGAN, TokenizerConfig

SMALL = TokenizerConfig(
    embedding_dim=32,
    n_codes=64,
    codebook_dim=8,
    resolution=32,
    sequence_length=5,
    patch_size=4,
    temporal_patch_size=2,
    enc_block="tw",
    dec_block="tt",
    spatial_depth=2,
    temporal_depth=2,
    twod_window_size=4,
    dim_head=8,
    heads=4,
    spatial_pos="rope",
)

RNG = np.random.RandomState(0)


@pytest.fixture(scope="module")
def vqgan():
    return OmniTokenizerVQGAN.from_config(SMALL, seed=0)


def test_image_encode_decode_shapes(vqgan):
    x = RNG.randn(2, 3, 32, 32).astype(np.float32) * 0.2
    enc = vqgan.encode(x, is_image=True)
    assert enc.shape == (2, 1, 8, 8)
    assert enc.dtype == jnp.int32
    assert int(enc.max()) < SMALL.n_codes and int(enc.min()) >= 0
    rec = vqgan.decode(enc, is_image=True)
    assert rec.shape == (2, 3, 32, 32)


def test_video_encode_decode_shapes(vqgan):
    x = RNG.randn(2, 3, 5, 32, 32).astype(np.float32) * 0.2
    enc = vqgan.encode(x, is_image=False)
    assert enc.shape == (2, 3, 8, 8)  # t = 1 + (5-1)/2
    rec = vqgan.decode(enc, is_image=False)
    assert rec.shape == (2, 3, 5, 32, 32)


def test_flat_and_grid_decode_agree(vqgan):
    x = RNG.randn(1, 3, 32, 32).astype(np.float32) * 0.2
    enc = vqgan.encode(x, is_image=True)
    rec_grid = vqgan.decode(enc, is_image=True)
    rec_flat = vqgan.decode(np.asarray(enc).reshape(1, -1), is_image=True)
    np.testing.assert_allclose(np.asarray(rec_grid), np.asarray(rec_flat), rtol=1e-5, atol=1e-5)


def test_video_flat_decode(vqgan):
    x = RNG.randn(1, 3, 5, 32, 32).astype(np.float32) * 0.2
    enc = vqgan.encode(x, is_image=False)
    rec_grid = vqgan.decode(enc, is_image=False)
    rec_flat = vqgan.decode(np.asarray(enc).reshape(1, -1), is_image=False)
    np.testing.assert_allclose(np.asarray(rec_grid), np.asarray(rec_flat), rtol=1e-5, atol=1e-5)


def test_encode_include_embeddings(vqgan):
    x = RNG.randn(1, 3, 32, 32).astype(np.float32) * 0.2
    emb, enc = vqgan.encode(x, is_image=True, include_embeddings=True)
    assert emb.shape == (1, 8, 1, 8, 8)  # channels-first (B, c, t, h, w)
    assert enc.shape == (1, 1, 8, 8)


def test_encode_deterministic(vqgan):
    x = RNG.randn(1, 3, 32, 32).astype(np.float32) * 0.2
    e1 = vqgan.encode(x, is_image=True)
    e2 = vqgan.encode(x, is_image=True)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_reconstruct_full_pass(vqgan):
    x = RNG.randn(1, 3, 5, 32, 32).astype(np.float32) * 0.2
    rec, aux = vqgan.reconstruct(x, is_image=False)
    assert rec.shape == x.shape
    assert "commitment_loss" in aux and np.isfinite(float(aux["commitment_loss"]))
    assert np.isfinite(float(aux["perplexity"]))


def test_single_frame_video_equals_image(vqgan):
    """A 1-frame 'video' goes through exactly the image path: only the
    first-frame embedder runs and t=1 everywhere, so encoding a (B,C,1,H,W)
    video must equal encoding the same (B,C,H,W) image."""
    img = RNG.randn(1, 3, 32, 32).astype(np.float32) * 0.2
    enc_img = np.asarray(vqgan.encode(img, is_image=True))
    enc_vid1 = np.asarray(vqgan.encode(img[:, :, None], is_image=False))
    np.testing.assert_array_equal(enc_img, enc_vid1)


def test_vae_mode():
    cfg = SMALL.replace(use_vae=True)
    vae = OmniTokenizerVQGAN.from_config(cfg, seed=0)
    x = RNG.randn(1, 3, 32, 32).astype(np.float32) * 0.2
    z = vae.encode(x, is_image=True)
    assert z.shape == (1, 8, 8, 8)  # (B, c, h, w)
    rec = vae.decode(z, is_image=True)
    assert rec.shape == (1, 3, 32, 32)

    xv = RNG.randn(1, 3, 5, 32, 32).astype(np.float32) * 0.2
    zv = vae.encode(xv, is_image=False)
    assert zv.shape == (1, 8, 3, 8, 8)  # (B, c, t, h, w)
    # the reference's 5-dim VAE decode expects channels-LAST latents
    # (omnitokenizer.py:305-311; Latte sample_ddp.py:202 rearranges first)
    recv = vae.decode(np.transpose(np.asarray(zv), (0, 2, 3, 4, 1)), is_image=False)
    assert recv.shape == (1, 3, 5, 32, 32)

    rec2, aux = vae.reconstruct(x, is_image=True)
    assert np.isfinite(float(aux["kl_loss"]))


def test_codebook_training_updates():
    """EMA update changes buffers and keeps shapes; init happens on first call."""
    from omnitokenizer_tpu.models.tokenizer import OmniTokenizerNet

    cfg = SMALL
    net = OmniTokenizerNet(cfg)
    x = jnp.asarray(RNG.randn(2, 5, 32, 32, 3).astype(np.float32) * 0.2)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "codebook": jax.random.PRNGKey(1)},
        x, False, training=True)
    assert int(variables["buffers"]["codebook"]["initialized"]) == 0

    (recon, aux), mutated = net.apply(
        variables, x, False, training=True,
        rngs={"codebook": jax.random.PRNGKey(2)},
        mutable=["buffers"])
    cb = mutated["buffers"]["codebook"]
    assert int(cb["initialized"]) == 1
    assert float(jnp.sum(cb["N"])) > 0
    assert np.isfinite(float(aux["perplexity"]))


def test_cnn_patch_embed_roundtrip():
    """The 'cnn' patch-embed path (strided Conv3d / ConvTranspose3d)."""
    # norm_type must be 'batch': the decoder normalizes 3 image channels and
    # GroupNorm(32, 3) is invalid (same constraint as the reference)
    cfg = SMALL.replace(patch_embed="cnn", norm_type="batch")
    tok = OmniTokenizerVQGAN.from_config(cfg, seed=0)
    x = RNG.randn(1, 3, 5, 32, 32).astype(np.float32) * 0.2
    enc = tok.encode(x, is_image=False)
    assert enc.shape == (1, 3, 8, 8)
    rec = tok.decode(enc, is_image=False)
    assert rec.shape == (1, 3, 5, 32, 32)
    assert np.all(np.isfinite(np.asarray(rec)))


def test_reference_parity_exports():
    """Top-level exports mirror /root/reference/OmniTokenizer/__init__.py:1-8."""
    import omnitokenizer_tpu as ot

    assert ot.OmniTokenizer_VQGAN is ot.OmniTokenizerVQGAN
    for name in ("VideoData", "ImageDataset", "DecordVideoDataset",
                 "Net2NetTransformer", "VQGAN", "load_vqgan",
                 "load_transformer"):
        assert callable(getattr(ot, name)), name
    # `download` resolves to the registry submodule (import precedence over
    # the lazy table); its resolver is the reference's download() analogue
    assert callable(ot.download.resolve_checkpoint)
    with __import__("pytest").raises(AttributeError):
        ot.not_a_real_export
