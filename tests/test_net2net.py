"""Net2Net conditioning / generation plumbing over a tiny tokenizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnitokenizer_tpu import OmniTokenizerVQGAN, TokenizerConfig
from omnitokenizer_tpu.config import GPTConfig, Net2NetConfig
from omnitokenizer_tpu.models.net2net import Net2NetTransformer

RNG = np.random.RandomState(0)

# resolution 16 / patch 4 -> 4x4 latent grid: keeps the compiled samplers
# (16-step scans) fast enough for the suite budget on one CPU core
TOK_CFG = TokenizerConfig(
    embedding_dim=32, n_codes=64, codebook_dim=8, resolution=16,
    sequence_length=5, patch_size=4, temporal_patch_size=2,
    enc_block="tw", dec_block="tt", spatial_depth=2, temporal_depth=2,
    twod_window_size=4, dim_head=8, heads=4, spatial_pos="rope",
)


@pytest.fixture(scope="module")
def n2n():
    tok = OmniTokenizerVQGAN.from_config(TOK_CFG, seed=0)
    cfg = Net2NetConfig(
        gpt=GPTConfig(vocab_size=64 + 10 + 1, block_size=256,
                      n_layer=2, n_head=2, n_embd=32),
        class_cond_dim=10, first_stage_vocab_size=64, starts_with_sos=True)
    return Net2NetTransformer(cfg, tok, seed=0)


def test_encode_to_z_shapes(n2n):
    x = RNG.randn(2, 3, 16, 16).astype(np.float32) * 0.2
    z = n2n.encode_to_z(x, is_image=True)
    assert z.shape == (2, 16)  # 4x4 grid flattened
    assert int(z.max()) < 64


def test_encode_to_c_variants(n2n):
    labels = jnp.asarray([1, 2], jnp.int32)
    c = n2n.encode_to_c(labels)
    assert c.shape == (2, 1)
    # text conditioning: passthrough token ids
    n2n.cfg = n2n.cfg.__class__(**{**n2n.cfg.__dict__, "cond_stage_key": "text"})
    txt = jnp.asarray(RNG.randint(0, 100, (2, 7)), jnp.int32)
    ct = n2n.encode_to_c(txt)
    assert ct.shape == (2, 7)
    n2n.cfg = n2n.cfg.__class__(**{**n2n.cfg.__dict__, "cond_stage_key": "label"})


def test_class_conditional_generation_end_to_end(n2n):
    sample = n2n.make_class_conditional_sampler(steps=16, top_k=8)
    ids = sample(jnp.asarray([3], jnp.int32), jax.random.PRNGKey(0))
    assert ids.shape == (1, 16)
    assert int(ids.min()) >= 0 and int(ids.max()) < 64
    pixels = n2n.decode_to_pixels(ids, is_image=True)
    assert pixels.shape == (1, 3, 16, 16)


def test_frame_prediction_sampler(n2n):
    lt = TOK_CFG.latent_t  # 3
    sample = n2n.make_frame_prediction_sampler(lt, prefix_latent_frames=2, top_k=8)
    video = RNG.randn(1, 3, 5, 16, 16).astype(np.float32) * 0.2
    ids = sample(video, jax.random.PRNGKey(0))
    assert ids.shape == (1, lt, 4, 4)
    pixels = n2n.decode_to_pixels(np.asarray(ids).reshape(1, -1), is_image=False)
    assert pixels.shape == (1, 3, 5, 16, 16)


def test_download_registry():
    from omnitokenizer_tpu.download import resolve_checkpoint

    with pytest.raises(FileNotFoundError):
        resolve_checkpoint("not_a_model")
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint("imagenet_k600")  # known name, no local file


def test_unconditional_forces_sos_off_and_finite_loss():
    """Reference lm_transformer.py:57-58: unconditional FORCES
    starts_with_sos=False (sos token 0 shares id space with code 0, no vocab
    slot).  Regression: the +1 z_offset pushed targets past vocab_size and
    made the CE NaN from step 0."""
    tok = OmniTokenizerVQGAN.from_config(TOK_CFG, seed=0)
    cfg = Net2NetConfig(
        gpt=GPTConfig(vocab_size=64, block_size=64,
                      n_layer=1, n_head=2, n_embd=32),
        class_cond_dim=0, first_stage_vocab_size=64,
        unconditional=True, starts_with_sos=True)
    n2n = Net2NetTransformer(cfg, tok, seed=0)
    assert n2n.cfg.starts_with_sos is False
    assert n2n.z_offset == 0
    z_ids = jnp.asarray(RNG.randint(0, 64, (2, 16)), jnp.int32)
    loss, metrics = n2n.loss_fn(n2n.gpt_params, z_ids, None)
    assert np.isfinite(float(loss)) and np.isfinite(float(metrics["acc1"]))
