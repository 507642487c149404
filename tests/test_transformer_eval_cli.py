"""End-to-end drive of the transformer_eval CLI on a tiny config: native
tokenizer checkpoint (JSON-sidecar self-described) + native GPT msgpack,
class-conditional CFG generation with bucketed decode."""

import glob
import pytest

pytestmark = pytest.mark.slow
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from omnitokenizer_tpu import OmniTokenizerVQGAN, TokenizerConfig
from omnitokenizer_tpu.cli import transformer_eval
from omnitokenizer_tpu.config import GPTConfig, Net2NetConfig
from omnitokenizer_tpu.models.net2net import Net2NetTransformer
from omnitokenizer_tpu.utils.checkpoint import save_tokenizer_checkpoint

TINY_TOK = TokenizerConfig(
    embedding_dim=16, n_codes=32, codebook_dim=4, resolution=16,
    sequence_length=3, patch_size=4, temporal_patch_size=2,
    enc_block="t", dec_block="t", spatial_depth=1, temporal_depth=1,
    dim_head=8, heads=2, spatial_pos="rope")


def test_transformer_eval_class_generation(tmp_path):
    tok = OmniTokenizerVQGAN.from_config(TINY_TOK, seed=0)
    tok_path = str(tmp_path / "tok.msgpack")
    save_tokenizer_checkpoint(tok_path, tok.variables, cfg=TINY_TOK)
    # self-describing native checkpoint: no cfg argument needed
    reloaded = OmniTokenizerVQGAN.load_from_checkpoint(tok_path)
    assert reloaded.cfg.n_codes == 32

    n_classes = 5
    # latent grid: 1 x 4 x 4 = 16 tokens, + sos/class prefix
    gcfg = GPTConfig(vocab_size=32 + n_classes + 1, block_size=20,
                     n_layer=1, n_head=2, n_embd=16)
    n2n = Net2NetTransformer(
        Net2NetConfig(gpt=gcfg, class_cond_dim=n_classes, starts_with_sos=True,
                      first_stage_vocab_size=32),
        tok, seed=0)
    gpt_path = str(tmp_path / "gpt.msgpack")
    with open(gpt_path, "wb") as f:
        f.write(serialization.to_bytes((n2n.gpt_params, None, 0)))

    save = str(tmp_path / "gen")
    transformer_eval.main([
        "--gpt_ckpt", gpt_path, "--vqvae", tok_path,
        "--inference_type", "class", "--save", save,
        "--n_sample", "2", "--class_cond_dim", str(n_classes),
        "--block_size", "20", "--n_layer", "1", "--n_head", "2",
        "--n_embd", "16", "--starts_with_sos", "--top_k", "10",
        "--decode_bucket", "8", "--sequence_length", "1",
    ])
    pngs = glob.glob(os.path.join(save, "*.png"))
    assert len(pngs) == 2
