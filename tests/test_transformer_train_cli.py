"""End-to-end drive of the transformer_train CLI: tiny frozen tokenizer
(self-describing native ckpt) + tiny GPT, 2 LM steps on an on-disk image
dataset, checkpoint + metrics written, auto-resume; plus the
--model_parallel TP path over the virtual mesh."""

import glob
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

from omnitokenizer_tpu import OmniTokenizerVQGAN, TokenizerConfig
from omnitokenizer_tpu.cli import transformer_train
from omnitokenizer_tpu.utils.checkpoint import save_tokenizer_checkpoint

TINY_TOK = TokenizerConfig(
    embedding_dim=16, n_codes=32, codebook_dim=4, resolution=16,
    sequence_length=1, patch_size=4, temporal_patch_size=2,
    enc_block="t", dec_block="t", spatial_depth=1, temporal_depth=1,
    dim_head=8, heads=2, spatial_pos="rope")


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("lm_cli")
    rng = np.random.RandomState(0)
    lines = []
    for i in range(16):
        rel = f"img_{i:03d}.png"
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(root / rel)
        lines.append(f"{rel}\t{i % 4}")
    (root / "imagenet_tiny.txt").write_text("\n".join(lines) + "\n")

    tok = OmniTokenizerVQGAN.from_config(TINY_TOK, seed=0)
    save_tokenizer_checkpoint(str(root / "tok.msgpack"), tok.variables,
                              cfg=TINY_TOK)
    return str(root)


def _args(root, run_dir, extra=()):
    return [
        "--vqvae", os.path.join(root, "tok.msgpack"),
        "--data_path", root,
        "--train_datalist", os.path.join(root, "imagenet_tiny.txt"),
        "--val_datalist", os.path.join(root, "imagenet_tiny.txt"),
        "--default_root_dir", run_dir,
        "--resolution", "16", "--sequence_length", "1",
        "--batch_size", "8", "--num_workers", "0",
        "--block_size", "20", "--n_layer", "2", "--n_head", "2",
        "--n_embd", "16", "--class_cond_dim", "4", "--starts_with_sos",
        "--lr", "1e-4", "--warmup_steps", "1", "--max_steps", "2",
    ] + list(extra)


def test_transformer_train_and_resume(fixture_dir, tmp_path):
    run_dir = str(tmp_path / "lm_run")
    transformer_train.main(_args(fixture_dir, run_dir))
    # a final checkpoint must exist even when max_steps isn't a multiple of
    # the 3000-step cadence (auto-resume/eval need the tail state)
    ckpts = glob.glob(os.path.join(run_dir, "checkpoints", "*.msgpack"))
    assert ckpts, "no final checkpoint written"
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    # auto-resume picks it up and continues to the new max_steps
    transformer_train.main(_args(fixture_dir, run_dir) + ["--max_steps", "3"])
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        steps = [__import__("json").loads(l)["step"] for l in f if l.strip()]
    assert max(steps) == 2  # resumed at 2, ran exactly one more step


def test_transformer_train_model_parallel(fixture_dir, tmp_path):
    run_dir = str(tmp_path / "lm_tp")
    transformer_train.main(_args(fixture_dir, run_dir,
                                 ["--model_parallel", "2"]))
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
