"""End-to-end drives of the DiT/Latte train + sample CLIs on synthetic
latents (tiny configs, CPU mesh)."""

import glob
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from omnitokenizer_tpu.cli import dit_sample, dit_train, latte_sample, latte_train

TINY = [
    "--model", "DiT-S/2", "--image_size", "32", "--in_channels", "4",
    "--num_classes", "5", "--synthetic_data", "--global_batch_size", "4",
    "--diffusion_steps", "8", "--noise_schedule", "squaredcos_cap_v2",
]


def test_dit_train_and_sample_roundtrip(tmp_path):
    results = str(tmp_path / "dit")
    dit_train.main(TINY + ["--results_dir", results, "--max_steps", "2",
                           "--ckpt_every", "2", "--log_every", "1"])
    ckpts = glob.glob(os.path.join(results, "state_*.msgpack"))
    assert ckpts, "no checkpoint written"
    # resume continues from step 2
    state = dit_train.main(TINY + ["--results_dir", results, "--max_steps", "3",
                                   "--ckpt_every", "3", "--log_every", "1"])
    assert int(state.step) == 3
    assert os.path.exists(os.path.join(results, "metrics.jsonl"))

    samples = str(tmp_path / "dit_samples")
    made = dit_sample.main([
        "--model", "DiT-S/2", "--image_size", "32", "--in_channels", "4",
        "--num_classes", "5", "--ckpt", ckpts[0], "--num_samples", "2",
        "--per_proc_batch_size", "2", "--num_sampling_steps", "4", "--ddim",
        "--cfg_scale", "2.0", "--sample_dir", samples,
        "--diffusion_steps", "8", "--noise_schedule", "squaredcos_cap_v2",
    ])
    assert made == 2
    latents = glob.glob(os.path.join(samples, "latents_*.npy"))
    assert latents and np.isfinite(np.load(latents[0])).all()


LTINY = [
    "--model", "Latte-S/2", "--image_size", "32", "--in_channels", "4",
    "--num_classes", "5", "--num_frames", "5", "--extras", "2",
    "--synthetic_data", "--global_batch_size", "2",
    "--diffusion_steps", "8", "--noise_schedule", "squaredcos_cap_v2",
]


def test_latte_train_and_sample_roundtrip(tmp_path):
    results = str(tmp_path / "latte")
    latte_train.main(LTINY + ["--results_dir", results, "--max_steps", "2",
                              "--ckpt_every", "2", "--log_every", "1"])
    ckpts = glob.glob(os.path.join(results, "state_*.msgpack"))
    assert ckpts

    samples = str(tmp_path / "latte_samples")
    made = latte_sample.main([
        "--model", "Latte-S/2", "--image_size", "32", "--in_channels", "4",
        "--num_classes", "5", "--num_frames", "5", "--extras", "2",
        "--ckpt", ckpts[0], "--num_samples", "1", "--per_proc_batch_size", "1",
        "--num_sampling_steps", "4", "--cfg_scale", "2.0", "--sample_dir", samples,
        "--diffusion_steps", "8", "--noise_schedule", "squaredcos_cap_v2",
    ])
    assert made == 1
    latents = glob.glob(os.path.join(samples, "latents_*.npy"))
    assert latents
    z = np.load(latents[0])
    assert z.shape == (1, 2, 4, 4, 4) and np.isfinite(z).all()  # latent frames 1+(5-1)//4


def test_latte_train_with_images(tmp_path):
    """latte_img joint image-video training (train_with_img.py analogue):
    --use_image_num appends independent image latents with their own labels;
    one synthetic step trains and checkpoints."""
    results = str(tmp_path / "latte_img")
    state = latte_train.main(LTINY + [
        "--results_dir", results, "--max_steps", "2", "--ckpt_every", "2",
        "--log_every", "1", "--use_image_num", "2"])
    assert int(state.step) == 2
    assert glob.glob(os.path.join(results, "state_*.msgpack"))
    import json

    lines = [json.loads(l) for l in open(os.path.join(results, "metrics.jsonl"))]
    assert all(np.isfinite(l["loss"]) for l in lines)


T2V_TINY = [
    "--num_layers", "2", "--num_attention_heads", "2",
    "--attention_head_dim", "8", "--cross_attention_dim", "16",
    "--caption_channels", "12", "--in_channels", "4", "--out_channels", "8",
    "--image_size", "32", "--video_length", "3",
    "--num_sampling_steps", "3", "--guidance_scale", "7.5",
    "--max_token_length", "16",
]


def test_latte_t2v_sample_byte_fallback(tmp_path):
    """VideoGenPipeline analogue end to end on the deterministic
    byte-embedding text fallback: CFG doubling, learned-sigma drop, ddim
    loop, latents written."""
    from omnitokenizer_tpu.cli import latte_t2v_sample

    save = str(tmp_path / "t2v")
    z = latte_t2v_sample.main(T2V_TINY + [
        "--save_img_path", save,
        "--text_prompt", "a corgi on the beach", "sunset over the sea",
    ])
    assert z.shape == (2, 3, 4, 4, 4) and np.isfinite(z).all()
    assert os.path.exists(os.path.join(save, "latents.npy"))


def test_latte_t2v_sample_with_tiny_t5(tmp_path):
    """The real transformers T5EncoderModel seam (random tiny T5 saved to
    disk; byte-ids stand in for the absent sentencepiece tokenizer)."""
    from transformers import T5Config, T5EncoderModel

    t5 = T5EncoderModel(T5Config(
        vocab_size=64, d_model=12, d_kv=4, d_ff=16, num_layers=1,
        num_heads=3, relative_attention_num_buckets=8))
    t5_dir = str(tmp_path / "t5")
    t5.save_pretrained(t5_dir)

    from omnitokenizer_tpu.cli import latte_t2v_sample

    save = str(tmp_path / "t2v_t5")
    z = latte_t2v_sample.main(T2V_TINY + [
        "--save_img_path", save, "--t5_dir", t5_dir, "--sample_method",
        "ddpm", "--text_prompt", "yellow and black tropical fish",
    ])
    assert z.shape == (1, 3, 4, 4, 4) and np.isfinite(z).all()
