"""End-to-end drives of the primary CLIs — vqgan_train (2 GAN steps on a
synthetic on-disk image dataset, checkpoint written, auto-resume) and
vqgan_eval (reconstruction dump + PSNR/SSIM/usage report from the saved
checkpoint)."""

import glob
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

from omnitokenizer_tpu.cli import vqgan_eval, vqgan_train

TINY = [
    "--embedding_dim", "16", "--n_codes", "32", "--codebook_dim", "4",
    "--patch_size", "4", "--temporal_patch_size", "2",
    "--enc_block", "t", "--dec_block", "t",
    "--spatial_depth", "1", "--temporal_depth", "1",
    "--dim_head", "8", "--heads", "2", "--spatial_pos", "rope",
    "--resolution", "16", "--sequence_length", "1",
    "--perceptual_weight", "0", "--image_gan_weight", "0.1",
    "--video_gan_weight", "0", "--gan_feat_weight", "0.1",
    "--disc_layers", "1", "--batch_size", "8", "--num_workers", "0",
    "--norm_type", "batch",
]


@pytest.fixture(scope="module")
def image_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    lines = []
    for i in range(16):
        arr = rng.randint(0, 255, (16, 16, 3), np.uint8)
        rel = f"img_{i:03d}.png"
        Image.fromarray(arr).save(root / rel)
        lines.append(f"{rel}\t{i % 3}")
    datalist = root / "imagenet_tiny.txt"
    datalist.write_text("\n".join(lines) + "\n")
    return str(root), str(datalist)


def test_vqgan_train_and_eval_roundtrip(image_dataset, tmp_path):
    data_root, datalist = image_dataset
    run_dir = str(tmp_path / "run")

    args = TINY + [
        "--data_path", data_root, "--train_datalist", datalist,
        "--val_datalist", datalist,
        "--default_root_dir", run_dir, "--max_steps", "2",
        "--warmup_steps", "1", "--lr", "1e-4",
    ]
    vqgan_train.main(args)

    ckpts = glob.glob(os.path.join(run_dir, "checkpoints", "*"))
    assert ckpts, "no checkpoint written"
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    assert rows and np.isfinite(rows[-1]["recon_loss"])

    # auto-resume: one more step continues from the saved state
    vqgan_train.main(TINY + [
        "--data_path", data_root, "--train_datalist", datalist,
        "--val_datalist", datalist,
        "--default_root_dir", run_dir, "--max_steps", "3",
        "--warmup_steps", "1", "--lr", "1e-4",
    ])

    # eval the trained checkpoint
    ckpt = sorted(glob.glob(os.path.join(run_dir, "checkpoints", "*.msgpack")))[-1]
    save = str(tmp_path / "eval")
    vqgan_eval.main(TINY + [
        "--data_path", data_root, "--train_datalist", datalist,
        "--val_datalist", datalist,
        "--vqgan_ckpt", ckpt, "--inference_type", "image",
        "--save", save, "--max_batches", "1",
    ])
    recons = glob.glob(os.path.join(save, "recons", "*.png"))
    inputs = glob.glob(os.path.join(save, "inputs", "*.png"))
    assert recons and inputs
    report = os.path.join(save, "result.json")
    if os.path.exists(report):
        with open(report) as f:
            rep = json.load(f)
        assert np.isfinite(rep.get("psnr", 0.0))
