"""Video-path end-to-end drives on synthetic GIF clips (the only encoder
available without ffmpeg): vqgan_train video mode -> vqgan_eval video mode
(PSNR/usage report) -> transformer_eval frame prediction."""

import glob
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from omnitokenizer_tpu.cli import transformer_eval, vqgan_eval, vqgan_train

TINY = [
    "--embedding_dim", "16", "--n_codes", "32", "--codebook_dim", "4",
    "--patch_size", "4", "--temporal_patch_size", "2",
    "--enc_block", "t", "--dec_block", "t",
    "--spatial_depth", "1", "--temporal_depth", "1",
    "--dim_head", "8", "--heads", "2", "--spatial_pos", "rope",
    "--resolution", "16", "--sequence_length", "5",
    "--perceptual_weight", "0", "--image_gan_weight", "0",
    "--video_gan_weight", "0.1", "--gan_feat_weight", "0.1",
    "--disc_layers", "1", "--batch_size", "8", "--num_workers", "0",
    "--norm_type", "batch",
]


@pytest.fixture(scope="module")
def video_dataset(tmp_path_factory):
    import imageio.v3 as iio

    root = tmp_path_factory.mktemp("vids")
    rng = np.random.RandomState(0)
    lines = []
    for i in range(16):
        frames = [rng.randint(0, 255, (16, 16, 3), np.uint8) for _ in range(9)]
        rel = f"clip_{i:03d}.gif"
        iio.imwrite(str(root / rel), frames, loop=0)
        lines.append(rel)
    datalist = root / "k600_tiny.txt"
    datalist.write_text("\n".join(lines) + "\n")
    return str(root), str(datalist)


def test_video_train_eval_and_frame_prediction(video_dataset, tmp_path):
    data_root, datalist = video_dataset
    run_dir = str(tmp_path / "vrun")
    common = [
        "--data_path", data_root, "--train_datalist", datalist,
        "--val_datalist", datalist,
    ]
    vqgan_train.main(TINY + common + [
        "--default_root_dir", run_dir, "--max_steps", "2",
        "--warmup_steps", "1", "--lr", "1e-4",
    ])
    ckpts = sorted(glob.glob(os.path.join(run_dir, "checkpoints", "*.msgpack")))
    assert ckpts

    save = str(tmp_path / "veval")
    vqgan_eval.main(TINY + common + [
        "--vqgan_ckpt", ckpts[-1], "--inference_type", "video",
        "--save", save, "--max_batches", "1",
    ])
    report = os.path.join(save, "result.json")
    assert os.path.exists(report)
    with open(report) as f:
        rep = json.load(f)
    assert np.isfinite(rep["psnr"]) and 0.0 <= rep["codebook_usage"] <= 1.0

    # frame prediction: tokenizer ckpt needs a config sidecar for the eval
    # CLI's config-free load; write one next to the training ckpt
    from omnitokenizer_tpu.cli import args as A
    from omnitokenizer_tpu.utils.checkpoint import config_to_json

    cfg = A.tokenizer_config_from(vqgan_train.build_parser().parse_args(
        TINY + common + ["--default_root_dir", run_dir]))
    with open(ckpts[-1] + ".cfg.json", "w") as f:
        json.dump(config_to_json(cfg), f)

    from flax import serialization

    from omnitokenizer_tpu.config import GPTConfig
    from omnitokenizer_tpu.models.gpt import GPT
    import jax
    import jax.numpy as jnp

    # latent grid 3 x 4 x 4 = 48 tokens
    gcfg = GPTConfig(vocab_size=32, block_size=64, n_layer=1, n_head=2, n_embd=16)
    gpt_params = GPT(gcfg).init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 4), jnp.int32))["params"]
    gpt_path = str(tmp_path / "gpt.msgpack")
    with open(gpt_path, "wb") as f:
        f.write(serialization.to_bytes((gpt_params, None, 0)))

    pred = str(tmp_path / "pred")
    transformer_eval.main(common + [
        "--gpt_ckpt", gpt_path, "--vqvae", ckpts[-1],
        "--inference_type", "frame_prediction", "--save", pred,
        "--n_sample", "2", "--block_size", "64", "--n_layer", "1",
        "--n_head", "2", "--n_embd", "16", "--unconditional",
        "--resolution", "16", "--sequence_length", "5", "--top_k", "10",
        "--decode_bucket", "16", "--batch_size", "8", "--num_workers", "0",
    ])
    preds = glob.glob(os.path.join(pred, "*.npz"))
    assert preds
    dat = np.load(preds[0])
    assert np.isfinite(dat["video"]).all()


def test_metrics_eval_cli(tmp_path):
    """fvd_external-style dir-vs-dir metrics CLI (PSNR/SSIM without I3D
    weights; identical dirs give infinite-ish PSNR and SSIM ~1)."""
    from omnitokenizer_tpu.cli import metrics_eval

    rng = np.random.RandomState(0)
    gen, gt = tmp_path / "gen", tmp_path / "gt"
    gen.mkdir(); gt.mkdir()
    for i in range(3):
        clip = rng.rand(4, 16, 16, 3).astype(np.float32) - 0.5
        np.savez(gen / f"c{i}.npz", video=clip)
        np.savez(gt / f"c{i}.npz", video=clip + 0.01)
    res = metrics_eval.main(["--gen_dir", str(gen), "--gt_dir", str(gt),
                             "--save", str(tmp_path / "m.json")])
    assert res["clips"] == 3
    assert 30 < res["psnr"] < 50  # 0.01 offset => ~40 dB
    assert 0.8 < res["ssim"] <= 1.0
    assert res["fvd"] is None
    assert os.path.exists(tmp_path / "m.json")


def test_metrics_eval_cli_metric_selection(tmp_path):
    """--metrics selection: psnr-only run skips ssim; is/fid/lpips degrade
    gracefully without weights."""
    from omnitokenizer_tpu.cli import metrics_eval

    rng = np.random.RandomState(1)
    gen, gt = tmp_path / "gen", tmp_path / "gt"
    gen.mkdir(); gt.mkdir()
    for i in range(2):
        clip = rng.rand(3, 16, 16, 3).astype(np.float32) - 0.5
        np.savez(gen / f"c{i}.npz", video=clip)
        np.savez(gt / f"c{i}.npz", video=clip)
    res = metrics_eval.main(["--gen_dir", str(gen), "--gt_dir", str(gt),
                             "--metrics", "psnr,is,fid,lpips"])
    assert res["psnr"] is not None
    assert res["ssim"] is None          # not requested
    assert res["is"] is None            # no inception weights
    assert res["fid"] is None
    assert res["fvd"] is None
