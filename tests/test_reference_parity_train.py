"""TRUE-ORACLE training-loss parity: our TokenizerTrainer.train_step must
report the exact loss values the reference's manual-optimization forward
computes (omnitokenizer.py:330-524, optimizer_idx 0 and 1) on identical
converted weights and identical inputs — recon, commitment, aeloss (G GAN),
perceptual (LPIPS), feature-matching, and both discriminator losses.

Video path included: torch.randint is pinned to the frame indices our
jax PRNG picks, and Tensor.cuda is a no-op on this CPU host.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
from reference_oracle import (  # noqa: E402
    ref_module, make_vqgan_args, lightning_ckpt_bytes, convert_ref_lpips_params)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

SMALL = dict(
    embedding_dim=64, n_codes=64, codebook_dim=8,
    spatial_depth=2, temporal_depth=2, dim_head=16, heads=4,
    enc_block="tt", dec_block="tt", patch_size=8, norm_type="batch",
    # loss configuration (explicit on both sides)
    l1_weight=4.0, perceptual_weight=4.0, image_gan_weight=1.0,
    video_gan_weight=1.0, gan_feat_weight=4.0, discriminator_iter_start=0,
    disc_channels=32, disc_layers=3, disc_loss_type="hinge",
    recon_loss_type="l1", apply_noise=False, apply_blur=False,
    apply_diffaug=False,
)


def _build(tmp_path):
    om = ref_module("omnitokenizer")
    args = make_vqgan_args(**SMALL)
    torch.manual_seed(7)
    ref = om.VQGAN(args)
    ref.codebook._need_init = False
    path = str(tmp_path / "ref.ckpt")
    with open(path, "wb") as f:
        f.write(lightning_ckpt_bytes(ref))

    from omnitokenizer_tpu.config import LossConfig, TrainConfig
    from omnitokenizer_tpu.training.trainer import TokenizerTrainer
    from omnitokenizer_tpu.utils.checkpoint import config_from_args
    from omnitokenizer_tpu.utils.inflate import load_pretrained_into_state

    cfg = config_from_args(args)
    loss_cfg = LossConfig(
        l1_weight=4.0, perceptual_weight=4.0, image_gan_weight=1.0,
        video_gan_weight=1.0, gan_feat_weight=4.0, discriminator_iter_start=0,
        disc_channels=32, disc_layers=3, disc_loss_type="hinge",
        recon_loss_type="l1", apply_noise=False, apply_diffaug=False,
    )
    trainer = TokenizerTrainer(cfg, loss_cfg, TrainConfig(ema_advances_per_step=1))
    state = load_pretrained_into_state(trainer, path, init_vdis="keep")
    state = state.replace(
        lpips_params=jax.tree_util.tree_map(
            jnp.asarray, convert_ref_lpips_params(ref.perceptual_model)))
    return ref, trainer, state


def _assert_metric(metrics, name, want, atol=2e-4, rtol=2e-3):
    np.testing.assert_allclose(float(metrics[name]), float(want),
                               atol=atol, rtol=rtol, err_msg=name)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["image", "video"])
def test_train_step_loss_parity(tmp_path, mode, monkeypatch):
    ref, trainer, state = _build(tmp_path)
    ref.train()
    # the reference's LPIPS lin heads contain nn.Dropout (lpips.py:55-64);
    # .train() reactivates it, making the torch perceptual loss stochastic
    # (arguably a reference bug — LPIPS is constructed .eval() and frozen).
    # Our LPIPS is deterministic; pin the oracle to the deterministic path.
    ref.perceptual_model.eval()
    ref.global_step = 3

    g = torch.Generator().manual_seed(9)
    if mode == "image":
        x = torch.randn(2, 3, 64, 64, generator=g) * 0.25
        video = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))[:, None]
    else:
        x = torch.randn(2, 3, 5, 64, 64, generator=g) * 0.25
        video = jnp.asarray(np.moveaxis(x.numpy(), 1, -1))

        # pin the reference's random frame pick (omnitokenizer.py:401) to the
        # indices our train_step derives from state.rng
        keys = jax.random.split(state.rng, 10)
        frame_idx = np.asarray(jax.random.randint(keys[1], (2,), 0, 5))
        monkeypatch.setattr(torch, "randint",
                            lambda *a, **k: torch.from_numpy(frame_idx.copy()))
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self, raising=False)

    with torch.no_grad():
        recon_t, _, vq_t, aeloss_t, perceptual_t, gan_feat_t = ref(
            x, optimizer_idx=0)
        discloss_t = ref(x, optimizer_idx=1)

    new_state, metrics = trainer.train_step(state, video)

    _assert_metric(metrics, "recon_loss", recon_t)
    _assert_metric(metrics, "commitment_loss", vq_t["commitment_loss"])
    _assert_metric(metrics, "aeloss", aeloss_t)
    _assert_metric(metrics, "perceptual_loss", perceptual_t)
    _assert_metric(metrics, "gan_feat_loss", gan_feat_t, atol=5e-4)
    _assert_metric(metrics, "discloss", discloss_t)
    _assert_metric(metrics, "perplexity", vq_t["perplexity"], atol=1e-2)
    # a train step must actually advance
    assert int(new_state.step) == int(state.step) + 1
