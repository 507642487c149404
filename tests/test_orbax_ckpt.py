"""Orbax checkpoint backend wired into the training loop (VERDICT r3 item 6).

Drives `train_tokenizer(ckpt_backend="orbax")` end-to-end: async atomic
directory saves at the ckpt cadence, auto-resume from the newest orbax step,
and restored leaves identical to what was saved.  The orbax backend is the
production analogue of the reference's Lightning ModelCheckpoint
(/root/reference/vqgan_train.py:101-110): atomic dirs + max_to_keep
retention + saves that overlap training.
"""

import os

import jax
import numpy as np
import pytest

from omnitokenizer_tpu.config import LossConfig, TokenizerConfig, TrainConfig
from omnitokenizer_tpu.training.loop import train_tokenizer
from omnitokenizer_tpu.training.trainer import TokenizerTrainer

TINY = TokenizerConfig(
    embedding_dim=32, n_codes=64, codebook_dim=8, resolution=16,
    sequence_length=5, patch_size=8, temporal_patch_size=2,
    enc_block="t", dec_block="t", spatial_depth=1, temporal_depth=1,
    dim_head=8, heads=2,
)


def _trainer():
    return TokenizerTrainer(
        TINY,
        LossConfig(perceptual_weight=0.0, image_gan_weight=0.1,
                   video_gan_weight=0.1, gan_feat_weight=0.0, disc_layers=1,
                   discriminator_iter_start=0),
        TrainConfig(grad_accumulates=1, warmup_steps=4, max_steps=100,
                    warmup_lr_init=1e-4),
    )


def _batches(seed=0):
    rng = np.random.RandomState(seed)
    while True:
        yield {"video": rng.randn(2, 5, 16, 16, 3).astype(np.float32) * 0.2}


def test_orbax_save_resume_roundtrip(tmp_path):
    root = str(tmp_path / "run")
    trainer = _trainer()

    # first leg: 4 steps, cadence 2 -> orbax steps {2, 4}
    state = train_tokenizer(trainer, _batches(), root, max_steps=4,
                            ckpt_every=2, img_every=0, log_every=100,
                            seed=0, ckpt_backend="orbax")
    assert int(state.step) == 4

    from omnitokenizer_tpu.utils.orbax_io import OrbaxCheckpointer

    mgr = OrbaxCheckpointer(root)
    assert mgr.latest_step() == 4
    # the restored tree matches what the loop finished with, leaf for leaf
    restored = mgr.restore(jax.device_get(trainer.init_state(seed=0)))
    for got, want in zip(jax.tree_util.tree_leaves(restored),
                         jax.tree_util.tree_leaves(jax.device_get(state))):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    mgr.close()

    # second leg: auto-resume from orbax step 4, run to 6
    state2 = train_tokenizer(trainer, _batches(seed=1), root, max_steps=6,
                             ckpt_every=2, img_every=0, log_every=100,
                             seed=0, ckpt_backend="orbax")
    assert int(state2.step) == 6

    mgr2 = OrbaxCheckpointer(root)
    assert mgr2.latest_step() == 6
    steps = set(mgr2.manager.all_steps())
    assert 6 in steps and len(steps) <= 3  # max_to_keep retention
    mgr2.close()

    # no msgpack files were written on the orbax path
    assert not os.path.exists(os.path.join(root, "checkpoints"))
