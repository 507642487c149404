"""Training-layer tests: losses, diffaug, discriminators, full GAN step on
the 8-device virtual mesh, eval math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnitokenizer_tpu.config import LossConfig, TokenizerConfig, TrainConfig
from omnitokenizer_tpu.training.losses import (
    adopt_weight,
    hinge_d_loss,
    logits_laplace,
    vanilla_d_loss,
)

RNG = np.random.RandomState(0)

SMALL = TokenizerConfig(
    embedding_dim=32, n_codes=64, codebook_dim=8, resolution=16,
    sequence_length=5, patch_size=4, temporal_patch_size=2,
    enc_block="tw", dec_block="tt", spatial_depth=2, temporal_depth=2,
    twod_window_size=4, dim_head=8, heads=4, spatial_pos="rope",
)


def test_gan_losses():
    r = jnp.asarray(RNG.randn(4, 5))
    f = jnp.asarray(RNG.randn(4, 5))
    # hinge: perfect discriminator (real>>1, fake<<-1) -> 0 loss
    assert float(hinge_d_loss(jnp.full((4,), 10.0), jnp.full((4,), -10.0))) == 0.0
    assert float(hinge_d_loss(r, f)) >= 0.0
    assert np.isfinite(float(vanilla_d_loss(r, f)))


def test_adopt_weight():
    assert float(adopt_weight(jnp.asarray(5), threshold=10)) == 0.0
    assert float(adopt_weight(jnp.asarray(15), threshold=10)) == 1.0


def test_logits_laplace_zero_for_identical():
    x = jnp.asarray(RNG.rand(2, 4, 4, 3) - 0.5)
    assert float(logits_laplace(x, x)) == 0.0


def test_diffaug_shapes_and_determinism():
    from omnitokenizer_tpu.ops.diffaug import diff_augment, diff_augment_video

    x = jnp.asarray(RNG.randn(3, 16, 16, 3).astype(np.float32))
    k = jax.random.PRNGKey(0)
    y1 = diff_augment(k, x)
    y2 = diff_augment(k, x)
    assert y1.shape == x.shape
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    v = jnp.asarray(RNG.randn(2, 4, 16, 16, 3).astype(np.float32))
    yv = diff_augment_video(jax.random.PRNGKey(1), v)
    assert yv.shape == v.shape


def test_diffaug_translation_zero_pads():
    from omnitokenizer_tpu.ops.diffaug import rand_translation

    x = jnp.ones((4, 8, 8, 3), jnp.float32)
    y = np.asarray(rand_translation(jax.random.PRNGKey(3), x))
    # every value is either the original 1.0 or a zero-padded 0.0
    assert set(np.unique(y)).issubset({0.0, 1.0})


def test_discriminators_shapes():
    from omnitokenizer_tpu.models.discriminator import (
        NLayerDiscriminator,
        NLayerDiscriminator3D,
    )

    d2 = NLayerDiscriminator(norm_type="group", n_layers=2)
    x = jnp.asarray(RNG.randn(2, 32, 32, 3).astype(np.float32))
    variables = d2.init(jax.random.PRNGKey(0), x, train=False)
    logits, feats = d2.apply(variables, x, train=False)
    assert logits.shape[0] == 2 and logits.shape[-1] == 1
    assert len(feats) == 2 + 2  # n_layers + 2 blocks

    # 3D disc's final block normalizes 1 channel -> GroupNorm(32, 1) is
    # invalid (as in the reference); released configs use norm_type 'batch'
    d3 = NLayerDiscriminator3D(norm_type="batch", n_layers=2)
    v = jnp.asarray(RNG.randn(2, 5, 32, 32, 3).astype(np.float32))
    variables = d3.init(jax.random.PRNGKey(0), v, train=False)
    logits, feats = d3.apply(variables, v, train=False)
    assert logits.shape[0] == 2 and logits.shape[-1] == 1


def test_frechet_distance_properties():
    from omnitokenizer_tpu.eval.frechet import frechet_distance

    x = RNG.randn(500, 16)
    assert frechet_distance(x, x) < 1e-6
    y = RNG.randn(500, 16) + 3.0
    d = frechet_distance(x, y)
    assert d > 16 * 8  # mean term alone = 16 * 9


def test_psnr_ssim():
    from omnitokenizer_tpu.eval.metrics import psnr, ssim

    x = jnp.asarray(RNG.rand(2, 32, 32, 3).astype(np.float32))
    assert float(psnr(x, x)[0]) > 100
    s = ssim(x, x)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-5)
    noisy = x + 0.1 * jnp.asarray(RNG.randn(2, 32, 32, 3).astype(np.float32))
    assert float(ssim(x, noisy)[0]) < 0.99


@pytest.mark.slow
def test_full_train_step_on_mesh():
    """One G+D GAN step over the 8-device virtual mesh; finite metrics and
    changed parameters."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from omnitokenizer_tpu.parallel.mesh import data_mesh
    from omnitokenizer_tpu.training.trainer import TokenizerTrainer

    trainer = TokenizerTrainer(
        SMALL,
        LossConfig(perceptual_weight=0.0, image_gan_weight=0.1, video_gan_weight=0.1,
                   gan_feat_weight=1.0, apply_noise=True, disc_layers=2,
                   discriminator_iter_start=0),
        # warmup_lr_init must be > 0: at step 0 the schedule returns exactly
        # warmup_lr_init, and a 0 LR would make the params-moved check vacuous
        TrainConfig(grad_accumulates=1, warmup_steps=10, max_steps=100,
                    warmup_lr_init=1e-4, disloss_check_thres=None),
    )
    state = trainer.init_state(seed=0, image_size=16)
    mesh = data_mesh()
    batch = jnp.asarray(RNG.randn(16, 5, 16, 16, 3).astype(np.float32) * 0.2)

    with mesh:
        batch = jax.device_put(batch, NamedSharding(mesh, P("data")))
        state = jax.device_put(state, NamedSharding(mesh, P()))
        step = jax.jit(trainer.train_step)
        old_params = jax.device_get(state.params_g)
        new_state, metrics = step(state, batch)

    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"non-finite metric {k}"
    assert int(new_state.step) == 1
    # codebook EMA ran
    assert float(jnp.sum(new_state.buffers["codebook"]["N"])) > 0
    # generator params moved
    new_params = jax.device_get(new_state.params_g)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), old_params, new_params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_freeze_trans_keeps_transformer_params():
    """--freeze_trans (vqgan_train.py:153-157): the four *_transformer
    subtrees stay bitwise-identical across a step while other params move."""
    from omnitokenizer_tpu.training.trainer import TokenizerTrainer

    trainer = TokenizerTrainer(
        SMALL,
        LossConfig(perceptual_weight=0.0, image_gan_weight=0.1, video_gan_weight=0.1,
                   gan_feat_weight=0.0, disc_layers=2, discriminator_iter_start=0),
        TrainConfig(grad_accumulates=1, warmup_steps=10, max_steps=100,
                    warmup_lr_init=1e-4, disloss_check_thres=None,
                    freeze_trans=True),
    )
    state = trainer.init_state(seed=0, image_size=16)
    batch = jnp.asarray(RNG.randn(4, 5, 16, 16, 3).astype(np.float32) * 0.2)
    new_state, _ = jax.jit(trainer.train_step)(state, batch)

    old = jax.device_get(state.params_g)
    new = jax.device_get(new_state.params_g)

    def collect(tree, pred):
        out = {}
        def walk(node, path, hit):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, path + (k,), hit or pred(k))
            else:
                out.setdefault(hit, []).append((path, node))
        walk(tree, (), False)
        return out

    frozen_old = collect(old, lambda k: k.endswith("_transformer"))
    frozen_new = collect(new, lambda k: k.endswith("_transformer"))
    # transformer params identical
    for (p1, a), (p2, b) in zip(frozen_old[True], frozen_new[True]):
        assert p1 == p2
        np.testing.assert_array_equal(a, b, err_msg=str(p1))
    # at least one non-transformer param moved
    moved = any(np.abs(a - b).max() > 0
                for (_, a), (_, b) in zip(frozen_old[False], frozen_new[False]))
    assert moved


def test_d_gate_independent_of_g_gate():
    """A skipped G step (recloss over threshold) must not skip the D step
    (reference gates independently, omnitokenizer.py:562-601)."""
    from omnitokenizer_tpu.training.trainer import TokenizerTrainer

    trainer = TokenizerTrainer(
        SMALL,
        LossConfig(perceptual_weight=0.0, image_gan_weight=0.1, video_gan_weight=0.1,
                   gan_feat_weight=0.0, disc_layers=2, discriminator_iter_start=0),
        TrainConfig(grad_accumulates=1, warmup_steps=10, max_steps=100,
                    warmup_lr_init=1e-4, disloss_check_thres=None,
                    recloss_check_thres=1e-9),  # always trips after 100k steps
    )
    state = trainer.init_state(seed=0, image_size=16)
    state = state.replace(step=jnp.asarray(200_000, jnp.int32))  # past the gate window
    batch = jnp.asarray(RNG.randn(4, 5, 16, 16, 3).astype(np.float32) * 0.2)
    new_state, metrics = jax.jit(trainer.train_step)(state, batch)
    assert float(metrics["optim_gen"]) == 0.0
    assert float(metrics["optim_disc"]) == 1.0
    # G params unchanged, D params moved
    og, ng = jax.device_get(state.params_g), jax.device_get(new_state.params_g)
    same = jax.tree_util.tree_map(lambda a, b: bool(np.array_equal(a, b)), og, ng)
    assert all(jax.tree_util.tree_leaves(same))
    od, nd = jax.device_get(state.params_d), jax.device_get(new_state.params_d)
    dmoved = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()), od, nd)
    assert max(jax.tree_util.tree_leaves(dmoved)) > 0


def test_train_grads_finite_on_constant_video():
    """Regression: a batch with constant (zero-information) patches produced
    NaN grads through the cosine-attention l2norm on step 0 (zero k/v rows
    from the pre-norm kv quirk); the whole optimizer state then NaN'd via
    clip_by_global_norm."""
    import jax
    import jax.numpy as jnp

    from omnitokenizer_tpu.training.trainer import TokenizerTrainer

    trainer = TokenizerTrainer(
        SMALL,
        LossConfig(perceptual_weight=0.0, image_gan_weight=0.05,
                   video_gan_weight=0.05, gan_feat_weight=0.5,
                   disc_layers=2, discriminator_iter_start=0),
        TrainConfig(grad_accumulates=1, warmup_steps=5, max_steps=50,
                    warmup_lr_init=1e-4, lr=3e-4, disloss_check_thres=None),
    )
    state = trainer.init_state(seed=0, image_size=16)
    batch = jnp.full((4, 5, 16, 16, 3), -0.5, jnp.float32)  # flat background
    batch = batch.at[:, :, 4:8, 4:8].set(0.3)               # one square
    state, metrics = jax.jit(trainer.train_step)(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} is not finite"
    for p, leaf in jax.tree_util.tree_leaves_with_path(state.params_g):
        assert np.all(np.isfinite(np.asarray(leaf))), jax.tree_util.keystr(p)
