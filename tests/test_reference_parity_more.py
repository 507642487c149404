"""TRUE-ORACLE parity for the remaining weight-bearing components:

* PatchGAN discriminators 2D/3D (/root/reference/OmniTokenizer/base.py:433-573)
  with converted random weights incl. BatchNorm running stats — logits AND
  the intermediate feature taps the feature-matching loss consumes;
* the legacy TATS-style CNN VQGAN (/root/reference/OmniTokenizer/base.py:38-120)
  encode/decode through a converted Lightning checkpoint;
* weight inflation surgery (/root/reference/OmniTokenizer/utils.py:11-121):
  inflate_gen / inflate_dis outputs equal the reference's tensors exactly.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
from reference_oracle import ref_module, make_vqgan_args  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _randomize(module: torch.nn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for name, b in module.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.5)


@pytest.mark.parametrize("norm_type", ["batch", "group"])
def test_discriminator_2d_parity(norm_type):
    base = ref_module("base")
    ref = base.NLayerDiscriminator(3, ndf=32, n_layers=3, norm_type=norm_type,
                                   getIntermFeat=True).eval()
    _randomize(ref, 21)
    sd = {f"image_discriminator.{k}": v.numpy() for k, v in ref.state_dict().items()}

    from omnitokenizer_tpu.models.discriminator import NLayerDiscriminator
    from omnitokenizer_tpu.utils.inflate import convert_discriminator_state

    params, stats = convert_discriminator_state(sd, "image_discriminator",
                                                n_layers=3, is_3d=False)

    g = torch.Generator().manual_seed(22)
    x = torch.rand(2, 3, 64, 64, generator=g) - 0.5
    with torch.no_grad():
        logits_t, feats_t = ref(x)

    model = NLayerDiscriminator(ndf=32, n_layers=3, norm_type=norm_type)
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    xj = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    logits_j, feats_j = model.apply(variables, xj, False)

    assert len(feats_j) == len(feats_t)
    np.testing.assert_allclose(
        np.asarray(logits_j), np.transpose(logits_t.numpy(), (0, 2, 3, 1)),
        atol=2e-5, rtol=1e-4)
    for fj, ft in zip(feats_j, feats_t):
        np.testing.assert_allclose(
            np.asarray(fj), np.transpose(ft.numpy(), (0, 2, 3, 1)),
            atol=2e-5, rtol=1e-4)


def test_discriminator_3d_parity():
    base = ref_module("base")
    ref = base.NLayerDiscriminator3D(3, ndf=32, n_layers=3, norm_type="batch",
                                     getIntermFeat=True).eval()
    _randomize(ref, 23)
    sd = {f"video_discriminator.{k}": v.numpy() for k, v in ref.state_dict().items()}

    from omnitokenizer_tpu.models.discriminator import NLayerDiscriminator3D
    from omnitokenizer_tpu.utils.inflate import convert_discriminator_state

    params, stats = convert_discriminator_state(sd, "video_discriminator",
                                                n_layers=3, is_3d=True)

    g = torch.Generator().manual_seed(24)
    x = torch.rand(1, 3, 8, 32, 32, generator=g) - 0.5
    with torch.no_grad():
        logits_t, feats_t = ref(x)

    model = NLayerDiscriminator3D(ndf=32, n_layers=3, norm_type="batch")
    logits_j, feats_j = model.apply(
        {"params": params, "batch_stats": stats}, xj(x), False)

    assert len(feats_j) == len(feats_t)
    np.testing.assert_allclose(
        np.asarray(logits_j), np.transpose(logits_t.numpy(), (0, 2, 3, 4, 1)),
        atol=2e-5, rtol=1e-4)
    for fj, ft in zip(feats_j, feats_t):
        np.testing.assert_allclose(
            np.asarray(fj), np.transpose(ft.numpy(), (0, 2, 3, 4, 1)),
            atol=2e-5, rtol=1e-4)


def xj(x: torch.Tensor) -> jnp.ndarray:
    """(B, C, T, H, W) torch -> (B, T, H, W, C) jax."""
    return jnp.asarray(np.moveaxis(x.numpy(), 1, -1))


@pytest.mark.slow
def test_cnn_vqgan_encode_decode_parity(tmp_path):
    """Legacy TATS-style CNN VQGAN (base.py:38-94): reference model with
    random weights saved as a Lightning ckpt, converted by
    load_cnn_vqgan_checkpoint — indices exact, pixels to tolerance."""
    base = ref_module("base")
    args = make_vqgan_args(n_hiddens=16, downsample=[2, 4, 4],
                           embedding_dim=16, n_codes=128, norm_type="group")
    ref = base.VQGAN(args).eval()
    ref.args = args  # lightning_ckpt_bytes reads .args
    _randomize(ref, 31)
    g = torch.Generator().manual_seed(32)
    with torch.no_grad():
        ref.codebook.embeddings.copy_(torch.randn(128, 16, generator=g) * 0.3)
        ref.codebook.z_avg.copy_(ref.codebook.embeddings)
        ref.codebook.N.fill_(1.0)
    ref.codebook._need_init = False

    from reference_oracle import lightning_ckpt_bytes

    path = tmp_path / "cnn_vqgan.ckpt"
    path.write_bytes(lightning_ckpt_bytes(ref))

    from omnitokenizer_tpu.models.cnn_vqgan import load_cnn_vqgan_checkpoint

    model, variables = load_cnn_vqgan_checkpoint(str(path))

    x = torch.rand(1, 3, 4, 32, 32, generator=g) - 0.5
    with torch.no_grad():
        enc_t = ref.encode(x)                      # (B, t, h, w) indices
        rec_t = ref.decode(enc_t)                  # (B, C, t', h', w')

    enc_j = model.apply(variables, xj(x), method="encode",
                        mutable=["buffers"])[0]
    np.testing.assert_array_equal(np.asarray(enc_j), enc_t.numpy())

    rec_j = model.apply(variables, jnp.asarray(enc_t.numpy()), method="decode")
    # random 0.1-scale weights compound to |pixels| ~15 through the deep
    # conv stack; observed max elementwise drift 1.1e-4
    np.testing.assert_allclose(np.asarray(rec_j),
                               np.moveaxis(rec_t.numpy(), 1, -1),
                               atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("strategy", ["average", "first"])
def test_inflate_gen_parity(strategy):
    """inflate_gen (utils.py:11-75) vs ours: tensors exactly equal."""
    utils = ref_module("utils")
    g = torch.Generator().manual_seed(41)
    dim, C, p, pt = 8, 3, 4, 2
    feat = C * p * p
    sd = {
        "encoder.to_patch_emb_first_frame.1.weight": torch.randn(feat, generator=g),
        "encoder.to_patch_emb_first_frame.1.bias": torch.randn(feat, generator=g),
        "encoder.to_patch_emb_first_frame.2.weight": torch.randn(dim, feat, generator=g),
        "encoder.to_patch_emb_first_frame.2.bias": torch.randn(dim, generator=g),
        "encoder.to_patch_emb_first_frame.3.weight": torch.randn(dim, generator=g),
        "encoder.to_patch_emb_first_frame.3.bias": torch.randn(dim, generator=g),
        "decoder.to_pixels_first_frame.0.weight": torch.randn(feat, dim, generator=g),
        "decoder.to_pixels_first_frame.0.bias": torch.randn(feat, generator=g),
        "encoder.to_patch_emb.1.weight": torch.randn(feat * pt, generator=g),
        "untouched.key": torch.randn(3, generator=g),
    }
    ref_out = utils.inflate_gen(sd, pt, p, strategy=strategy)

    from omnitokenizer_tpu.utils.inflate import inflate_gen

    ours = inflate_gen({k: v.numpy() for k, v in sd.items()}, pt,
                       strategy=strategy)
    assert set(ours) == set(ref_out)
    for k in ref_out:
        np.testing.assert_array_equal(ours[k], ref_out[k].numpy(), err_msg=k)


@pytest.mark.parametrize("strategy", ["average", "center", "first", "last"])
def test_inflate_dis_parity(strategy):
    """inflate_dis (utils.py:78-121) vs ours: tensors exactly equal."""
    utils = ref_module("utils")
    g = torch.Generator().manual_seed(42)
    sd = {
        "image_discriminator.model0.0.weight": torch.randn(8, 3, 4, 4, generator=g),
        "image_discriminator.model0.0.bias": torch.randn(8, generator=g),
        "image_discriminator.model1.2.weight": torch.randn(16, generator=g),  # norm
        "image_discriminator.model1.2.running_mean": torch.randn(16, generator=g),
        "video_discriminator.model0.0.weight": torch.randn(8, 3, 4, 4, 4, generator=g),
        "encoder.something": torch.randn(2, generator=g),
    }
    ref_out = utils.inflate_dis(sd, strategy=strategy)

    from omnitokenizer_tpu.utils.inflate import inflate_dis

    ours = inflate_dis({k: v.numpy() for k, v in sd.items()}, strategy=strategy)
    assert set(ours) == set(ref_out)
    for k in ref_out:
        np.testing.assert_array_equal(ours[k], ref_out[k].numpy(), err_msg=k)
