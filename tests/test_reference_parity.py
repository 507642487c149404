"""TRUE-ORACLE parity: the actual reference implementation
(/root/reference/OmniTokenizer/omnitokenizer.py, imported via
tests/reference_oracle.py stubs), with small random weights, saved as a
Lightning-style ckpt, converted by utils/checkpoint.py, must match our
flax model's encode/decode end to end.

This is the round-2 harness VERDICT.md item 1 asked for: it proves
checkpoint-conversion fidelity (SURVEY §7.3's top risk) without the released
weights — any torch tensor the reference produces converts and reproduces.
"""

import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
from reference_oracle import (  # noqa: E402
    ref_module, make_vqgan_args, lightning_ckpt_bytes)

from omnitokenizer_tpu.models.wrapper import OmniTokenizerVQGAN  # noqa: E402

SMALL = dict(
    embedding_dim=64, n_codes=64, codebook_dim=8,
    spatial_depth=2, temporal_depth=2, dim_head=16, heads=4,
    enc_block="tt", dec_block="tt", patch_size=8, norm_type="batch",
)

CONFIGS = {
    "vq_rel": {},
    "vq_rope": dict(spatial_pos="rope"),
    "vq_window": dict(enc_block="tw", dec_block="wt", twod_window_size=4),
    "vq_l2": dict(l2_code=True),
    "vae": dict(use_vae=True, kl_weight=1e-6),
    "vq_defer": dict(defer_temporal_pool=True, defer_spatial_pool=True),
    "vq_cnn": dict(patch_embed="cnn"),
}


def _build_pair(tmp_path, overrides, seed=0):
    om = ref_module("omnitokenizer")
    args = make_vqgan_args(**{**SMALL, **overrides})
    torch.manual_seed(seed)
    ref = om.VQGAN(args).eval()
    path = str(tmp_path / "ref.ckpt")
    with open(path, "wb") as f:
        f.write(lightning_ckpt_bytes(ref))
    ours = OmniTokenizerVQGAN.load_from_checkpoint(path)
    return ref, ours


def _img(seed=1, b=2, res=64):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(b, 3, res, res, generator=g) * 0.25


def _vid(seed=2, b=2, t=5, res=64):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(b, 3, t, res, res, generator=g) * 0.25


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_vqgan_encode_decode_parity(tmp_path, name):
    ref, ours = _build_pair(tmp_path, CONFIGS[name])
    use_vae = CONFIGS[name].get("use_vae", False)

    x = _img()
    v = _vid()
    with torch.no_grad():
        if not use_vae:
            # ---- VQ: indices must match exactly, decodes to tolerance ----
            for inp, is_image in ((x, True), (v, False)):
                enc_t = ref.encode(inp, is_image=is_image)
                enc_j = np.asarray(ours.encode(inp.numpy(), is_image=is_image))
                assert enc_j.shape == tuple(enc_t.shape)
                mismatch = (enc_j != enc_t.numpy()).mean()
                assert mismatch == 0.0, f"{name} {'img' if is_image else 'vid'} idx mismatch {mismatch:.4f}"

                dec_t = ref.decode(enc_t, is_image=is_image).numpy()
                dec_j = np.asarray(ours.decode(enc_j, is_image=is_image))
                np.testing.assert_allclose(dec_j, dec_t, atol=2e-4, rtol=1e-3)

            # embeddings path (lm_transformer.py:262 contract)
            emb_t, enc_t = ref.encode(x, is_image=True, include_embeddings=True)
            emb_j, enc_j = ours.encode(x.numpy(), is_image=True, include_embeddings=True)
            np.testing.assert_allclose(np.asarray(emb_j), emb_t.numpy(), atol=2e-4, rtol=1e-3)

            # flat-index decode contract (omnitokenizer.py:270-292)
            flat_t = enc_t.reshape(enc_t.shape[0], -1)
            dec_t = ref.decode(flat_t, is_image=True).numpy()
            dec_j = np.asarray(ours.decode(np.asarray(flat_t), is_image=True))
            np.testing.assert_allclose(dec_j, dec_t, atol=2e-4, rtol=1e-3)
        else:
            # ---- VAE: deterministic posterior mode + decode parity ----
            from OmniTokenizer.modules.vae import DiagonalGaussianDistribution

            for inp, is_image in ((x, True), (v, False)):
                if is_image:
                    inp5 = inp.unsqueeze(2)
                else:
                    inp5 = inp
                h_t = ref.pre_vq_conv(ref.encoder(inp, is_image))
                mode_t = DiagonalGaussianDistribution(h_t).mode()
                # ours: encode without a gaussian rng returns posterior.mode()
                from omnitokenizer_tpu.models.tokenizer import OmniTokenizerNet
                import jax.numpy as jnp
                xl = np.transpose(inp5.numpy(), (0, 2, 3, 4, 1))
                mode_j = ours.net.apply(
                    ours.variables, jnp.asarray(xl), is_image,
                    method=OmniTokenizerNet.encode)
                # ours is (B,t,h,w,c); torch is (B,c,t,h,w)
                mode_j = np.transpose(np.asarray(mode_j), (0, 4, 1, 2, 3))
                if is_image:
                    mode_t = mode_t  # ref keeps 5-dim pre-squeeze here
                np.testing.assert_allclose(mode_j, mode_t.numpy(), atol=2e-4, rtol=1e-3)

                if is_image:
                    # DiT contract: 4-dim channels-first (sample_ddp.py:162)
                    z_t = mode_t.squeeze(2)
                else:
                    # Latte contract: 5-dim channels-LAST — the reference's
                    # decode rearranges 'b t h w c -> b c t h w'
                    # (omnitokenizer.py:305-311, Latte sample_ddp.py:202)
                    z_t = mode_t.permute(0, 2, 3, 4, 1).contiguous()
                dec_t = ref.decode(z_t, is_image=is_image).numpy()
                dec_j = np.asarray(ours.decode(z_t.numpy(), is_image=is_image))
                np.testing.assert_allclose(dec_j, dec_t, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_vqgan_full_forward_parity(tmp_path):
    """forward(x) recon + commitment/perplexity parity on the default config."""
    ref, ours = _build_pair(tmp_path, {})
    x = _vid()
    with torch.no_grad():
        recon_t, _, vq_t = ref.forward(x)[:3] if False else (None, None, None)
    # reference forward(optimizer_idx=None) computes losses; drive the pieces
    with torch.no_grad():
        z_t = ref.pre_vq_conv(ref.encoder(x, False))
        vq_t = ref.codebook(z_t)
        recon_t = ref.decoder(ref.post_vq_conv(vq_t["embeddings"]), False)

    import jax.numpy as jnp
    xl = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 4, 1)))
    recon_j, aux = ours.net.apply(ours.variables, xl, False)
    recon_j = np.transpose(np.asarray(recon_j), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(recon_j, recon_t.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(float(aux["commitment_loss"]),
                               float(vq_t["commitment_loss"]), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(aux["perplexity"]),
                               float(vq_t["perplexity"]), atol=1e-3, rtol=1e-4)
