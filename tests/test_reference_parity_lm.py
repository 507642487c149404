"""TRUE-ORACLE LM parity: the actual reference minGPT
(/root/reference/OmniTokenizer/modules/gpt.py) with random weights, converted
by utils/gpt_checkpoint.py, must match our flax GPT — full-forward logits AND
greedy token sequences from every sampler family (sample_with_past,
sample_with_past_cfg both scale modes, sample_with_past_hardcfg)."""

import argparse
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
from reference_oracle import ref_module  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from omnitokenizer_tpu.config import GPTConfig  # noqa: E402
from omnitokenizer_tpu.models.gpt import (  # noqa: E402
    GPT as JGPT, make_cfg_sampler, make_hardcfg_sampler, make_sampler)
from omnitokenizer_tpu.utils.gpt_checkpoint import convert_gpt_state  # noqa: E402

VOCAB, BLOCK, LAYERS, HEADS, EMBD = 128, 48, 2, 2, 32


def _build_pair(seed=0):
    rgpt_mod = ref_module("gpt") if False else ref_module("modules.gpt")
    torch.manual_seed(seed)
    args = argparse.Namespace()
    ref = rgpt_mod.GPT(args, VOCAB, BLOCK, n_layer=LAYERS, n_head=HEADS,
                       n_embd=EMBD).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = GPTConfig(vocab_size=VOCAB, block_size=BLOCK, n_layer=LAYERS,
                    n_head=HEADS, n_embd=EMBD)
    params = convert_gpt_state(sd, cfg)
    return ref, cfg, params


@pytest.fixture(scope="module")
def pair():
    return _build_pair()


def test_gpt_forward_logits_parity(pair):
    ref, cfg, params = pair
    idx = torch.randint(0, VOCAB, (2, 17), generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        logits_t, _ = ref(idx)
    logits_j, _ = JGPT(cfg).apply({"params": params}, jnp.asarray(idx.numpy()))
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_sample_with_past_token_parity(pair):
    ref, cfg, params = pair
    gmod = ref_module("modules.gpt")
    cond = torch.randint(1, VOCAB, (2, 3), generator=torch.Generator().manual_seed(2))
    steps = 16
    with torch.no_grad():
        toks_t = gmod.sample_with_past(cond.clone(), ref, steps,
                                       sample_logits=False)
    sample = make_sampler(cfg, steps, greedy=True)
    toks_j = sample(params, jnp.asarray(cond.numpy()), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(toks_j), toks_t.numpy())


@pytest.mark.parametrize("scale_cfg", [False, True])
def test_sample_with_past_cfg_token_parity(pair, scale_cfg):
    ref, cfg, params = pair
    gmod = ref_module("modules.gpt")
    cls = torch.randint(0, 10, (2, 1), generator=torch.Generator().manual_seed(3))
    steps = 12
    with torch.no_grad():
        toks_t = gmod.sample_with_past_cfg(
            cls.clone(), ref, steps, sample_logits=False, cfg_ratio=1.5,
            class_first=False, scale_cfg=scale_cfg)
    sample = make_cfg_sampler(cfg, steps, cfg_ratio=1.5, class_first=False,
                              scale_cfg=scale_cfg, greedy=True)
    toks_j = sample(params, jnp.asarray(cls.numpy()), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(toks_j), toks_t.numpy())


def test_sample_with_past_hardcfg_token_parity(pair):
    ref, cfg, params = pair
    gmod = ref_module("modules.gpt")
    cls = torch.randint(0, 10, (2, 1), generator=torch.Generator().manual_seed(4))
    steps = 12
    with torch.no_grad():
        toks_t = gmod.sample_with_past_hardcfg(
            cls.clone(), ref, steps, sample_logits=False, cfg_ratio=1.5,
            class_first=False)
    sample = make_hardcfg_sampler(cfg, steps, cfg_ratio=1.5, class_first=False,
                                  greedy=True)
    toks_j = sample(params, jnp.asarray(cls.numpy()), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(toks_j), toks_t.numpy())


def test_sample_with_past_topk_filter_parity(pair):
    """top-k filtering changes which tokens survive; greedy argmax after
    filtering must still agree (gpt.py:19-36)."""
    ref, cfg, params = pair
    gmod = ref_module("modules.gpt")
    cond = torch.randint(1, VOCAB, (2, 2), generator=torch.Generator().manual_seed(5))
    steps = 8
    with torch.no_grad():
        toks_t = gmod.sample_with_past(cond.clone(), ref, steps,
                                       sample_logits=False, top_k=5, top_p=0.9)
    sample = make_sampler(cfg, steps, top_k=5, top_p=0.9, greedy=True)
    toks_j = sample(params, jnp.asarray(cond.numpy()), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(toks_j), toks_t.numpy())


@pytest.mark.slow
def test_net2net_full_forward_parity(tmp_path):
    """The REAL reference Net2NetTransformer (frozen real VQGAN first stage +
    real minGPT), loaded via our download.load_transformer conversion path:
    z-token encoding, vocab offsets, prefix layout, targets and logits must
    all match (lm_transformer.py:136-192)."""
    from reference_oracle import (lightning_ckpt_bytes, make_net2net_args,
                                  make_vqgan_args)

    om = ref_module("omnitokenizer")
    vq_args = make_vqgan_args(embedding_dim=64, n_codes=64, codebook_dim=8,
                              spatial_depth=2, temporal_depth=2, dim_head=16,
                              heads=4, enc_block="tt", dec_block="tt",
                              patch_size=8, norm_type="batch")
    torch.manual_seed(0)
    vq = om.VQGAN(vq_args).eval()
    vq_path = str(tmp_path / "vq.ckpt")
    with open(vq_path, "wb") as f:
        f.write(lightning_ckpt_bytes(vq))

    lm = ref_module("lm_transformer")
    n2n_args = make_net2net_args(vq_path, starts_with_sos=True,
                                 block_size=256, n_layer=2, n_head=2,
                                 n_embd=32, p_drop_cond=None)
    torch.manual_seed(1)
    ref = lm.Net2NetTransformer(n2n_args).eval()
    gpt_path = str(tmp_path / "gpt.ckpt")
    torch.save({"state_dict": ref.state_dict(),
                "hyper_parameters": {"args": n2n_args}}, gpt_path)

    from omnitokenizer_tpu.download import load_transformer

    ours = load_transformer(gpt_path, vq_path)
    assert ours.cfg.gpt.vocab_size == ref.transformer.config.vocab_size

    g = torch.Generator().manual_seed(7)
    x = torch.randn(2, 3, 5, 64, 64, generator=g) * 0.25
    c = torch.randint(0, 10, (2,), generator=g)

    with torch.no_grad():
        logits_t, target_t = ref(x, c)

    z_ids = ours.encode_to_z(np.asarray(x), is_image=False)
    cz, target_j, prefix = ours.build_sequence(
        jnp.asarray(np.asarray(z_ids)), jnp.asarray(c.numpy()))
    # reference targets are offset z-ids (lm_transformer.py:143-147,185)
    np.testing.assert_array_equal(
        np.asarray(target_j) + ours.z_offset, target_t.numpy())
    logits_j, _ = ours.gpt.apply({"params": ours.gpt_params}, cz[:, :-1])
    logits_j = np.asarray(logits_j)[:, prefix:]
    np.testing.assert_allclose(logits_j, logits_t.numpy(), atol=5e-4, rtol=1e-3)

    # loss parity: CE over the same logits/targets
    loss_j, _ = ours.loss_fn(ours.gpt_params, jnp.asarray(np.asarray(z_ids)),
                             jnp.asarray(c.numpy()))
    loss_t = torch.nn.functional.cross_entropy(
        logits_t.reshape(-1, logits_t.shape[-1]), target_t.reshape(-1))
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)
