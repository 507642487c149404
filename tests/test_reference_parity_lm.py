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
