"""GPipe pipeline parallelism (parallel/pp.py) on the virtual CPU mesh:
the pipelined loss must equal the sequential full-forward loss, and grads
must flow through the ppermute hops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omnitokenizer_tpu.config import GPTConfig
from omnitokenizer_tpu.models.gpt import GPT
from omnitokenizer_tpu.parallel import pp

CFG = GPTConfig(vocab_size=48, block_size=16, n_layer=4, n_head=2, n_embd=16)


def _ref_loss(gpt, params, tokens):
    logits, _ = gpt.apply({"params": params}, tokens[:, :-1])
    lp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(lp, tokens[:, 1:, None], axis=-1).mean()


def test_pp_loss_matches_sequential(devices):
    if len(devices) < 4:
        pytest.skip("needs 4 virtual devices")
    gpt = GPT(CFG)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 12), 0, CFG.vocab_size)
    params = gpt.init(jax.random.PRNGKey(0), tokens[:1])["params"]

    ref = float(_ref_loss(gpt, params, tokens))

    mesh = pp.pp_mesh(4)
    stacked, rest = pp.stack_block_params(params, CFG.n_layer)
    stacked = pp.shard_stacked(stacked, mesh)
    loss = pp.make_pp_lm_loss(CFG, n_stages=4, n_micro=2, mesh=mesh)
    got = float(jax.jit(loss)(stacked, rest, tokens))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    # grads flow through the pipeline (ppermute transpose = reverse hops)
    g = jax.jit(jax.grad(loss))(stacked, rest, tokens)
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms)) and max(norms) > 0

    # every stage's slab contributes: per-layer grad norms all nonzero
    qn = jnp.sqrt(jnp.sum(g["query"]["kernel"].astype(jnp.float32) ** 2,
                          axis=(1, 2)))
    assert float(jnp.min(qn)) > 0
