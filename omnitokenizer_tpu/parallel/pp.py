"""Pipeline parallelism (GPipe schedule) for the GPT synthesis stack.

Beyond the reference (whose only parallelism is DDP, SURVEY §2.8): the
24-layer LM is split into S stages laid out over a `('stage',)` mesh axis;
microbatches stream through the pipeline with `jax.lax.ppermute` hops
between stages (ICI neighbours).  Differentiable end-to-end — ppermute has
a transpose rule, so `jax.grad` of the pipelined loss implements the GPipe
backward schedule automatically.

Layout:
  * per-stage params: every `TransformerBlock` param tree stacked on a
    leading (n_layer,) axis, sharded P('stage') -> each device holds its
    own (layers_per_stage, ...) slab;
  * embeddings / final ln / head replicated, applied outside shard_map;
  * activations: (n_micro, mb, T, C) replicated in; stage 0 injects
    microbatch t at step t, stage S-1 emits microbatch t at step t+S-1;
    total steps = n_micro + S - 1 (the classic bubble).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import GPTConfig
from ..models.gpt import TransformerBlock

STAGE_AXIS = "stage"


def pp_mesh(n_stages: int, devices=None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= n_stages
    return Mesh(np.asarray(devices[:n_stages]), (STAGE_AXIS,))


def stack_block_params(params, n_layer: int):
    """{'block0': tree, ...} -> one tree with a leading (n_layer,) axis,
    plus the non-block leftovers (embeddings, ln_f, head)."""
    blocks = [params[f"block{i}"] for i in range(n_layer)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    rest = {k: v for k, v in params.items() if not k.startswith("block")}
    return stacked, rest


def shard_stacked(stacked, mesh: Mesh):
    """Shard the leading layer axis over the stage axis."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(STAGE_AXIS))), stacked)


def unstack_block_params(stacked, rest, n_layer: int):
    """Inverse of stack_block_params: back to the flat {'block{i}': ...}
    tree (for checkpointing / serving with the normal GPT)."""
    out = dict(rest)
    for i in range(n_layer):
        out[f"block{i}"] = jax.tree_util.tree_map(lambda x: x[i], stacked)
    return out


def make_pp_gpt_apply(cfg: GPTConfig, n_stages: int, n_micro: int, mesh: Mesh):
    """Returns apply(stacked_block_params, rest_params, idx) -> logits
    (B, T, vocab): the FULL GPT forward (tok+pos embed -> pipelined blocks
    -> ln_f -> head) with the blocks streamed through the GPipe schedule.
    idx: (B, T) int tokens; B must divide by n_micro."""
    assert cfg.n_layer % n_stages == 0, "layers must divide into stages"
    per_stage = cfg.n_layer // n_stages
    block = TransformerBlock(cfg)

    def stage_apply(slab, x):
        """Run this device's `per_stage` blocks sequentially via scan."""

        def body(x, layer_params):
            y, _ = block.apply({"params": layer_params}, x)
            return y, ()

        x, _ = jax.lax.scan(body, x, slab)
        return x

    def pipeline(slab, xs):
        """shard_map body.  slab: this stage's (per_stage, ...) params;
        xs: (n_micro, mb, T, C) replicated microbatch activations."""
        S, M = n_stages, n_micro
        sidx = jax.lax.axis_index(STAGE_AXIS)
        carry = jnp.zeros_like(xs[0])
        outs = jnp.zeros_like(xs)
        for t in range(M + S - 1):
            x_in = jnp.where(sidx == 0, xs[min(t, M - 1)], carry)
            y = stage_apply(slab, x_in)
            if t >= S - 1:
                m = t - (S - 1)
                outs = outs.at[m].set(jnp.where(sidx == S - 1, y, outs[m]))
            carry = jax.lax.ppermute(
                y, STAGE_AXIS, [(i, (i + 1) % S) for i in range(S)])
        # only the last stage holds real outputs; replicate them
        return jax.lax.psum(jnp.where(sidx == S - 1, outs, 0.0), STAGE_AXIS)

    pipe = jax.shard_map(
        pipeline, mesh=mesh,
        in_specs=(P(STAGE_AXIS), P()),
        out_specs=P(),
        check_vma=False)

    def apply(stacked, rest, idx):
        B, T = idx.shape
        assert B % n_micro == 0, f"batch {B} must divide by n_micro {n_micro}"
        mb = B // n_micro
        # embed (replicated, cheap)
        emb = rest["tok_emb"]["embedding"]
        pos = rest["pos_emb"][0, :T]
        x = emb[idx].astype(cfg.dtype) + pos.astype(cfg.dtype)
        xs = x.reshape(n_micro, mb, T, cfg.n_embd)

        ys = pipe(stacked, xs).reshape(B, T, cfg.n_embd)

        # final LN + head (replicated) — the very same nn.LayerNorm as
        # GPT.ln_f so epsilon/dtype semantics can never diverge
        h = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype).apply(
            {"params": rest["ln_f"]}, ys)
        return jnp.dot(h.astype(cfg.dtype), rest["head"]["kernel"].astype(cfg.dtype),
                       preferred_element_type=jnp.float32)

    return apply


def make_pp_lm_loss(cfg: GPTConfig, n_stages: int, n_micro: int, mesh: Mesh):
    """Plain next-token CE over the pipelined forward (tokens (B, T))."""
    apply = make_pp_gpt_apply(cfg, n_stages, n_micro, mesh)

    def loss(stacked, rest, tokens):
        logits = apply(stacked, rest, tokens[:, :-1])
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tgt = tokens[:, 1:]
        return -jnp.take_along_axis(lp, tgt[..., None], axis=-1).mean()

    return loss


def make_pp_net2net_loss(n2n, n_stages: int, n_micro: int, mesh: Mesh):
    """Net2Net training loss (models/net2net.py loss_fn semantics: vocab
    offsets, pkeep corruption, prefix cut, CE + top-1/5) with the GPT
    forward pipelined over `mesh`.  Signature mirrors n2n.loss_fn with
    (stacked, rest) in place of gpt_params."""
    import optax

    cfg = n2n.cfg
    apply = make_pp_gpt_apply(cfg.gpt, n_stages, n_micro, mesh)

    def loss_fn(stacked, rest, z_ids, labels, pkeep_rng=None):
        if pkeep_rng is not None and cfg.pkeep < 1.0:
            k1, k2 = jax.random.split(pkeep_rng)
            keep = jax.random.bernoulli(k1, cfg.pkeep, z_ids.shape)
            rand = jax.random.randint(k2, z_ids.shape, 0, cfg.gpt.vocab_size)
            z_in = jnp.where(keep, z_ids + n2n.z_offset, rand) - n2n.z_offset
        else:
            z_in = z_ids
        cz, target, prefix = n2n.build_sequence(z_in, labels)
        logits = apply(stacked, rest, cz[:, :-1])[:, prefix:]
        target = target + n2n.z_offset
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.reshape(-1, logits.shape[-1]), target.reshape(-1)).mean()
        top1 = (jnp.argmax(logits, -1) == target).mean()
        top5 = jnp.mean(jnp.any(
            jax.lax.top_k(logits, 5)[1] == target[..., None], axis=-1))
        return loss, dict(loss=loss, acc1=top1 * 100, acc5=top5 * 100)

    return loss_fn
