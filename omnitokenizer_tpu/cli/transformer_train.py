"""LM training CLI — analogue of /root/reference/transformer_train.py.

Trains the GPT over frozen-tokenizer codes with AdamW (decay/no-decay param
split per lm_transformer.py:354-399) + warmup-cosine schedule, data-parallel
over the mesh, auto-resume.
"""

from __future__ import annotations

import argparse
import os
from functools import partial

import numpy as np

from . import args as A


def build_parser():
    p = argparse.ArgumentParser("transformer_train")
    A.add_model_args(p)
    A.add_train_args(p)
    A.add_data_args(p)
    p.add_argument("--vqvae", type=str, required=True, help="tokenizer ckpt")
    p.add_argument("--unconditional", action="store_true")
    p.add_argument("--starts_with_sos", action="store_true")
    p.add_argument("--class_first", action="store_true")
    p.add_argument("--p_drop_cond", type=float, default=None)
    p.add_argument("--block_size", type=int, default=1025)
    p.add_argument("--n_layer", type=int, default=24)
    p.add_argument("--n_head", type=int, default=16)
    p.add_argument("--n_embd", type=int, default=1536)
    p.add_argument("--n_unmasked", type=int, default=0)
    p.add_argument("--transformer_dropout", type=float, default=0.0)
    p.add_argument("--class_cond_dim", type=int, default=1000)
    p.add_argument("--pkeep", type=float, default=1.0)
    # --vtokens/--vtokens_pos come from add_data_args (shared with the data
    # routing); the LM consumes them in build_model/encode_to_z
    p.add_argument("--first_stage_key", type=str, default="video")
    p.add_argument("--stft_vqvae", type=str, default=None,
                   help="second tokenizer ckpt for 'stft' conditioning "
                        "(lm_transformer.py:115-122)")
    p.add_argument("--vocab_size", type=int, default=None,
                   help="override the GPT vocab (reference lm parser compat; "
                        "default derives from the tokenizer + conditioning)")
    p.add_argument("--first_stage_vocab_size", type=int, default=None,
                   help="override the first-stage code vocab (vtokens mode)")
    p.add_argument("--cond_stage_key", type=str, default="label")
    p.add_argument("--sample_every_n_latent_frames", type=int, default=0)
    p.add_argument("--base_lr", type=float, default=4.5e-6)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--pipeline_stages", type=int, default=1,
                   help="GPipe pipeline stages over a ('stage',) mesh "
                        "(parallel/pp.py); n_layer must divide by it")
    p.add_argument("--microbatches", type=int, default=2,
                   help="GPipe microbatches per step (batch must divide)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="tensor-parallel size: Megatron-layout shardings over "
                        "a ('data','model') mesh (parallel/tp.py); n_head and "
                        "4*n_embd must be divisible by it")
    return p


def main(argv=None):
    A.apply_platform_env()
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..config import GPTConfig, Net2NetConfig
    from ..data.loader import VideoData
    from ..models.net2net import Net2NetTransformer
    from ..models.wrapper import OmniTokenizerVQGAN
    from ..parallel.mesh import data_mesh
    from ..training.loop import MetricsLogger, find_latest_checkpoint
    from flax import serialization

    args = A.normalize_precision(build_parser().parse_args(argv))
    tok = OmniTokenizerVQGAN.load_from_checkpoint(args.vqvae)

    first_stage_vocab = args.first_stage_vocab_size or tok.cfg.n_codes
    vocab = first_stage_vocab + (0 if args.unconditional else args.class_cond_dim)
    if args.starts_with_sos and not args.unconditional:
        vocab += 1
    if args.vocab_size:
        assert args.vocab_size >= vocab, \
            f"--vocab_size {args.vocab_size} < required {vocab}"
        vocab = args.vocab_size
    gpt_cfg = GPTConfig(
        vocab_size=vocab, block_size=args.block_size, n_layer=args.n_layer,
        n_head=args.n_head, n_embd=args.n_embd,
        embd_pdrop=args.transformer_dropout, resid_pdrop=args.transformer_dropout,
        attn_pdrop=args.transformer_dropout,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    n2n_cfg = Net2NetConfig(
        gpt=gpt_cfg, class_cond_dim=args.class_cond_dim,
        unconditional=args.unconditional, starts_with_sos=args.starts_with_sos,
        class_first=args.class_first, p_drop_cond=args.p_drop_cond,
        pkeep=args.pkeep, first_stage_vocab_size=first_stage_vocab,
        cond_stage_key=args.cond_stage_key,
        sample_every_n_latent_frames=args.sample_every_n_latent_frames)
    cond_stage_model = None
    if args.cond_stage_key == "stft":
        assert args.stft_vqvae, "--cond_stage_key stft needs --stft_vqvae"
        cond_stage_model = OmniTokenizerVQGAN.load_from_checkpoint(args.stft_vqvae)
    n2n = Net2NetTransformer(n2n_cfg, tok, seed=args.seed,
                             cond_stage_model=cond_stage_model)

    # AdamW with decay/no-decay split: biases, LayerNorm/Embedding weights and
    # pos_emb get no weight decay (lm_transformer.py:362-398)
    def decay_mask(params):
        def mask(path, leaf):
            name = "/".join(str(p.key) for p in path)
            if name.endswith("bias") or "ln" in name or "tok_emb" in name \
               or name.endswith("pos_emb") or "_norm" in name:
                return False
            return True
        return jax.tree_util.tree_map_with_path(mask, params)

    schedule = optax.warmup_cosine_decay_schedule(
        init_value=args.warmup_lr_init, peak_value=args.lr,
        warmup_steps=max(min(args.warmup_steps, args.max_steps - 1), 1),
        decay_steps=max(args.max_steps, 2), end_value=args.lr_min)
    tx = optax.chain(
        optax.clip_by_global_norm(args.grad_clip_val or 1.0),
        optax.adamw(schedule, b1=0.9, b2=0.95,
                    weight_decay=args.weight_decay, mask=decay_mask),
    )
    if args.grad_accumulates > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=args.grad_accumulates)

    params = n2n.gpt_params
    pp_loss = None
    if args.pipeline_stages > 1:
        from ..parallel import pp
        assert args.model_parallel == 1, \
            "--pipeline_stages and --model_parallel are mutually exclusive here"
        assert args.n_layer % args.pipeline_stages == 0, \
            "n_layer must divide by --pipeline_stages"
        mesh = pp.pp_mesh(args.pipeline_stages)
        stacked, rest = pp.stack_block_params(params, args.n_layer)
        stacked = pp.shard_stacked(stacked, mesh)
        params = {"stacked": stacked, "rest": rest}
        opt_state = tx.init(params)
        pp_loss = pp.make_pp_net2net_loss(
            n2n, args.pipeline_stages, args.microbatches, mesh)
    elif args.model_parallel > 1:
        from ..parallel import tp
        assert args.n_head % args.model_parallel == 0, \
            "n_head must divide by --model_parallel (head-aligned TP shards)"
        assert (4 * args.n_embd) % args.model_parallel == 0 \
            and args.n_embd % args.model_parallel == 0, \
            "n_embd and 4*n_embd must divide by --model_parallel"
        mesh = tp.tp_mesh(args.model_parallel)
        params = tp.shard_params(params, mesh)
        opt_state = tp.sharded_opt_init(tx, params)
    else:
        mesh = data_mesh()
        opt_state = tx.init(params)
    loader = VideoData(args, train=True,
                       process_index=jax.process_index(),
                       process_count=jax.process_count())

    if pp_loss is not None:
        def _loss(p, z_ids, labels, sub):
            return pp_loss(p["stacked"], p["rest"], z_ids, labels, sub)
    else:
        _loss = n2n.loss_fn

    # params + opt state donated: updated in place, no per-step HBM copy.
    # Safe because the loop rebinds both from the step's outputs and the
    # checkpoint writes read the live (post-step) values via device_get.
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, z_ids, labels, rng):
        rng, sub = jax.random.split(rng)
        (loss, metrics), grads = jax.value_and_grad(
            _loss, has_aux=True)(params, z_ids, labels, sub)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics, rng

    root = args.default_root_dir
    logger = MetricsLogger(root, wandb_project=args.wandb_project,
                           wandb_config=vars(args))
    rng = jax.random.PRNGKey(args.seed)
    os.makedirs(os.path.join(root, "checkpoints"), exist_ok=True)

    step = 0
    latest = find_latest_checkpoint(root)
    if latest:
        tmpl_p, tmpl_o = params, opt_state
        with open(latest, "rb") as f:
            params, opt_state, step = serialization.from_bytes(
                (params, opt_state, step), f.read())
        # restore device placement from the templates — but ONLY mesh
        # (NamedSharding) placements, i.e. the TP case.  Re-committing to a
        # template's SingleDeviceSharding would pin the restored params to
        # device 0, which then conflicts with a data-sharded batch under jit;
        # uncommitted arrays let jit replicate them over the mesh itself.
        from jax.sharding import NamedSharding as _NS

        def replace_sharding(tmpl, tree):
            return jax.tree_util.tree_map(
                lambda t, x: jax.device_put(x, t.sharding)
                if isinstance(getattr(t, "sharding", None), _NS) else x,
                tmpl, tree)
        params = replace_sharding(tmpl_p, params)
        opt_state = replace_sharding(tmpl_o, opt_state)
        print(f"auto-resumed from {latest} at step {step}")

    for batch in iter(loader):
        if step >= args.max_steps:
            break
        video = np.asarray(batch["video"], np.float32)
        x = np.moveaxis(video, -1, 1)
        is_image = x.ndim == 4
        z_ids = n2n.encode_to_z(x, is_image)
        # condition column: text ids (B, L) when text-conditioned (coinrun
        # captions / HDF5 text), class ids (B,) otherwise
        if args.cond_stage_key == "text" and "text" in batch:
            labels = jnp.asarray(batch["text"], jnp.int32)
        else:
            labels = jnp.asarray(batch.get("label", np.zeros(len(x))), jnp.int32)
        with mesh:
            # PP mesh has a ('stage',) axis — microbatches stream through the
            # pipeline from a replicated batch; otherwise batch-shard on data
            bspec = P() if pp_loss is not None else P("data")
            z_ids = jax.device_put(z_ids, NamedSharding(mesh, bspec))
            labels = jax.device_put(labels, NamedSharding(mesh, bspec))
            params, opt_state, metrics, rng = train_step(
                params, opt_state, z_ids, labels, rng)
        logger.log(step, metrics)
        step += 1
        # post-increment like the final checkpoint below: step_N means
        # "resume at N" for both kinds, and only process 0 writes.
        if step % 3000 == 0 and jax.process_index() == 0:
            with open(os.path.join(root, "checkpoints",
                                   f"step_{step:08d}.msgpack"), "wb") as f:
                f.write(serialization.to_bytes(
                    (jax.device_get(params), jax.device_get(opt_state), step)))

    # final checkpoint: without it a run whose max_steps isn't a multiple of
    # the 3000-step cadence leaves nothing to auto-resume from / evaluate
    if step > 0 and jax.process_index() == 0:
        final = os.path.join(root, "checkpoints", f"step_{step:08d}.msgpack")
        if not os.path.exists(final):
            with open(final, "wb") as f:
                f.write(serialization.to_bytes(
                    (jax.device_get(params), jax.device_get(opt_state), step)))


if __name__ == "__main__":
    main()
