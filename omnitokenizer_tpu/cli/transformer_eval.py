"""LM generation CLI — analogue of /root/reference/transformer_eval.py.

Class-conditional generation (classes partitioned across processes,
transformer_eval.py:228-242) with CFG sampling, and frame-prediction
(encode a latent-frame prefix, AR-continue, decode, :93-134).  Sampling is
one compiled lax.scan; per-process seeds are offset (:179).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from . import args as A


def build_parser():
    p = argparse.ArgumentParser("transformer_eval")
    A.add_model_args(p)
    A.add_data_args(p)
    p.add_argument("--gpt_ckpt", type=str, required=True)
    p.add_argument("--vqvae", "--vqgan_ckpt", type=str, required=True,
                   help="tokenizer ckpt (reference name: --vqgan_ckpt)")
    p.add_argument("--inference_type", type=str, default="class",
                   choices=["class", "frame_prediction"])
    # reference-name compatibility (transformer_eval.py:141-167)
    p.add_argument("--class_cond", action="store_true",
                   help="force class-conditional generation (reference's "
                        "switch; equals --inference_type class)")
    p.add_argument("--data_dir", type=str, default=None,
                   help="frame-prediction input root (alias of --data_path)")
    p.add_argument("--data_list", type=str, default=None,
                   help="frame-prediction clip list (alias of --val_datalist)")
    p.add_argument("--distributed", action="store_true",
                   help="accepted for recipe compat; process layout is "
                        "automatic under jax.distributed")
    p.add_argument("--save", type=str, default="./gen_out")
    p.add_argument("--n_sample", type=int, default=16)
    p.add_argument("--class_cond_dim", type=int, default=1000)
    p.add_argument("--block_size", type=int, default=1025)
    p.add_argument("--n_layer", type=int, default=24)
    p.add_argument("--n_head", type=int, default=16)
    p.add_argument("--n_embd", type=int, default=1536)
    p.add_argument("--starts_with_sos", action="store_true")
    p.add_argument("--class_first", action="store_true")
    p.add_argument("--unconditional", action="store_true")
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--top_p", type=float, default=1.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--cfg_ratio", type=float, default=1.5)
    p.add_argument("--no_scale_cfg", action="store_true",
                   help="constant guidance scale instead of the default "
                        "step-scaled t=cfg_ratio*n (transformer_eval.py:152,240)")
    p.add_argument("--int8", action="store_true",
                   help="int8 W8A8 decode weights (ops/int8.py)")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="shard decode over a ('data','model') mesh: Megatron "
                        "param shards + head-sharded KV caches (parallel/tp)")
    p.add_argument("--decode_bucket", type=int, default=128,
                   help="segmented attention windows for long AR decode "
                        "(0 = full-window every step); 128 is the measured "
                        "optimum at both image (1024-tok) and video "
                        "(5120-tok) scale — round-5 sweep in PERF.md")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--save_as", type=str, default="png", choices=["png", "mp4", "npz"])
    return p


def main(argv=None):
    A.apply_platform_env()
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from PIL import Image

    from ..config import GPTConfig, Net2NetConfig
    from ..models.gpt import GPT
    from ..models.net2net import Net2NetTransformer
    from ..models.wrapper import OmniTokenizerVQGAN

    args = build_parser().parse_args(argv)
    if args.class_cond:
        args.inference_type = "class"
    if args.data_dir:
        args.data_path = [args.data_dir]
    if args.data_list:
        args.val_datalist = [args.data_list]
    tok = OmniTokenizerVQGAN.load_from_checkpoint(args.vqvae)

    vocab = tok.cfg.n_codes + (0 if args.unconditional else args.class_cond_dim)
    if args.starts_with_sos and not args.unconditional:
        vocab += 1
    gpt_cfg = GPTConfig(vocab_size=vocab, block_size=args.block_size,
                        n_layer=args.n_layer, n_head=args.n_head,
                        n_embd=args.n_embd,
                        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    n2n_cfg = Net2NetConfig(
        gpt=gpt_cfg, class_cond_dim=args.class_cond_dim,
        unconditional=args.unconditional, starts_with_sos=args.starts_with_sos,
        class_first=args.class_first, first_stage_vocab_size=tok.cfg.n_codes)

    # GPT weights: native msgpack tuple or torch Lightning ckpt
    if args.gpt_ckpt.endswith(".msgpack"):
        n2n = Net2NetTransformer(n2n_cfg, tok, seed=0)
        with open(args.gpt_ckpt, "rb") as f:
            params, _, _ = serialization.from_bytes((n2n.gpt_params, None, 0), f.read())
        n2n.gpt_params = params
    else:
        from ..utils.gpt_checkpoint import load_gpt_torch_checkpoint

        params = load_gpt_torch_checkpoint(args.gpt_ckpt, gpt_cfg)
        n2n = Net2NetTransformer(n2n_cfg, tok, gpt_params=params)

    os.makedirs(args.save, exist_ok=True)
    hw = tok.cfg.latent_hw
    lt = tok.cfg.latent_t
    is_image = args.sequence_length == 1
    steps = hw * hw if is_image else lt * hw * hw

    if args.inference_type == "frame_prediction":
        # encode a 2-latent-frame prefix from val videos, AR-continue, decode
        # (transformer_eval.py:93-134)
        from ..data.loader import VideoData

        # one finite pass like the reference's val loader (epochs=1); the
        # n_sample bound below may stop earlier
        loader = VideoData(args, train=False, epochs=1)
        sampler = n2n.make_frame_prediction_sampler(
            lt, prefix_latent_frames=2, temperature=args.temperature,
            top_k=args.top_k, top_p=args.top_p,
            bucket=args.decode_bucket or None, int8=args.int8)
        rng = jax.random.PRNGKey(args.seed + jax.process_index())
        done = 0
        for bi, batch in enumerate(iter(loader)):
            if done >= args.n_sample:
                break
            video = np.moveaxis(np.asarray(batch["video"], np.float32), -1, 1)
            rng, sub = jax.random.split(rng)
            ids = sampler(video, sub)
            pixels = np.asarray(n2n.decode_to_pixels(ids, is_image=False))
            for i in range(len(pixels)):
                np.savez(os.path.join(args.save, f"pred{done:05d}.npz"),
                         video=pixels[i],
                         ground_truth=video[i])
                done += 1
        print(f"frame-predicted {done} clips to {args.save}")
        return

    cache_sharding = None
    tp_mesh_ctx = None
    if args.model_parallel > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import tp

        assert args.n_head % args.model_parallel == 0
        assert not args.int8, "--int8 and --model_parallel are mutually exclusive"
        tp_mesh_ctx = tp.tp_mesh(args.model_parallel)
        n2n.gpt_params = tp.shard_params(n2n.gpt_params, tp_mesh_ctx)
        cache_sharding = NamedSharding(tp_mesh_ctx, P(None, "model"))

    sampler = n2n.make_class_conditional_sampler(
        steps, temperature=args.temperature, top_k=args.top_k,
        top_p=args.top_p, cfg_ratio=args.cfg_ratio,
        use_cfg=args.starts_with_sos, scale_cfg=not args.no_scale_cfg,
        bucket=args.decode_bucket or None,
        int8=args.int8, cache_sharding=cache_sharding)

    # shard classes across processes (transformer_eval.py:228-242)
    pidx, pcount = jax.process_index(), jax.process_count()
    classes = np.arange(args.class_cond_dim)[pidx::pcount]
    rng = jax.random.PRNGKey(args.seed + pidx)

    done = 0
    n_total = min(args.n_sample, len(classes))
    for start in range(0, n_total, 8):
        cls = jnp.asarray(classes[start:min(start + 8, n_total)], jnp.int32)
        rng, sub = jax.random.split(rng)
        ids = sampler(cls, sub)
        pixels = np.asarray(n2n.decode_to_pixels(ids, is_image=is_image))
        for i, c in enumerate(np.asarray(cls)):
            if is_image:
                img = np.clip((np.moveaxis(pixels[i], 0, -1) + 0.5) * 255, 0, 255).astype(np.uint8)
                Image.fromarray(img).save(os.path.join(args.save, f"class{c:04d}.png"))
            else:
                np.savez(os.path.join(args.save, f"class{c:04d}.npz"),
                         video=pixels[i])
            done += 1
    print(f"generated {done} samples to {args.save}")


if __name__ == "__main__":
    main()
