"""DiT training CLI — analogue of /root/reference/Diffusion/DiT/train.py.

Recipe (reference :181,:220-287): AdamW(lr 1e-4, wd 0), EMA 0.9999 synced at
init, uniform timesteps, latents = vae.encode(x)*0.18215, checkpoint every
`--ckpt_every`, auto-resume from the newest checkpoint.

TPU-native: the jitted train step (grad + optimizer + EMA in one graph) runs
data-parallel over Mesh(('data',)); XLA inserts gradient all-reduces.
`latte_train` reuses `main(video=True)` for the Latte video recipe
(/root/reference/Diffusion/Latte/train.py).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from . import args as A
from .diffusion_common import (
    add_common_diffusion_args,
    build_model,
    encode_batch_fn,
    load_vae_adapter,
    synthetic_latents,
)


def build_parser(video: bool = False):
    p = argparse.ArgumentParser("latte_train" if video else "dit_train")
    add_common_diffusion_args(p, video)
    A.add_data_args(p)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--grad_clip_val", type=float, default=0.0)
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--max_steps", type=int, default=400_000)
    p.add_argument("--global_batch_size", type=int, default=256)
    p.add_argument("--ckpt_every", type=int, default=50_000)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--noise_schedule", type=str, default="linear")
    p.add_argument("--schedule_sampler", type=str, default="uniform",
                   choices=["uniform", "loss-second-moment"])
    p.add_argument("--init_from", type=str, default=None,
                   help="seed params from a torch DiT/Latte .pt/.ckpt "
                        "(converted) or a native state_*.msgpack")
    p.add_argument("--synthetic_data", action="store_true",
                   help="train directly on random latents (no VAE/data needed)")
    p.add_argument("--wandb_project", type=str, default=None)
    if video:
        p.add_argument("--use_image_num", type=int, default=0,
                       help="latte_img joint image-video training "
                            "(Diffusion/Latte/train_with_img.py): append N "
                            "independent image latents per sample; they ride "
                            "spatial blocks with their own labels and bypass "
                            "temporal blocks")
    return p


def find_latest(root: str):
    ckpts = [f for f in os.listdir(root) if f.startswith("state_") and f.endswith(".msgpack")] \
        if os.path.isdir(root) else []
    if not ckpts:
        return None
    return os.path.join(root, max(ckpts, key=lambda f: int(f.split("_")[1].split(".")[0])))


def main(argv=None, video: bool = False):
    A.apply_platform_env()
    import jax
    import jax.numpy as jnp
    import optax

    from ..diffusion import create_diffusion, create_named_schedule_sampler
    from ..parallel.mesh import data_mesh, shard_batch
    from ..training.diffusion_loop import (
        DiffusionTrainState,
        load_diffusion_state,
        make_diffusion_train_step,
        save_diffusion_state,
    )
    from ..training.loop import MetricsLogger

    args = build_parser(video).parse_args(argv)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model, cfg = build_model(args, video, dtype)
    diffusion = create_diffusion(None, noise_schedule=args.noise_schedule,
                                 diffusion_steps=args.diffusion_steps)
    sampler = create_named_schedule_sampler(args.schedule_sampler, diffusion.num_timesteps)

    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)

    # init
    ex = synthetic_latents(rng, 2, cfg, video)
    t0 = jnp.zeros((2,), jnp.int32)
    y0 = jnp.zeros((2,), jnp.int32) if cfg.num_classes else None
    init_kw = {}
    if video and cfg.extras == 78:
        init_kw["text_embedding"] = jnp.zeros((2, 77, 768))
    variables = model.init({"params": key, "label_dropout": key}, jnp.asarray(ex), t0, y0, **init_kw)
    params = variables["params"]

    tx_parts = []
    if args.grad_clip_val:
        tx_parts.append(optax.clip_by_global_norm(args.grad_clip_val))
    tx_parts.append(optax.adamw(args.lr, weight_decay=args.weight_decay))
    if args.init_from:
        from flax import serialization

        if args.init_from.endswith((".pt", ".pth", ".ckpt")):
            from ..models.dit import (convert_dit_state,
                                      load_torch_diffusion_state_dict)
            from ..models.latte import convert_latte_state

            sd = load_torch_diffusion_state_dict(args.init_from, use_ema=True)
            convert = convert_latte_state if video else convert_dit_state
            params = serialization.from_state_dict(params, convert(sd))
        else:
            with open(args.init_from, "rb") as f:
                raw = serialization.msgpack_restore(f.read())
            params = serialization.from_state_dict(params, raw["params"])
        print(f"[dit_train] initialized params from {args.init_from}")

    tx = optax.chain(*tx_parts)
    state = DiffusionTrainState(params, params, tx.init(params), jnp.int32(0))

    use_image_num = getattr(args, "use_image_num", 0) if video else 0

    def loss_model_fn(p, x_t, t, drop_rng, y=None, text_embedding=None,
                      y_image=None):
        kw = dict(train=True)
        if video and text_embedding is not None:
            kw["text_embedding"] = text_embedding
        if use_image_num:  # static: drives the video/image frame split
            kw["use_image_num"] = use_image_num
            kw["y_image"] = y_image
        return model.apply({"params": p}, x_t, t, y,
                           rngs={"label_dropout": drop_rng}, **kw)

    step_fn = make_diffusion_train_step(loss_model_fn, diffusion, tx, args.ema_decay)

    mesh = data_mesh()
    os.makedirs(args.results_dir, exist_ok=True)
    logger = MetricsLogger(args.results_dir, log_every=args.log_every,
                           wandb_project=args.wandb_project, wandb_config=vars(args))

    latest = find_latest(args.results_dir)
    if latest:
        state = load_diffusion_state(latest, state)
        print(f"[dit_train] resumed from {latest} at step {int(state.step)}")

    adapter = None if args.synthetic_data else load_vae_adapter(args)
    encode = encode_batch_fn(adapter, video) if adapter else None
    # latte_img joint training encodes the appended frames as IMAGES
    # (train_with_img.py:227-231 encodes per-frame; with the omnitokenizer
    # VAE that is the is_image=True path, one latent frame per image)
    encode_img = encode_batch_fn(adapter, video=False) if adapter else None
    data_iter = None
    if not args.synthetic_data and args.train_datalist[0] != "none":
        from ..data.loader import VideoData

        loader = VideoData(args, train=True, process_index=jax.process_index(),
                           process_count=jax.process_count())
        data_iter = iter(loader)

    B = max(args.global_batch_size // jax.process_count(), 1)
    step = int(state.step)
    while step < args.max_steps:
        y_image = None
        if data_iter is not None:
            batch = next(data_iter, None)
            if batch is None:
                data_iter = iter(loader)
                batch = next(data_iter)
            pix = np.asarray(batch["video"], np.float32)  # channels-last
            if not video and pix.ndim == 5:  # video dataset -> first frame
                pix = pix[:, 0]
            y = np.asarray(batch.get("label", np.zeros(len(pix)))).astype(np.int32)
            img_pix = None
            if video and use_image_num:
                # train_with_img batch mixing (the ucf101_img datasets draw
                # use_image_num random frames from the global frame pool,
                # each with its source video's label): draw frames from
                # rolled batch rows so every image comes from a different
                # sample than its host video
                Bc, Tc = pix.shape[:2]
                img_pix = np.empty((Bc, use_image_num) + pix.shape[2:],
                                   np.float32)
                y_image = np.empty((Bc, use_image_num), np.int32)
                for j in range(use_image_num):
                    src = np.roll(np.arange(Bc), j + 1)
                    fidx = rng.randint(0, Tc, size=Bc)
                    img_pix[:, j] = pix[src, fidx]
                    y_image[:, j] = y[src]
            if encode:
                # wrapper.encode consumes torch layout (models/wrapper.py)
                x0 = encode(np.moveaxis(pix, -1, 1), seed=step)
                if img_pix is not None:
                    flat = img_pix.reshape((-1,) + img_pix.shape[2:])
                    zi = encode_img(np.moveaxis(flat, -1, 1), seed=step + 1)
                    zi = zi.reshape((len(pix), use_image_num) + zi.shape[1:])
                    x0 = jnp.concatenate([jnp.asarray(x0), zi], axis=1)
            else:
                x0 = jnp.asarray(pix)
                if img_pix is not None:
                    x0 = jnp.concatenate([x0, jnp.asarray(img_pix)], axis=1)
        else:
            x0 = jnp.asarray(synthetic_latents(rng, B, cfg, video))
            if use_image_num:
                extra = synthetic_latents(rng, B, cfg, video)[:, :use_image_num]
                x0 = jnp.concatenate([x0, jnp.asarray(extra)], axis=1)
                y_image = rng.randint(0, max(cfg.num_classes, 1),
                                      size=(B, use_image_num)).astype(np.int32)
            y = rng.randint(0, max(cfg.num_classes, 1), size=(len(x0),)).astype(np.int32)

        ts, weights = sampler.sample(len(x0), rng)
        key, sub = jax.random.split(key)
        cond = {"y": jnp.asarray(y)} if cfg.num_classes else {}
        if use_image_num and y_image is not None and cfg.num_classes:
            cond["y_image"] = jnp.asarray(y_image)
        x0 = jnp.asarray(x0)
        if len(x0) % mesh.size == 0:  # GSPMD data-parallel shard over 'data'
            x0 = shard_batch(x0, mesh)
        state, loss, aux = step_fn(state, x0,
                                   jnp.asarray(ts, jnp.int32), jnp.asarray(weights), sub, cond)
        if args.schedule_sampler == "loss-second-moment":
            sampler.update_with_all_losses(ts, np.asarray(aux["per_t_loss"]))
        step = int(state.step)
        if step % args.log_every == 0 or step == 1:
            logger.log(step, {"loss": float(loss), "mse": float(aux.get("mse", loss)),
                              "grad_norm": float(aux["grad_norm"])})
        if step % args.ckpt_every == 0 or step == args.max_steps:
            save_diffusion_state(os.path.join(args.results_dir, f"state_{step:09d}.msgpack"), state)
    print(f"[dit_train] done at step {step}")
    return state


if __name__ == "__main__":
    main()
