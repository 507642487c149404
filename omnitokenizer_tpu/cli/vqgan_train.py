"""Tokenizer training CLI — TPU-native analogue of
/root/reference/vqgan_train.py: compositional flags, optional pretrained load
with weight inflation, auto-resume, GAN training over the data mesh.

Usage (flags match the reference shell scripts):
    python -m omnitokenizer_tpu.cli.vqgan_train --patch_size 8 ... \
        --data_path DIR --train_datalist LIST --default_root_dir RUNS
"""

from __future__ import annotations

import argparse

from . import args as A


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("vqgan_train")
    A.add_model_args(p)
    A.add_loss_args(p)
    A.add_train_args(p)
    A.add_data_args(p)
    return p


def main(argv=None):
    A.apply_platform_env()
    import jax

    args = A.normalize_precision(build_parser().parse_args(argv))

    from ..data.loader import VideoData
    from ..parallel.mesh import data_mesh
    from ..training.loop import train_tokenizer
    from ..training.trainer import TokenizerTrainer
    from ..utils.inflate import load_pretrained_into_state

    cfg = A.tokenizer_config_from(args)
    loss_cfg = A.loss_config_from(args)
    train_cfg = A.train_config_from(args)

    trainer = TokenizerTrainer(cfg, loss_cfg, train_cfg)
    mesh = data_mesh()
    loader = VideoData(args, train=True,
                       process_index=jax.process_index(),
                       process_count=jax.process_count())
    try:
        val_loader = VideoData(args, train=False,
                               process_index=jax.process_index(),
                               process_count=jax.process_count())
    except (ValueError, OSError) as e:
        print(f"no validation loader ({e}); skipping val passes")
        val_loader = None

    if jax.process_index() == 0:
        print(f"devices: {jax.device_count()}  mesh: {mesh.shape}")

    state = None
    if args.pretrained:
        state = load_pretrained_into_state(
            trainer, args.pretrained,
            init_vgen=args.init_vgen, init_vdis=args.init_vdis,
            no_init_idis=args.no_init_idis, seed=args.seed)

    train_tokenizer(
        trainer, iter(loader), args.default_root_dir,
        max_steps=args.max_steps, mesh=mesh, seed=args.seed,
        initial_state=state,
        val_batches=iter(val_loader) if val_loader is not None else None,
        wandb_project=args.wandb_project, wandb_config=vars(args),
        ckpt_backend=args.ckpt_backend,
    )


if __name__ == "__main__":
    main()
