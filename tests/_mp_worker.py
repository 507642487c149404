"""Worker for the two-process `jax.distributed` test (VERDICT r2 item 7).

Launched by tests/test_multiprocess.py as one of TWO OS processes with
OMNITOK_COORD / OMNITOK_NPROCS / OMNITOK_PROC_ID set.  Exercises the same
bootstrap every CLI uses (`cli/args.apply_platform_env` ->
`jax.distributed.initialize`, the analogue of the reference's NCCL
process-group init at /root/reference/ddp_utils.py:333-365), a
process-sharded DataLoader (the DistributedSampler analogue,
/root/reference/OmniTokenizer/data.py:521-535), and ONE data-parallel
tokenizer GAN train step over the global 2-device mesh.

Dumps to <out_dir>/proc<pid>.npz:
  - the local batch this process's loader produced (for the parent's
    single-process reference run on the concatenated global batch)
  - the updated replicated generator params + codebook buffers + metrics

Run standalone for debugging:
  OMNITOK_COORD=localhost:PORT OMNITOK_NPROCS=2 OMNITOK_PROC_ID=i \
  JAX_PLATFORMS=cpu python tests/_mp_worker.py OUT_DIR DATA_DIR
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def build_trainer():
    from omnitokenizer_tpu.config import LossConfig, TokenizerConfig, TrainConfig
    from omnitokenizer_tpu.training.trainer import TokenizerTrainer

    cfg = TokenizerConfig(
        embedding_dim=32, n_codes=64, codebook_dim=8, resolution=32,
        sequence_length=5, patch_size=8, temporal_patch_size=2,
        enc_block="tt", dec_block="tt", spatial_depth=1, temporal_depth=1,
        dim_head=8, heads=4,
    )
    # perceptual + both discriminators ON so the step covers the full GAN
    # surface (incl. psum'd codebook EMA + BN stats) across processes
    loss = LossConfig(perceptual_weight=1.0, image_gan_weight=1.0,
                      video_gan_weight=1.0, gan_feat_weight=1.0,
                      discriminator_iter_start=0)
    return TokenizerTrainer(cfg, loss, TrainConfig(lr=1e-4))


def main():
    out_dir, data_dir = sys.argv[1], sys.argv[2]

    from omnitokenizer_tpu.cli.args import apply_platform_env
    apply_platform_env()  # OMNITOK_COORD -> jax.distributed.initialize

    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from omnitokenizer_tpu.utils.jit_cache import enable_persistent_cache
    enable_persistent_cache()

    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    from omnitokenizer_tpu.data.image import ImageDataset
    from omnitokenizer_tpu.data.loader import DataLoader

    ds = ImageDataset(data_dir, os.path.join(data_dir, "list.txt"),
                      train=True, resolution=32)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1,
                        process_index=pid, process_count=jax.process_count())
    it = iter(loader)
    batch = next(it)
    it.close()
    local = np.asarray(batch["video"], np.float32)[:, None]  # (2,1,32,32,3)

    trainer = build_trainer()
    state = trainer.init_state(seed=0, image_size=32, frames=1)

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    rep = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))

    video = jax.make_array_from_process_local_data(sharded, local)
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        state)

    # AOT-compile BEFORE touching any cross-process collective.  On a
    # 1-core host the two workers compile the train step serially (~3 min
    # skew); Gloo's context init times out after 30 s if one rank executes
    # while the other is still compiling.  Compilation itself is local and
    # deterministic, so: compile, then file-barrier, then execute — the
    # first collective is entered by both ranks within milliseconds.
    compiled = jax.jit(trainer.train_step).lower(state, video).compile()

    import time
    open(os.path.join(out_dir, f"compiled{pid}"), "w").close()
    deadline = time.time() + 1200
    while not all(os.path.exists(os.path.join(out_dir, f"compiled{p}"))
                  for p in range(jax.process_count())):
        if time.time() > deadline:
            raise TimeoutError("peer never finished compiling")
        time.sleep(0.2)

    new_state, metrics = compiled(state, video)

    def fetch(tree):
        return {"/".join(map(str, path)): np.asarray(leaf.addressable_data(0))
                for path, leaf in
                jax.tree_util.tree_flatten_with_path(tree)[0]}

    out = {f"params/{k}": v for k, v in fetch(new_state.params_g).items()}
    out.update({f"buffers/{k}": v for k, v in fetch(new_state.buffers).items()})
    out.update({f"metrics/{k}": v for k, v in fetch(metrics).items()})
    out["local_batch"] = local
    np.savez(os.path.join(out_dir, f"proc{pid}.npz"), **out)
    print(f"proc {pid}: ok ({len(out)} arrays)", flush=True)


if __name__ == "__main__":
    main()
