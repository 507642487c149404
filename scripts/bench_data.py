"""Input-pipeline throughput benchmark (VERDICT r1 item 7).

Measures DataLoader decode+collate throughput (frames/s) on a synthetic
on-disk video dataset (17x256^2 GIF clips, the eval-protocol clip shape) and
compares it against the training-step consumption rate (BENCH_r*.json,
~2275 f/s/chip).  Prints one JSON line.

Usage: python scripts/bench_data.py [--clips 32] [--workers N] [--seconds 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n_clips: int, frames: int = 17, res: int = 256):
    import imageio.v3 as iio

    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    for i in range(n_clips):
        clip = rng.randint(0, 255, (frames, res, res, 3), np.uint8)
        iio.imwrite(os.path.join(root, "train", f"clip{i:04d}.gif"), clip)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=32)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--mode", default="thread", choices=["thread", "process"])
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--sequence_length", type=int, default=17)
    ap.add_argument("--train_rate", type=float, default=2275.0,
                    help="frames/s the train step consumes (BENCH_r*.json)")
    args = ap.parse_args(argv)

    from omnitokenizer_tpu.data.loader import DataLoader
    from omnitokenizer_tpu.data.video import VideoDataset

    with tempfile.TemporaryDirectory() as root:
        make_dataset(root, args.clips, args.sequence_length, args.resolution)
        ds = VideoDataset(root, sequence_length=args.sequence_length,
                          resolution=args.resolution, train=True)
        loader = DataLoader(ds, batch_size=args.batch_size,
                            num_workers=args.workers, worker_mode=args.mode)
        it = iter(loader)
        next(it)  # warm the prefetch queue + import costs
        t0 = time.perf_counter()
        frames = 0
        batches = 0
        while time.perf_counter() - t0 < args.seconds:
            b = next(it)
            frames += int(np.prod(b["video"].shape[:2]))
            batches += 1
        dt = time.perf_counter() - t0
        it.close()  # stop prefetch workers before the tempdir vanishes
        rate = frames / dt
        from omnitokenizer_tpu.native.build import video_available

        native = (video_available()
                  and os.environ.get("OMNITOK_NO_NATIVE_VIDEO") != "1")
        result = {
            "metric": "data_loader_frames_per_sec",
            "value": round(rate, 2),
            "unit": "frames/s",
            "batches": batches,
            "workers": args.workers,
            "mode": args.mode,
            "decode": "native-ffmpeg" if native else "imageio",
            "vs_train_rate": round(rate / args.train_rate, 4),
        }
        print(json.dumps(result))
        return result


if __name__ == "__main__":
    main()
