"""Video dataset + host-side frame decoding (the decord replacement).

Reference semantics:
 * /root/reference/OmniTokenizer/data.py:120-236 (DecordVideoDataset) —
   annotation list of video paths, class = parent dir name, decode resized to
   resolution (1.5x when resizecrop), contiguous `sequence_length`-frame
   window sampled 'rand' (train) / 'center' (val), square random crop,
   normalize to [-0.5, 0.5];
 * /root/reference/OmniTokenizer/video_utils.py:206-332 — fps resample via
   linspace re-indexing, sampling strategies, zero-pad + mask for short clips.

Decoding runs on the HOST (imageio-ffmpeg when available); the TPU only ever
sees fixed-shape float batches.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image


def _decode_backend():
    try:
        import imageio.v3 as iio  # noqa: F401

        return "imageio"
    except Exception:
        return None


def _read_frames_imageio(path: str) -> Tuple[np.ndarray, float]:
    import imageio.v3 as iio

    frames = iio.imread(path, plugin="pyav") if path.endswith(".webm") else iio.imread(path)
    meta = {}
    try:
        meta = iio.immeta(path)
    except Exception:
        pass
    fps = float(meta.get("fps", 30.0) or 30.0)
    if frames.ndim == 3:
        frames = frames[None]
    return frames.astype(np.uint8), fps


def _resize_frames(frames: np.ndarray, height: int, width: int) -> np.ndarray:
    t, h, w = frames.shape[:3]
    if (h, w) == (height, width):
        return frames
    out = np.empty((t, height, width, frames.shape[-1]), np.uint8)
    for i in range(t):
        out[i] = np.asarray(
            Image.fromarray(frames[i]).resize((width, height), Image.BILINEAR))
    return out


def sample_frame_indices(vlen: int, num_frm: int, strategy: str,
                         rng: np.random.RandomState) -> np.ndarray:
    """video_utils.py:256-309 sampling strategies over a decoded clip."""
    n = min(num_frm, vlen)
    if strategy == "rand":
        start = rng.randint(0, vlen - n + 1)
        return np.arange(start, start + n)
    if strategy == "center":
        c = vlen // 2
        lo = c - n // 2
        hi = c + n // 2 + (n % 2)
        return np.arange(lo, hi)
    if strategy == "uniform":
        return np.linspace(0, vlen - 1, n).astype(int)
    if strategy == "headtail":
        head = np.sort(rng.choice(vlen // 2, n // 2, replace=False))
        tail = np.sort(rng.choice(np.arange(vlen // 2, vlen), n // 2, replace=False))
        return np.concatenate([head, tail])
    if strategy == "all":
        return np.arange(vlen)
    raise NotImplementedError(strategy)


def load_video_frames(
    path: str,
    num_frm: int,
    strategy: str = "center",
    fps: float = -1,
    height: Optional[int] = None,
    width: Optional[int] = None,
    rng: Optional[np.random.RandomState] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode -> optional fps resample -> window sample -> (T,H,W,3) uint8 +
    validity mask, zero-padded to `num_frm` (video_utils.py:316-332)."""
    rng = rng or np.random.RandomState(0)
    frames, native_fps = _read_frames_imageio(path)
    if height and width:
        frames = _resize_frames(frames, height, width)

    if fps not in (-1, None) and native_fps > fps:
        duration = len(frames) / native_fps
        n = int(duration * fps)
        if n >= 1:
            idx = np.linspace(0, len(frames) - 1, n).astype(int)
            frames = frames[idx]

    vlen = len(frames)
    idx = sample_frame_indices(vlen, num_frm, strategy, rng)
    out = frames[np.clip(idx, 0, vlen - 1)]

    if len(out) < num_frm:
        pad = np.zeros((num_frm - len(out),) + out.shape[1:], np.uint8)
        mask = np.concatenate([np.ones(len(out), np.uint8),
                               np.zeros(num_frm - len(out), np.uint8)])
        out = np.concatenate([out, pad], axis=0)
    else:
        mask = np.ones(num_frm, np.uint8)
    return out, mask


class VideoDataset:
    """Decord-free analogue of DecordVideoDataset; channels-last output."""

    exts = ("avi", "mp4", "webm", "mkv", "mov", "gif")

    def __init__(self, data_folder: str, data_list: Optional[str] = None,
                 fps: Optional[float] = None, sequence_length: int = 17,
                 train: bool = True, resolution: int = 256,
                 resizecrop: bool = False, seed: int = 1234):
        self.train = train
        self.data_folder = data_folder
        self.fps = fps if fps is not None else -1
        self.sequence_length = sequence_length
        self.resolution = resolution
        self.resizecrop = resizecrop
        self.rng = np.random.RandomState(seed)

        if data_list and data_list not in ("none", "None"):
            with open(data_list) as f:
                self.annotations = [
                    os.path.join(data_folder, ln.split("\t")[0])
                    for ln in (l.strip() for l in f) if ln
                ]
        else:
            split = "train" if train else "test"
            self.annotations = sorted(
                os.path.join(root, name)
                for root, _, files in os.walk(os.path.join(data_folder, split))
                for name in files
                if name.rsplit(".", 1)[-1].lower() in self.exts
            )

        self.classes = sorted({os.path.basename(os.path.dirname(p))
                               for p in self.annotations})
        self.class_to_label = {c: i for i, c in enumerate(self.classes)}

    def __len__(self) -> int:
        return len(self.annotations)

    @property
    def n_classes(self) -> int:
        return len(self.classes)

    def __getitem__(self, idx: int) -> Dict:
        path = self.annotations[idx]
        res = self.resolution
        read = res if not self.resizecrop else int(res * 1.5)
        strategy = "rand" if self.train else "center"

        try:
            frames, mask = load_video_frames(
                path, self.sequence_length, strategy, self.fps,
                height=read, width=read, rng=self.rng)
        except Exception as e:  # corrupt-data tolerance (data.py:288-294)
            print(f"[VideoDataset] decode failed for {path}: {e}; using next index")
            return self[(idx + 1) % len(self)]

        # square random crop (video_utils.py:472-505) + fused normalize
        # (native single-pass kernel when built, numpy fallback otherwise)
        from ..native import crop_normalize_u8

        t, h, w, _ = frames.shape
        x = self.rng.randint(0, h - res + 1) if h > res else 0
        y = self.rng.randint(0, w - res + 1) if w > res else 0
        video = crop_normalize_u8(frames, x, y, min(res, h), min(res, w))
        label = self.class_to_label.get(os.path.basename(os.path.dirname(path)), -1)
        return {"video": video, "label": label, "path": path, "mask": mask}
