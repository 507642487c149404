"""HDF5-backed datasets + frame-folder dataset.

Reference semantics: /root/reference/OmniTokenizer/data.py —
HDF5Dataset :354 (uint8 video frames with start-index table),
HDF5Dataset_vtokens :705 (pre-tokenized int64 grids with crop boxes),
FrameDataset :804 (folders of frames as clips), StftDataset :884
(audio STFT + video pairs).  Channels-last numpy outputs in [-0.5, 0.5].
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def _center_crop_resize(video_u8: np.ndarray, resolution: int) -> np.ndarray:
    """(T, H, W, C) uint8 -> scale shorter side then center crop
    (data.py preprocess :305-351 semantics)."""
    from PIL import Image

    t, h, w, c = video_u8.shape
    scale = resolution / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    if (nh, nw) != (h, w):
        video_u8 = np.stack([
            np.asarray(Image.fromarray(f).resize((nw, nh), Image.BILINEAR))
            for f in video_u8])
    y = (nh - resolution) // 2
    x = (nw - resolution) // 2
    return video_u8[:, y:y + resolution, x:x + resolution]


class HDF5Dataset:
    """uint8 frames stored flat with per-video start indices."""

    def __init__(self, data_file: str, sequence_length: int, train: bool = True,
                 resolution: int = 64, sample_every_n_frames: int = 1, seed: int = 1234):
        import h5py

        self.data_file = data_file
        self.sequence_length = sequence_length
        self.resolution = resolution
        self.sample_every_n_frames = sample_every_n_frames
        self.rng = np.random.RandomState(seed)
        self.prefix = "train" if train else "test"
        self._h5 = h5py.File(data_file, "r")
        self._images = self._h5[f"{self.prefix}_data"]
        self._idx = self._h5[f"{self.prefix}_idx"][:-1]

    def __len__(self) -> int:
        return len(self._idx)

    def __getitem__(self, idx: int) -> Dict:
        start = int(self._idx[idx])
        end = int(self._idx[idx + 1]) if idx < len(self._idx) - 1 else len(self._images)
        span = end - start - self.sequence_length
        if span <= 0:
            return self[(idx + 1) % len(self)]
        start = start + self.rng.randint(0, span)
        clip = np.asarray(self._images[start:start + self.sequence_length])
        clip = _center_crop_resize(clip, self.resolution)
        if self.sample_every_n_frames > 1:
            clip = clip[:: self.sample_every_n_frames]
        video = clip.astype(np.float32) / 255.0 - 0.5
        return {"video": video, "label": -1}


class HDF5DatasetVtokens:
    """Pre-tokenized int grids with optional random spatial crop + box."""

    def __init__(self, data_file: str, sequence_length: int, train: bool = True,
                 resolution: int = 15, spatial_length: int = 15, seed: int = 1234):
        import h5py

        self.sequence_length = sequence_length
        self.resolution = resolution
        self.spatial_length = spatial_length
        self.rng = np.random.RandomState(seed)
        prefix = "train" if train else "test"
        with h5py.File(data_file, "r") as f:
            self._tokens = np.asarray(f[f"{prefix}_data"])
            self._idx = np.asarray(f[f"{prefix}_idx"][:-1])

    def __len__(self) -> int:
        return len(self._idx)

    def __getitem__(self, idx: int) -> Dict:
        start = int(self._idx[idx])
        end = int(self._idx[idx + 1]) if idx < len(self._idx) - 1 else len(self._tokens)
        if end - start <= self.sequence_length:
            return self[self.rng.randint(0, len(self))]
        start = start + self.rng.randint(0, end - start - self.sequence_length)
        clip = self._tokens[start:start + self.sequence_length]
        if self.spatial_length == self.resolution:
            box = np.zeros(4, np.int64)
        else:
            y = self.rng.randint(0, self.resolution - self.spatial_length + 1)
            x = self.rng.randint(0, self.resolution - self.spatial_length + 1)
            clip = clip[:, y:y + self.spatial_length, x:x + self.spatial_length]
            box = np.asarray([y, y + self.spatial_length, x, x + self.spatial_length])
        return {"video": clip.astype(np.int32), "cbox": box}


class FrameDataset:
    """Folders of per-frame images, each folder one clip (data.py:804-881)."""

    def __init__(self, data_folder: str, sequence_length: int,
                 resolution: int = 64, sample_every_n_frames: int = 1,
                 seed: int = 1234):
        self.sequence_length = sequence_length
        self.resolution = resolution
        self.sample_every_n_frames = sample_every_n_frames
        self.rng = np.random.RandomState(seed)
        exts = (".jpg", ".jpeg", ".png")
        self.clips = []
        for root, _, files in sorted(os.walk(data_folder)):
            frames = sorted(os.path.join(root, f) for f in files
                            if f.lower().endswith(exts))
            if len(frames) >= sequence_length * sample_every_n_frames:
                self.clips.append(frames)

    def __len__(self) -> int:
        return len(self.clips)

    def __getitem__(self, idx: int) -> Dict:
        from PIL import Image

        frames = self.clips[idx]
        need = self.sequence_length * self.sample_every_n_frames
        start = self.rng.randint(0, len(frames) - need + 1)
        sel = frames[start:start + need:self.sample_every_n_frames]
        imgs = np.stack([
            np.asarray(Image.open(p).convert("RGB").resize(
                (self.resolution, self.resolution), Image.BILINEAR))
            for p in sel])
        video = imgs.astype(np.float32) / 255.0 - 0.5
        return {"video": video, "label": -1}


class StftDataset:
    """Audio-to-video: paired (stft, video) clips stored as .npz files with
    'stft' (T, F) float and 'video' (T, H, W, 3) uint8 arrays — the TPU-side
    analogue of data.py:884-948's pickle+librosa pipeline (decoding offline)."""

    def __init__(self, data_folder: str, data_list: Optional[str] = None,
                 sequence_length: int = 16, resolution: int = 64, seed: int = 1234):
        self.sequence_length = sequence_length
        self.resolution = resolution
        self.rng = np.random.RandomState(seed)
        if data_list:
            with open(data_list) as f:
                self.files = [os.path.join(data_folder, ln.strip())
                              for ln in f if ln.strip()]
        else:
            self.files = sorted(
                os.path.join(r, n) for r, _, fs in os.walk(data_folder)
                for n in fs if n.endswith(".npz"))

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> Dict:
        z = np.load(self.files[idx])
        stft, video = z["stft"], z["video"]
        t = min(len(video), len(stft))
        if t < self.sequence_length:
            return self[(idx + 1) % len(self)]
        start = self.rng.randint(0, t - self.sequence_length + 1)
        video = _center_crop_resize(
            video[start:start + self.sequence_length], self.resolution)
        return {
            "video": video.astype(np.float32) / 255.0 - 0.5,
            "stft": stft[start:start + self.sequence_length].astype(np.float32),
            "label": -1,
        }


class HDF5DatasetSmap:
    """Paired video + segmentation-map clips from two aligned HDF5 files
    (data.py:580-627): every possible `sequence_length` window is a sample."""

    def __init__(self, data_file: str, data_file_cond: str, sequence_length: int,
                 train: bool = True, resolution: int = 64):
        import h5py

        self.sequence_length = sequence_length
        self.resolution = resolution
        prefix = "train" if train else "test"
        self._h5 = h5py.File(data_file, "r")
        self._h5c = h5py.File(data_file_cond, "r")
        self._images = self._h5[f"{prefix}_data"]
        self._images2 = self._h5c[f"{prefix}_data"]
        idx = self._h5[f"{prefix}_idx"][:]
        self._splits = []
        for i in range(len(idx) - 1):
            start, end = int(idx[i]), int(idx[i + 1])
            self._splits.extend(
                (start + j, start + j + sequence_length)
                for j in range(end - start - sequence_length + 1))

    def __len__(self) -> int:
        return len(self._splits)

    def __getitem__(self, idx: int) -> Dict:
        s, e = self._splits[idx]
        video = _center_crop_resize(np.asarray(self._images[s:e]), self.resolution)
        smap = np.asarray(self._images2[s:e])
        return {
            "video": video.astype(np.float32) / 255.0 - 0.5,
            "smap": smap,
            "label": -1,
        }


class HDF5DatasetText:
    """Video clips + raw caption strings (data.py:629-702); captions are
    tokenized with the byte-BPE tokenizer (data/text_tokenizer.py)."""

    def __init__(self, data_file: str, sequence_length: int, train: bool = True,
                 resolution: int = 64, text_len: int = 77,
                 bpe_path: Optional[str] = None, seed: int = 1234):
        import h5py

        from .text_tokenizer import SimpleTokenizer

        self.sequence_length = sequence_length
        self.resolution = resolution
        self.text_len = text_len
        self.rng = np.random.RandomState(seed)
        self.tokenizer = SimpleTokenizer(bpe_path)
        prefix = "train" if train else "test"
        self._h5 = h5py.File(data_file, "r")
        self._images = self._h5[f"{prefix}_data"]
        self._idx = self._h5[f"{prefix}_idx"][:-1]
        self._text = self._h5[f"{prefix}_text"]

    def __len__(self) -> int:
        return len(self._idx)

    def __getitem__(self, idx: int) -> Dict:
        start = int(self._idx[idx])
        end = int(self._idx[idx + 1]) if idx < len(self._idx) - 1 else len(self._images)
        span = end - start - self.sequence_length
        if span <= 0:
            return self[(idx + 1) % len(self)]
        start = start + self.rng.randint(0, span)
        clip = _center_crop_resize(
            np.asarray(self._images[start:start + self.sequence_length]),
            self.resolution)
        raw = self._text[idx]
        text = raw.decode() if isinstance(raw, bytes) else str(raw)
        return {
            "video": clip.astype(np.float32) / 255.0 - 0.5,
            "text": np.asarray(self.tokenizer(text, self.text_len), np.int32),
            "label": -1,
        }
