"""Annotation-file image dataset (ImageNet-style).

Reference semantics: /root/reference/OmniTokenizer/data.py:52-117 —
lines of "relpath\tlabel"; bicubic resize to (res, res) (or 1.5x resize +
random crop when train & resizecrop); normalize to [-0.5, 0.5]
(mean 0.5, std 1).  Returns channels-LAST (H, W, C) float32 — the TPU
layout; CLI layers add the batch dim.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
from PIL import Image


class ImageDataset:
    exts = ("jpg", "jpeg", "png", "bmp", "webp")

    def __init__(self, data_folder: str, data_list: str, train: bool = True,
                 resolution: int = 256, resizecrop: bool = False,
                 seed: int = 1234):
        self.train = train
        self.data_folder = data_folder
        self.resolution = resolution
        self.resizecrop = resizecrop
        self.rng = np.random.RandomState(seed)
        with open(data_list) as f:
            self.annotations = [ln for ln in (l.strip() for l in f) if ln]

    def __len__(self) -> int:
        return len(self.annotations)

    @property
    def n_classes(self) -> int:
        return 1000

    def __getitem__(self, idx: int) -> Dict:
        parts = self.annotations[idx].split("\t")
        rel, label = parts[0], int(parts[1]) if len(parts) > 1 else -1
        img = Image.open(os.path.join(self.data_folder, rel)).convert("RGB")

        res = self.resolution
        if self.train and self.resizecrop:
            big = int(res * 1.5)
            img = img.resize((big, big), Image.BICUBIC)
            x = self.rng.randint(0, big - res + 1)
            y = self.rng.randint(0, big - res + 1)
            img = img.crop((x, y, x + res, y + res))
        else:
            img = img.resize((res, res), Image.BICUBIC)

        from ..native import normalize_u8

        arr = normalize_u8(np.asarray(img))  # (H, W, C) in [-0.5, 0.5]
        return {"video": arr, "label": label, "path": rel}
