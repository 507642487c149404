"""wandb-compatible experiment logger.

The reference logs through `WandbLogger(project="omnitokenizer")`
(/root/reference/vqgan_train.py:149, transformer_train.py:97).  This module
provides the same surface: if the `wandb` package is importable it logs to
it; otherwise it degrades to an offline wandb-style run directory
(`{root}/wandb/run-<ts>/`) holding `config.json` + `history.jsonl` in the
shape `wandb sync`-style tooling and pandas consumers expect
(one JSON object per step with `_step`/`_runtime` keys).

Usage mirrors wandb:
    run = WandbRun(project="omnitokenizer", config=vars(args), root=out_dir)
    run.log({"train/recon_loss": 0.1}, step=10)
    run.finish()
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


def _scalarize(metrics: Dict[str, Any]) -> Dict[str, float]:
    out = {}
    for k, v in metrics.items():
        try:
            if np.ndim(v) == 0:
                out[k] = float(v)
        except TypeError:
            continue
    return out


class WandbRun:
    def __init__(
        self,
        project: str = "omnitokenizer",
        name: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
        root: str = ".",
        mode: str = "auto",  # auto | online | offline
    ):
        self.project = project
        self._wandb = None
        if mode in ("auto", "online"):
            try:
                import wandb  # noqa: F401 — optional, not in the base image

                self._wandb = wandb.init(project=project, name=name, config=config or {})
            except Exception:
                if mode == "online":
                    raise
        self._t0 = time.time()
        self._step = 0
        self.dir = None
        self._hist = None
        if self._wandb is None:
            ts = time.strftime("%Y%m%d_%H%M%S")
            self.dir = os.path.join(root, "wandb", f"run-{ts}-{name or project}")
            os.makedirs(self.dir, exist_ok=True)
            with open(os.path.join(self.dir, "config.json"), "w") as f:
                json.dump({k: _json_safe(v) for k, v in (config or {}).items()}, f, indent=1)
            self._hist = open(os.path.join(self.dir, "history.jsonl"), "a")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        step = self._step if step is None else step
        self._step = step + 1
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
            return
        rec = {"_step": step, "_runtime": round(time.time() - self._t0, 3)}
        rec.update(_scalarize(metrics))
        self._hist.write(json.dumps(rec) + "\n")
        self._hist.flush()

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        elif self._hist is not None:
            self._hist.close()
            self._hist = None


def _json_safe(v):
    if isinstance(v, (str, int, float, bool)) or v is None:
        return v
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    return str(v)
