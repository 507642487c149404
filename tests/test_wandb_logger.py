"""WandbRun offline-fallback logger tests."""

import glob
import json
import os

from omnitokenizer_tpu.training.loop import MetricsLogger
from omnitokenizer_tpu.utils.wandb_logger import WandbRun


def test_offline_run_writes_history(tmp_path):
    run = WandbRun(project="p", name="t", config={"lr": 1e-4, "arch": ["t", "w"]},
                   root=str(tmp_path), mode="offline")
    run.log({"loss": 1.5, "vec_ignored": [1, 2]}, step=0)
    run.log({"loss": 1.0}, step=5)
    run.log({"loss": 0.5})  # auto-step -> 6
    run.finish()
    assert run.dir and os.path.isdir(run.dir)
    cfg = json.load(open(os.path.join(run.dir, "config.json")))
    assert cfg["lr"] == 1e-4 and cfg["arch"] == ["t", "w"]
    hist = [json.loads(l) for l in open(os.path.join(run.dir, "history.jsonl"))]
    assert [h["_step"] for h in hist] == [0, 5, 6]
    assert hist[0]["loss"] == 1.5 and "vec_ignored" not in hist[0]
    assert all("_runtime" in h for h in hist)


def test_metrics_logger_mirrors_to_wandb(tmp_path):
    logger = MetricsLogger(str(tmp_path), log_every=10,
                           wandb_project="omnitokenizer", wandb_config={"x": 1})
    logger.log(1, {"recon_loss": 0.25})
    runs = glob.glob(os.path.join(str(tmp_path), "wandb", "run-*"))
    assert runs
    hist = [json.loads(l) for l in open(os.path.join(runs[0], "history.jsonl"))]
    assert hist[0]["recon_loss"] == 0.25 and hist[0]["_step"] == 1
