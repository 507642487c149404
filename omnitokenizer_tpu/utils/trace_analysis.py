"""XLA trace analysis: per-op / per-source-line device-time tables.

Part of the tracing subsystem (SURVEY.md 5.1 — the reference has none).
`utils.profiling.trace` writes a profile dir containing
`plugins/profile/<ts>/*.trace.json.gz` (chrome-trace format); this module
aggregates the 'XLA Ops' track without needing tensorboard.

Usage:
    with profiling.trace("/tmp/my-trace"):
        run_model()
    python -m omnitokenizer_tpu.utils.trace_analysis /tmp/my-trace --calls 3
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
from typing import Dict, List, Optional, Tuple


def load_trace_events(trace_dir: str) -> List[dict]:
    pattern = os.path.join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")
    files = sorted(glob.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(files[-1]) as f:
        return json.load(f)["traceEvents"]


def _thread_names(events) -> Dict[Tuple[int, int], str]:
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    return tids


def op_table(events, calls: int = 1) -> List[dict]:
    """Aggregate 'XLA Ops' events by base op name (fusion indices stripped).

    Returns rows {name, ms (per call), count (per call), source} sorted by
    time, plus a 'TOTAL' row.
    """
    tids = _thread_names(events)
    agg = collections.Counter()
    cnt = collections.Counter()
    src: Dict[str, str] = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if tids.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        base = re.sub(r"[.\d]+$", "", e["name"])
        agg[base] += e["dur"]
        cnt[base] += 1
        total += e["dur"]
        a = e.get("args") or {}
        if base not in src and a.get("source"):
            src[base] = a["source"]
    rows = [
        # per-call count; keep sub-call occurrences visible (a one-time
        # prefill op averaged over 15 decode calls is 0.07, not 0)
        {"name": n, "ms": us / 1000.0 / calls,
         "count": cnt[n] // calls if cnt[n] % calls == 0
         else round(cnt[n] / calls, 2),
         "source": src.get(n, "")}
        for n, us in agg.most_common()
    ]
    rows.insert(0, {"name": "TOTAL", "ms": total / 1000.0 / calls, "count": 0, "source": ""})
    return rows


def source_table(events, calls: int = 1) -> List[dict]:
    """Aggregate device time by originating source line."""
    tids = _thread_names(events)
    agg = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if tids.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        a = e.get("args") or {}
        agg[a.get("source", "(unattributed)")] += e["dur"]
    return [{"source": s, "ms": us / 1000.0 / calls} for s, us in agg.most_common()]


def print_report(trace_dir: str, calls: int = 1, top: int = 25) -> None:
    events = load_trace_events(trace_dir)
    print(f"== per-op (averaged over {calls} call(s)) ==")
    for r in op_table(events, calls)[: top + 1]:
        print(f"{r['ms']:8.3f} ms  x{r['count']:<5} {r['name'][:40]:40} {r['source'][-50:]}")
    print("\n== per-source-line ==")
    for r in source_table(events, calls)[:top]:
        print(f"{r['ms']:8.3f} ms  {r['source'][-70:]}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser("trace_analysis")
    ap.add_argument("trace_dir")
    ap.add_argument("--calls", type=int, default=1, help="divide by this many traced calls")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    print_report(args.trace_dir, args.calls, args.top)
