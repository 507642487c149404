"""trace_analysis aggregation over a synthetic chrome-trace file."""

import gzip
import json
import os

from omnitokenizer_tpu.utils.trace_analysis import load_trace_events, op_table, source_table


def _write_trace(tmp_path):
    events = [
        {"ph": "M", "pid": 1, "tid": 2, "name": "thread_name", "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 1, "tid": 3, "name": "thread_name", "args": {"name": "Steps"}},
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.1", "dur": 1000, "ts": 0,
         "args": {"source": "a.py:1"}},
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.2", "dur": 3000, "ts": 0,
         "args": {"source": "a.py:1"}},
        {"ph": "X", "pid": 1, "tid": 2, "name": "my_kernel", "dur": 2000, "ts": 0,
         "args": {"source": "b.py:9"}},
        # wrong track: ignored
        {"ph": "X", "pid": 1, "tid": 3, "name": "step", "dur": 99999, "ts": 0},
    ]
    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_op_and_source_tables(tmp_path):
    root = _write_trace(tmp_path)
    events = load_trace_events(root)
    rows = op_table(events, calls=2)
    assert rows[0]["name"] == "TOTAL" and abs(rows[0]["ms"] - 3.0) < 1e-9
    byname = {r["name"]: r for r in rows[1:]}
    assert abs(byname["fusion"]["ms"] - 2.0) < 1e-9 and byname["fusion"]["count"] == 1
    assert abs(byname["my_kernel"]["ms"] - 1.0) < 1e-9
    srcs = source_table(events, calls=2)
    assert srcs[0]["source"] == "a.py:1" and abs(srcs[0]["ms"] - 2.0) < 1e-9
