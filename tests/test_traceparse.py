"""Trace-parse pass attribution (core/traceparse.py): bucket device-op
durations by named_pass scope from a profiler trace.  The fixture mirrors
the real TPU trace layout captured on metal (process "/device:TPU:0",
"XLA Ops" thread rows with args.tf_op scope paths, "XLA Modules" rows that
must NOT double-count).
"""

import gzip
import json

from unclerenderer_tpu.core.traceparse import (
    PASS_NAMES,
    find_trace_file,
    parse_pass_times,
)


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "2026_08_19"
    d.mkdir(parents=True)
    f = d / "host.trace.json.gz"
    with gzip.open(f, "wt") as fh:
        json.dump({"traceEvents": events}, fh)
    return tmp_path


def _meta(pid, name, tid=None, kind="process_name"):
    e = {"ph": "M", "pid": pid, "name": kind, "args": {"name": name}}
    if tid is not None:
        e["tid"] = tid
    return e


def _op(pid, tid, dur_ps, tf_op):
    return {
        "ph": "X",
        "pid": pid,
        "tid": tid,
        "name": "fusion.1",
        "dur": dur_ps / 1e6,
        "args": {"device_duration_ps": str(dur_ps), "tf_op": tf_op},
    }


def test_parse_buckets_and_excludes_module_rows(tmp_path):
    events = [
        _meta(3, "/device:TPU:0"),
        _meta(3, "XLA Modules", tid=2, kind="thread_name"),
        _meta(3, "XLA Ops", tid=3, kind="thread_name"),
        _meta(701, "/host:CPU"),
        _meta(701, "python", tid=9, kind="thread_name"),
        # module row spanning everything -- must not count
        {"ph": "X", "pid": 3, "tid": 2, "name": "jit_f(123)", "dur": 1e6,
         "args": {"device_duration_ps": "999000000000"}},
        # host row -- must not count
        _op(701, 9, 5_000_000_000, "jit(f)/ShadowMap/x:"),
        # real op rows
        _op(3, 3, 2_000_000, "jit(f)/ShadowMap/gather:"),        # 2 us
        _op(3, 3, 3_000_000, "jit(f)/ShadowMap/jit(p)/slice:"),  # 3 us
        _op(3, 3, 4_000_000, "jit(f)/MaterialResolve/dot:"),     # 4 us
        _op(3, 3, 1_000_000, "jit(f)/reshape:"),                 # unscoped
    ]
    out = parse_pass_times(_write_trace(tmp_path, events), n_frames=1)
    assert abs(out["ShadowMap"] - 5e-3) < 1e-9      # 5 us = 0.005 ms
    assert abs(out["MaterialResolve"] - 4e-3) < 1e-9
    assert abs(out["(other)"] - 1e-3) < 1e-9
    assert abs(out["(total)"] - 10e-3) < 1e-9
    # per-frame scaling
    out2 = parse_pass_times(_write_trace(tmp_path / "b", events), n_frames=2)
    assert abs(out2["ShadowMap"] - 2.5e-3) < 1e-9


def test_empty_and_missing(tmp_path):
    assert parse_pass_times(tmp_path) == {}
    assert find_trace_file(tmp_path) is None
    out = parse_pass_times(
        _write_trace(tmp_path, [_meta(3, "/device:TPU:0")])
    )
    assert out == {}


def test_pass_names_cover_registrations():
    """PASS_NAMES must stay in sync with every @named_pass in the package."""
    import pathlib
    import re

    root = pathlib.Path(__file__).parents[1] / "unclerenderer_tpu"
    found = set()
    for p in root.rglob("*.py"):
        found |= set(re.findall(r"named_pass\(\"(\w+)\"\)", p.read_text()))
    assert found == set(PASS_NAMES), (
        found ^ set(PASS_NAMES), "update core/traceparse.py PASS_NAMES"
    )
