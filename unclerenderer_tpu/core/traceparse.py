"""Real in-frame per-pass timing from a ``jax.profiler`` device trace.

The reference harvests GPU timestamp pairs around each *production* pass
every frame and shows a rolling top-N table
(``RenderGraph.cpp:323-390,698-771``).  The earlier analog here
(``framegraph.profile_deferred_passes``) re-executes stages in isolation,
which materializes intermediates XLA would fuse -- a measurement artifact.
This module instead parses ONE captured device trace: every ``named_pass``
wraps its ops in ``jax.named_scope``, the scope lands in each HLO op's
metadata, and the profiler emits that metadata with each device op event --
so bucketing device-op durations by scope attributes the *actual fused
frame*, and the buckets sum to ~the measured frame time.

Trace format: TensorBoard "Chrome trace" JSON (``*.trace.json.gz``) under
``<dir>/plugins/profile/<run>/``.  Device rows live in processes whose
``process_name`` mentions the device; op events are complete events
(``ph == "X"``) whose ``args`` carry the annotated ``name``/``tf_op``.
"""

from __future__ import annotations

import gzip
import json
from collections import defaultdict
from pathlib import Path

#: every @named_pass in the package (grep-verified); parse_pass_times
#: accepts an override for custom scopes
PASS_NAMES = (
    "ShadowMap",
    "VisibilityRaster",
    "MaskedRaster",
    "MaterialResolve",
    "BuildHZB",
    "ShadowPCF",
    "IBLAmbient",
    "SkyAtmosphere",
    "TemporalAA",
    "AutoExposure",
    "Tonemap",
    "CAS",
)

#: nested sub-scopes (render/common.py resolve internals, render/deferred.py
#: frame sections, ops/pallas_raster.py raster internals); listed BEFORE the
#: parents so the first-match attribution picks the finer bucket
# ORDER MATTERS: the bucketer takes the FIRST tuple entry found in the op's
# scope path, so deepest-nested scopes must come first (Untile lives inside
# RasterKernel/MidLevel/GiantLevel; LevelMerge inside the raster passes).
SUB_SCOPES = (
    "Untile", "LevelMerge", "GpuDebugPrint", "GiantCompact", "GiantKernel",
    "RecGather", "InterpAttr", "MaterialTap", "NormalMap",
    "FineBinning", "RasterKernel", "MidLevel", "GiantLevel", "Compaction",
    "VertexSetup", "ShadowPack", "DirectLighting",
)
PASS_NAMES_FINE = SUB_SCOPES + PASS_NAMES


def find_trace_file(trace_dir) -> Path | None:
    """Newest ``*.trace.json.gz`` under ``trace_dir`` (profiler layout:
    ``plugins/profile/<timestamp>/<host>.trace.json.gz``)."""
    hits = sorted(
        Path(trace_dir).rglob("*.trace.json.gz"),
        key=lambda p: p.stat().st_mtime,
    )
    return hits[-1] if hits else None


def _op_threads(events) -> set:
    """(pid, tid) pairs of device "XLA Ops" rows -- the per-op events whose
    ``args.tf_op`` carries the named_scope path.  "XLA Modules" rows span
    whole executables (they would double-count every op) and host rows have
    no device time; both are excluded."""
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            n = str(e.get("args", {}).get("name", ""))
            if "/device:" in n or "TPU" in n or "GPU" in n:
                dev_pids.add(e.get("pid"))
    ops = set()
    for e in events:
        if (
            e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e.get("pid") in dev_pids
            and str(e.get("args", {}).get("name", "")) == "XLA Ops"
        ):
            ops.add((e.get("pid"), e.get("tid")))
    return ops


def parse_pass_times(
    trace_dir, pass_names=PASS_NAMES, n_frames: int = 1,
    other_top: list | None = None,
) -> dict[str, float]:
    """Sum device-op durations per named pass from the newest trace under
    ``trace_dir``; returns ``{pass: ms}`` (per frame when ``n_frames`` > 1)
    plus ``"(other)"`` for device time matching no pass and ``"(total)"``.

    An op fused across scopes is attributed to the first scope its metadata
    mentions -- the same convention the profiler UI uses."""
    f = find_trace_file(trace_dir)
    if f is None:
        return {}
    with gzip.open(f, "rt") as fh:
        doc = json.load(fh)
    events = doc.get("traceEvents", [])
    op_threads = _op_threads(events)

    sums: dict[str, float] = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_threads:
            continue
        args = e.get("args", {}) or {}
        # device_duration_ps is the chip-clock duration; dur (us) is the
        # trace-timeline span -- prefer the former when present
        dur_us = (
            float(args["device_duration_ps"]) / 1e6
            if "device_duration_ps" in args
            else float(e.get("dur", 0))
        )
        if not dur_us:
            continue
        # the named_scope path rides in tf_op: "jit(f)/<PassName>/..."
        hay = str(args.get("tf_op", "")) or str(e.get("name", ""))
        total += dur_us
        hit = next((p for p in pass_names if p in hay), None)
        sums[hit if hit is not None else "(other)"] += dur_us
        if hit is None and other_top is not None:
            other_top.append((dur_us, hay))
    if not total:
        return {}
    out = {k: v / 1e3 / max(n_frames, 1) for k, v in sums.items()}
    out["(total)"] = total / 1e3 / max(n_frames, 1)
    return out
