"""Trace attribution for the REAL pica_pica scene (the bench's real-scene
row regressed 199.8 -> 234.6 ms between sessions C and I; this splits the
frame the same way prof_frame's traceattr does, on the actual Renderer
path: masked models on, no compaction, real textures/env).

    python tools/prof_pica.py
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from unclerenderer_tpu.core.jaxcache import (
    enable_persistent_cache,
    pin_platform_from_env,
)

pin_platform_from_env()
enable_persistent_cache()

from unclerenderer_tpu.core.traceparse import PASS_NAMES_FINE, parse_pass_times
from unclerenderer_tpu.render.params import RenderSettings
from unclerenderer_tpu.render.renderer import Renderer


def main():
    import os

    print("device:", jax.devices()[0], flush=True)
    kw = {}
    if os.environ.get("PICA_PACKED"):
        kw["material_packed_trilinear"] = bool(int(os.environ["PICA_PACKED"]))
    if os.environ.get("PICA_ENV_MM"):
        kw["env_matmul_gather"] = bool(int(os.environ["PICA_ENV_MM"]))
    if os.environ.get("PICA_FILTER"):
        kw["texture_filter"] = os.environ["PICA_FILTER"]
    settings = RenderSettings(
        width=1920, height=1080, renderer_type="deferred",
        shadow_map_size=4096, **kw,
    )
    t0 = time.monotonic()
    r = Renderer(
        Path("/root/reference/Assets/Scenes/pica_pica.json"), settings=settings
    )
    out = r.render_frame()
    jax.block_until_ready(out["color"])
    print(f"init+first frame {time.monotonic() - t0:.1f}s; effective: "
          f"masked={r.settings.has_masked_models} "
          f"packed={r.settings.material_packed_trilinear} "
          f"u8={r.settings.material_atlas_u8}", flush=True)

    # steady-state ms/frame (host loop; the Renderer feeds a cached shadow
    # map exactly like the bench's chained row)
    t0 = time.monotonic()
    n = 8
    for _ in range(n):
        out = r.render_frame()
    jax.block_until_ready(out["color"])
    print(f"render_frame steady: {(time.monotonic() - t0) / n * 1e3:.2f} "
          "ms/frame (incl. dispatch round trips)", flush=True)

    d = tempfile.mkdtemp(prefix="uncle_pica_trace_")
    with jax.profiler.trace(d):
        for _ in range(4):
            out = r.render_frame()
        jax.block_until_ready(out["color"])
    other: list = []
    per = parse_pass_times(d, pass_names=PASS_NAMES_FINE, n_frames=4,
                           other_top=other)
    print("-- pica in-frame attribution (4 frames, device op time) --")
    for k, v in sorted(per.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<20}{v:9.3f} ms", flush=True)
    from collections import defaultdict

    agg = defaultdict(float)
    for dur, hay in other:
        agg[hay[:110]] += dur
    print("-- top unattributed --")
    for hay, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {dur / 1e3 / 4:8.3f} ms  {hay}", flush=True)

    scopes = [s for s in os.environ.get("PROF_SCOPE_DUMP", "").split(",") if s]
    if scopes:
        import gzip
        import json

        from unclerenderer_tpu.core.traceparse import find_trace_file

        f = find_trace_file(d)
        with gzip.open(f, "rt") as fh:
            doc = json.load(fh)
        for scope in scopes:
            agg2 = defaultdict(float)
            for e in doc.get("traceEvents", []):
                if e.get("ph") != "X":
                    continue
                args2 = e.get("args", {}) or {}
                hay2 = str(args2.get("tf_op", "")) or str(e.get("name", ""))
                if scope not in hay2:
                    continue
                dur2 = (
                    float(args2["device_duration_ps"]) / 1e6
                    if "device_duration_ps" in args2
                    else float(e.get("dur", 0))
                )
                agg2[hay2[:160]] += dur2
            print(f"-- top ops in scope {scope} (4 frames) --")
            for hay2, dur2 in sorted(agg2.items(), key=lambda kv: -kv[1])[:14]:
                print(f"  {dur2 / 1e3 / 4:8.3f} ms  {hay2}", flush=True)


if __name__ == "__main__":
    main()
