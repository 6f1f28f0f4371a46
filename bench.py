"""Benchmark: full deferred pipeline, steady-state ms/frame.

North star (BASELINE.md): Sponza 1920x1080 deferred + shadows + TAA +
auto-exposure + tonemap + CAS at <= 60 ms/frame on one TPU chip.  The mounted
reference checkout is missing sponza's geometry .bin (and
metal_rough_ball's), so the HEADLINE metric is a synthetic Sponza-class tier
(~263k triangles, 342 models incl. giant floor/wall triangles -- the
north-star workload at intended load); pica_pica (~76k triangles, the
heaviest complete reference scene) is measured alongside for continuity with
earlier rounds.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = 60ms / measured (>1 means beating the target); pica_pica's
ms/frame rides along as an extra key.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BASELINE_MS = 60.0
WIDTH, HEIGHT = 1920, 1080
FRAMES = 10


def _measure(render, frames=FRAMES):
    """Steady-state ms/frame; materializes every frame's values
    (block_until_ready alone is not a reliable barrier on relayed backends)."""
    import numpy as np
    import jax.numpy as jnp

    t_setup = time.monotonic()
    out = render()
    float(np.asarray(out["color"]).mean())
    setup_s = time.monotonic() - t_setup

    t0 = time.monotonic()
    sums = []
    for _ in range(frames):
        out = render()
        sums.append(out["color"].mean())  # cheap per-frame reduction
    total = float(np.asarray(jnp.stack(sums).sum()))  # forces every frame
    assert total == total  # finite
    ms = (time.monotonic() - t0) / frames * 1e3
    return ms, setup_s


def _synthetic_runner(settings, n_objects, sphere_res, ground):
    import functools

    import jax

    from unclerenderer_tpu.render.deferred import deferred_frame
    from unclerenderer_tpu.render.params import FrameState
    from unclerenderer_tpu.render.testing import (
        synthetic_device_scene,
        synthetic_frame_params,
    )

    import dataclasses

    scene, data = synthetic_device_scene(
        n_objects, sphere_res=sphere_res, ground=ground
    )
    # the synthetic scene has no MASK materials; skip the masked pass like
    # the Renderer does for such scenes (static setting)
    settings = dataclasses.replace(settings, has_masked_models=False)
    params = synthetic_frame_params(data, WIDTH, HEIGHT)
    state_box = [FrameState.initial(WIDTH, HEIGHT)]
    frame = jax.jit(functools.partial(deferred_frame, settings=settings))

    def render():
        out, state_box[0] = frame(scene, params, state_box[0])
        return out

    n_tris = int(data.tri_model.shape[0])
    return render, n_tris


def main() -> int:
    import jax

    from unclerenderer_tpu.render.params import RenderSettings

    on_tpu = jax.default_backend() not in ("cpu",)
    settings = RenderSettings(
        width=WIDTH,
        height=HEIGHT,
        renderer_type="deferred",
        shadow_map_size=2048,
        raster_backend="auto",
    )

    # headline: Sponza-class synthetic (~263k tris) -- the north-star load
    render, n_tris = _synthetic_runner(
        settings, n_objects=340, sphere_res=(32, 24), ground=True
    )
    ms, setup_s = _measure(render)

    extra = {}
    scene_json = Path("/root/reference/Assets/Scenes/pica_pica.json")
    if scene_json.is_file():
        from unclerenderer_tpu.render.renderer import Renderer

        t0 = time.monotonic()
        renderer = Renderer(scene_json, settings=settings)
        pica_ms, pica_setup = _measure(renderer.render_frame)
        extra = {
            "pica_pica_ms": round(pica_ms, 2),
            "pica_pica_setup_s": round(time.monotonic() - t0 - pica_ms * FRAMES / 1e3, 1),
        }

    print(
        json.dumps(
            {
                "metric": "sponza_class_263k_1080p_deferred_full_pipeline_ms_per_frame",
                "value": round(ms, 2),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 3),
                "triangles": n_tris,
                "device": str(jax.devices()[0]),
                "on_tpu": on_tpu,
                "frames": FRAMES,
                "setup_and_compile_s": round(setup_s, 1),
                **extra,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
