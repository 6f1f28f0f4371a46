"""Round-6 regression diagnostics, smallest-first.

1. Localize the frame-parity color divergence (pallas vs xla, 256^2 gate
   config): compare depth, tri_id, SHADOW MAP, then color.
2. Bisect the bench worker crash: procedural atlas first, then the sponza
   atlas at growing caps, single frame (no scan).

    python tools/diag_r6.py [step1|step2]
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from unclerenderer_tpu.core.jaxcache import (
    enable_persistent_cache,
    pin_platform_from_env,
)

pin_platform_from_env()
enable_persistent_cache()

from unclerenderer_tpu.render import common
from unclerenderer_tpu.render.deferred import deferred_frame
from unclerenderer_tpu.render.params import FrameState, RenderSettings
from unclerenderer_tpu.render.testing import (
    synthetic_device_scene,
    synthetic_frame_params,
)

want = sys.argv[1] if len(sys.argv) > 1 else "step1"


def step1():
    w = h = 256
    base = RenderSettings(
        width=w, height=h, renderer_type="deferred", shadow_map_size=256,
        has_masked_models=False, combined_material=True,
        tile_h=16, tile_w=64, chunk=64, shadow_chunk=64,
    )
    scene, data = synthetic_device_scene(
        24, sphere_res=(12, 10), ground=True, rich_materials=True,
        atlas_u8=True,
    )
    params = synthetic_frame_params(data, w, h)

    outs = {}
    for backend in ("pallas", "xla"):
        s = dataclasses.replace(base, raster_backend=backend)
        out, _ = jax.jit(
            lambda sc, p, st: deferred_frame(sc, p, st, s)
        )(scene, params, FrameState.initial(w, h))
        shadow, _ovf = jax.jit(
            lambda sc, l: common.raster_shadow(
                sc, l,
                common.tri_draw_masks(sc, params.model_visible)[0], s)
        )(scene, params.light_view_proj)
        outs[backend] = {
            "color": np.asarray(out["color"]),
            "tri_id": np.asarray(out["tri_id"]),
            "depth": np.asarray(out["depth"]),
            "shadow": np.asarray(shadow),
        }
    p, x = outs["pallas"], outs["xla"]
    print("tri_id equal:", np.array_equal(p["tri_id"], x["tri_id"]), flush=True)
    print("depth equal:", np.array_equal(p["depth"], x["depth"]),
          "max diff", float(np.abs(p["depth"] - x["depth"]).max()), flush=True)
    sd = np.abs(p["shadow"] - x["shadow"])
    print("shadow equal:", np.array_equal(p["shadow"], x["shadow"]),
          "max diff", float(sd.max()),
          "ndiff", int((sd > 0).sum()), flush=True)
    cd = np.abs(p["color"] - x["color"])
    print("color max diff:", float(cd.max()),
          "ndiff>1e-5:", int((cd.max(-1) > 1e-5).sum()), flush=True)
    if cd.max() > 1e-5:
        ys, xs = np.nonzero(cd.max(-1) > 1e-5)
        print("diff rows span:", ys.min(), ys.max(),
              "cols:", xs.min(), xs.max(), flush=True)


def step2():
    import time

    from unclerenderer_tpu.render.testing import sponza_material_chains

    W, H = 1920, 1080
    for label, kwargs in [
        ("procedural", dict()),
        ("sponza256", dict(texture_source="sponza")),
    ]:
        if label == "sponza256":
            # shrink the sponza cap for the bisect
            import unclerenderer_tpu.render.testing as T

            T._sponza_chain_cache.clear()
            orig = T.sponza_material_chains
            T.sponza_material_chains = (
                lambda max_combos=None, max_dim=256: orig(max_combos, max_dim)
            )
        settings = RenderSettings(
            width=W, height=H, renderer_type="deferred",
            shadow_map_size=4096, raster_backend="pallas",
            has_masked_models=False, combined_material=True,
        )
        scene, data = synthetic_device_scene(
            340, sphere_res=(32, 24), ground=True, rich_materials=True,
            atlas_u8=True, **kwargs,
        )
        params = synthetic_frame_params(data, W, H)
        t0 = time.monotonic()
        out, _ = jax.jit(
            lambda sc, p, st: deferred_frame(sc, p, st, settings)
        )(scene, params, FrameState.initial(W, H))
        m = float(np.asarray(out["color"]).mean())
        print(f"{label}: single frame OK mean={m:.4f} "
              f"atlas={scene.quad_img.nbytes / 1e6:.0f}MB "
              f"({time.monotonic() - t0:.0f}s)", flush=True)


if want == "step1":
    step1()
else:
    step2()
