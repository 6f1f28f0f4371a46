"""On-chip shadow-raster stage profiler (relay-safe timing).

Timing rules for the axon relay (see BENCHLOG): every iteration must carry a
genuine data dependence (XLA hoists loop-invariant bodies), and each
measurement must force a host readback (block_until_ready is not a reliable
barrier through the relay).  All loops run device-side in one lax.scan
dispatch so the ~28 ms relay round trip is paid once.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from unclerenderer_tpu.core.jaxcache import enable_persistent_cache
from unclerenderer_tpu.render import common
from unclerenderer_tpu.render.params import RenderSettings
from unclerenderer_tpu.render.testing import (
    synthetic_device_scene,
    synthetic_frame_params,
)

enable_persistent_cache()

ITERS = int(__import__("os").environ.get("PROF_ITERS", "8"))


from tools.timing import timed_scan as _timed_scan


def timed_scan(fn, *args, iters=ITERS, label=""):
    """Mean ms/iter of fn(*args) with an inter-iteration dependence."""
    return _timed_scan(fn, *args, iters=iters, label=label, label_width=44)


def main():
    print("device:", jax.devices()[0], flush=True)
    scene, data = synthetic_device_scene(340, sphere_res=(32, 24), ground=True)
    t_count = int(scene.tris.shape[0])
    print("triangles:", t_count, flush=True)
    params = synthetic_frame_params(data, 1920, 1080)
    opaque, masked = common.tri_draw_masks(scene, params.model_visible)
    tri_mask = jax.block_until_ready(opaque | masked)
    lvp = params.light_view_proj

    sizes = [int(s) for s in (sys.argv[1:] or [2048, 4096])]
    for size in sizes:
        settings = RenderSettings(
            width=1920, height=1080, shadow_map_size=size, raster_backend="pallas"
        )

        timed_scan(
            lambda s, l: common.raster_shadow(s, l, tri_mask, settings),
            scene, lvp, label=f"shadow {size} full raster_shadow",
        )

        # stage split: setup (vertex + coefficients) alone
        from unclerenderer_tpu.ops.raster import (
            CULL_FRONT, triangle_setup_expanded, viewport_homogeneous,
        )

        def setup_only(s, l):
            hom = jnp.concatenate([s.position, jnp.ones_like(s.position[..., :1])], -1)
            clip = hom @ l
            pix_h = viewport_homogeneous(clip, size, size)
            return triangle_setup_expanded(pix_h, clip[:, 2], tri_mask, CULL_FRONT, size, size)

        timed_scan(setup_only, scene, lvp, label=f"shadow {size} setup only")

        # binning alone (fine level)
        from unclerenderer_tpu.ops.binning import bin_triangles
        from unclerenderer_tpu.ops.raster import DEPTH_MIN
        from unclerenderer_tpu.ops.pallas_raster import (
            _run_binned_kernel, flip_depth_key,
        )

        def bin_only(s, l):
            st = flip_depth_key(setup_only(s, l))
            return bin_triangles(
                st, size, size, settings.tile_h, settings.tile_w,
                settings.shadow_chunk, max_span=settings.bin_max_span,
                budget_factor=settings.bin_budget_factor,
            )

        timed_scan(bin_only, scene, lvp, label=f"shadow {size} setup+fine binning")

        def fine_kernel(s, l):
            bins = bin_only(s, l)
            return _run_binned_kernel(
                bins, size, size, settings.tile_h, settings.tile_w,
                settings.shadow_chunk, 0, False, False, want_ids=False,
            )[0]

        timed_scan(fine_kernel, scene, lvp, label=f"shadow {size} setup+bin+fine kernel")


if __name__ == "__main__":
    main()
