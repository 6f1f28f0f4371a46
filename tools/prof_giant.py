"""Giant-level decomposition + compact-primitive decision rows.

GiantLevel traced at 15.5 ms after the onepass flip (was 17.9) at the
263k/1080p/4096^2 tier -- the onepass kernel removed only ~2.4 ms of grid
overhead, so the remainder sits in the full-T compact() sorts, the kernel
eval itself, or the level merges.  Rows here attribute it and price a
top_k-based compact against the packed-sort one.

    python tools/prof_giant.py
"""

from __future__ import annotations

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

import os

from tools.timing import timed_scan as _timed_scan

ITERS = int(os.environ.get("PROF_ITERS", "8"))
W, H, SHADOW = 1920, 1080, 4096


def timed_scan(fn, *args, label=""):
    try:
        return _timed_scan(fn, *args, iters=ITERS, label=label, label_width=52)
    except Exception as e:  # pragma: no cover
        print(f"{label:<52}   FAILED ({str(e)[:90]})", flush=True)
        return float("nan")


def main():
    from unclerenderer_tpu.ops import pallas_raster as pr
    from unclerenderer_tpu.ops.raster import (
        CULL_BACK, CULL_FRONT, RasterSetup, compact_setup, flip_depth_key,
        normalize_ortho_setup, triangle_setup_expanded, viewport_homogeneous,
    )
    from unclerenderer_tpu.render import common
    from unclerenderer_tpu.render.params import RenderSettings
    from unclerenderer_tpu.render.testing import (
        synthetic_device_scene,
        synthetic_frame_params,
    )

    print("device:", jax.devices()[0], flush=True)
    settings = RenderSettings(
        width=W, height=H, renderer_type="deferred", shadow_map_size=SHADOW,
        raster_backend="pallas", has_masked_models=False,
        combined_material=True,
    )
    scene, data = synthetic_device_scene(
        340, sphere_res=(32, 24), ground=True, rich_materials=True,
        atlas_u8=True,
    )
    params = synthetic_frame_params(data, W, H)
    opaque, _ = common.tri_draw_masks(scene, params.model_visible)
    t_count = int(scene.tri_geo.shape[0])

    def cam_setup(sc, vp):
        clip, pix_h = common.vertex_stage(sc, vp, W, H)
        st = triangle_setup_expanded(
            pix_h, clip[:, 2], opaque, CULL_BACK, W, H)
        cap = common.compaction_cap(settings, t_count)
        if cap:
            st, _ids, _ovf = compact_setup(st, cap)
        return st

    def sh_setup(sc, lvp):
        hom = jnp.concatenate(
            [sc.position, jnp.ones_like(sc.position[..., :1])], axis=-1)
        clip = hom @ lvp
        pix_h = viewport_homogeneous(clip, SHADOW, SHADOW)
        st = triangle_setup_expanded(
            pix_h, clip[:, 2], opaque, CULL_FRONT, SHADOW, SHADOW)
        scap = common.shadow_compaction_cap(settings, t_count)
        if scap:
            st, _ids, _ovf = compact_setup(st, scap)
        return flip_depth_key(normalize_ortho_setup(st))

    cam0 = jax.block_until_ready(jax.jit(cam_setup)(scene, params.view_proj))
    sh0 = jax.block_until_ready(
        jax.jit(sh_setup)(scene, params.light_view_proj))

    from unclerenderer_tpu.ops.binning import bin_triangles

    for name, st0, (w_, h_, th, tw, ck, gdiv, gth, gtw, want_ids, ortho) in [
        ("cam", cam0, (W, H, settings.tile_h, settings.tile_w, settings.chunk,
                       settings.bin_giant_divisor, settings.giant_tile_h,
                       settings.giant_tile_w, True, False)),
        ("shadow", sh0, (SHADOW, SHADOW, settings.shadow_tile_h,
                         settings.shadow_tile_w, settings.shadow_chunk,
                         settings.bin_giant_divisor,
                         settings.shadow_giant_tile_h,
                         settings.shadow_giant_tile_w, False, True)),
    ]:
        tc = st0.coef.shape[0]
        # the production mid bins give the giant mask; reproduce the same
        # masks the binned raster computes
        bins = jax.block_until_ready(jax.jit(lambda s: bin_triangles(
            s, w_, h_, th, tw, ck, max_span=settings.bin_max_span,
            budget_factor=2.0))(st0))
        big_chunk = 32
        cap_mid = min(tc, max(big_chunk, -(-(tc // settings.bin_mid_divisor) // big_chunk) * big_chunk))
        cap_g = min(tc, max(big_chunk, -(-(tc // gdiv) // big_chunk) * big_chunk))
        n_big = int(np.asarray(jnp.sum(bins.big_mask)))
        print(f"  [{name}] T={tc} big(mid-level in)={n_big} cap_mid={cap_mid} "
              f"cap_g={cap_g}", flush=True)

        idx_bits = max((tc - 1).bit_length(), 1)

        def compact_sort(mask, cap):
            iota = jnp.arange(tc, dtype=jnp.int32)
            packed = jnp.where(mask, 0, jnp.int32(1 << idx_bits)) + iota
            sp = jnp.sort(packed)[:cap]
            return sp & jnp.int32((1 << idx_bits) - 1), sp < jnp.int32(1 << idx_bits)

        def compact_topk(mask, cap):
            iota = jnp.arange(tc, dtype=jnp.int32)
            packed = jnp.where(mask, 0, jnp.int32(1 << idx_bits)) + iota
            neg = -packed  # top_k is descending; negate for ascending
            vals, _ = jax.lax.top_k(neg, cap)
            sp = -vals
            return sp & jnp.int32((1 << idx_bits) - 1), sp < jnp.int32(1 << idx_bits)

        timed_scan(lambda m: compact_sort(m, cap_g)[0], bins.big_mask,
                   label=f"giant[{name}]: compact via full sort (cap={cap_g})")
        timed_scan(lambda m: compact_topk(m, cap_g)[0], bins.big_mask,
                   label=f"giant[{name}]: compact via top_k    (cap={cap_g})")
        timed_scan(lambda m: compact_sort(m, cap_mid)[0], bins.big_mask,
                   label=f"giant[{name}]: mid compact sort (cap={cap_mid})")
        timed_scan(lambda m: compact_topk(m, cap_mid)[0], bins.big_mask,
                   label=f"giant[{name}]: mid compact top_k (cap={cap_mid})")

        # equality check
        a = jax.jit(lambda m: compact_sort(m, cap_g))(bins.big_mask)
        b = jax.jit(lambda m: compact_topk(m, cap_g))(bins.big_mask)
        ok = bool(jnp.all(a[0] == b[0]) & jnp.all(a[1] == b[1]))
        print(f"  [{name}] top_k == sort: {ok}", flush=True)

        g_idx, g_valid = jax.block_until_ready(
            jax.jit(lambda m: compact_sort(m, cap_g))(bins.big_mask))
        giant_setup = jax.block_until_ready(RasterSetup(
            coef=st0.coef[g_idx], valid=g_valid, bbox=st0.bbox[:, g_idx]))
        n_gv = int(np.asarray(jnp.sum(g_valid)))
        print(f"  [{name}] giant kernel input valid = {n_gv}", flush=True)

        for op in (True, False):
            def kern(gs):
                out = pr.rasterize_pallas(
                    gs, w_, h_, tile_h=gth, tile_w=gtw, chunk=big_chunk,
                    want_ids=want_ids, ortho=ortho, onepass=op)
                return out[0]
            timed_scan(kern, giant_setup,
                       label=f"giant[{name}]: kernel onepass={op}")


if __name__ == "__main__":
    main()
