"""Binning coef-gather decision rows: plain slow-path gather vs
table-parts fast-path (ops/raster.py gather_rows_parts) on the REAL
block-aligned indices of the 263k tier.

binparts (round 6) measured the coef gather at +11.3 ms (cam, 916k rows)
and +16.4 ms (shadow, 1.0M rows) over the sort -- ~12-18 ns/row, i.e. the
>96k-row slow path.  binning.py's comment dismissing the split as a loss
cites the ROUND-4 prober, which predates the round-5 timed_scan integer
anti-hoist fix -- its "f32 fast to >=262k rows" rows were hoisted.  These
rows re-decide with honest timing.

    python tools/prof_coef.py
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
        return _timed_scan(fn, *args, iters=ITERS, label=label, label_width=56)
    except Exception as e:  # pragma: no cover
        print(f"{label:<56}   FAILED ({str(e)[:90]})", flush=True)
        return float("nan")


def main():
    from unclerenderer_tpu.ops.binning import (
        _align_pairs, _pair_keys, _sort_pairs,
    )
    from unclerenderer_tpu.ops.raster import (
        CULL_BACK, CULL_FRONT, compact_setup, flip_depth_key,
        gather_rows_parts, normalize_ortho_setup, triangle_setup_expanded,
        viewport_homogeneous,
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
    span = settings.bin_max_span
    s_slots = span * span

    for name, st0, (w_, h_, th, tw, ck, budget) in [
        ("cam", cam0, (W, H, settings.tile_h, settings.tile_w,
                       settings.chunk, settings.bin_budget_factor)),
        ("shadow", sh0, (SHADOW, SHADOW, settings.shadow_tile_h,
                         settings.shadow_tile_w, settings.shadow_chunk,
                         settings.shadow_bin_budget_factor)),
    ]:
        n_tiles = (-(-w_ // tw)) * (-(-h_ // th))
        tc = st0.coef.shape[0]
        n_blocks = max(int(budget * tc) // ck + n_tiles, 2)
        print(f"  [{name}] T={tc} n_blocks={n_blocks} chunk={ck} "
              f"rows={n_blocks * ck}", flush=True)

        def aligned_tid(st):
            keys, _big = _pair_keys(st, w_, h_, th, tw, span)
            sk, stri = _sort_pairs(keys, n_tiles, s_slots)
            btid, sv, *_rest = _align_pairs(sk, stri, n_tiles, ck, n_blocks)
            return jnp.where(sv, btid, 0)

        btid0 = jax.block_until_ready(jax.jit(aligned_tid)(st0))

        def plain(st, bt):
            return st.coef[bt].transpose(0, 2, 1)
        timed_scan(plain, st0, btid0,
                   label=f"coef[{name}]: plain gather + T (current)")

        def parts(st, bt):
            return gather_rows_parts(st.coef, bt).transpose(0, 2, 1)
        timed_scan(parts, st0, btid0,
                   label=f"coef[{name}]: gather_rows_parts + T")

        def parts3(st, bt):
            return gather_rows_parts(st.coef, bt, part_rows=65536).transpose(0, 2, 1)
        timed_scan(parts3, st0, btid0,
                   label=f"coef[{name}]: parts 64k rows + T")

        a = jax.jit(plain)(st0, btid0)
        b = jax.jit(parts)(st0, btid0)
        print(f"  [{name}] parts bit-exact: "
              f"{bool(jnp.all(a == b))}", flush=True)

        # resolve-record-shaped row: (T, 128) f32 table, 2M requests
        if name == "cam":
            rng = np.random.default_rng(0)
            rec = jnp.asarray(rng.standard_normal((tc, 128)).astype(np.float32))
            idx = jnp.asarray(
                rng.integers(0, tc, W * H).astype(np.int32)).reshape(H, W)
            timed_scan(lambda r, i: r[i].sum(-1), rec, idx,
                       label="rec128[cam-cap]: plain gather 2M")
            timed_scan(lambda r, i: gather_rows_parts(r, i).sum(-1), rec, idx,
                       label="rec128[cam-cap]: gather_rows_parts 2M")


if __name__ == "__main__":
    main()
