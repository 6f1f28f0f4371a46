"""Round-5 decision rows: giant-level structure, RecGather fusion context,
shift-compaction, and the MXU edge-eval prototype.

Round-5 targets (VERDICT r4): GiantKernel traced 17.4 ms for only ~43
giants / 1.7k live (tile,tri) pairs (6.8 Mpix-tri of real work -- CPU
diagnosis) => the kernel is structure-bound, not compute-bound; RecGather
12.1 vs 8.9 param-fed; Compaction 6.0 over two full-T packed sorts.

    python tools/prof_r5.py [giant rec compact ...]
"""

from __future__ import annotations

import os
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

from tools.timing import timed_scan as _timed_scan

ITERS = int(os.environ.get("PROF_ITERS", "8"))
W, H, SHADOW = 1920, 1080, 4096


def timed_scan(fn, *args, label=""):
    try:
        return _timed_scan(fn, *args, iters=ITERS, label=label, label_width=56)
    except Exception as e:  # pragma: no cover
        print(f"{label:<56}   FAILED ({str(e)[:110]})", flush=True)
        return float("nan")


def main():
    from unclerenderer_tpu.ops import pallas_raster as pr
    from unclerenderer_tpu.ops.binning import bin_triangles
    from unclerenderer_tpu.ops.raster import (
        CULL_BACK, RasterSetup, compact_mask, compact_setup,
        triangle_setup_expanded,
    )
    from unclerenderer_tpu.render import common
    from unclerenderer_tpu.render.params import RenderSettings
    from unclerenderer_tpu.render.testing import (
        synthetic_device_scene,
        synthetic_frame_params,
    )

    print("device:", jax.devices()[0], flush=True)
    want = set(sys.argv[1:])

    def on(name):
        return not want or name in want

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

    setup0 = jax.block_until_ready(jax.jit(cam_setup)(scene, params.view_proj))
    tc = int(setup0.coef.shape[0])

    # ------------------------------------------------------------------
    # giant: the giant level's real inputs, kernel variants
    # ------------------------------------------------------------------
    if on("giant"):
        big_chunk = 32
        cap_mid = min(tc, max(big_chunk, -(-(tc // 16) // big_chunk) * big_chunk))
        cap_g = min(tc, max(big_chunk, -(-(tc // 128) // big_chunk) * big_chunk))

        def build_giant(st):
            bins = bin_triangles(
                st, W, H, settings.tile_h, settings.tile_w, settings.chunk,
                max_span=settings.bin_max_span,
                budget_factor=settings.bin_budget_factor)
            ext_idx, ext_valid = compact_mask(
                bins.big_mask, min(cap_mid + cap_g, tc))
            mid_idx = ext_idx[:cap_mid]
            mid_valid = ext_valid[:cap_mid]
            mid_setup = RasterSetup(
                coef=st.coef[mid_idx], valid=mid_valid,
                bbox=st.bbox[:, mid_idx])
            mid_bins = bin_triangles(
                mid_setup, W, H, 32, 128, big_chunk, max_span=4,
                budget_factor=2.0, tri_ids=mid_idx)
            a_mask = mid_bins.big_mask & mid_valid
            a_local, a_ok = compact_mask(a_mask, cap_g)
            a_ids = jnp.where(a_ok, mid_idx[a_local], 0)
            cat_ids = jnp.concatenate([a_ids, ext_idx[cap_mid:]])
            cat_ok = jnp.concatenate([a_ok, ext_valid[cap_mid:]])
            g_local, g_valid = compact_mask(cat_ok, cap_g)
            g_idx = jnp.where(g_valid, cat_ids[g_local], 0)
            return RasterSetup(
                coef=st.coef[g_idx], valid=g_valid,
                bbox=st.bbox[:, g_idx]), g_idx

        gsetup, g_idx = jax.block_until_ready(jax.jit(build_giant)(setup0))
        print("giant: n_valid =", int(np.asarray(gsetup.valid).sum()),
              "cap_g =", cap_g, flush=True)
        id_col = jax.block_until_ready(
            g_idx.astype(jnp.float32)[:, None])

        def g_run(st, rec, **kw):
            out = pr.rasterize_pallas(
                st, W, H, tile_h=32, tile_w=128, chunk=big_chunk,
                records=rec, **kw)
            return out[0], out[1]

        timed_scan(lambda st, rc: g_run(st, rc),
                   gsetup, id_col, label="giant: CURRENT (rec-emit, 32x128, cap1280)")
        timed_scan(lambda st: g_run(st, None),
                   gsetup, label="giant: no record emission (local ids)")
        # smaller cap: slice the setup to 256 rows (valid set is ~43)
        g256 = RasterSetup(coef=gsetup.coef[:256], valid=gsetup.valid[:256],
                           bbox=gsetup.bbox[:, :256])
        timed_scan(lambda st, rc: g_run(st, rc),
                   g256, id_col[:256], label="giant: cap 256 (rec-emit)")
        for gth, gtw in ((64, 128), (16, 128), (32, 256)):
            def g_tiles(st, rc, gth=gth, gtw=gtw):
                out = pr.rasterize_pallas(
                    st, W, H, tile_h=gth, tile_w=gtw, chunk=big_chunk,
                    records=rc)
                return out[0], out[1]
            timed_scan(g_tiles, g256, id_col[:256],
                       label=f"giant: cap 256, tiles {gth}x{gtw}")
        timed_scan(lambda st, rc: g_run(st, rc, onepass=False),
                   g256, id_col[:256], label="giant: cap 256, 2D grid")
        # chunk sweep at cap 256
        for ck in (64, 128, 256):
            def g_ck(st, rc, ck=ck):
                out = pr.rasterize_pallas(
                    st, W, H, tile_h=32, tile_w=128, chunk=ck, records=rc)
                return out[0], out[1]
            timed_scan(g_ck, g256, id_col[:256],
                       label=f"giant: cap 256, chunk {ck}")

    # ------------------------------------------------------------------
    # rec: RecGather fusion-context treatments
    # ------------------------------------------------------------------
    if on("rec"):
        rng = np.random.default_rng(0)
        rec = jnp.asarray(rng.standard_normal((tc, 128)).astype(np.float32))
        i1 = jnp.asarray(rng.integers(0, tc, (H, W)).astype(np.int32))
        i2 = jnp.asarray(rng.integers(0, tc, (H, W)).astype(np.int32))
        k1 = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))
        k2 = jnp.asarray(rng.standard_normal((H, W)).astype(np.float32))
        rec = jax.block_until_ready(rec)

        def merged(a_, b_, ka, kb):
            return jnp.where(ka > kb, a_, b_)

        def rec_param(r, tri):
            return r[jnp.maximum(tri, 0)].sum(-1)
        tri0 = jax.block_until_ready(jax.jit(merged)(i1, i2, k1, k2))
        timed_scan(rec_param, rec, tri0, label="rec128: param-fed gather (floor)")

        def rec_fused(r, a_, b_, ka, kb):
            return r[jnp.maximum(merged(a_, b_, ka, kb), 0)].sum(-1)
        timed_scan(rec_fused, rec, i1, i2, k1, k2,
                   label="rec128: merge-select + gather FUSED")

        def rec_scat(r, a_, b_, ka, kb):
            tri = merged(a_, b_, ka, kb).reshape(-1)
            n = tri.shape[0]
            tri = jnp.zeros(n, jnp.int32).at[
                jnp.arange(n, dtype=jnp.int32)].set(tri).reshape(H, W)
            return r[jnp.maximum(tri, 0)].sum(-1)
        timed_scan(rec_scat, rec, i1, i2, k1, k2,
                   label="rec128: merge + IOTA-SCATTER mat + gather")

        def scat_only(a_, b_, ka, kb):
            tri = merged(a_, b_, ka, kb).reshape(-1)
            n = tri.shape[0]
            return jnp.zeros(n, jnp.int32).at[
                jnp.arange(n, dtype=jnp.int32)].set(tri)
        timed_scan(scat_only, i1, i2, k1, k2,
                   label="rec128: iota scatter of 2M i32 ALONE")

        def rec_roll(r, a_, b_, ka, kb):
            tri = merged(a_, b_, ka, kb)
            tri = jnp.roll(tri, 1, axis=0)
            out = r[jnp.maximum(tri, 0)].sum(-1)
            return jnp.roll(out, -1, axis=0)
        timed_scan(rec_roll, rec, i1, i2, k1, k2,
                   label="rec128: merge + roll-wrap + gather")

        # merge INSIDE a Pallas kernel (output = kernel result, not a
        # fusable select chain)
        from jax.experimental import pallas as pl

        def _merge_k(a_ref, b_ref, ka_ref, kb_ref, o_ref):
            o_ref[...] = jnp.where(
                ka_ref[...] > kb_ref[...], a_ref[...], b_ref[...])

        def merge_pallas(a_, b_, ka, kb):
            return pl.pallas_call(
                _merge_k,
                grid=(H // 8,),
                in_specs=[pl.BlockSpec((8, W), lambda i: (i, 0))] * 4,
                out_specs=pl.BlockSpec((8, W), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((H, W), jnp.int32),
            )(a_, b_, ka, kb)

        def rec_pmerge(r, a_, b_, ka, kb):
            tri = merge_pallas(a_, b_, ka, kb)
            return r[jnp.maximum(tri, 0)].sum(-1)
        timed_scan(rec_pmerge, rec, i1, i2, k1, k2,
                   label="rec128: PALLAS-merge + gather")

    # ------------------------------------------------------------------
    # compact: shift vs sort vs scatter at production shapes
    # ------------------------------------------------------------------
    if on("compact"):
        rng = np.random.default_rng(1)
        for t, p in ((263184, 0.4), (163840, 0.004), (163840, 0.06)):
            mask0 = jax.block_until_ready(jnp.asarray(rng.random(t) < p))
            for cap in (1280, 163840):
                if cap > t:
                    continue
                for mode in ("sort", "shift", "scatter"):
                    timed_scan(
                        lambda m, mode=mode, cap=cap: compact_mask(m, cap, mode),
                        mask0,
                        label=f"compact[T={t} p={p} cap={cap}]: {mode}")
                a = jax.jit(lambda m: compact_mask(m, cap, "sort"))(mask0)
                b = jax.jit(lambda m: compact_mask(m, cap, "shift"))(mask0)
                ok = bool(
                    jnp.all(jnp.where(a[1], a[0], 0) == jnp.where(b[1], b[0], 0))
                    & jnp.all(a[1] == b[1]))
                print(f"  [T={t} cap={cap}] shift == sort: {ok}", flush=True)


if __name__ == "__main__":
    main()
