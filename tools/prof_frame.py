"""On-chip per-stage profiler for the deferred frame at the bench's
Sponza-class synthetic tier (1080p, ~263k tris, rich materials).

Relay-safe timing (see BENCHLOG): every iteration carries a genuine data
dependence so XLA cannot hoist the body; each measurement forces a host
readback; loops run device-side in one lax.scan dispatch so the ~28 ms relay
round trip is paid once per measurement, not per iter.

    python tools/prof_frame.py [stage ...]   # default: all stages
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
from unclerenderer_tpu.render import common
from unclerenderer_tpu.render.deferred import deferred_frame
from unclerenderer_tpu.render.params import FrameState, RenderSettings
from unclerenderer_tpu.render.testing import (
    synthetic_device_scene,
    synthetic_frame_params,
)

pin_platform_from_env()
enable_persistent_cache()

import os

ITERS = int(os.environ.get("PROF_ITERS", "8"))
W = int(os.environ.get("PROF_W", "1920"))
H = int(os.environ.get("PROF_H", "1080"))
SHADOW = int(os.environ.get("PROF_SHADOW", "4096"))
N_OBJECTS = int(os.environ.get("PROF_OBJECTS", "340"))
BACKEND = os.environ.get("PROF_BACKEND", "pallas")
INTERPRET = bool(int(os.environ.get("PROF_INTERPRET", "0")))
# Env defaults MUST track the shipped RenderSettings defaults (quad u8
# atlas, trilinear) so the profile measures the judged config; overrides
# exist for decision rows only (VERDICT r5 weak #2: prof/bench divergence).
PACKED_TRI = bool(int(os.environ.get("PROF_PACKED_TRI", "0")))
ATLAS_U8 = bool(int(os.environ.get("PROF_ATLAS_U8", "1")))
# "sponza" = the bench headline's real-DDS material tier (24 materials)
TEX_SOURCE = os.environ.get("PROF_TEX_SOURCE", "procedural")
GEOMETRY = os.environ.get("PROF_GEOMETRY", "procedural")
ANISO_FRAC = os.environ.get("PROF_ANISO_FRAC")
ENV_MM = bool(int(os.environ.get("PROF_ENV_MM", "0")))


from tools.timing import timed_scan as _timed_scan


def timed_scan(fn, *args, iters=ITERS, label=""):
    try:
        return _timed_scan(fn, *args, iters=iters, label=label, label_width=46)
    except Exception as e:
        # a row lost to a relay drop (after timing.py's retries) must not
        # kill the remaining rows of a metal window
        msg = (str(e).splitlines() or [type(e).__name__])[0]
        print(f"{label:<46}   FAILED ({msg[:100]})", flush=True)
        return float("nan")


def main():
    print("device:", jax.devices()[0], flush=True)
    want = set(sys.argv[1:])

    def on(name):
        return not want or name in want

    scene, data = synthetic_device_scene(
        N_OBJECTS, sphere_res=(32, 24), ground=True, rich_materials=True,
        packed_trilinear=PACKED_TRI, atlas_u8=ATLAS_U8,
        texture_source=TEX_SOURCE, geometry_source=GEOMETRY,
    )
    t_count = int(scene.tri_geo.shape[0])
    print("triangles:", t_count, flush=True)
    # optional raster-tuning sweeps (defaults = RenderSettings defaults)
    overrides = {}
    for env, field, conv in [
        ("PROF_TILE_H", "tile_h", int), ("PROF_TILE_W", "tile_w", int),
        ("PROF_CHUNK", "chunk", int),
        ("PROF_BUDGET", "bin_budget_factor", float),
        ("PROF_SHADOW_TILE_H", "shadow_tile_h", int),
        ("PROF_SHADOW_TILE_W", "shadow_tile_w", int),
        ("PROF_SHADOW_CHUNK", "shadow_chunk", int),
        # span-1 binning: pairs = T (not span^2*T) -- pair table drops under
        # the gather cliff; tile-crossers spill to the mid level (counted)
        ("PROF_SPAN", "bin_max_span", int),
        ("PROF_MID_DIV", "bin_mid_divisor", int),
        ("PROF_ALIGN_SCATTER", "bin_align_scatter", lambda v: bool(int(v))),
        ("PROF_GIANT_CHUNK", "bin_giant_chunk", int),
        ("PROF_SHADOW_GIANT_TILE_H", "shadow_giant_tile_h", int),
        ("PROF_SHADOW_GIANT_TILE_W", "shadow_giant_tile_w", int),
    ]:
        if os.environ.get(env):
            overrides[field] = conv(os.environ[env])
    if overrides:
        print("overrides:", overrides, flush=True)
    settings = RenderSettings(
        width=W, height=H, renderer_type="deferred", shadow_map_size=SHADOW,
        raster_backend=BACKEND, has_masked_models=False,
        combined_material=True, pallas_interpret=INTERPRET,
        material_packed_trilinear=PACKED_TRI,
        material_atlas_u8=ATLAS_U8,
        # default tracks the SHIPPED sampler (RenderSettings.texture_filter
        # = trilinear; the aniso flip was reverted on judged-tier cost --
        # params.py); PROF_FILTER overrides for decision rows
        texture_filter=os.environ.get("PROF_FILTER", "trilinear"),
        env_matmul_gather=ENV_MM,
        **({"aniso_compact_frac": float(ANISO_FRAC)} if ANISO_FRAC else {}),
        **overrides,
    )
    if GEOMETRY == "sponza" and getattr(
            data, "sponza_chain_of_model", None) is not None:
        import numpy as _np

        _c = _np.asarray(data.scene_center)
        params = synthetic_frame_params(
            data, W, H, camera_pos=(14.327, 0.762, 0.571),
            look_at=(_c[0] - 10.0, _c[1] + 1.0, _c[2]))
    else:
        params = synthetic_frame_params(data, W, H)
    state = FrameState.initial(W, H)
    opaque, _ = common.tri_draw_masks(scene, params.model_visible)
    opaque = jax.block_until_ready(opaque)

    if on("frame"):
        def full(sc, p, st):
            out, st2 = deferred_frame(sc, p, st, settings)
            return out["color"], st2.exposure_ev
        timed_scan(full, scene, params, state, label="FULL deferred frame (4096 shadow)")

    if want and "traceattr" in want:
        # REAL in-frame attribution (explicit-only): one device trace of the
        # fused production frame, bucketed by named_pass scope + resolve
        # sub-scopes -- rows sum to ~the frame, no isolation artifacts.
        import tempfile

        from unclerenderer_tpu.core.traceparse import (
            PASS_NAMES_FINE, parse_pass_times,
        )

        full_jit = jax.jit(
            lambda sc, p, st: deferred_frame(sc, p, st, settings)
        )
        out, st2 = full_jit(scene, params, state)
        jax.block_until_ready(out["color"])
        n = 4
        d = tempfile.mkdtemp(prefix="uncle_traceattr_")
        with jax.profiler.trace(d):
            st_i = state
            for _ in range(n):
                out, st_i = full_jit(scene, params, st_i)
            jax.block_until_ready(out["color"])
        other_top: list = []
        per = parse_pass_times(
            d, pass_names=PASS_NAMES_FINE, n_frames=n, other_top=other_top
        )
        print(f"-- in-frame attribution ({n} traced frames, device op time) --")
        for k, v in sorted(per.items(), key=lambda kv: -kv[1]):
            print(f"  {k:<20}{v:9.3f} ms", flush=True)
        # aggregate the unattributed ops by their (truncated) op path so
        # "(other)" stops being a black box
        from collections import defaultdict as _dd

        agg = _dd(float)
        for dur, hay in other_top:
            agg[hay[:110]] += dur
        print(f"-- top unattributed ops ({n} frames) --")
        for hay, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
            print(f"  {dur / 1e3 / n:8.3f} ms  {hay}", flush=True)
        # PROF_SCOPE_DUMP=<Scope1,Scope2,...>: per-op split of named scopes
        scopes = [s for s in os.environ.get("PROF_SCOPE_DUMP", "").split(",")
                  if s]
        if scopes:
            from unclerenderer_tpu.core.traceparse import (
                find_trace_file,
            )
            import gzip as _gz
            import json as _json

            f = find_trace_file(d)
            with _gz.open(f, "rt") as fh:
                doc = _json.load(fh)
            for scope in scopes:
                agg2 = _dd(float)
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
                print(f"-- top ops in scope {scope} ({n} frames) --")
                for hay2, dur2 in sorted(agg2.items(), key=lambda kv: -kv[1])[:14]:
                    print(f"  {dur2 / 1e3 / n:8.3f} ms  {hay2}", flush=True)

    if on("vertex"):
        timed_scan(
            lambda sc, vp: common.vertex_stage(sc, vp, W, H),
            scene, params.view_proj, label="vertex stage",
        )

    if want and "soaframe" in want:
        # FULL frame with settings.soa_vertex=True -- explicit-only (a second
        # full-frame compile is too expensive for the default sweep); run it
        # when the setup-stage SoA rows justify the compile.
        soa_settings = dataclasses.replace(settings, soa_vertex=True)

        def full_soa(sc, p, st):
            out, st2 = deferred_frame(sc, p, st, soa_settings)
            return out["color"], st2.exposure_ev
        timed_scan(full_soa, scene, params, state,
                   label="FULL deferred frame (SoA vertex)")

    if on("vertexlayout"):
        # Layout hypothesis for the vertex stage's gap above its bandwidth
        # floor: (N, 4) f32 wastes 124/128 lanes of every TPU tile.  Time the
        # same transform three ways; if B/C win big, restructure
        # common.vertex_stage around a transposed/SoA position layout.
        pos = scene.position  # (N, 3)
        n = pos.shape[0]
        pos_t = jax.block_until_ready(pos.T)              # (3, N)
        px, py, pz = (jax.block_until_ready(pos[:, i]) for i in range(3))

        def lay_a(p, vp):  # current: concat + (N,4)@(4,4)
            hom = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
            return hom @ vp
        timed_scan(lay_a, pos, params.view_proj,
                   label=f"vertex layout A: (N,4)@(4,4)  N={n}")

        def lay_b(pt, vp):  # transposed: (4,4)@(4,N), N on the lane dim
            hom = jnp.concatenate([pt, jnp.ones_like(pt[:1])], axis=0)
            return vp.T @ hom
        timed_scan(lay_b, pos_t, params.view_proj,
                   label="vertex layout B: (4,4)@(4,N)")

        def lay_c(x, y, z, vp):  # SoA: 16 fma over dense (N,) vectors
            outs = [x * vp[0, j] + y * vp[1, j] + z * vp[2, j] + vp[3, j]
                    for j in range(4)]
            return tuple(outs)
        timed_scan(lay_c, px, py, pz, params.view_proj,
                   label="vertex layout C: SoA (N,) fma x16")

    from unclerenderer_tpu.ops.raster import (
        CULL_BACK, compact_setup, triangle_setup_expanded,
        triangle_setup_from_soa,
    )

    def setup_fn(sc, vp):
        clip, pix_h = common.vertex_stage(sc, vp, W, H)
        return triangle_setup_expanded(pix_h, clip[:, 2], opaque, CULL_BACK, W, H), pix_h

    if on("setup"):
        timed_scan(lambda sc, vp: setup_fn(sc, vp)[0], scene, params.view_proj,
                   label="vertex + triangle setup")

        # the shipped SoA alternative (settings.soa_vertex): same setup core,
        # lane-dense inputs end to end -- the flip-decision row
        def setup_soa(sc, vp):
            v = common.vertex_stage_soa(sc.pos_soa, vp, W, H)
            return triangle_setup_from_soa(v, opaque, CULL_BACK, W, H)
        timed_scan(setup_soa, scene, params.view_proj,
                   label="vertex + setup (SoA path)")
        cap = common.compaction_cap(settings, t_count)
        print(f"  compaction cap = {cap}", flush=True)
        if cap:
            timed_scan(
                lambda sc, vp: compact_setup(setup_fn(sc, vp)[0], cap)[:2],
                scene, params.view_proj, label="vertex + setup + compact",
            )
            s0, _ = jax.jit(setup_fn)(scene, params.view_proj)
            n_valid = int(jnp.sum(s0.valid))
            _, _, ovf = jax.jit(lambda s: compact_setup(s, cap))(s0)
            print(f"  valid tris this view = {n_valid}  overflow = {int(ovf)}",
                  flush=True)

    if on("raster"):
        def raster_full(sc, vp):
            clip, pix_h = common.vertex_stage(sc, vp, W, H)
            d, t, st, _a, _c = common.raster_opaque(sc, clip, pix_h, opaque, settings)
            return d, t
        timed_scan(raster_full, scene, params.view_proj,
                   label="vertex+setup+compact+binned raster")

    if on("resolve"):
        def raster_ids(sc, vp):
            clip, pix_h = common.vertex_stage(sc, vp, W, H)
            d, t, st, _a, cids = common.raster_opaque(sc, clip, pix_h, opaque, settings)
            return pix_h, t, cids
        pix_h0, tid0, cids0 = jax.jit(raster_ids)(scene, params.view_proj)
        pix_h0, tid0 = jax.block_until_ready((pix_h0, tid0))

        def resolve(sc, ph, t, ci):
            g = common.resolve_materials(sc, ph, t, settings, compact_ids=ci)
            return g["albedo"], g["normal"], g["world_pos"]
        timed_scan(resolve, scene, pix_h0, tid0, cids0, label="material resolve (compact)")

        def resolve_nc(sc, ph, t):
            g = common.resolve_materials(sc, ph, t, settings)
            return g["albedo"], g["normal"], g["world_pos"]
        # global-id resolve for comparison (same tri image still works: ids
        # are compact but the gather cost is what we time)
        timed_scan(resolve_nc, scene, pix_h0, tid0, label="material resolve (global table)")

    if on("shadow"):
        timed_scan(
            lambda sc, l: common.raster_shadow(sc, l, opaque, settings),
            scene, params.light_view_proj,
            label=f"shadow raster {SHADOW} (compacted)",
        )
        no_compact = dataclasses.replace(settings, shadow_compact_cap=0)
        timed_scan(
            lambda sc, l: common.raster_shadow(sc, l, opaque, no_compact),
            scene, params.light_view_proj,
            label=f"shadow raster {SHADOW} (no compaction)",
        )

    if on("light"):
        # isolate lighting+post: run the frame with a precomputed shadow map
        shadow = jax.block_until_ready(jax.jit(
            lambda sc, l: common.raster_shadow(sc, l, opaque, settings)[0]
        )(scene, params.light_view_proj))

        def frame_cached_shadow(sc, p, st):
            out, st2 = deferred_frame(sc, p, st, settings, shadow_map=shadow)
            return out["color"], st2.exposure_ev
        timed_scan(frame_cached_shadow, scene, params, state,
                   label="frame minus shadow raster (cached map)")

    if on("shadowparts"):
        # sub-stage split of the shadow raster (VERDICT r2 #1a: how much of
        # the 4096^2 number is setup/binning vs kernels vs merge epilogue)
        from unclerenderer_tpu.ops import pallas_raster as pr
        from unclerenderer_tpu.ops.binning import bin_triangles
        from unclerenderer_tpu.ops.raster import (
            CULL_FRONT, DEPTH_MIN, flip_depth_key, normalize_ortho_setup,
            viewport_homogeneous,
        )

        s = settings.shadow_map_size
        th, tw = min(settings.shadow_tile_h, s), settings.shadow_tile_w
        ck = settings.shadow_chunk

        def light_setup(sc, lvp):
            hom = jnp.concatenate(
                [sc.position, jnp.ones_like(sc.position[..., :1])], axis=-1)
            clip = hom @ lvp
            pix_h = viewport_homogeneous(clip, s, s)
            st = triangle_setup_expanded(
                pix_h, clip[:, 2], opaque, CULL_FRONT, s, s)
            return normalize_ortho_setup(st)

        timed_scan(light_setup, scene, params.light_view_proj,
                   label="shadow: vertex+setup+ortho-norm")

        def light_setup_soa(sc, lvp):
            v = common.vertex_stage_soa(sc.pos_soa, lvp, s, s)
            st = triangle_setup_from_soa(v, opaque, CULL_FRONT, s, s)
            return normalize_ortho_setup(st)
        timed_scan(light_setup_soa, scene, params.light_view_proj,
                   label="shadow: vertex+setup (SoA path)")

        # production path compacts the light-space setup before binning
        # (common.raster_shadow); profile the binning/kernel stages on the
        # SAME compacted table the frame actually rasters
        scap = common.shadow_compaction_cap(settings, t_count)

        def light_setup_compact(sc, lvp):
            st = light_setup(sc, lvp)
            if scap:
                st, _ids, _ovf = compact_setup(st, scap)
            return st
        timed_scan(light_setup_compact, scene, params.light_view_proj,
                   label=f"shadow: setup+compact (cap={scap})")
        setup0 = jax.block_until_ready(
            jax.jit(light_setup_compact)(scene, params.light_view_proj))
        n_valid = int(jnp.sum(setup0.valid))
        print(f"  light-space valid tris = {n_valid} / {t_count} "
              f"(compact cap = {scap})", flush=True)

        def bins_only(st):
            b = bin_triangles(
                flip_depth_key(st), s, s, th, tw, ck,
                max_span=settings.bin_max_span,
                budget_factor=settings.shadow_bin_budget_factor)
            return b.coef, b.valid, b.overflow
        timed_scan(bins_only, setup0, label="shadow: fine binning (sort+gather)")

        bins0 = jax.block_until_ready(jax.jit(
            lambda st: bin_triangles(
                flip_depth_key(st), s, s, th, tw, ck,
                max_span=settings.bin_max_span,
                budget_factor=settings.shadow_bin_budget_factor)
        )(setup0))

        def fine_only(b):
            out = pr._run_binned_kernel(
                b, s, s, th, tw, ck, 0, INTERPRET, False, want_ids=False,
                ortho=True)
            return out[0]
        timed_scan(fine_only, bins0, label="shadow: fine kernel only")

        def full_binned(st):
            d, _t, _st = pr.rasterize_binned(
                st, s, s, tile_h=th, tile_w=tw, chunk=ck,
                depth_mode=DEPTH_MIN, want_ids=False, ortho=True,
                max_span=settings.bin_max_span,
                mid_divisor=settings.bin_mid_divisor,
                budget_factor=settings.shadow_bin_budget_factor,
                giant_tile_h=settings.shadow_giant_tile_h,
                giant_tile_w=settings.shadow_giant_tile_w,
                interpret=INTERPRET)
            return d
        timed_scan(full_binned, setup0, label="shadow: full binned raster")
        _, _, sstats = jax.jit(lambda st: pr.rasterize_binned(
            st, s, s, tile_h=th, tile_w=tw, chunk=ck,
            depth_mode=DEPTH_MIN, want_ids=False, ortho=True,
            max_span=settings.bin_max_span,
            mid_divisor=settings.bin_mid_divisor,
            budget_factor=settings.shadow_bin_budget_factor,
            giant_tile_h=settings.shadow_giant_tile_h,
            giant_tile_w=settings.shadow_giant_tile_w,
            interpret=INTERPRET))(setup0)
        print("  shadow raster drops:",
              {k: int(v) for k, v in sstats.items()}, flush=True)

    if on("rasterparts"):
        # sub-stage split of the camera-view binned raster: where do the
        # ~31 ms of kernels+merges (round-2 profile) actually sit?
        from unclerenderer_tpu.ops import pallas_raster as pr
        from unclerenderer_tpu.ops.binning import bin_triangles

        def cam_setup(sc, vp):
            st, _ph = setup_fn(sc, vp)
            cap = common.compaction_cap(settings, t_count)
            if cap:
                st, _ids, _ovf = compact_setup(st, cap)
            return st

        setup0 = jax.block_until_ready(
            jax.jit(cam_setup)(scene, params.view_proj))
        th, tw, ck = settings.tile_h, settings.tile_w, settings.chunk

        def bins_only(st):
            b = bin_triangles(
                st, W, H, th, tw, ck, max_span=settings.bin_max_span,
                budget_factor=settings.bin_budget_factor)
            return b.coef, b.valid, b.overflow
        timed_scan(bins_only, setup0, label="raster: fine binning (sort+gather)")

        bins0 = jax.block_until_ready(jax.jit(
            lambda st: bin_triangles(
                st, W, H, th, tw, ck, max_span=settings.bin_max_span,
                budget_factor=settings.bin_budget_factor)
        )(setup0))

        def fine_only(b):
            out = pr._run_binned_kernel(b, W, H, th, tw, ck, 0, INTERPRET)
            return out[0], out[1]
        timed_scan(fine_only, bins0, label="raster: fine kernel only")

        def full_binned(st):
            d, t, _st = pr.rasterize_binned(
                st, W, H, tile_h=th, tile_w=tw, chunk=ck,
                budget_factor=settings.bin_budget_factor,
                max_span=settings.bin_max_span,
                mid_divisor=settings.bin_mid_divisor,
                giant_divisor=settings.bin_giant_divisor,
                giant_tile_h=min(settings.giant_tile_h, H),
                giant_tile_w=settings.giant_tile_w,
                interpret=INTERPRET)
            return d, t
        timed_scan(full_binned, setup0,
                   label="raster: full binned (fine+mid+giant+merge)")
        _, _, cstats = jax.jit(lambda st: pr.rasterize_binned(
            st, W, H, tile_h=th, tile_w=tw, chunk=ck,
            budget_factor=settings.bin_budget_factor,
            max_span=settings.bin_max_span,
            mid_divisor=settings.bin_mid_divisor,
            giant_divisor=settings.bin_giant_divisor,
            giant_tile_h=min(settings.giant_tile_h, H),
            giant_tile_w=settings.giant_tile_w,
            interpret=INTERPRET))(setup0)
        print("  raster drops:",
              {k: int(v) for k, v in cstats.items()}, flush=True)

    if want and "binparts" in want:
        # Cumulative split of bin_triangles itself (explicit-only): expand+
        # sort vs +pair-source alignment gather vs full (+coef gather) --
        # attributes the binning cost between the sort, the slow pair-table
        # gather (n_pairs rows, past the f32 cliff), and the coefficient
        # gather (compacted T-table).  Same helpers production uses.
        from unclerenderer_tpu.ops.binning import (
            _align_pairs, _pair_keys, _sort_pairs, bin_triangles,
        )
        from unclerenderer_tpu.ops.raster import (
            CULL_FRONT, flip_depth_key, normalize_ortho_setup,
            viewport_homogeneous,
        )

        def cam_setup(sc, vp):
            st, _ph = setup_fn(sc, vp)
            cap = common.compaction_cap(settings, t_count)
            if cap:
                st, _ids, _ovf = compact_setup(st, cap)
            return st

        s = settings.shadow_map_size

        def light_setup_c(sc, lvp):
            hom = jnp.concatenate(
                [sc.position, jnp.ones_like(sc.position[..., :1])], axis=-1)
            clip = hom @ lvp
            pix_h = viewport_homogeneous(clip, s, s)
            st = triangle_setup_expanded(
                pix_h, clip[:, 2], opaque, CULL_FRONT, s, s)
            scap = common.shadow_compaction_cap(settings, t_count)
            if scap:
                st, _ids, _ovf = compact_setup(st, scap)
            return flip_depth_key(normalize_ortho_setup(st))

        cam0 = jax.block_until_ready(jax.jit(cam_setup)(scene, params.view_proj))
        sh0 = jax.block_until_ready(
            jax.jit(light_setup_c)(scene, params.light_view_proj))
        span = settings.bin_max_span
        s_slots = span * span
        for name, st0, (w_, h_, th, tw, ck, budget) in [
            ("cam", cam0, (W, H, settings.tile_h, settings.tile_w,
                           settings.chunk, settings.bin_budget_factor)),
            ("shadow", sh0, (s, s, settings.shadow_tile_h,
                             settings.shadow_tile_w, settings.shadow_chunk,
                             settings.shadow_bin_budget_factor)),
        ]:
            n_tiles = (-(-w_ // tw)) * (-(-h_ // th))
            tc = st0.coef.shape[0]
            n_blocks = max(int(budget * tc) // ck + n_tiles, 2)
            print(f"  {name}: T={tc} pairs={tc * s_slots} n_tiles={n_tiles} "
                  f"n_blocks={n_blocks}", flush=True)

            def sort_only(st):
                keys, big = _pair_keys(st, w_, h_, th, tw, span)
                sk, stri = _sort_pairs(keys, n_tiles, s_slots)
                return sk, stri, big
            timed_scan(sort_only, st0,
                       label=f"binparts[{name}]: expand + sort")

            def sort_align(st):
                keys, big = _pair_keys(st, w_, h_, th, tw, span)
                sk, stri = _sort_pairs(keys, n_tiles, s_slots)
                btid, sv, _bt, _bf, _iu, _tu, ovf = _align_pairs(
                    sk, stri, n_tiles, ck, n_blocks)
                return btid, sv, ovf
            timed_scan(sort_align, st0,
                       label=f"binparts[{name}]: + pair-source gather")

            def sort_align_sc(st):
                keys, big = _pair_keys(st, w_, h_, th, tw, span)
                sk, stri = _sort_pairs(keys, n_tiles, s_slots)
                btid, sv, _bt, _bf, _iu, _tu, ovf = _align_pairs(
                    sk, stri, n_tiles, ck, n_blocks, use_scatter=True)
                return btid, sv, ovf
            timed_scan(sort_align_sc, st0,
                       label=f"binparts[{name}]: + pair scatter (alt)")

            def align_gather(st):
                keys, big = _pair_keys(st, w_, h_, th, tw, span)
                sk, stri = _sort_pairs(keys, n_tiles, s_slots)
                btid, sv, _bt, _bf, _iu, _tu, ovf = _align_pairs(
                    sk, stri, n_tiles, ck, n_blocks)
                btid = jnp.where(sv, btid, 0)
                return st.coef[btid], sv, ovf
            timed_scan(align_gather, st0,
                       label=f"binparts[{name}]: + coef gather NO transpose")

            def align_gather_t(st):
                keys, big = _pair_keys(st, w_, h_, th, tw, span)
                sk, stri = _sort_pairs(keys, n_tiles, s_slots)
                btid, sv, _bt, _bf, _iu, _tu, ovf = _align_pairs(
                    sk, stri, n_tiles, ck, n_blocks)
                btid = jnp.where(sv, btid, 0)
                return st.coef[btid].transpose(0, 2, 1), sv, ovf
            timed_scan(align_gather_t, st0,
                       label=f"binparts[{name}]: + coef gather + transpose")

            def align_gather_tb(st):
                keys, big = _pair_keys(st, w_, h_, th, tw, span)
                sk, stri = _sort_pairs(keys, n_tiles, s_slots)
                btid, sv, _bt, _bf, _iu, _tu, ovf = _align_pairs(
                    sk, stri, n_tiles, ck, n_blocks)
                btid = jax.lax.optimization_barrier(jnp.where(sv, btid, 0))
                return st.coef[btid].transpose(0, 2, 1), sv, ovf
            timed_scan(align_gather_tb, st0,
                       label=f"binparts[{name}]: + BARRIER idx + gather + T")

            def full_bin(st):
                b = bin_triangles(st, w_, h_, th, tw, ck, max_span=span,
                                  budget_factor=budget)
                return b.coef, b.valid, b.overflow
            timed_scan(full_bin, st0,
                       label=f"binparts[{name}]: + coef gather (full)")

    if on("hzb"):
        from unclerenderer_tpu.ops.hzb import build_hzb, hzb_layout

        layout, _total = hzb_layout(W // 2, H // 2)
        depth0 = jax.block_until_ready(jax.jit(
            lambda sc, vp: common.raster_opaque(
                sc, *common.vertex_stage(sc, vp, W, H), opaque, settings
            )[0]
        )(scene, params.view_proj))
        timed_scan(lambda d: build_hzb(d, layout), depth0,
                   label="HZB build (XLA reduction chain)")
        timed_scan(
            lambda d: build_hzb(d, layout, pallas_tail=True,
                                interpret=INTERPRET),
            depth0, label="HZB build (Pallas single-launch tail)",
        )

    if want and "tapparts" in want:
        # MaterialTap (44 ms in-frame, the round-5 #1 target) split into its
        # two candidate bottlenecks on PRODUCTION data: the packed-atlas row
        # gather vs the trilinear reconstruction ALU (lane selects + blends).
        def gbuf_ids(sc, vp):
            clip, pix_h = common.vertex_stage(sc, vp, W, H)
            d, t, st, _a, cids = common.raster_opaque(
                sc, clip, pix_h, opaque, settings)
            return pix_h, t, cids
        pix_h0, tid0, cids0 = jax.block_until_ready(
            jax.jit(gbuf_ids)(scene, params.view_proj))

        from unclerenderer_tpu.ops import texture as tex
        from unclerenderer_tpu.render import packing as PK

        quad_flat = jax.block_until_ready(
            scene.quad_img.reshape(-1, scene.quad_img.shape[-1]))
        atlas_w = scene.quad_img.shape[1]
        print(f"  atlas: {quad_flat.shape} {quad_flat.dtype}", flush=True)

        # production-distribution uv/lod/rect from one resolve run
        def uv_lod(sc, ph, t, ci):
            g = common.resolve_materials(sc, ph, t, settings, compact_ids=ci)
            return g["albedo"]
        # gather-only with resolve-realistic row indices: rows hit by the
        # frame's actual uv/mips (uniform-random rows would overstate cost)
        rng = np.random.default_rng(5)
        idx = jnp.asarray(
            rng.integers(0, quad_flat.shape[0], W * H, dtype=np.int64),
            jnp.int32).reshape(H, W)
        timed_scan(
            lambda t, i: t[i].astype(jnp.float32).sum(axis=-1),
            quad_flat, idx, label="tap: atlas row gather only (random idx)")

        # full production tap chain (resolve minus the record gather):
        # reuse resolve with a precomputed full record to isolate the tap
        rec = jax.jit(lambda sc, ph, ci: common.build_resolve_records(
            sc, ph, ids=ci))(scene, pix_h0, cids0)
        rec = jax.block_until_ready(rec)

        def resolve_full(sc, ph, t, ci):
            g = common.resolve_materials(sc, ph, t, settings, compact_ids=ci)
            return g["albedo"], g["normal"], g["metallic"]
        timed_scan(resolve_full, scene, pix_h0, tid0, cids0,
                   label="tap: FULL resolve (rec gather + tap + interp)")

        # trilinear tap only, synthetic uniform uv/lod over the real atlas:
        # isolates gather+reconstruction without interp/record costs
        uv0 = jnp.asarray(rng.uniform(0, 1, (H, W, 2)).astype(np.float32))
        lod0 = jnp.asarray(
            rng.uniform(0, 6, (H, W)).astype(np.float32))
        rect0 = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 512.0, 512.0], jnp.float32), (H, W, 4))
        timed_scan(
            lambda q, u, l: tex.sample_pyramid_tri(
                q, atlas_w, rect0, u, l).sum(axis=-1),
            quad_flat, uv0, lod0, label="tap: packed-tri tap (gather+recon)")
        timed_scan(
            lambda q, u, l: tex.sample_pyramid_tri_level(
                q, atlas_w, rect0, u, jnp.round(l).astype(jnp.int32)
            ).sum(axis=-1),
            quad_flat, uv0, lod0, label="tap: bilinear tap (gather+quad blend)")

    if want and "pcfparts" in want:
        # ShadowPCF (33.7 ms in-frame) split: row gather / +select9 kernel /
        # full (+compare+blend), f32 table vs the u16 staged experiment.
        from unclerenderer_tpu.ops.shadow import (
            _select9, _shadow_project, pack_shadow_blocks,
            pack_shadow_blocks_u16, shadow_block_shape, shadow_factor_blocks,
        )

        def gbuf_wp(sc, vp):
            clip, pix_h = common.vertex_stage(sc, vp, W, H)
            d, t, st, _a, cids = common.raster_opaque(
                sc, clip, pix_h, opaque, settings)
            g = common.resolve_materials(sc, pix_h, t, settings,
                                         compact_ids=cids)
            return g["world_pos"]
        wp = jax.block_until_ready(jax.jit(gbuf_wp)(scene, params.view_proj))
        shadow = jax.block_until_ready(jax.jit(
            lambda sc, l: common.raster_shadow(sc, l, opaque, settings)[0]
        )(scene, params.light_view_proj))
        s = settings.shadow_map_size
        bh, bw = shadow_block_shape(s)
        deltas = tuple(dy * (bw + 2) + dx for dy in range(3) for dx in range(3))

        for name, pack in (("f32", pack_shadow_blocks),
                           ("u16", pack_shadow_blocks_u16)):
            blocks = jax.block_until_ready(jax.jit(pack)(shadow))
            timed_scan(lambda sm: pack(sm), shadow,
                       label=f"pcf[{name}]: pack_shadow_blocks")

            def project_rows(bl, w_pos, lvp):
                uv, compare, fx, fy, xi, yi, xi0, yi0 = _shadow_project(
                    w_pos, lvp, s, jnp.float32(2e-3))
                row = (yi0 // bh) * (s // bw) + (xi0 // bw)
                return bl[row.reshape(-1)].astype(jnp.float32).sum(axis=-1)
            timed_scan(project_rows, blocks, wp, params.light_view_proj,
                       label=f"pcf[{name}]: project + row gather only")

            def rows_select(bl, w_pos, lvp):
                uv, compare, fx, fy, xi, yi, xi0, yi0 = _shadow_project(
                    w_pos, lvp, s, jnp.float32(2e-3))
                row = (yi0 // bh) * (s // bw) + (xi0 // bw)
                base = (yi0 % bh) * (bw + 2) + (xi0 % bw)
                rows = bl[row.reshape(-1)]
                nb = _select9(rows, base.reshape(-1), deltas,
                              interpret=INTERPRET)
                return nb.sum(axis=-1)
            timed_scan(rows_select, blocks, wp, params.light_view_proj,
                       label=f"pcf[{name}]: + select9 kernel")

            def full(bl, w_pos, lvp):
                return shadow_factor_blocks(
                    bl, s, w_pos, lvp, jnp.float32(0.9), jnp.float32(2e-3),
                    pcf="deferred", interpret=INTERPRET)
            timed_scan(full, blocks, wp, params.light_view_proj,
                       label=f"pcf[{name}]: FULL (+compare+blend)")

    if on("pcf") or on("ibl") or on("ggx") or on("post"):
        # shared fixtures: a resolved g-buffer and a shadow map
        from unclerenderer_tpu.ops import pbr
        from unclerenderer_tpu.ops.shadow import (
            pack_shadow_blocks, shadow_block_shape, shadow_factor_blocks,
        )

        def gbuf(sc, vp):
            clip, pix_h = common.vertex_stage(sc, vp, W, H)
            d, t, st, _a, cids = common.raster_opaque(
                sc, clip, pix_h, opaque, settings)
            return common.resolve_materials(
                sc, pix_h, t, settings, compact_ids=cids)
        g = jax.block_until_ready(jax.jit(gbuf)(scene, params.view_proj))

    if on("pcf"):
        s = settings.shadow_map_size
        print(f"  pcf table: blocks {shadow_block_shape(s)}, "
              f"rows {(s // shadow_block_shape(s)[0]) * (s // shadow_block_shape(s)[1])}",
              flush=True)
        shadow = jax.block_until_ready(jax.jit(
            lambda sc, l: common.raster_shadow(sc, l, opaque, settings)[0]
        )(scene, params.light_view_proj))
        blocks = jax.block_until_ready(jax.jit(pack_shadow_blocks)(shadow))

        def pcf_only(bl, wp, lvp):
            return shadow_factor_blocks(
                bl, s, wp, lvp, jnp.float32(0.9), jnp.float32(2e-3),
                pcf="deferred", interpret=INTERPRET)
        timed_scan(pcf_only, blocks, g["world_pos"], params.light_view_proj,
                   label=f"PCF superblocks ({s})")
        timed_scan(lambda sm: pack_shadow_blocks(sm), shadow,
                   label="pack_shadow_blocks")

    if on("ggx"):
        # direct lighting in isolation: view-space GGX at the g-buffer, no
        # shadow/IBL terms (their costs have their own stages)
        from unclerenderer_tpu.ops import pbr

        view3 = params.view[:3, :3]

        def ggx_only(g_albedo, g_metal, g_rough, g_normal, g_wpos):
            normal_view = pbr.normalize(g_normal @ view3)
            l_view = pbr.normalize(params.light_dir @ view3)
            hom_w = jnp.concatenate(
                [g_wpos, jnp.ones_like(g_wpos[..., :1])], axis=-1)
            view_pos = (hom_w @ params.view)[..., :3]
            v_view = pbr.normalize(-view_pos)
            f0 = 0.04 + (g_albedo - 0.04) * g_metal[..., None]
            return pbr.evaluate_pbr(
                g_albedo, g_metal, g_rough, f0, normal_view, v_view, l_view)
        timed_scan(ggx_only, g["albedo"], g["metallic"], g["roughness"],
                   g["normal"], g["world_pos"], label="direct GGX lighting")

    if on("sky"):
        from unclerenderer_tpu.ops.sky import (
            apply_atmosphere, sky_view_directions,
        )

        def sky_only(cam_pos, light_dir, light_color):
            vd = sky_view_directions(
                W, H, cam_pos, params.view, params.proj_unjittered)
            return apply_atmosphere(vd, cam_pos, light_dir, light_color)
        timed_scan(sky_only, params.camera_pos, params.light_dir,
                   params.light_color, label="sky atmosphere (full screen)")

    if on("post"):
        # TAA -> auto exposure -> tonemap -> CAS on an hdr fixture, chained
        # exactly like deferred_frame's tail (steps 9-12)
        from unclerenderer_tpu.ops.post import (
            auto_exposure_ev, cas_sharpen, temporal_aa, tonemap,
        )

        hdr0 = jax.block_until_ready(
            jnp.abs(g["albedo"]) + g["world_pos"] * 1e-3)
        hist0 = jax.block_until_ready(hdr0 * 0.97)

        def post_chain(hdr, hist, prev_ev):
            out = temporal_aa(hdr, hist, jnp.float32(0.9), True)
            ev = auto_exposure_ev(
                out, prev_ev, True, jnp.float32(0.18), jnp.float32(1e-3),
                jnp.float32(1e3), jnp.float32(3.0), jnp.float32(1.0),
                jnp.float32(1 / 60))
            color = tonemap(out, jnp.float32(1.0), ev, True, True,
                            jnp.float32(2.2))
            color = jnp.clip(
                cas_sharpen(color, jnp.float32(0.4)), 0.0, 1.0)
            return color, ev
        timed_scan(post_chain, hdr0, hist0, state.exposure_ev,
                   label="post chain (TAA+exposure+tonemap+CAS)")

    if on("ibl"):
        from unclerenderer_tpu.ops import texture as tex_ops

        env_flat = scene.env_quad.reshape(-1, scene.env_quad.shape[-1])
        env_w = scene.env_quad.shape[1]

        def ibl_only(sc, g_albedo, g_metal, g_rough, g_normal, g_wpos):
            f0 = 0.04 + (g_albedo - 0.04) * g_metal[..., None]
            n_world = pbr.normalize(g_normal)
            v_world = pbr.normalize(params.camera_pos - g_wpos)

            def env_sample(direction, lod):
                return tex_ops.sample_cube_pyramid_tri(
                    env_flat, env_w, sc.env_rect0, direction, lod)[..., :3]

            def env_level(direction, level):
                del level
                return tex_ops.sample_cube_tail_matmul(
                    sc.env_tail, direction)[..., :3]

            def brdf(uv):
                return tex_ops.sample_table_bilinear_matmul(sc.brdf_lut, uv)

            return pbr.ibl_ambient(
                g_albedo, g_metal, f0, n_world, v_world, env_sample, brdf,
                params.env_mip_count, g_rough, env_sample_level_fn=env_level)
        timed_scan(ibl_only, scene, g["albedo"], g["metallic"],
                   g["roughness"], g["normal"], g["world_pos"],
                   label="IBL ambient (packed-tri env)")


if __name__ == "__main__":
    main()
