"""Deferred rendering path: the reference's default pipeline.

Port of ``FDeferredRenderer`` (``Source/Render/DeferredRenderer.cpp``)'s
13-pass frame (``SURVEY.md`` section 3.2) as a jit-traced pass schedule:

 1. GPU culling (frustum + previous-frame HZB)      -> ops/cull.py
 2. ShadowMap                                       -> shared raster, DEPTH_MIN
 3. DepthPrepass  \\ subsumed by the visibility raster (one pass produces
 4. GBuffer       //  depth + ids; materials resolve deferred)
 5. ObjectId      -> free byproduct of the visibility buffer
 6. Build HZB     -> ops/hzb.py (for *next* frame's culling)
 7. Lighting      -> fused GGX + PCF + IBL (``DeferredLighting.hlsl``)
 8. Sky           -> empty-pixel mask (``SkyAtmosphere.hlsl``)
 9. TemporalAA    -> ops/post.py
10. AutoExposure  -> ops/post.py (EV carried in FrameState)
11. Tonemap       -> ops/post.py
12. CAS           -> ops/post.py
13. (GpuDebugPrint -> host-side stats overlay, core/debugprint)

G-buffer layout follows the reference (A = view normal + view depth,
B = specular/metallic/roughness, C = albedo, SceneColor = emissive,
``DeferredRenderer.cpp:38-45``) conceptually; as jit intermediates XLA fuses
them into the lighting pass instead of round-tripping HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import mathlib
from ..ops import pbr
from ..ops import texture as tex
from ..ops.cull import frustum_cull, occlusion_cull
from ..ops.hzb import build_hzb, hzb_layout
from ..ops.post import (
    auto_exposure_ev,
    cas_sharpen,
    ev_adapt,
    pooled_log_luminance_slab,
    temporal_aa,
    tonemap,
)
from ..ops.shadow import (
    pack_shadow9,
    pack_shadow_blocks,
    pack_shadow_blocks_u16,
    shadow_factor_blocks,
    shadow_factor_packed,
)
from ..ops.sky import apply_atmosphere, sky_view_directions
from . import common
from .params import DeviceScene, FrameParams, FrameState, RenderSettings


def deferred_frame(
    scene: DeviceScene,
    params: FrameParams,
    state: FrameState,
    settings: RenderSettings,
    shadow_map: jnp.ndarray | None = None,
    dist=None,
) -> tuple[dict, FrameState]:
    """The ONE deferred frame implementation.  ``dist`` supplies the
    collective hooks (parallel/dist.py): the default SingleChip renders the
    whole frame; a RowShards instance (inside shard_map, see
    parallel/multichip.py) renders this device's row slab with identical
    math -- the shadow map and HZB source depth are all_gather'd, exposure
    pooling is psum'd, TAA/CAS neighborhoods halo-exchange at slab seams."""
    if dist is None:
        from ..parallel.dist import SingleChip

        dist = SingleChip(settings.height)
    sharded = dist.n_dev > 1
    width, height = settings.width, settings.height
    slab_h = dist.slab_h
    layout, _total = hzb_layout(width // 2, height // 2)

    # --- 1. GPU culling (unjittered camera VP, like BuildCameraFrustumPlanes)
    # Per-cause counters mirror the reference's FRUSTUM/OCCLUDE on-screen
    # split (``GpuDebugPrintStats.hlsl:33-47``).
    model_visible = params.model_visible
    unjittered_vp = params.view @ params.proj_unjittered
    frustum_culled = jnp.zeros((), jnp.int32)
    hzb_occluded = jnp.zeros((), jnp.int32)
    if settings.enable_gpu_culling:
        planes = frustum_planes(unjittered_vp)
        in_frustum = frustum_cull(scene.bounds_min, scene.bounds_max, planes)
        frustum_culled = jnp.sum(model_visible & ~in_frustum).astype(jnp.int32)
        model_visible = model_visible & in_frustum
        if settings.enable_hzb:
            occluded = occlusion_cull(
                scene.bounds_min,
                scene.bounds_max,
                unjittered_vp,
                state.hzb,
                layout,
                width // 2,
                height // 2,
            )
            occluded = occluded & state.hzb_valid
            hzb_occluded = jnp.sum(model_visible & occluded).astype(jnp.int32)
            model_visible = model_visible & ~occluded

    # --- 2. shadow map.  Casters are NOT camera-frustum culled (an object
    # behind the camera still casts; the reference culls against the light
    # frustum instead).  The host may pass a cached map (static light+scene).
    mask_mm = common._use_pallas(settings)
    opaque_mask, masked_mask = common.tri_draw_masks(
        scene, model_visible, matmul=mask_mm,
        interpret=settings.pallas_interpret,
    )
    shadow_overflow = jnp.zeros((), jnp.int32)
    if settings.enable_shadows:
        if shadow_map is None:
            cast_o, cast_m = common.tri_draw_masks(
                scene, params.model_visible, matmul=mask_mm,
                interpret=settings.pallas_interpret,
            )
            shadow_map, shadow_overflow = common.raster_shadow(
                scene, params.light_view_proj, cast_o | cast_m, settings, dist
            )
        # Superblock layout on TPU (fast-gather table + Pallas lane select);
        # per-texel rows on the XLA/CPU path (ops/shadow.py measurements).
        shadow_blocks = common._use_pallas(settings)
        with jax.named_scope("ShadowPack"):
            if shadow_blocks:
                pack_fn = (pack_shadow_blocks_u16 if settings.shadow_table_u16
                           else pack_shadow_blocks)
                shadow9 = pack_fn(shadow_map)
            else:
                shadow9 = pack_shadow9(shadow_map).reshape(-1, 12)
    else:
        shadow9 = None

    # --- 3/4/5. visibility raster (jittered VP when TAA active)
    with jax.named_scope("VertexSetup"):
        if settings.soa_vertex and scene.pos_soa is not None:
            vsoa = common.vertex_stage_soa(scene.pos_soa, params.view_proj, width, height)
            clip = pix_h = None
            pix9 = vsoa.pix9()  # (T, 9) record rows, same layout as pix_h.reshape
        else:
            vsoa = None
            clip, pix_h = common.vertex_stage(scene, params.view_proj, width, height)
            pix9 = pix_h
    fused = common.use_fused_resolve(settings, scene.tri_geo.shape[0])
    records = common.build_resolve_records(scene, pix9) if fused else None
    depth, tri_id, raster_stats, attr, compact_ids = common.raster_opaque(
        scene, clip, pix_h, opaque_mask, settings, dist, records=records,
        vsoa=vsoa,
    )
    if settings.has_masked_models:
        masked_out = common.raster_masked_combine(
            scene, clip, pix_h, masked_mask, depth, tri_id, settings, dist,
            attr=attr, records=records, vsoa=vsoa,
        )
        depth, tri_id = masked_out[0], masked_out[1]
        attr = masked_out[2] if attr is not None else None
    # pair_overflow/giant_truncated come from per-slab binning -> psum;
    # compact_overflow comes from the REPLICATED camera-view compaction
    # (identical setup math on every device), so psumming it would inflate
    # by n_dev -- keep it replicated, like shadow_compact_overflow below
    raster_stats = {
        k: (v if k == "compact_overflow" else dist.psum(v))
        for k, v in raster_stats.items()
    }
    # replicated under sharding (identical setup math on every device), so
    # no psum -- the single-chip and multichip stats stay bit-identical
    raster_stats["shadow_compact_overflow"] = shadow_overflow

    g = common.resolve_materials(
        scene, pix9, tri_id, settings, row0=dist.row0,
        next_tri_row=dist.row_below(tri_id) if sharded else None,
        prev_tri_row=dist.row_above(tri_id) if sharded else None,
        row_halo=(lambda x: (dist.row_above(x), dist.row_below(x))) if sharded else None,
        full_override=attr,
        compact_ids=compact_ids,
    )
    if settings.texture_filter == "anisotropic":
        # pixels whose compacted line taps fell past the static cap (each
        # slab compacts its own pixels -> psum)
        raster_stats["aniso_tap_overflow"] = dist.psum(
            g["aniso_tap_overflow"])

    # --- 6. HZB for next frame (sharded: built replicated from the
    # all_gather'd depth slabs so next frame's culling sees the full screen)
    if settings.enable_hzb:
        new_hzb = build_hzb(
            dist.all_gather_rows(depth), layout,
            pallas_tail=settings.hzb_pallas_tail and common._use_pallas(settings),
            interpret=settings.pallas_interpret,
        )
    else:
        new_hzb = state.hzb

    # --- 7. lighting (DeferredLighting.hlsl, view-space)
    view3 = params.view[:3, :3]
    normal_view = pbr.normalize(g["normal"] @ view3)
    # G-buffer A stores (viewNormal, viewDepth=-z_view); lighting negates it
    # back -- net effect: shade with z_view = interpolated clip w.
    l_view = pbr.normalize(params.light_dir @ view3)
    hom_w = jnp.concatenate([g["world_pos"], jnp.ones_like(g["world_pos"][..., :1])], axis=-1)
    view_pos = (hom_w @ params.view)[..., :3]
    v_view = pbr.normalize(-view_pos)

    f0 = 0.04 + (g["albedo"] - 0.04) * g["metallic"][..., None]

    if settings.enable_shadows:
        shadow_fn = shadow_factor_blocks if shadow_blocks else shadow_factor_packed
        shadow = shadow_fn(
            shadow9,
            settings.shadow_map_size,
            g["world_pos"],
            params.light_view_proj,
            params.shadow_strength,
            params.shadow_bias,
            pcf="deferred",
            **({"interpret": settings.pallas_interpret} if shadow_blocks else {}),
        )
    else:
        shadow = jnp.ones_like(g["metallic"])

    with jax.named_scope("DirectLighting"):
        direct = (
            pbr.evaluate_pbr(
                g["albedo"], g["metallic"], g["roughness"], f0, normal_view, v_view, l_view
            )
            * params.light_intensity
            * params.light_color
            * shadow[..., None]
        )

    if settings.enable_ibl:
        env_flat = scene.env_quad.reshape(-1, scene.env_quad.shape[-1])
        env_w = scene.env_quad.shape[1]

        def env_sample(direction, lod):
            # packed-trilinear atlas: both taps from one row gather (or the
            # MXU one-hot contraction -- settings.env_matmul_gather)
            return tex.sample_cube_pyramid_tri(
                env_flat, env_w, scene.env_rect0, direction, lod,
                matmul_gather=(
                    settings.env_matmul_gather and common._use_pallas(settings)
                ),
                select_kernel=(
                    settings.env_select_kernel and common._use_pallas(settings)
                ),
                interpret=settings.pallas_interpret,
            )[..., :3]

        def env_sample_level(direction, level):
            # level is always the last mip; its texels live in env_tail and
            # sample via hat matmuls instead of an atlas gather
            del level
            return tex.sample_cube_tail_matmul(scene.env_tail, direction)[..., :3]

        def brdf_sample(uv):
            return tex.sample_table_bilinear_matmul(scene.brdf_lut, uv)

        n_world = pbr.normalize(g["normal"])
        v_world = pbr.normalize(params.camera_pos - g["world_pos"])
        ambient = pbr.ibl_ambient(
            g["albedo"], g["metallic"], f0, n_world, v_world,
            env_sample, brdf_sample, params.env_mip_count, g["roughness"],
            env_sample_level_fn=env_sample_level,
        )
    else:
        ambient = jnp.zeros_like(direct)

    lighting = g["emissive"] + direct + ambient

    # --- 8. sky on empty pixels (depth GE test semantics)
    if settings.enable_sky:
        view_dir = sky_view_directions(
            width, height, params.camera_pos, params.view, params.proj_unjittered,
            row0=dist.row0, out_h=slab_h,
        )
        bg = apply_atmosphere(view_dir, params.camera_pos, params.light_dir, params.light_color)
    else:
        bg = jnp.broadcast_to(params.background, (slab_h, width, 3))
    valid = g["valid"][..., None]
    hdr = jnp.where(valid, lighting, bg)

    # --- 9. TAA (sharded: ppermute halo rows so slab seams clamp against
    # their true neighbors)
    pad_fn = dist.halo2d if sharded else None
    if settings.enable_taa:
        hdr = temporal_aa(
            hdr, state.taa_history, params.taa_history_weight, state.taa_valid,
            pad_fn=pad_fn,
        )
        new_history = hdr
        new_taa_valid = jnp.array(True)
    else:
        new_history = state.taa_history
        new_taa_valid = jnp.array(False)

    # --- 10. auto exposure (sharded: per-slab partial sums of the global
    # 16x16 luminance grid, psum'd -- exact regardless of slab alignment)
    if settings.enable_auto_exposure:
        if sharded:
            log_avg = pooled_log_luminance_slab(hdr, dist.row0, height, dist.psum)
            new_ev = ev_adapt(
                log_avg,
                state.exposure_ev,
                state.exposure_valid,
                params.auto_exposure_key,
                params.auto_exposure_min,
                params.auto_exposure_max,
                params.auto_exposure_speed_up,
                params.auto_exposure_speed_down,
                params.delta_time,
            )
        else:
            new_ev = auto_exposure_ev(
                hdr,
                state.exposure_ev,
                state.exposure_valid,
                params.auto_exposure_key,
                params.auto_exposure_min,
                params.auto_exposure_max,
                params.auto_exposure_speed_up,
                params.auto_exposure_speed_down,
                params.delta_time,
            )
        new_exposure_valid = jnp.array(True)
    else:
        new_ev = state.exposure_ev
        new_exposure_valid = jnp.array(False)

    # --- 11. tonemap
    color = tonemap(
        hdr,
        params.tonemap_exposure,
        new_ev,
        settings.enable_tonemap,
        settings.enable_auto_exposure,
        params.tonemap_gamma,
    )

    # --- 12. CAS (can overshoot slightly; the UNORM backbuffer clamps).
    # Sharded: same halo exchange as TAA, so seam pixels sharpen exactly.
    if settings.enable_cas:
        color = jnp.clip(
            cas_sharpen(color, params.cas_sharpness, pad_fn=pad_fn), 0.0, 1.0
        )

    # --- 13. device-side debug print (GpuDebugPrint.hlsl:42-124 analog):
    # the stats block rasterizes onto the backbuffer INSIDE the jitted
    # frame from traced counters -- no host compositing (ops/overlay.py).
    if settings.gpu_debug_print:
        from ..ops.overlay import device_stats_overlay

        with jax.named_scope("GpuDebugPrint"):
            color = device_stats_overlay(
                color,
                models_visible=jnp.sum(model_visible).astype(jnp.int32),
                models_total=int(model_visible.shape[0]),
                frustum_culled=frustum_culled,
                hzb_occluded=hzb_occluded,
                exposure_ev=new_ev,
            )

    object_id = jnp.where(g["valid"], g["object_id_f"].astype(jnp.uint32), jnp.uint32(0))

    new_state = FrameState(
        taa_history=new_history,
        taa_valid=new_taa_valid,
        exposure_ev=new_ev,
        exposure_valid=new_exposure_valid,
        hzb=new_hzb,
        hzb_valid=jnp.array(settings.enable_hzb),
        frame_index=state.frame_index + 1,
    )
    out = {
        "color": color,
        "hdr": hdr,
        "depth": depth,
        # compact id space when compaction is on; tri_remap maps back to
        # global triangle rows (equality/tie semantics are preserved, so
        # LOD diffs and the multichip bit-exactness contract are unchanged)
        "tri_id": tri_id,
        "object_id": object_id,
        "model_visible": model_visible,
        "raster_stats": raster_stats,
        "frustum_culled": frustum_culled,
        "hzb_occluded": hzb_occluded,
    }
    if compact_ids is not None:
        out["tri_remap"] = compact_ids
    return out, new_state


def frustum_planes(view_proj: jnp.ndarray) -> jnp.ndarray:
    """Traced version of mathlib.frustum_planes_from_view_proj."""
    c = [view_proj[:, i] for i in range(4)]
    planes = jnp.stack(
        [c[3] + c[0], c[3] - c[0], c[3] + c[1], c[3] - c[1], c[2], c[3] - c[2]],
        axis=0,
    )
    norms = jnp.linalg.norm(planes[:, :3], axis=1, keepdims=True)
    return planes / jnp.where(norms > 0, norms, 1.0)
