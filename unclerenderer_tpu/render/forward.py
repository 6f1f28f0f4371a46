"""Forward rendering path.

Port of ``FForwardRenderer`` (``Source/Render/ForwardRenderer.cpp``): one
shading pass (PBR + IBL + shadows, ``ForwardPS.hlsl``) straight to the
output, plus sky for empty pixels.  No G-buffer, no TAA/tonemap/CAS/
auto-exposure/HZB -- the forward path writes linear values directly to the
UNORM backbuffer like the reference does (no gamma encode).

Pass order mirrors ``ForwardRenderer.cpp:293-918``: (culling happens
host/device-side upstream), ShadowMap, [DepthPrepass subsumed by the
visibility raster], Sky, Forward, ObjectId (separate helper).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import pbr
from ..ops import texture as tex
from ..ops.shadow import (
    pack_shadow9,
    pack_shadow_blocks,
    pack_shadow_blocks_u16,
    shadow_factor_blocks,
    shadow_factor_packed,
)
from ..ops.sky import apply_atmosphere, sky_view_directions
from . import common
from .params import DeviceScene, FrameParams, RenderSettings


def forward_frame(
    scene: DeviceScene,
    params: FrameParams,
    settings: RenderSettings,
    shadow_map: jnp.ndarray | None = None,
) -> dict:
    """Render one forward frame.  Returns dict with 'color' (H, W, 3) linear
    [0,1]-clamped, 'depth', 'tri_id', 'object_id'."""
    width, height = settings.width, settings.height

    if settings.soa_vertex and scene.pos_soa is not None:
        vsoa = common.vertex_stage_soa(scene.pos_soa, params.view_proj, width, height)
        clip = pix_h = None
        pix9 = vsoa.pix9()  # (T, 9) record rows, same layout as pix_h.reshape
    else:
        vsoa = None
        clip, pix_h = common.vertex_stage(scene, params.view_proj, width, height)
        pix9 = pix_h
    opaque_mask, masked_mask = common.tri_draw_masks(scene, params.model_visible)

    fused = common.use_fused_resolve(settings, scene.tri_geo.shape[0])
    records = common.build_resolve_records(scene, pix9) if fused else None
    depth, tri_id, raster_stats, attr, compact_ids = common.raster_opaque(
        scene, clip, pix_h, opaque_mask, settings, records=records, vsoa=vsoa
    )
    if settings.has_masked_models:
        masked_out = common.raster_masked_combine(
            scene, clip, pix_h, masked_mask, depth, tri_id, settings,
            attr=attr, records=records, vsoa=vsoa,
        )
        depth, tri_id = masked_out[0], masked_out[1]
        attr = masked_out[2] if attr is not None else None

    shadow_overflow = jnp.zeros((), jnp.int32)
    if settings.enable_shadows:
        if shadow_map is None:
            shadow_map, shadow_overflow = common.raster_shadow(
                scene, params.light_view_proj, opaque_mask | masked_mask, settings
            )
        shadow_blocks = common._use_pallas(settings)
        if shadow_blocks:
            pack_fn = (pack_shadow_blocks_u16 if settings.shadow_table_u16
                       else pack_shadow_blocks)
            shadow9 = pack_fn(shadow_map)
        else:
            shadow9 = pack_shadow9(shadow_map).reshape(-1, 12)
    else:
        shadow9 = None

    g = common.resolve_materials(
        scene, pix9, tri_id, settings, full_override=attr,
        compact_ids=compact_ids,
    )
    if settings.texture_filter == "anisotropic":
        raster_stats["aniso_tap_overflow"] = g["aniso_tap_overflow"]

    n = g["normal"]
    v = pbr.normalize(params.camera_pos - g["world_pos"])
    l = pbr.normalize(params.light_dir)
    # lerp(0.04, albedo, metallic) (ForwardPS.hlsl:104)
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
            pcf="forward",
            **({"interpret": settings.pallas_interpret} if shadow_blocks else {}),
        )
    else:
        shadow = jnp.ones_like(g["metallic"])

    direct = (
        pbr.evaluate_pbr(g["albedo"], g["metallic"], g["roughness"], f0, n, v, l)
        * params.light_intensity
        * params.light_color
        * shadow[..., None]
    )

    if settings.enable_ibl:
        env_flat = scene.env_quad.reshape(-1, scene.env_quad.shape[-1])
        env_w = scene.env_quad.shape[1]

        def env_sample(direction, lod):
            # packed-trilinear atlas: both taps from one 64-lane row gather
            return tex.sample_cube_pyramid_tri(
                env_flat, env_w, scene.env_rect0, direction, lod,
                select_kernel=(
                    settings.env_select_kernel
                    and common._use_pallas(settings)
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

        ambient = pbr.ibl_ambient(
            g["albedo"],
            g["metallic"],
            f0,
            n,
            v,
            env_sample,
            brdf_sample,
            params.env_mip_count,
            g["roughness"],
            env_sample_level_fn=env_sample_level,
        )
    else:
        ambient = jnp.zeros_like(direct)

    color = direct + ambient + g["emissive"]

    # Sky / background for empty pixels.
    if settings.enable_sky:
        view_dir = sky_view_directions(
            width, height, params.camera_pos, params.view, params.proj_unjittered
        )
        bg = apply_atmosphere(view_dir, params.camera_pos, params.light_dir, params.light_color)
    else:
        bg = jnp.broadcast_to(params.background, (height, width, 3))

    valid = g["valid"][..., None]
    color = jnp.where(valid, color, bg)

    # Forward path writes to the UNORM backbuffer directly (no tonemap/gamma).
    color = jnp.clip(color, 0.0, 1.0)

    object_id = jnp.where(
        g["valid"], g["object_id_f"].astype(jnp.uint32), jnp.uint32(0)
    )
    raster_stats["shadow_compact_overflow"] = shadow_overflow
    return {
        "color": color,
        "depth": depth,
        "tri_id": tri_id,
        "object_id": object_id,
        "raster_stats": raster_stats,
    }
