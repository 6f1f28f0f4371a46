"""Multi-chip rendering: the pixel grid sharded over a device mesh.

The reference is strictly single-GPU (``SURVEY.md`` section 2.7); this is the
TPU-native scale-out axis: **tile-space data parallelism** over ICI.

Design (per device, inside ``shard_map`` over a 1D ``("sp",)`` mesh):

* geometry, material tables and atlases are replicated; each device owns a
  horizontal slab of the viewport (H/n rows);
* rasterization runs in slab-local coordinates by folding the row offset
  into the edge-function constants (``ops.pallas_raster.shift_setup``), so
  no kernel changes are needed;
* the shadow map is itself row-sharded across devices, then
  ``all_gather``-ed (every receiver samples the full map) -- the collective
  rides ICI;
* auto-exposure needs the global mean log-luminance: ``lax.pmean`` over the
  mesh (slabs are equal-sized, so the mean of means is exact);
* TAA history is sharded with the slab; CAS uses a local edge-pad at the
  slab boundary (1-px halo approximation; ppermute halo exchange is a
  planned refinement);
* the framebuffer comes back sharded; XLA assembles it on demand.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import pbr
from ..ops import texture as tex
from ..ops.cull import frustum_cull
from ..ops.pallas_raster import shift_setup
from ..ops.post import cas_sharpen, temporal_aa, tonemap
from ..ops.raster import CULL_BACK, CULL_FRONT, DEPTH_MAX, DEPTH_MIN, triangle_setup_expanded, viewport_homogeneous
from ..ops.shadow import shadow_factor
from ..ops.sky import apply_atmosphere
from ..render import common
from ..render.deferred import frustum_planes
from ..render.params import DeviceScene, FrameParams, FrameState, RenderSettings

AXIS = "sp"


def make_render_mesh(devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=(AXIS,))


def _shift_pix_h(pix_h: jnp.ndarray, dy) -> jnp.ndarray:
    """Shift screen-space homogeneous vertex coords down by dy rows:
    Y' = Y - dy * w (so local pixel rows 0..Hd-1 see the right geometry)."""
    return pix_h.at[:, 1].add(-dy * pix_h[:, 2])


def render_frame_multichip(
    scene: DeviceScene,
    params: FrameParams,
    state: FrameState,
    settings: RenderSettings,
    mesh: Mesh,
):
    """Deferred-path frame over a device mesh.  Returns (out, new_state) with
    'color' sharded by rows over the mesh."""
    n_dev = mesh.shape[AXIS]
    width, height = settings.width, settings.height
    assert height % n_dev == 0, "height must divide across the mesh"
    slab_h = height // n_dev
    shadow_size = settings.shadow_map_size
    assert shadow_size % n_dev == 0

    def device_fn(taa_history):
        dev = jax.lax.axis_index(AXIS)
        row0 = (dev * slab_h).astype(jnp.float32)

        # --- culling (replicated compute, identical result on all devices)
        model_visible = params.model_visible
        if settings.enable_gpu_culling:
            planes = frustum_planes(params.view @ params.proj_unjittered)
            model_visible = model_visible & frustum_cull(
                scene.bounds_min, scene.bounds_max, planes
            )
        opaque_mask, masked_mask = common.tri_draw_masks(scene, model_visible)
        draw_mask = opaque_mask | masked_mask

        # --- shadow map: row-sharded raster + all_gather
        if settings.enable_shadows:
            hom = jnp.concatenate(
                [scene.position, jnp.ones_like(scene.position[..., :1])], axis=-1
            )
            lclip = hom @ params.light_view_proj
            lpix = viewport_homogeneous(lclip, shadow_size, shadow_size)
            srow0 = (dev * (shadow_size // n_dev)).astype(jnp.float32)
            lsetup = triangle_setup_expanded(
                lpix, lclip[:, 2], draw_mask, CULL_FRONT,
                shadow_size, shadow_size,
            )
            lsetup = shift_setup(lsetup, jnp.float32(0.0), srow0)
            from ..ops.raster import rasterize

            shadow_slab, _ = rasterize(
                lsetup, shadow_size, shadow_size // n_dev,
                tile_h=min(settings.tile_h, shadow_size // n_dev),
                tile_w=settings.tile_w,
                chunk=settings.shadow_chunk,
                depth_mode=DEPTH_MIN,
            )
            shadow_map = jax.lax.all_gather(shadow_slab, AXIS).reshape(
                shadow_size, shadow_size
            )
        else:
            shadow_map = None

        # --- visibility raster for this slab
        clip, pix_h = common.vertex_stage(scene, params.view_proj, width, height)
        setup = triangle_setup_expanded(
            pix_h, clip[:, 2], opaque_mask, CULL_BACK, width, height
        )
        setup = shift_setup(setup, jnp.float32(0.0), row0)
        from ..ops.raster import rasterize

        depth, tri_id = rasterize(
            setup, width, slab_h,
            tile_h=min(settings.tile_h, slab_h), tile_w=settings.tile_w,
            chunk=settings.chunk, depth_mode=DEPTH_MAX,
        )

        # --- material resolve in slab-local coordinates
        local = RenderSettings(**{**settings.__dict__, "height": slab_h})
        pix_h_local = _shift_pix_h(pix_h, row0)
        g = common.resolve_materials(scene, pix_h_local, tri_id, local)

        # --- lighting (same math as render/deferred.py)
        view3 = params.view[:3, :3]
        normal_view = pbr.normalize(g["normal"] @ view3)
        l_view = pbr.normalize(params.light_dir @ view3)
        hom_w = jnp.concatenate(
            [g["world_pos"], jnp.ones_like(g["world_pos"][..., :1])], axis=-1
        )
        view_pos = (hom_w @ params.view)[..., :3]
        v_view = pbr.normalize(-view_pos)
        f0 = 0.04 + (g["albedo"] - 0.04) * g["metallic"][..., None]

        if settings.enable_shadows:
            shadow = shadow_factor(
                shadow_map, g["world_pos"], params.light_view_proj,
                params.shadow_strength, params.shadow_bias, pcf="deferred",
            )
        else:
            shadow = jnp.ones_like(g["metallic"])

        direct = (
            pbr.evaluate_pbr(
                g["albedo"], g["metallic"], g["roughness"], f0,
                normal_view, v_view, l_view,
            )
            * params.light_intensity
            * params.light_color
            * shadow[..., None]
        )
        hdr = g["emissive"] + direct

        if settings.enable_sky:
            # slab-local sky rays
            yy = (jnp.arange(slab_h, dtype=jnp.float32)[:, None] + row0 + 0.5) / height
            xx = (jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5) / width
            ndc_x = xx * 2.0 - 1.0
            ndc_y = 1.0 - yy * 2.0
            proj = params.proj_unjittered
            ones = jnp.ones((slab_h, width), jnp.float32)
            ray = jnp.stack([ndc_x / proj[0, 0] * ones, ndc_y / proj[1, 1] * ones, ones], axis=-1)
            ray = ray @ params.view[:3, :3].T
            ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-20)
            bg = apply_atmosphere(ray, params.camera_pos, params.light_dir, params.light_color)
        else:
            bg = jnp.broadcast_to(params.background, (slab_h, width, 3))
        hdr = jnp.where(g["valid"][..., None], hdr, bg)

        # --- TAA on the sharded history slab
        if settings.enable_taa:
            hdr = temporal_aa(hdr, taa_history, params.taa_history_weight, state.taa_valid)
            new_history = hdr
        else:
            new_history = taa_history

        # --- auto exposure: same 16x16 pooled sampling as the single-chip
        # path (ops.post.auto_exposure_ev), with the grid split across slabs
        # and combined by pmean -- bit-comparable when 16 % n_dev == 0.
        if settings.enable_auto_exposure:
            gh = max(1, 16 // n_dev)
            gw = min(16, width)
            ph, pw = slab_h - slab_h % gh, width - width % gw
            pooled = hdr[:ph, :pw].reshape(gh, ph // gh, gw, pw // gw, 3).mean(axis=(1, 3))
            lum = jnp.einsum(
                "hwc,c->hw", jnp.maximum(pooled, 0.0),
                jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32),
            )
            local_log = jnp.mean(jnp.log2(jnp.maximum(lum, 1e-4)))
            log_avg = jax.lax.pmean(local_log, AXIS)
            key_ev = jnp.log2(jnp.maximum(params.auto_exposure_key, 1e-4))
            target = jnp.clip(
                key_ev - log_avg,
                jnp.log2(jnp.maximum(params.auto_exposure_min, 1e-4)),
                jnp.log2(jnp.maximum(params.auto_exposure_max, 1e-4)),
            )
            speed = jnp.where(
                target > state.exposure_ev,
                params.auto_exposure_speed_up,
                params.auto_exposure_speed_down,
            )
            alpha = jnp.clip(1.0 - jnp.exp(-params.delta_time * speed), 0.0, 1.0)
            adapted = state.exposure_ev + (target - state.exposure_ev) * alpha
            new_ev = jnp.where(state.exposure_valid, adapted, target)
        else:
            new_ev = state.exposure_ev

        color = tonemap(
            hdr, params.tonemap_exposure, new_ev,
            settings.enable_tonemap, settings.enable_auto_exposure,
            params.tonemap_gamma,
        )
        if settings.enable_cas:
            color = jnp.clip(cas_sharpen(color, params.cas_sharpness), 0.0, 1.0)
        return color, new_history, new_ev

    sharded = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(AXIS),),
        out_specs=(P(AXIS), P(AXIS), P()),
        check_rep=False,
    )
    color, new_history, new_ev = sharded(state.taa_history)

    new_state = FrameState(
        taa_history=new_history,
        taa_valid=jnp.array(settings.enable_taa),
        exposure_ev=new_ev.reshape(()),
        exposure_valid=jnp.array(settings.enable_auto_exposure),
        hzb=state.hzb,
        hzb_valid=jnp.array(False),
        frame_index=state.frame_index + 1,
    )
    return {"color": color}, new_state
