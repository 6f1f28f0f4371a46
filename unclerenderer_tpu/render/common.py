"""Shared frame-function building blocks: vertex stage, visibility raster
(opaque + alpha-masked), and the material resolve replacing the base-pass
pixel shaders (``DeferredBasePass.hlsl`` / the material half of
``ForwardPS.hlsl``).

The reference records one draw per model per pass with per-model constant
buffers (``RendererUtils::UpdateSceneConstants``, the CPU hot loop); here the
whole scene is one vertex-stage matmul + one visibility raster, and
"per-model constants" become per-pixel gathers from the (M, ...) tables via
``model_id = tri_model[tri_id]`` -- the 32 PSO permutations become per-pixel
``has_map`` selects that XLA folds into the fused material pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import pbr
from ..ops import texture as tex
from ..ops.raster import (
    COEF_COLS,
    CULL_BACK,
    CULL_FRONT,
    DEPTH_MAX,
    DEPTH_MIN,
    RasterSetup,
    VertexSoA,
    gather_rows_split16,
    rasterize,
    triangle_setup_expanded,
    triangle_setup_from_soa,
    viewport_homogeneous,
)
from .params import DeviceScene, RenderSettings

# material texture slots
SLOT_BASE, SLOT_MR, SLOT_NORMAL, SLOT_EMISSIVE = 0, 1, 2, 3


def vertex_stage(scene: DeviceScene, view_proj: jnp.ndarray, width: int, height: int):
    """World -> clip -> homogeneous pixel coords for the whole scene."""
    hom = jnp.concatenate(
        [scene.position, jnp.ones_like(scene.position[..., :1])], axis=-1
    )
    clip = hom @ view_proj
    pix_h = viewport_homogeneous(clip, width, height)
    return clip, pix_h


def vertex_stage_soa(
    pos_soa: jnp.ndarray, view_proj: jnp.ndarray, width: int, height: int
) -> VertexSoA:
    """SoA vertex stage: the same world -> clip -> homogeneous-pixel math as
    ``vertex_stage`` + ``viewport_homogeneous``, but on lane-dense (T,)
    component vectors (``pos_soa`` is (3, 3, T) = [vertex slot][x/y/z][tri]).
    No (V, 3)/(V, 4) intermediates, no strided column slices downstream
    (settings.soa_vertex; BENCHLOG round-3 vertex-layout experiment).  Values
    match the AoS path up to the clip transform's fma-vs-dot rounding."""
    m = view_proj
    px, py, pw, z = [], [], [], []
    for i in range(3):
        x, y, zc = pos_soa[i, 0], pos_soa[i, 1], pos_soa[i, 2]
        cy = x * m[0, 1] + y * m[1, 1] + zc * m[2, 1] + m[3, 1]
        cz = x * m[0, 2] + y * m[1, 2] + zc * m[2, 2] + m[3, 2]
        cw = x * m[0, 3] + y * m[1, 3] + zc * m[2, 3] + m[3, 3]
        cx = x * m[0, 0] + y * m[1, 0] + zc * m[2, 0] + m[3, 0]
        px.append((cx * 0.5 + cw * 0.5) * width)
        py.append((cw * 0.5 - cy * 0.5) * height)
        pw.append(cw)
        z.append(cz)
    return VertexSoA(px=tuple(px), py=tuple(py), pw=tuple(pw), z=tuple(z))


def tri_draw_masks(scene: DeviceScene, model_visible: jnp.ndarray,
                   matmul: bool = False, interpret: bool = False):
    """Per-triangle opaque / alpha-masked draw masks from model state.

    matmul: gather the two per-model flags on the MXU (one-hot contraction,
    ops/texture.py).  The plain path is two T-request gathers from a
    models-row table -- the pathological small-table gather emitter; at
    263k triangles x2 calls/frame the round-6 trace showed ~5.5 ms of
    unattributed gather, vs <0.5 ms for the one-hot form.  Flags are 0/1,
    exact in a single bf16 MXU pass."""
    if matmul and scene.object_ids.shape[0] <= 2048:
        from ..ops.texture import gather_rows_onehot_matmul

        table = jnp.stack(
            [model_visible, scene.alpha_mode == 1], axis=-1
        ).astype(jnp.bfloat16)
        got = gather_rows_onehot_matmul(
            table, scene.tri_model, interpret=interpret
        ) > 0.5
        vis, masked = got[..., 0], got[..., 1]
        return vis & ~masked, vis & masked
    vis = model_visible[scene.tri_model]
    masked = scene.alpha_mode[scene.tri_model] == 1
    return vis & ~masked, vis & masked


def _atlas_is_packed_tri(quad_flat: jnp.ndarray) -> bool:
    """Static layout dispatch: the combined packed-trilinear material atlas
    has 16*COMBINED_C = 256 lanes; plain quad layouts are 16 (per-map) or
    64 (combined).  Packed rows only exist for the combined atlas
    (renderer.py _build_device_scene), so the lane count is unambiguous."""
    return quad_flat.shape[-1] == 256


def _sample_level_any(quad_flat, atlas_width, rect0, uv, level):
    """Bilinear tap at an integer mip on EITHER atlas layout (the alpha-test
    kernels and the bilinear filter mode share it)."""
    if _atlas_is_packed_tri(quad_flat):
        return tex.sample_pyramid_tri_level(quad_flat, atlas_width, rect0, uv, level)
    return tex.sample_pyramid_bilinear(quad_flat, atlas_width, rect0, uv, level)


def _sample_trilinear_any(quad_flat, atlas_width, rect0, uv, lod,
                          select_kernel=False, interpret=False):
    """Trilinear tap on either layout: ONE row gather on the packed atlas
    (textures/atlas.py build_pyramid_tri_atlas, bit-exact), two on the
    plain quad atlas.  select_kernel routes the packed-row decode through
    the VMEM kernel (ops/texture.py _mat_select_kernel; Pallas backends)."""
    if _atlas_is_packed_tri(quad_flat):
        return tex.sample_pyramid_tri(
            quad_flat, atlas_width, rect0, uv, lod,
            select_kernel=select_kernel, interpret=interpret)
    return tex.sample_pyramid_trilinear(quad_flat, atlas_width, rect0, uv, lod)


def _alpha_lod(u, v, au, bu, av, bv, a1, b1, denom, tw_, th_):
    """Analytic per-(pixel, candidate) LOD for the in-raster alpha test.

    The masked raster's uv is the rational linear form u = U/D with
    U = au*qx + bu*qy + cu and D = a1*qx + b1*qy + c1, so the screen
    derivatives are exact: du/dx = (au - u*a1)/D (no neighbor diffs, no
    helper lanes).  Same footprint rule as ops/texture.py uv_screen_lod
    (max axis length in texels, squared).  Closes ARCHITECTURE deviation
    #2: the reference clips on the FILTERED base-color alpha
    (``DeferredBasePass.hlsl`` bit4 clip on the anisotropic sample), so
    cutout edges under minification need a real mip, not mip 0."""
    inv_d = 1.0 / denom
    dudx = (au - u * a1) * inv_d
    dudy = (bu - u * b1) * inv_d
    dvdx = (av - v * a1) * inv_d
    dvdy = (bv - v * b1) * inv_d
    lx = (dudx * tw_) ** 2 + (dvdx * th_) ** 2
    ly = (dudy * tw_) ** 2 + (dvdy * th_) ** 2
    return 0.5 * jnp.log2(jnp.maximum(jnp.maximum(lx, ly), 1e-12))


def _alpha_tap(quad_flat, atlas_width, rect0, uv, lod, settings):
    """Alpha-test texture tap at the analytic LOD, honoring the material
    filter mode: nearest-mip bilinear under "bilinear", trilinear otherwise
    (one gather on the packed atlas, so the filtered test is ~free)."""
    if settings.texture_filter == "bilinear":
        level = jnp.round(jnp.maximum(lod, 0.0)).astype(jnp.int32)
        return _sample_level_any(quad_flat, atlas_width, rect0, uv, level)
    return _sample_trilinear_any(quad_flat, atlas_width, rect0, uv, lod)


def _use_pallas(settings: RenderSettings) -> bool:
    if settings.raster_backend == "pallas":
        return True
    if settings.raster_backend == "xla":
        return False
    import jax

    return jax.default_backend() not in ("cpu",)


def compaction_cap(settings: RenderSettings, t_count: int) -> int:
    """Static frame-visible compaction cap (ops/raster.py compact_setup).

    0 = no compaction.  Compaction is ALWAYS off for scenes with
    alpha-masked models -- the masked merge writes global tri ids into the
    same image, so the opaque raster must stay in global id space too
    (extendable later by compacting the union).  Auto (-1) additionally
    keeps it off when the resolve record table is already under the
    ~96k-row gather fast path."""
    if settings.has_masked_models:
        return 0
    cap = settings.compact_cap
    if cap == -1:
        if t_count <= 94208:
            return 0
        # Auto picks the 16-bit split-gather window (163840 rows; the
        # resolve + binning coef gathers route through the bit-exact u16
        # split pair in that window).  The f32 fast window (94208) measures
        # cheaper per row, but the Sponza-class bench orbit's visible set is
        # ~97k even after the sub-center cull -- a cap that drops real
        # geometry is not an optimization.  Set compact_cap=94208 explicitly
        # for scenes whose visible set is known to fit (overflow is counted
        # in stats() either way).  Past 2x the window, half the scene could
        # be visible and drops become plausible: auto turns compaction off
        # (correctness over gather speed).
        if t_count > 2 * 163840:
            return 0
        cap = 163840
    if cap <= 0 or cap >= t_count:
        return 0
    return cap


def shadow_compaction_cap(settings: RenderSettings, t_count: int) -> int:
    """Light-space compaction cap for the depth-only shadow raster.

    Unlike the camera-view cap (``compaction_cap``), ids never leave the
    raster (no resolve, no masked merge), so this is safe for every scene
    including masked ones.  Auto: 163840 when the scene is over the f32
    fast-gather cliff -- front-face culling alone keeps the light-space
    valid set well under that at Sponza-class counts, and the compacted
    table rides the 16-bit split gather window in ops/binning.py."""
    cap = settings.shadow_compact_cap
    if cap == -1:
        cap = 0 if t_count <= 94208 else 163840
    if cap <= 0 or cap >= t_count:
        return 0
    return cap


def use_fused_resolve(settings, t_count: int) -> bool:
    """Fused attribute emission (the raster kernels select the winner's
    resolve record in-VMEM) replaces the per-pixel record gather, which
    falls off the TPU fast-gather cliff once the record table exceeds
    ~96k rows (measured 3.5 ns/row below, 12-19 ns/row above).

    Measured at the 263k-tri tier (1080p): the machinery costs +31.5 ms in
    the raster (per-pair record gather, MXU one-hot selects, three 1 GB
    attribute images and their merges) against -33.7 ms in the resolve --
    a wash in isolation and slightly negative in-frame (lost fusion), so
    ``auto`` keeps it OFF for now; ``on`` forces it (the machinery is
    CI-tested bit-exact and is the right shape for future scenes whose
    resolve-side savings grow faster than the attr IO)."""
    if settings.fused_resolve != "on" or not _use_pallas(settings):
        return False
    return True


def _dispatch_raster(
    setup, width, height, tile_h, tile_w, chunk, depth_mode, settings, y_offset=0,
    want_ids=True, records=None, ortho=False, budget_factor=None,
    giant_tile=(0, 0), big_tile=None,
):
    """Returns (depth, tri_id, stats[, attr]) -- stats carries the binned
    path's overflow counters (zeros on the exhaustive XLA path, which never
    drops); attr is the fused-resolve record image, appended only when
    ``records`` is given (Pallas path; None on the XLA fallback).

    y_offset (traced ok) renders rows [y_offset, y_offset+height) in GLOBAL
    pixel coordinates, so a sharded slab render is bit-identical to the
    corresponding rows of the full-frame render."""
    if _use_pallas(settings):
        from ..ops.pallas_raster import rasterize_binned

        big_kw = {}
        if big_tile is not None:
            big_kw = {"big_tile_h": big_tile[0], "big_tile_w": big_tile[1]}
        return rasterize_binned(
            setup, width, height,
            tile_h=tile_h, tile_w=tile_w, chunk=chunk, depth_mode=depth_mode,
            y_offset=y_offset,
            max_span=settings.bin_max_span,
            **big_kw,
            budget_factor=(
                settings.bin_budget_factor if budget_factor is None
                else budget_factor
            ),
            mid_divisor=settings.bin_mid_divisor,
            giant_divisor=settings.bin_giant_divisor,
            giant_tile_h=giant_tile[0],
            giant_tile_w=giant_tile[1],
            giant_chunk=settings.bin_giant_chunk,
            debug_print=settings.kernel_debug_print,
            want_ids=want_ids,
            records=records,
            interpret=settings.pallas_interpret,
            ortho=ortho,
            align_scatter=settings.bin_align_scatter,
            compact_mode=settings.compact_mode,
            mat_idx=settings.bin_mat_idx,
        )
    depth, tri_id = rasterize(
        setup, width, height,
        tile_h=tile_h, tile_w=tile_w, chunk=chunk, depth_mode=depth_mode,
        y_offset=y_offset,
    )
    zero = jnp.zeros((), jnp.int32)
    stats = {"pair_overflow": zero, "giant_truncated": zero}
    if records is not None:
        return depth, tri_id, stats, None
    return depth, tri_id, stats


from .framegraph import named_pass


@named_pass("VisibilityRaster")
def raster_opaque(
    scene: DeviceScene,
    clip: jnp.ndarray,
    pix_h: jnp.ndarray,
    tri_mask: jnp.ndarray,
    settings: RenderSettings,
    dist=None,
    records=None,
    vsoa: VertexSoA | None = None,
):
    """Visibility raster over the full frame, or over this device's row slab
    when ``dist`` is sharded (traced y_offset, global pixel coordinates --
    bit-identical to the full-frame render; parallel/dist.py).

    Returns ``(depth, tri_id, stats, attr, compact_ids)``.  When
    ``compaction_cap`` is nonzero the raster runs over the frame-visible
    compacted triangle list and ``tri_id`` holds COMPACT ids;
    ``compact_ids`` maps them back to global rows (None when off).  Under
    sharding every device computes the identical compaction (replicated
    setup math), so compact ids agree across slabs.

    ``vsoa`` (settings.soa_vertex) supplies SoA vertex components instead of
    ``clip``/``pix_h`` (which are then unused and may be None)."""
    from ..ops.raster import compact_setup

    with jax.named_scope("VertexSetup"):
        if vsoa is not None:
            setup = triangle_setup_from_soa(
                vsoa, tri_mask, CULL_BACK, settings.width, settings.height
            )
        else:
            setup = triangle_setup_expanded(
                pix_h, clip[:, 2], tri_mask, CULL_BACK, settings.width, settings.height
            )
    cap = compaction_cap(settings, setup.valid.shape[0])
    cids = None
    c_overflow = jnp.zeros((), jnp.int32)
    if cap:
        with jax.named_scope("Compaction"):
            setup, cids, c_overflow = compact_setup(
                setup, cap, mode=settings.compact_mode)
            if records is not None:
                records = records[cids]
    out_h = settings.height
    y_off = 0
    if dist is not None and dist.n_dev > 1:
        out_h = dist.slab_h
        y_off = dist.row0
    res = _dispatch_raster(
        setup, settings.width, out_h,
        min(settings.tile_h, out_h), settings.tile_w, settings.chunk,
        DEPTH_MAX, settings, y_offset=y_off, records=records,
        giant_tile=(min(settings.giant_tile_h, out_h), settings.giant_tile_w),
    )
    depth, tri_id, stats = res[0], res[1], dict(res[2])
    stats["compact_overflow"] = c_overflow
    attr = res[3] if records is not None else None
    return depth, tri_id, stats, attr, cids


@named_pass("ShadowMap")
def raster_shadow(
    scene: DeviceScene,
    light_view_proj: jnp.ndarray,
    tri_mask: jnp.ndarray,
    settings: RenderSettings,
    dist=None,
):
    """Depth-only shadow raster: CULL_FRONT + LESS_EQUAL over a standard-Z
    ortho projection (``Renderer.cpp:271-296``).  Sharded: each device
    rasterizes a row slab of the map, then ``all_gather`` assembles the full
    map on every device (every receiver samples everywhere).

    Returns ``(depth, compact_overflow)`` -- the i32 count of valid casters
    dropped past the light-space compaction cap (0 when compaction is off;
    surface it in stats, raise ``shadow_compact_cap`` if it fires)."""
    size = settings.shadow_map_size
    with jax.named_scope("VertexSetup"):
        if settings.soa_vertex and scene.pos_soa is not None:
            vs = vertex_stage_soa(scene.pos_soa, light_view_proj, size, size)
            setup = triangle_setup_from_soa(vs, tri_mask, CULL_FRONT, size, size)
        else:
            hom = jnp.concatenate(
                [scene.position, jnp.ones_like(scene.position[..., :1])], axis=-1
            )
            clip = hom @ light_view_proj
            pix_h = viewport_homogeneous(clip, size, size)
            setup = triangle_setup_expanded(
                pix_h, clip[:, 2], tri_mask, CULL_FRONT, size, size
            )
    # light-space compaction: depth-only needs no ids, so dropping
    # never-visible rows is free correctness-wise and keeps the binning
    # gathers on a fast path (shadow_compaction_cap)
    from ..ops.raster import compact_setup, normalize_ortho_setup

    cap = shadow_compaction_cap(settings, setup.valid.shape[0])
    overflow = jnp.zeros((), jnp.int32)
    if cap:
        with jax.named_scope("Compaction"):
            setup, _ids, overflow = compact_setup(
                setup, cap, mode=settings.compact_mode)
    # directional light = orthographic projection (w == 1): fold the constant
    # depth denominator into the setup once so the depth-only kernels skip
    # the per-pixel nw evaluation and divide (ops/raster.py)
    setup = normalize_ortho_setup(setup)
    out_h = size
    y_off = 0
    if dist is not None and dist.n_dev > 1:
        assert size % dist.n_dev == 0, "shadow map must divide across the mesh"
        out_h = size // dist.n_dev
        y_off = jax.lax.axis_index(dist.axis) * out_h
    depth, _, _stats = _dispatch_raster(
        setup, size, out_h,
        min(settings.shadow_tile_h, out_h), settings.shadow_tile_w,
        settings.shadow_chunk,
        DEPTH_MIN, settings, y_offset=y_off,
        # depth-only: the shadow map needs no triangle ids -- skips the id
        # output stream, the per-block min-id reduce, and the id merges
        want_ids=False,
        ortho=True,
        budget_factor=settings.shadow_bin_budget_factor,
        giant_tile=(settings.shadow_giant_tile_h, settings.shadow_giant_tile_w),
        # coarse (mid-level) tiles sized for the map, not the screen --
        # see RenderSettings.shadow_big_tile_h
        big_tile=(
            min(settings.shadow_big_tile_h, out_h),
            settings.shadow_big_tile_w,
        ),
    )
    if dist is not None and dist.n_dev > 1:
        depth = dist.all_gather_rows(depth)
    return depth, overflow


@named_pass("MaskedRaster")
def raster_masked_combine(
    scene: DeviceScene,
    clip: jnp.ndarray,
    pix_h: jnp.ndarray,
    masked_mask: jnp.ndarray,
    depth: jnp.ndarray,
    tri_id: jnp.ndarray,
    settings: RenderSettings,
    dist=None,
    attr=None,
    records=None,
    vsoa: VertexSoA | None = None,
):
    """Rasterize alpha-masked geometry with an in-raster alpha test, then
    depth-combine with the opaque visibility buffer.

    Approximation vs the reference: the alpha test samples the base-color
    texture at mip 0 bilinear (the PS tests the filtered sample after the
    raster); same cutoff, cutout edges differ only under heavy minification.
    """
    if vsoa is not None:
        setup = triangle_setup_from_soa(
            vsoa, masked_mask, CULL_BACK, settings.width, settings.height
        )
    else:
        setup = triangle_setup_expanded(
            pix_h, clip[:, 2], masked_mask, CULL_BACK, settings.width, settings.height
        )
    out_h = settings.height
    y_off = 0
    if dist is not None and dist.n_dev > 1:
        out_h = dist.slab_h
        y_off = dist.row0

    # Per-triangle alpha inputs. The KHR transform is affine in uv, so it
    # folds into the per-vertex uvs and interpolates linearly.  Interpolation
    # coefficients build from the packed edge record: weight of vertex k is
    # edge k, so num_x = sum_k e_k * x_k per (a, b, c) component.
    model = scene.tri_model
    uv_os = scene.uv_transform[model, SLOT_BASE]
    uv_rot = scene.uv_rotation[model, SLOT_BASE]
    t_count = scene.uv.shape[0] // 3
    uv_tri = scene.uv.reshape(t_count, 3, 2)
    uv0 = tex.apply_texture_transform(uv_tri[:, 0], uv_os, uv_rot)
    uv1 = tex.apply_texture_transform(uv_tri[:, 1], uv_os, uv_rot)
    uv2 = tex.apply_texture_transform(uv_tri[:, 2], uv_os, uv_rot)
    coef = setup.coef  # (T, 16)

    def interp_coef(x0, x1, x2):
        # -> (T, 3): (a, b, c) of the linear form sum_k e_k(q) * x_k
        return jnp.stack(
            [
                coef[:, 0] * x0 + coef[:, 1] * x1 + coef[:, 2] * x2,
                coef[:, 3] * x0 + coef[:, 4] * x1 + coef[:, 5] * x2,
                coef[:, 6] * x0 + coef[:, 7] * x1 + coef[:, 8] * x2,
            ],
            axis=1,
        )

    num_u = interp_coef(uv0[:, 0], uv1[:, 0], uv2[:, 0])
    num_v = interp_coef(uv0[:, 1], uv1[:, 1], uv2[:, 1])
    ones = jnp.ones_like(uv0[:, 0])
    num_1 = interp_coef(ones, ones, ones)
    ca = scene.color.reshape(t_count, 3, 4)[..., 3]
    num_ca = interp_coef(ca[:, 0], ca[:, 1], ca[:, 2])

    from . import packing as PK

    alpha_args = (
        setup,
        num_u,
        num_v,
        num_ca,
        num_1,
        scene.tri_mrec[:, PK.M_RECT + SLOT_BASE * 4 : PK.M_RECT + SLOT_BASE * 4 + 4],
        scene.has_map[model, SLOT_BASE],
        scene.base_color_alpha[model],
        scene.alpha_cutoff[model],
        scene,
        settings,
        out_h,
        y_off,
    )
    if settings.masked_tri_cap != 0:
        m_depth, m_tri = _rasterize_alpha_binned(*alpha_args)
    else:
        m_depth, m_tri = _rasterize_alpha(*alpha_args)
    take_masked = m_depth > depth
    depth = jnp.where(take_masked, m_depth, depth)
    tri_id = jnp.where(take_masked, m_tri, tri_id)
    if attr is None:
        return depth, tri_id
    # fused resolve: masked-won pixels take their record via a fast gather
    # from the compacted masked list (the full table is past the gather
    # cliff; the compact one is tiny)
    t_count = setup.coef.shape[0]
    cap = settings.masked_tri_cap
    safe_m = jnp.maximum(m_tri, 0)
    if 0 < cap < t_count:
        chunk = min(settings.chunk, 64)
        idx_bits = max((t_count - 1).bit_length(), 1)
        iota = jnp.arange(t_count, dtype=jnp.int32)
        packed = jnp.where(setup.valid, 0, jnp.int32(1 << idx_bits)) + iota
        sp = jnp.sort(packed)[: -(-cap // chunk) * chunk]
        sel = sp & jnp.int32((1 << idx_bits) - 1)
        sel_valid = sp < jnp.int32(1 << idx_bits)
        ids_m = jnp.where(sel_valid, sel, jnp.int32(t_count))
        rec_m = records[sel]
        local = jnp.clip(
            jnp.searchsorted(ids_m, safe_m, method="scan_unrolled")
            .astype(jnp.int32), 0, sel.shape[0] - 1
        )
        attr_m = rec_m[local]
    else:
        attr_m = records[safe_m]
    attr = jnp.where(take_masked[..., None], attr_m, attr)
    return depth, tri_id, attr


def _rasterize_alpha(
    setup: RasterSetup,
    num_u: jnp.ndarray,
    num_v: jnp.ndarray,
    num_ca: jnp.ndarray,
    num_1: jnp.ndarray,
    base_rect0: jnp.ndarray,
    has_base: jnp.ndarray,
    alpha_scale: jnp.ndarray,
    cutoff: jnp.ndarray,
    scene: DeviceScene,
    settings: RenderSettings,
    out_h: int | None = None,
    y_offset=0,
):
    """Tile raster like ops.raster.rasterize with per-candidate alpha test.
    out_h + y_offset (traced ok) render a row slab in global coordinates."""
    width, height = settings.width, out_h or settings.height
    tile_h, tile_w = min(settings.tile_h, height), settings.tile_w
    chunk = settings.chunk
    pad_w = -(-width // tile_w) * tile_w
    pad_h = -(-height // tile_h) * tile_h
    n_ty, n_tx = pad_h // tile_h, pad_w // tile_w
    n_tiles = n_ty * n_tx
    pix = tile_h * tile_w

    quad_flat = scene.quad_img.reshape(-1, scene.quad_img.shape[-1])
    atlas_width = scene.quad_img.shape[1]

    t = setup.coef.shape[0]
    n_chunks = max(1, -(-t // chunk))
    t_pad = n_chunks * chunk

    def pad(x, fill=0):
        pad_n = t_pad - x.shape[0]
        if pad_n == 0:
            return x
        cfg = [(0, pad_n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    coef_c = pad(setup.coef).reshape(n_chunks, chunk, 16)
    nu = pad(num_u).reshape(n_chunks, chunk, 3)
    nv = pad(num_v).reshape(n_chunks, chunk, 3)
    nca = pad(num_ca).reshape(n_chunks, chunk, 3)
    n1 = pad(num_1).reshape(n_chunks, chunk, 3)
    valid = pad(setup.valid, fill=False).reshape(n_chunks, chunk)
    c_rect = pad(base_rect0).reshape(n_chunks, chunk, 4)
    c_has = pad(has_base, fill=False).reshape(n_chunks, chunk)
    c_scale = pad(alpha_scale).reshape(n_chunks, chunk)
    c_cut = pad(cutoff).reshape(n_chunks, chunk)

    ty_idx = jnp.arange(n_tiles, dtype=jnp.int32) // n_tx
    tx_idx = jnp.arange(n_tiles, dtype=jnp.int32) % n_tx
    yy = jnp.arange(tile_h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(tile_w, dtype=jnp.float32)[None, :]
    qx0 = tx_idx[:, None, None] * tile_w + xx[None] + 0.5
    qy0 = ty_idx[:, None, None] * tile_h + yy[None] + 0.5 + jnp.asarray(y_offset, jnp.float32)
    qx = jnp.broadcast_to(qx0, (n_tiles, tile_h, tile_w)).reshape(n_tiles, pix)
    qy = jnp.broadcast_to(qy0, (n_tiles, tile_h, tile_w)).reshape(n_tiles, pix)

    def chunk_step(carry, inputs):
        best_key, best_id = carry
        (c_coef, c_nu, c_nv, c_nca, c_n1, c_valid, rect0, has, a_scale, cut, c_base) = inputs
        qx_e = qx[:, :, None]
        qy_e = qy[:, :, None]

        def form(a, b, c):
            return a[None, None, :] * qx_e + b[None, None, :] * qy_e + c[None, None, :]

        def edge_inside(i):
            a, b, c = c_coef[:, 0 + i], c_coef[:, 3 + i], c_coef[:, 6 + i]
            ev = form(a, b, c)
            tl = (a > 0.0) | ((a == 0.0) & (b > 0.0))
            return (ev > 0.0) | ((ev == 0.0) & tl[None, None, :])

        cov = edge_inside(0) & edge_inside(1) & edge_inside(2)
        nz_v = form(c_coef[:, 9], c_coef[:, 10], c_coef[:, 11])
        nw_v = form(c_coef[:, 12], c_coef[:, 13], c_coef[:, 14])
        depth = nz_v / jnp.where(nw_v != 0.0, nw_v, 1.0)
        ok = cov & (nw_v > 0.0) & (depth >= 0.0) & (depth <= 1.0) & c_valid[None, None, :]

        denom = form(c_n1[:, 0], c_n1[:, 1], c_n1[:, 2])
        denom = jnp.where(denom != 0.0, denom, 1.0)
        u = form(c_nu[:, 0], c_nu[:, 1], c_nu[:, 2]) / denom
        v = form(c_nv[:, 0], c_nv[:, 1], c_nv[:, 2]) / denom
        ca = form(c_nca[:, 0], c_nca[:, 1], c_nca[:, 2]) / denom

        uv = jnp.stack([u, v], axis=-1)
        lod = _alpha_lod(
            u, v, c_nu[None, None, :, 0], c_nu[None, None, :, 1],
            c_nv[None, None, :, 0], c_nv[None, None, :, 1],
            c_n1[None, None, :, 0], c_n1[None, None, :, 1],
            denom, rect0[None, None, :, 2], rect0[None, None, :, 3],
        )
        texel = _alpha_tap(
            quad_flat, atlas_width,
            jnp.broadcast_to(rect0[None, None, :, :], u.shape + (4,)),
            uv, lod, settings,
        )
        tex_a = jnp.where(has[None, None, :], texel[..., 3], 1.0)
        alpha = a_scale[None, None, :] * ca * tex_a
        ok = ok & (alpha >= cut[None, None, :])

        key = jnp.where(ok, depth, -1.0)
        k_best = jnp.max(key, axis=-1)
        k_arg = jnp.argmax(key, axis=-1).astype(jnp.int32)
        better = k_best > best_key
        best_key = jnp.where(better, k_best, best_key)
        best_id = jnp.where(better, c_base + k_arg, best_id)
        return (best_key, best_id), None

    init = (
        jnp.full((n_tiles, pix), -1.0, jnp.float32),
        jnp.full((n_tiles, pix), -1, jnp.int32),
    )
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (best_key, best_id), _ = jax.lax.scan(
        chunk_step,
        init,
        (coef_c, nu, nv, nca, n1, valid, c_rect, c_has, c_scale, c_cut, bases),
    )
    hit = best_key >= 0.0
    depth = jnp.where(hit, best_key, 0.0)
    tri_id = jnp.where(hit, best_id, -1)
    depth = (
        depth.reshape(n_ty, n_tx, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(pad_h, pad_w)[:height, :width]
    )
    tri_id = (
        tri_id.reshape(n_ty, n_tx, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(pad_h, pad_w)[:height, :width]
    )
    return depth, tri_id


def _rasterize_alpha_binned(
    setup: RasterSetup,
    num_u: jnp.ndarray,
    num_v: jnp.ndarray,
    num_ca: jnp.ndarray,
    num_1: jnp.ndarray,
    base_rect0: jnp.ndarray,
    has_base: jnp.ndarray,
    alpha_scale: jnp.ndarray,
    cutoff: jnp.ndarray,
    scene: DeviceScene,
    settings: RenderSettings,
    out_h: int | None = None,
    y_offset=0,
):
    """Binned alpha-masked raster: the production path.

    The exhaustive ``_rasterize_alpha`` evaluates (and texture-taps!) every
    (tile, pixel, candidate) triple -- quadratic in scene size.  Here masked
    triangles first compact to a small static list (the scene's masked count
    is static; ``RenderSettings.masked_tri_cap``), then bin to tiles
    (ops/binning.py), so alpha-test taps scale with actual masked coverage:
    (blocks x tile pixels x chunk).  Per-tile block lists merge with
    segment reductions (max depth key, min id on ties -- identical
    tie-breaking to the opaque kernels).  Reference: MASK materials ride the
    same binned pipeline with pixel clip (``DeferredBasePass.hlsl`` bit4).
    """
    from ..ops.binning import bin_triangles

    width, height = settings.width, out_h or settings.height
    chunk = min(settings.chunk, 64)
    t_count = setup.coef.shape[0]
    yoff = jnp.asarray(y_offset, jnp.float32)
    quad_flat = scene.quad_img.reshape(-1, scene.quad_img.shape[-1])
    atlas_width = scene.quad_img.shape[1]
    big_sentinel = jnp.int32(0x7FFFFFFF)

    def compact(mask, cap):
        """Order-preserving packed-sort compaction (global ids in sel)."""
        n = mask.shape[0]
        idx_bits = max((n - 1).bit_length(), 1)
        iota = jnp.arange(n, dtype=jnp.int32)
        packed = jnp.where(mask, 0, jnp.int32(1 << idx_bits)) + iota
        sp = jnp.sort(packed)[: -(-cap // chunk) * chunk]
        sel = sp & jnp.int32((1 << idx_bits) - 1)
        return sel, sp < jnp.int32(1 << idx_bits)

    cap = settings.masked_tri_cap
    if 0 < cap < t_count:
        sel, sel_valid = compact(setup.valid, cap)
        lvl_setup = RasterSetup(
            coef=setup.coef[sel], valid=sel_valid, bbox=setup.bbox[:, sel]
        )
        # searchsorted keys must be ascending: the invalid tail of sel
        # restarts at small ids, so replace it with an out-of-range sentinel
        arec_ids = jnp.where(sel_valid, sel, jnp.int32(t_count))
        gather = lambda x: x[sel]
        tri_ids = sel
    else:
        lvl_setup = setup
        arec_ids = None
        gather = lambda x: x
        tri_ids = None

    # one packed alpha record per (compacted) triangle: interp numerators
    # (u, v, vertex-alpha, 1/w), base rect, has/scale/cutoff
    arec = jnp.concatenate(
        [
            gather(num_u), gather(num_v), gather(num_ca), gather(num_1),
            gather(base_rect0),
            gather(has_base.astype(jnp.float32))[:, None],
            gather(alpha_scale)[:, None],
            gather(cutoff)[:, None],
        ],
        axis=1,
    )  # (T', 19)

    def eval_level(bins, tile_h, tile_w, lvl_chunk):
        """Alpha-tested per-block raster + per-tile segment merge ->
        (depth, tri_id) images for one binning level."""
        pad_w = -(-width // tile_w) * tile_w
        pad_h = -(-height // tile_h) * tile_h
        n_ty, n_tx = pad_h // tile_h, pad_w // tile_w
        n_tiles = n_ty * n_tx
        pix = tile_h * tile_w
        n_blocks = bins.coef.shape[0]

        blk_global = bins.tri_id[:, 0, :]
        if arec_ids is not None:
            blk_rows = jnp.clip(
                jnp.searchsorted(arec_ids, blk_global.reshape(-1),
                                 method="scan_unrolled")
                .reshape(blk_global.shape).astype(jnp.int32),
                0, arec.shape[0] - 1,
            )
        else:
            blk_rows = blk_global
        blk_arec = arec[blk_rows]  # (n_blocks, lvl_chunk, 19)

        col_i = jnp.arange(pix, dtype=jnp.int32)
        group = max(1, min(32, n_blocks))
        n_groups = -(-n_blocks // group)
        g_pad = n_groups * group - n_blocks

        def pad0(x):
            cfg = [(0, g_pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, cfg)

        inputs = (
            pad0(bins.coef).reshape(n_groups, group, COEF_COLS, lvl_chunk),
            pad0(blk_arec).reshape(n_groups, group, lvl_chunk, 19),
            pad0(blk_global).reshape(n_groups, group, lvl_chunk),
            pad0(bins.valid[:, 0, :]).reshape(n_groups, group, lvl_chunk),
            pad0(bins.blk_tile % n_tx).reshape(n_groups, group),
            pad0(bins.blk_tile // n_tx).reshape(n_groups, group),
        )

        def block_step(_, inp):
            coef, ar, tid, val, btx, bty = inp
            qx = (
                btx[:, None].astype(jnp.float32) * tile_w
                + jnp.mod(col_i, tile_w).astype(jnp.float32)[None, :] + 0.5
            )[..., None]  # (G, pix, 1)
            qy = (
                bty[:, None].astype(jnp.float32) * tile_h
                + (col_i // tile_w).astype(jnp.float32)[None, :] + 0.5 + yoff
            )[..., None]

            C = lambda i: coef[:, None, i, :]  # (G, 1, lvl_chunk)

            def edge_inside(i):
                a = C(0 + i)
                b = C(3 + i)
                ev = a * qx + b * qy + C(6 + i)
                tl = (a > 0.0) | ((a == 0.0) & (b > 0.0))
                return (ev > 0.0) | ((ev == 0.0) & tl)

            cov = edge_inside(0) & edge_inside(1) & edge_inside(2)
            nz = C(9) * qx + C(10) * qy + C(11)
            nw = C(12) * qx + C(13) * qy + C(14)
            key = nz / jnp.where(nw != 0.0, nw, 1.0)
            ok = cov & (nw > 0.0) & (key >= 0.0) & (key <= 1.0) & (val[:, None, :] > 0.0)

            def lin(base):
                return (
                    ar[:, None, :, base] * qx
                    + ar[:, None, :, base + 1] * qy
                    + ar[:, None, :, base + 2]
                )

            denom = lin(9)
            denom = jnp.where(denom != 0.0, denom, 1.0)
            u = lin(0) / denom
            v = lin(3) / denom
            ca = lin(6) / denom
            rect0 = jnp.broadcast_to(ar[:, None, :, 12:16], u.shape + (4,))
            lod = _alpha_lod(
                u, v, ar[:, None, :, 0], ar[:, None, :, 1],
                ar[:, None, :, 3], ar[:, None, :, 4],
                ar[:, None, :, 9], ar[:, None, :, 10],
                denom, ar[:, None, :, 14], ar[:, None, :, 15],
            )
            texel = _alpha_tap(
                quad_flat, atlas_width, rect0,
                jnp.stack([u, v], axis=-1), lod, settings,
            )
            tex_a = jnp.where(ar[:, None, :, 16] > 0.5, texel[..., 3], 1.0)
            alpha = ar[:, None, :, 17] * ca * tex_a
            ok = ok & (alpha >= ar[:, None, :, 18])

            key = jnp.where(ok, key, -1.0)
            k_best = jnp.max(key, axis=-1)  # (G, pix)
            k_id = jnp.min(
                jnp.where((key == k_best[..., None]) & ok, tid[:, None, :], big_sentinel),
                axis=-1,
            )
            return None, (k_best, k_id)

        _, (blk_key, blk_id) = jax.lax.scan(block_step, None, inputs)
        blk_key = blk_key.reshape(n_groups * group, pix)[:n_blocks]
        blk_id = blk_id.reshape(n_groups * group, pix)[:n_blocks]

        # merge blocks per tile: max key, min id among key-ties (identical
        # tie semantics to the opaque kernels)
        tile_key = jax.ops.segment_max(
            blk_key, bins.blk_tile, num_segments=n_tiles, indices_are_sorted=True
        )
        tile_key = jnp.maximum(
            jnp.where(jnp.isfinite(tile_key), tile_key, -1.0), -1.0
        )
        at_best = (blk_key == tile_key[bins.blk_tile]) & (blk_key >= 0.0)
        tile_id = jax.ops.segment_min(
            jnp.where(at_best, blk_id, big_sentinel), bins.blk_tile,
            num_segments=n_tiles, indices_are_sorted=True,
        )
        tile_key = jnp.where(bins.tile_used[:, None], tile_key, -1.0)

        key_img = (
            tile_key.reshape(n_ty, n_tx, tile_h, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(pad_h, pad_w)[:height, :width]
        )
        id_img = (
            tile_id.reshape(n_ty, n_tx, tile_h, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(pad_h, pad_w)[:height, :width]
        )
        return key_img, id_img

    # level 1: scene tiles
    tile_h = min(settings.tile_h, height)
    bins = bin_triangles(
        lvl_setup, width, height, tile_h, settings.tile_w, chunk,
        max_span=4, budget_factor=4.0, tri_ids=tri_ids, y_offset=y_offset,
        align_scatter=settings.bin_align_scatter,
    )
    key_img, id_img = eval_level(bins, tile_h, settings.tile_w, chunk)

    # level 2: the fine level's big triangles on coarse tiles (span 8 covers
    # ~1024x256 px at 1080p; masked geometry is small-triangle by nature --
    # anything larger would need the exhaustive path, counted if dropped)
    t1 = lvl_setup.coef.shape[0]
    cap2 = min(t1, max(chunk, -(-(t1 // 4) // chunk) * chunk))
    sel2, sel2_valid = compact(bins.big_mask, cap2)
    big_setup = RasterSetup(
        coef=lvl_setup.coef[sel2], valid=sel2_valid, bbox=lvl_setup.bbox[:, sel2]
    )
    g2 = tri_ids[sel2] if tri_ids is not None else sel2
    big_th = min(32, height)
    bins2 = bin_triangles(
        big_setup, width, height, big_th, 128, chunk,
        max_span=8, budget_factor=2.0, tri_ids=g2, y_offset=y_offset,
        align_scatter=settings.bin_align_scatter,
    )
    key2, id2 = eval_level(bins2, big_th, 128, chunk)
    take2 = key2 > key_img
    tie2 = (key2 == key_img) & (key2 >= 0.0)
    key_img = jnp.where(take2, key2, key_img)
    id_img = jnp.where(
        take2, id2, jnp.where(tie2, jnp.minimum(id2, id_img), id_img)
    )

    hit = key_img >= 0.0
    depth = jnp.where(hit, key_img, 0.0)
    tri = jnp.where(hit, id_img, -1)
    return depth, tri


def build_resolve_records(
    scene: DeviceScene, pix_h: jnp.ndarray, ids: jnp.ndarray | None = None
) -> jnp.ndarray:
    """The (T, 128) per-triangle resolve record:
    [9 pix_h | 48 tri_geo | 64 tri_mrec | 7 pad] (render/packing.py).
    Shared by the per-pixel-gather resolve and the fused-emission path.

    ``ids`` (the compact->global map from compact_setup) builds the record
    table for just those rows -- component-wise gathers BEFORE the concat,
    so no full-size (T, 128) intermediate ever materializes."""
    t_count = scene.tri_geo.shape[0]
    parts = [
        pix_h.reshape(t_count, 9),
        scene.tri_geo,
        scene.tri_mrec,
    ]
    if ids is not None:
        parts = [p[ids] for p in parts]
    rows = parts[0].shape[0]
    parts.append(jnp.zeros((rows, 7), jnp.float32))
    return jnp.concatenate(parts, axis=1)


# moved to ops/raster.py gather_rows_split16 (shared with the superblock PCF)


@named_pass("MaterialResolve")
def resolve_materials(
    scene: DeviceScene,
    pix_h: jnp.ndarray,
    tri_id: jnp.ndarray,
    settings: RenderSettings,
    row0=0,
    next_tri_row: jnp.ndarray | None = None,
    prev_tri_row: jnp.ndarray | None = None,
    row_halo=None,
    full_override: jnp.ndarray | None = None,
    compact_ids: jnp.ndarray | None = None,
):
    """Visibility buffer -> interpolated attributes + sampled material values.

    Ports the material half of ``DeferredBasePass.hlsl`` PSMain /
    ``ForwardPS.hlsl`` PSMain.  Gather discipline (TPU gathers are
    latency-bound, with a lowering cliff above 64-wide rows): TWO per-pixel
    row gathers -- the (T, 57) geometry record and the (T, 64) model
    record -- plus quad gathers with arithmetic mip rects for the texture
    taps: ONE 64-channel combined-material tap when
    ``settings.combined_material`` (all maps fused at scene build,
    render/renderer.py), else one 16-channel tap per enabled slot
    (render/packing.py, ops/texture.py).
    """
    from . import packing as PK

    # height from the visibility buffer: callers may resolve a row slab
    # (sharded rendering) by passing a slab tri_id image + its first global
    # row in row0 (traced ok); pixel centers stay in global coordinates so
    # the interpolation is bit-identical to the full-frame resolve
    width, height = settings.width, tri_id.shape[0]
    t_count = scene.tri_geo.shape[0]

    if full_override is not None:
        # fused resolve: the raster kernels already selected each pixel's
        # record (bit-identical to the gather below -- tested); no per-pixel
        # gather at all
        full = full_override
    elif compact_ids is not None:
        # compact id space (raster_opaque compaction): the record table
        # shrinks to the frame-visible cap, keeping the per-pixel gather on
        # the TPU fast path (f32 under ~96k rows; 16-bit split under ~192k)
        with jax.named_scope("RecGather"):
            rec = build_resolve_records(scene, pix_h, ids=compact_ids)
            safe_id = jnp.maximum(tri_id, 0)
            # plain f32 gather at any compaction cap: the round-4 on-metal
            # prober measured plain 128-lane f32 fast to >=262k rows (10.4 ms
            # /2M at 163840) and SPLIT16 a 2.3x LOSS (23.5 ms) on the current
            # toolchain -- the round-2/3 "~96k f32 cliff" law is stale
            # (BENCHLOG round-4 gather law)
            full = rec[safe_id]
    else:
        # ONE (T, 128) per-pixel record gather (build_resolve_records);
        # fast for record tables under the ~96k-row gather cliff -- larger
        # scenes use the fused path (use_fused_resolve)
        with jax.named_scope("RecGather"):
            rec = build_resolve_records(scene, pix_h)
            safe_id = jnp.maximum(tri_id, 0)
            full = rec[safe_id]   # (H, W, 128)
    av = full[..., 0:57]
    mrec = full[..., 57:121]
    valid = tri_id >= 0

    p0 = av[..., 0:3]
    p1 = av[..., 3:6]
    p2 = av[..., 6:9]

    yy = jnp.arange(height, dtype=jnp.float32)[:, None] + jnp.asarray(row0, jnp.float32)
    xx = jnp.arange(width, dtype=jnp.float32)[None, :]
    qx = xx + 0.5
    qy = yy + 0.5

    def edge(pa, pb):
        cx = pa[..., 1] * pb[..., 2] - pa[..., 2] * pb[..., 1]
        cy = pa[..., 2] * pb[..., 0] - pa[..., 0] * pb[..., 2]
        cz = pa[..., 0] * pb[..., 1] - pa[..., 1] * pb[..., 0]
        return cx * qx + cy * qy + cz

    def interp(offset, n):
        out = 0.0
        for k in range(3):
            out = out + bary[..., k : k + 1] * av[..., 9 + k * 16 + offset : 9 + k * 16 + offset + n]
        return out

    with jax.named_scope("InterpAttr"):
        e0 = edge(p1, p2)
        e1 = edge(p2, p0)
        e2 = edge(p0, p1)
        ssum = e0 + e1 + e2
        ssum = jnp.where(ssum != 0.0, ssum, 1.0)
        bary = jnp.stack([e0 / ssum, e1 / ssum, e2 / ssum], axis=-1)
        view_w = (
            bary[..., 0] * p0[..., 2] + bary[..., 1] * p1[..., 2] + bary[..., 2] * p2[..., 2]
        )
        world_pos = interp(0, 3)
        v_normal = interp(3, 3)
        tangent4 = interp(6, 4)
        uv = interp(10, 2)
        v_color = interp(12, 4)

    M = lambda c, n=1: mrec[..., c : c + n] if n > 1 else mrec[..., c]
    model_id = mrec[..., PK.M_ID].astype(jnp.int32)
    has = M(PK.M_HAS, 4) > 0.5
    uv_os = M(PK.M_UVOS, 16)
    uv_rot = M(PK.M_UVROT, 8)
    rects = M(PK.M_RECT, 16)

    quad_lod = settings.lod_derivatives == "quad"
    if quad_lod:
        # D3D 2x2-quad derivatives with HELPER-LANE semantics, analytically
        # (closes ARCHITECTURE deviation #3): the GPU computes ddx/ddy per
        # quad from the pixel's OWN triangle extended to the quad corners
        # (helper invocations).  The visibility buffer has the pixel's edge
        # vectors in registers, so uv(x', y') of the winner triangle is
        # evaluable at the quad's TL/TR/BL corners directly -- exact
        # helper-lane values, no neighbor reads, no triangle-edge
        # fallbacks, and (sharded) no halo exchanges: bit-identical across
        # any slab split by construction.
        with jax.named_scope("QuadDerivs"):
            xi = jnp.arange(width, dtype=jnp.int32)[None, :]
            yi = (jnp.arange(height, dtype=jnp.int32)[:, None]
                  + jnp.asarray(row0, jnp.int32))
            bx = (xi & ~1).astype(jnp.float32)
            by = (yi & ~1).astype(jnp.float32)

            def uv_at(X, Y):
                def edge_at(pa, pb):
                    cx = pa[..., 1] * pb[..., 2] - pa[..., 2] * pb[..., 1]
                    cy = pa[..., 2] * pb[..., 0] - pa[..., 0] * pb[..., 2]
                    cz = pa[..., 0] * pb[..., 1] - pa[..., 1] * pb[..., 0]
                    return cx * X + cy * Y + cz

                f0 = edge_at(p1, p2)
                f1 = edge_at(p2, p0)
                f2 = edge_at(p0, p1)
                fs = f0 + f1 + f2
                fs = jnp.where(fs != 0.0, fs, 1.0)
                out = 0.0
                for k, fk in enumerate((f0, f1, f2)):
                    out = out + (fk / fs)[..., None] * av[
                        ..., 9 + k * 16 + 10 : 9 + k * 16 + 12]
                return out

            uv_tl = uv_at(bx + 0.5, by + 0.5)
            uv_tr = uv_at(bx + 1.5, by + 0.5)
            uv_bl = uv_at(bx + 0.5, by + 1.5)
        same_x = same_y = same_bx = same_by = None
    else:
        # forward-difference LOD neighbors; sharded callers pass the true
        # rows above/below the slab (ppermute) so seam rows pick the same
        # mip as single-chip.  Backward (-x/-y) same-triangle masks gate
        # the fallback derivative so it never reads across a triangle edge
        # (ops/texture.py _edge_gated_uv_derivs).
        append_y = tri_id[-1:, :] if next_tri_row is None else next_tri_row
        prepend_y = tri_id[:1, :] if prev_tri_row is None else prev_tri_row
        same_x = jnp.diff(tri_id, axis=1, append=tri_id[:, -1:]) == 0
        same_y = jnp.diff(tri_id, axis=0, append=append_y) == 0
        same_bx = jnp.diff(tri_id, axis=1, prepend=tri_id[:, :1]) == 0
        same_by = jnp.diff(tri_id, axis=0, prepend=prepend_y) == 0

    quad_flat = scene.quad_img.reshape(-1, scene.quad_img.shape[-1])
    atlas_width = scene.quad_img.shape[1]
    # filled by the compacted anisotropic sampler (pixels whose line taps
    # fell past the static cap); surfaced as stats "aniso_tap_overflow"
    aniso_overflow_box = [jnp.int32(0)]

    def sample_slot(slot):
        # trace-attribution sub-scope: the texture tap (transform + LOD +
        # atlas gather) is resolve's other big term next to RecGather
        with jax.named_scope("MaterialTap"):
            return _sample_slot(slot)

    def _sample_slot(slot):
        suv = tex.apply_texture_transform(
            uv, uv_os[..., slot * 4 : slot * 4 + 4], uv_rot[..., slot * 2 : slot * 2 + 2]
        )
        rect0 = rects[..., slot * 4 : slot * 4 + 4]
        scale = uv_os[..., slot * 4 + 2 : slot * 4 + 4]
        base_w = rect0[..., 2] * jnp.abs(scale[..., 0])
        base_h = rect0[..., 3] * jnp.abs(scale[..., 1])
        # sharded: true neighbor rows for the y derivatives at slab seams
        # (forward-difference mode only; quad mode needs no neighbors)
        ua, ub = (row_halo(suv) if row_halo is not None and not quad_lod
                  else (None, None))
        _sk = settings.mat_select_kernel and _use_pallas(settings)
        _itp = settings.pallas_interpret
        if quad_lod:
            # derivatives of the TRANSFORMED uv, like the shader's quad:
            # transform the helper-corner uvs with this slot's KHR
            # transform, then difference (ddx = TR - TL, ddy = BL - TL)
            t_os = uv_os[..., slot * 4 : slot * 4 + 4]
            t_rot = uv_rot[..., slot * 2 : slot * 2 + 2]
            s_tl = tex.apply_texture_transform(uv_tl, t_os, t_rot)
            d_dx = tex.apply_texture_transform(uv_tr, t_os, t_rot) - s_tl
            d_dy = tex.apply_texture_transform(uv_bl, t_os, t_rot) - s_tl
        if settings.texture_filter == "anisotropic":
            # D3D12_FILTER_ANISOTROPIC analog: N trilinear taps along the
            # major-axis footprint; minor-axis LOD (ops/texture.py)
            n = settings.max_anisotropy
            if quad_lod:
                lod, dmaj, extent = tex.footprint_lod_aniso(
                    d_dx, d_dy, base_w, base_h, n)
            else:
                lod, dmaj, extent = tex.uv_screen_lod_aniso(
                    suv, base_w, base_h, same_x, same_y, n,
                    uv_above=ua, uv_below=ub,
                    same_tri_bx=same_bx, same_tri_by=same_by,
                )
            frac = settings.aniso_compact_frac
            if 0.0 < frac < 1.0:
                # Compacted line taps (round-5): only GRAZING pixels have an
                # anisotropic footprint (extent > 0); head-on surfaces --
                # most of the screen -- degenerate to N coincident taps that
                # equal ONE trilinear sample exactly.  So: one full-rate
                # center tap serves the isotropic pixels, and the N offset
                # taps run only over a compacted list of anisotropic pixels
                # (static cap = frac of the image, counted overflow -- a
                # pixel past the cap falls back to the center tap at the
                # correct minor-axis LOD, i.e. sharper-than-filtered, never
                # garbage).  Cuts the sampler's gather count from N x pixels
                # to pixels + N x cap.
                from ..ops.raster import compact_mask

                n_pix = 1
                for _d in suv.shape[:-1]:
                    n_pix *= int(_d)
                cap = max(1024, (int(n_pix * frac) // 1024) * 1024)
                lead = suv.shape[:-1]

                def flat(x):
                    return x.reshape((n_pix,) + x.shape[len(lead):])

                amask = flat((extent > 0.0) & valid)
                ids, ok_c = compact_mask(amask, cap, "sort")
                safe_ids = jnp.where(ok_c, ids, 0)
                suv_c = flat(suv)[safe_ids]
                lod_c = flat(lod)[safe_ids]
                dmaj_c = flat(dmaj)[safe_ids]
                ext_c = flat(extent)[safe_ids]
                rect_c = flat(rect0)[safe_ids]
                acc = 0.0
                for k in range(n):
                    t = ((k + 0.5) / n - 0.5) * ext_c
                    acc = acc + _sample_trilinear_any(
                        quad_flat, atlas_width, rect_c,
                        suv_c + dmaj_c * t[..., None], lod_c,
                        select_kernel=_sk, interpret=_itp,
                    )
                acc = acc / n
                center = _sample_trilinear_any(
                    quad_flat, atlas_width, rect0, suv, lod,
                    select_kernel=_sk, interpret=_itp)
                img = flat(center)
                img = img.at[jnp.where(ok_c, ids, n_pix)].set(
                    acc, mode="drop")
                aniso_overflow_box[0] = (
                    jnp.sum(amask).astype(jnp.int32)
                    - jnp.sum(ok_c).astype(jnp.int32)
                )
                return img.reshape(center.shape)
            acc = 0.0
            for k in range(n):
                t = ((k + 0.5) / n - 0.5) * extent
                acc = acc + _sample_trilinear_any(
                    quad_flat, atlas_width, rect0,
                    suv + dmaj * t[..., None], lod,
                    select_kernel=_sk, interpret=_itp,
                )
            return acc / n
        if quad_lod:
            lod = tex.footprint_lod(d_dx, d_dy, base_w, base_h)
        else:
            lod = tex.uv_screen_lod(
                suv, base_w, base_h, same_x, same_y, uv_above=ua,
                uv_below=ub, same_tri_bx=same_bx, same_tri_by=same_by,
            )
        if settings.texture_filter == "bilinear":
            level = jnp.round(jnp.maximum(lod, 0.0)).astype(jnp.int32)
            return _sample_level_any(quad_flat, atlas_width, rect0, suv, level)
        return _sample_trilinear_any(quad_flat, atlas_width, rect0, suv, lod,
                                     select_kernel=_sk, interpret=_itp)

    albedo = M(PK.M_BCF, 3) * v_color[..., :3]
    alpha = M(PK.M_ALPHA) * v_color[..., 3]
    metallic = M(PK.M_METAL)
    roughness = M(PK.M_ROUGH)
    emissive = M(PK.M_EMISSIVE, 3)

    if settings.combined_material:
        # All maps fused into one 16-channel texture (renderer.py COMBINED_C):
        # a single quad gather serves every slot.  Absent maps are baked
        # neutral (1s / flat normal), so factor math needs no has_map selects.
        s = sample_slot(0)  # shared rect + transform live in slot 0
        albedo = albedo * s[..., 0:3]
        alpha = alpha * s[..., 3]
        roughness = roughness * s[..., 4]
        metallic = metallic * s[..., 5]
        emissive = emissive * s[..., 8:11]
        nm_rg = s[..., 6:8]
    else:
        if settings.slot_enabled[SLOT_BASE]:
            base_sample = sample_slot(SLOT_BASE)
            albedo = jnp.where(has[..., SLOT_BASE : SLOT_BASE + 1], albedo * base_sample[..., :3], albedo)
            alpha = jnp.where(has[..., SLOT_BASE], alpha * base_sample[..., 3], alpha)

        if settings.slot_enabled[SLOT_MR]:
            mr_sample = sample_slot(SLOT_MR)
            metallic = jnp.where(has[..., SLOT_MR], metallic * mr_sample[..., 2], metallic)
            roughness = jnp.where(has[..., SLOT_MR], roughness * mr_sample[..., 1], roughness)

        if settings.slot_enabled[SLOT_EMISSIVE]:
            em_sample = sample_slot(SLOT_EMISSIVE)
            emissive = jnp.where(
                has[..., SLOT_EMISSIVE : SLOT_EMISSIVE + 1], emissive * em_sample[..., :3], emissive
            )
        nm_rg = sample_slot(SLOT_NORMAL)[..., :2] if settings.slot_enabled[SLOT_NORMAL] else None

    with jax.named_scope("NormalMap"):
        if nm_rg is not None:
            # Deferred path: RG -> reconstruct Z (DeferredBasePass.hlsl:88-90);
            # the BC5 normal maps only carry RG anyway, so this serves both
            # paths.
            rg = nm_rg * 2.0 - 1.0
            tangent_normal = jnp.concatenate([rg, pbr.reconstruct_normal_z(rg)[..., None]], axis=-1)
            mapped = pbr.apply_normal_map(v_normal, tangent4, tangent_normal)
            shading_normal = jnp.where(
                has[..., SLOT_NORMAL : SLOT_NORMAL + 1], mapped, pbr.normalize(v_normal)
            )
        else:
            shading_normal = pbr.normalize(v_normal)

    return {
        "valid": valid,
        "aniso_tap_overflow": aniso_overflow_box[0],
        "model_id": model_id,
        "object_id_f": M(PK.M_OBJID),
        "world_pos": world_pos,
        "view_w": view_w,
        "albedo": albedo,
        "alpha": alpha,
        "metallic": metallic,
        "roughness": roughness,
        "emissive": emissive,
        "normal": shading_normal,
        "vertex_normal": v_normal,
    }
