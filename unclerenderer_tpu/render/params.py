"""Render parameter structures.

* RenderSettings: static (hashable) pipeline configuration -- the analog of
  ``FRendererOptions`` (``Renderer.h:16-43``) + the 32 shader permutations:
  toggling a setting retraces the frame function exactly like the reference
  swaps PSOs.
* FrameParams: traced per-frame values -- the analog of ``FSceneConstants``
  (``Shaders/SceneConstants.hlsl``), minus per-model material data which
  lives in DeviceScene tables.
* DeviceScene: device-resident scene arrays (geometry + material tables +
  texture atlas), the analog of the big descriptor heap + vertex/index
  buffers.
* FrameState: frame-carried pytree (TAA history, exposure EV, HZB) --
  replaces the fence-gated history textures
  (``DeferredRenderer.cpp:2787-2799``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RenderSettings:
    width: int = 1280
    height: int = 720
    renderer_type: str = "deferred"  # "deferred" | "forward"
    enable_shadows: bool = True
    shadow_map_size: int = 4096
    enable_sky: bool = True
    enable_ibl: bool = True
    enable_tonemap: bool = True
    enable_auto_exposure: bool = True
    enable_taa: bool = True
    enable_cas: bool = True
    # NOTE: the reference's UseDepthPrepass has no knob here -- the
    # visibility raster IS a fused depth prepass (depth + ids in one pass)
    enable_gpu_culling: bool = True
    enable_hzb: bool = True
    # set False when the scene has no alpha-masked models (host knows at
    # load time); skips tracing the masked raster pass entirely
    has_masked_models: bool = True
    # masked-raster compaction cap: the Renderer sets this to the scene's
    # exact masked-triangle count (rounded up to a chunk) so the binned
    # masked pass works on a small static list.  -1 = binned over the full
    # list (no compaction); 0 = the exhaustive reference path (tests)
    masked_tri_cap: int = -1
    # which material slots (base, mr, normal, emissive) exist anywhere in the
    # scene; absent slots skip their texture taps entirely (static)
    slot_enabled: tuple = (True, True, True, True)
    # "bilinear" (nearest mip), "trilinear", or "anisotropic"
    # (max_anisotropy trilinear taps along the major-axis footprint -- the
    # D3D12_FILTER_ANISOTROPIC analog; the reference's actual sampler is
    # anisotropic x4, ForwardRenderer.cpp:956-961).  Round-5 brought dense
    # aniso from +81% to +32% over trilinear on coherent content
    # (quad-coherent line taps from the quad-derivative LOD), but the
    # judged sponza-material tier still measures 1.70x (268.6 vs 157.8 ms)
    # and pica 2.1x -- real scenes' incoherent taps pay the full N-tap
    # premium, so the affordability bar for flipping the default was NOT
    # met; trilinear stays default with aniso priced every bench run
    # (ARCHITECTURE deviation #1, updated numbers).
    texture_filter: str = "trilinear"
    max_anisotropy: int = 4
    # Compacted anisotropic line taps: the N offset taps run only over a
    # compacted list of GRAZING pixels (extent > 0), capped at this
    # fraction of the image (overflow counted, never silent).  Default 0 =
    # dense taps: round-5 metal measured the compacted path a big LOSS
    # (frac 0.5: 317 ms, frac 0.25: 239.5 vs DENSE 178.1 -- the 2M-pixel
    # compaction sort + per-tap row gathers + scatter-back cost far more
    # than the skipped taps).  Kept CI-tested for smaller-image use.
    aniso_compact_frac: float = 0.0
    # Mip-selection derivatives: "quad" = D3D's 2x2-quad coarse
    # derivatives with exact helper-lane semantics, evaluated analytically
    # from the pixel's own triangle at the quad corners (closes
    # ARCHITECTURE deviation #3; needs no neighbor reads or sharded
    # halos); "forward" = the rounds-1-4 per-pixel forward differences
    # with triangle-edge fallbacks.
    lod_derivatives: str = "quad"
    # user knob: allow fusing material maps into the combined atlas
    enable_combined_material: bool = True
    # Packed-trilinear material atlas: each texel row carries its own 2x2
    # quad AND the parent mip's 3x3 (textures/atlas.py
    # build_pyramid_tri_atlas), so a trilinear tap is ONE 256-lane
    # (vs two 64-lane quad) row gather -- the same packing that made IBL's
    # env taps single-gather.  Requires combined_material (the Renderer
    # forces it off otherwise); 4x atlas HBM.  Round-5 metal decision rows
    # on the u8 atlas (prof_tap_bisect quadtri) flipped round 4's verdict:
    # 64-lane u8 rows ride a gather fast path 128/256-lane rows do not, so
    # TWO quad gathers beat ONE packed row -- trilinear tap 27.2 ms vs
    # 42.8, bilinear 15.2 vs 35.0 at 2M requests -> default OFF (quad
    # atlas).  The packed layout stays as the opt-in alternative (and the
    # env cube atlas keeps it: its seamless rows are 128-lane bf16, the
    # one shape measured fast at 128 lanes).
    # "auto" resolves at scene build by MATERIAL COUNT (resolve_packed
    # _trilinear): round-6 metal decision rows show the optimal layout is
    # coherence-dependent -- at 6 procedural materials the quad atlas wins
    # the FULL frame by 30.7 ms (two coherent 64-lane gathers), at the
    # 24-material Sponza set the packed layout wins by 22.4 ms (incoherent
    # taps are request-latency-bound, so ONE 256-lane gather beats two).
    material_packed_trilinear: bool | str = "auto"
    # True when the scene atlas fuses all material maps into one 16-channel
    # texture per material (render/renderer.py COMBINED_C): the resolve does
    # ONE quad gather instead of one per slot.  Set by the Renderer at scene
    # build (requires per-model slots to share one KHR texture transform).
    combined_material: bool = False
    # Frame-visible triangle compaction (ops/raster.py compact_setup): the
    # opaque raster + material resolve work in compact id space so the
    # per-pixel resolve record table stays under the TPU gather cliff
    # (~96k f32 / ~192k 16-bit rows).  -1 auto: off when the scene is
    # already under the cliff (T <= 94208) or has masked models (the
    # masked merge needs one id space); else cap = 94208 (the largest
    # measured fast f32 gather table).  0 = off.  Overflow (valid
    # triangles beyond the cap, dropped) is counted in raster stats
    # "compact_overflow" -- set the cap to 163840 (16-bit split-gather
    # range, resolve falls back automatically) if it ever fires.
    compact_cap: int = -1
    # SoA vertex stage: run the vertex transform + triangle setup on
    # lane-dense (T,) component vectors from DeviceScene.pos_soa instead of
    # the (V,3)/(V,4) AoS intermediates (which waste 124/128 lanes per vreg
    # and feed strided column slices into triangle setup).  Applies to the
    # camera, masked, and shadow rasters; the resolve-record pix rows stack
    # from the same components (bit-identical interpolation inputs either
    # way up to the clip transform's fma-vs-dot rounding).  Round-4 metal
    # decision rows: setup 5.00 -> 3.44 ms (camera), 6.22 -> 4.02 (shadow),
    # FULL frame 302.8 -> 246.7 -- default ON.
    soa_vertex: bool = True
    # raster tuning
    raster_backend: str = "auto"  # "auto" | "xla" | "pallas"
    # fused attribute emission: the Pallas raster kernels select the
    # winner's resolve record in VMEM (MXU one-hot dot) instead of the
    # resolve doing a per-pixel record gather.  Measured a wash at the
    # 263k-tri tier (common.py use_fused_resolve); "auto" currently stays
    # off, "on" forces the fused path (CI-tested bit-exact).
    fused_resolve: str = "auto"
    # run Pallas kernels in interpret mode (hermetic CPU CI of the full
    # pallas frame -- slow; tests only)
    pallas_interpret: bool = False
    tile_h: int = 16
    tile_w: int = 64
    # chunk 64 measured faster than 128 at 263k tris (less padding waste in
    # partial blocks): full raster 57.7 -> 51.2 ms, shadow 82.3 -> 74.8 ms
    chunk: int = 64
    shadow_chunk: int = 64
    # Shadow-map binning runs on bigger tiles than the camera raster: the
    # binning gather count is budget*T + n_tiles*chunk, and at 4096^2 the
    # per-tile padding term dominates (measured: binning 56 ms of the
    # 102 ms shadow raster at 16x64 tiles).  32x128 keeps the depth-only
    # kernel cheap while cutting tiles 4x.
    shadow_tile_h: int = 32
    shadow_tile_w: int = 128
    # giant-level brute kernel tiles for the shadow map: its (tiles x
    # chunks) grid overhead scales with map area at fixed tile size
    # mid-level (coarse-bin) tile size for the SHADOW raster.  The 64x256
    # hypothesis (larger coarse tiles -> fewer giant spills at 4096^2) was
    # MEASURED A LOSS on metal: frame 140.4 -> 148.0 (Untile 0.3 -> 4.6,
    # ShadowPack 5.3 -> 6.4, GiantKernel unchanged at 17.4 -- the giant
    # population is camera-side, not shadow-side).  Kept as knobs at the
    # camera defaults.
    shadow_big_tile_h: int = 32
    shadow_big_tile_w: int = 128
    shadow_giant_tile_h: int = 64
    # 64x512 giant tiles at 4096^2: round-5 sweep -1.45 ms vs 64x256
    # (fewer grid steps over the dense giant overlap); 128x512 fails to
    # compile on metal (64k-px blocks overflow the kernel's VMEM scope)
    shadow_giant_tile_w: int = 512
    # pair budget for shadow binning: spans at 32x128 tiles are mostly one
    # tile, so 1.5 still carries wide margin (overflow is counted in stats)
    shadow_bin_budget_factor: float = 1.5
    # Light-space triangle compaction for the shadow raster.  Depth-only
    # rasters never touch triangle ids, so compaction is unconditionally
    # safe (no tie-break/id-space concerns, works with masked models).
    # -1 auto: off when T <= 94208; else cap 163840 -- front-face culling
    # keeps the light-space valid set well under that at the Sponza-class
    # tier, and the 94208<rows<=163840 compacted table puts the binning
    # coef gather on the 16-bit split fast path (ops/binning.py).  0 = off.
    # Dropped casters (valid beyond the cap) are counted in raster stats
    # "shadow_compact_overflow" -- never silent.
    shadow_compact_cap: int = -1
    # pl.debug_print per bin block in the Pallas raster kernels (the
    # device-side printf analog of GpuDebugPrint.hlsl); off by default
    # u16 ceil-quantized PCF superblock table: halves the per-pixel gather
    # bytes; comparisons stay conservative within 1/65535 of depth (well
    # under the 2e-3 bias -- ops/shadow.py pack_shadow_blocks_u16).
    # Round-5 metal decision row: PCF FULL 18.7 ms vs 34.5 f32 + pack 3.4
    # vs 9.2 at 4096^2/1080p -> DEFAULT ON; the f32 table (opt-out) stays
    # the bit-exact oracle surface in tests.
    shadow_table_u16: bool = True
    # u8 combined-material atlas: halves the MaterialTap gather bytes vs
    # bf16 (256 vs 512 B/row packed-trilinear) and quarters the atlas HBM
    # + upload + scene-cache bytes.  Color channels store on a gamma-2.0
    # byte curve, the rest linear (8-bit class, like the reference's
    # RGBA8/BC maps); gathered rows decode to linear f32 BEFORE any filter
    # blend (D3D12 sRGB-view sampling order; textures/image.py
    # encode_combined_u8, ops/texture.py _decode_combined_u8).  Round-5
    # metal rows: resolve 69.2 vs 73.0 ms, tri tap 43.2 vs 47.8, FULL
    # frame 200.4 vs 202.0 (wash), atlas 201 vs 805 MB -> DEFAULT ON for
    # the memory/startup win; bf16/f32 stays the opt-out oracle surface.
    material_atlas_u8: bool = True
    kernel_debug_print: bool = False
    # device-side stats overlay rasterized INSIDE the jitted frame (the
    # reference's GpuDebugPrint draw pass, GpuDebugPrint.hlsl:42-124 --
    # glyph quads from the baked atlas blended onto the backbuffer on
    # device; ops/overlay.py).  The host compositing path
    # (Renderer.render_overlay_u8) stays for pick-box/timing overlays.
    gpu_debug_print: bool = False
    bin_max_span: int = 2
    # Block-align binned pairs by a unique-index scatter instead of the
    # pair-source gather.  Bit-identical output either way (ops/binning.py
    # _align_pairs).  The align step ITSELF is a wash (round-4: 3.49 vs
    # 3.38 ms) -- but round-6 prof_fuse showed the downstream COEF gather
    # runs ~3x faster behind the scatter (a scatter op cannot fuse into
    # its consumer, so the index array is genuinely materialized; the same
    # gather behind the fused gather-align producer pays a ~3x penalty
    # that optimization_barrier and a Pallas identity copy do NOT remove):
    # align+coef cam 17.8 -> 12.5 ms, shadow 20.8 -> 13.1.  DEFAULT ON.
    bin_align_scatter: bool = True
    # Pair-budget factor: binning gathers scale with the static budget
    # (n_blocks x chunk rows), so over-provisioning costs real bandwidth.
    # 2.0 carries ~5x margin over measured demand on the Sponza-class tier
    # (live blocks ~= 0.35 x budget at 3.0); overflow is counted and
    # surfaced in Renderer.stats() -- raise when pair_overflow is nonzero.
    bin_budget_factor: float = 2.0
    # Compute all HZB pyramid levels past the first two in ONE Pallas
    # launch (the tail fits VMEM) instead of ~9 tiny XLA reductions -- a
    # candidate for the measured 6 ms HZB cost if it is launch-overhead
    # bound (BENCHLOG speed-of-light notes).  Off until measured on metal;
    # bit-identical values either way (tests/test_post.py).
    hzb_pallas_tail: bool = False
    # Camera-view giant-level brute kernel tiles.  The giant level holds a
    # handful of wall/floor triangles but its grid is (tiles x chunks):
    # at 32x128 tiles 1080p runs 510 tiles x ~23 chunks of step overhead
    # for almost no work; 64x256 cuts the grid ~3.75x (bit-exact -- tile
    # shape only affects scheduling).  Same rationale as the shadow
    # giant tiles above.
    giant_tile_h: int = 64
    giant_tile_w: int = 256
    # compacted mid/giant raster level capacities = T // divisor (see
    # ops/pallas_raster.py rasterize_binned).  Measured Sponza-class tier:
    # 604 mid of 263k (T/435), a handful giant -- the defaults keep >25x
    # margin; mid overflow spills to giant, giant truncation is counted in
    # stats().giant_truncated -- lower the divisors when nonzero.
    bin_mid_divisor: int = 16
    bin_giant_divisor: int = 128
    # Giant-level kernel chunk (0 = big_chunk).  The giant population is
    # tiny (tens of triangles) but each overlaps most tiles, so the skip
    # granularity IS the cost: chunk 32 evaluated 10x the real px-tri work
    # at the bench tiers (round-5 diagnosis); a small chunk tightens it.
    # Bit-identical output for any value (ascending-chunk accumulation).
    bin_giant_chunk: int = 8
    # mask-compaction primitive for every compact (primary/mid/giant x
    # cam/shadow -- ~6/frame): "sort" = packed i32 sort, "scatter" =
    # cumsum ranks + unique-index scatter (ops/raster.py compact_mask;
    # identical outputs, cross-tested).  Round-6 prof_fuse ISOLATED rows
    # had scatter slightly ahead (4.40/4.50/5.08 vs 4.79/5.21/5.13), but
    # IN-FRAME the scatter flip cost +6.9 ms across Compaction/Mid/Giant
    # (frameD traceattr: 6.0+6.5+15.5 -> 9.9+7.9+17.0) -- the cumsum chain
    # fuses worse than the sort into the surrounding graph.  DEFAULT sort;
    # scatter stays the tested experiment surface.
    compact_mode: str = "sort"
    # route the binning's block-aligned index array through a Pallas
    # identity kernel before the coef gather.  Round-6 prof_fuse verdict:
    # NO WIN (17.8 -> 16.6 cam / 20.8 -> 20.1 shadow) -- the identity-copy
    # boundary does not restore the parameter-fed gather's 3.9 ms; the
    # scatter alignment (bin_align_scatter) is the fix that works.  Kept
    # as a tested-bit-exact experiment surface; default OFF.
    bin_mat_idx: bool = False
    # IBL specular env tap: gather the packed env row on the MXU as a
    # one-hot matmul (ops/texture.py gather_rows_onehot_matmul) instead of
    # a per-request row gather -- per-request gathers are ~5-6 ns flat, so
    # 2M requests cost ~11 ms even from the ~1k-row env atlas, while the
    # one-hot contraction is ~1-2 ms of MXU.  Bit-exact.  prof_env rows
    # pick the default.
    env_matmul_gather: bool = False
    # Seamless env decode in a Pallas kernel (ops/texture.py
    # _env_select_kernel).  Default OFF: measured a 16.9 ms LOSS in-frame
    # on metal (round 5) -- the decode works on 4-lane channel groups, so
    # every VPU op in the kernel wastes 31/32 lanes; XLA's materialized
    # chain is lane-dense and wins despite the extra HBM traffic.  Kept
    # (CI-tested bit-compatible) for a future lane-transposed formulation.
    env_select_kernel: bool = False
    # Same VMEM-decode treatment for the packed-trilinear MATERIAL rows
    # (ops/texture.py _mat_select_kernel).  Default OFF like the env
    # kernel: the decode is lane-sparse (16-lane groups), and the round-5
    # XLA select-then-decode restructure already halves the materialized
    # f32 row traffic.  Kept CI-tested for a lane-transposed retry.
    mat_select_kernel: bool = False


# material-count boundary for material_packed_trilinear="auto".  Measured
# points: 6 procedural 256^2 materials -> quad wins (coherent taps; round-5
# FULL-frame row 169.7 vs 200.4); pica's 7 real high-res materials ->
# packed wins (pica frame 162.6 -> 134.2 ms, MaterialTap 78.2 -> 52.4);
# Sponza's 24 -> packed wins (210.0 -> 187.7).  Every real-scene point
# prefers packed (real taps are incoherent and latency-bound), so the
# boundary sits directly above the one synthetic coherent case.
PACKED_TRI_AUTO_MATERIALS = 6


def resolve_packed_trilinear(setting, n_materials: int) -> bool:
    """Resolve the packed-trilinear atlas choice at scene build.

    "auto": packed when the scene carries more than
    PACKED_TRI_AUTO_MATERIALS distinct combined materials -- material
    diversity scatters neighboring pixels' atlas addresses, and incoherent
    taps are request-latency-bound (one 256-lane row gather beats two
    64-lane ones: sponza tier 187.7 vs 210.0 ms), while coherent taps are
    the opposite (procedural tier 169.7 quad vs 200.4 packed; BENCHLOG
    rounds 5-6)."""
    if setting == "auto":
        return n_materials > PACKED_TRI_AUTO_MATERIALS
    if not isinstance(setting, bool):
        # a typo like 'Auto' or 'off' must not silently enable the layout
        raise ValueError(
            "material_packed_trilinear must be True, False or 'auto'; "
            f"got {setting!r}"
        )
    return setting


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrameParams:
    view: jnp.ndarray = None
    proj: jnp.ndarray = None            # jittered when TAA active
    proj_unjittered: jnp.ndarray = None  # for culling/frustum/sky rays
    view_proj: jnp.ndarray = None
    camera_pos: jnp.ndarray = None
    light_dir: jnp.ndarray = None     # points toward the light (Y-flipped)
    light_intensity: jnp.ndarray = None
    light_color: jnp.ndarray = None
    light_view_proj: jnp.ndarray = None
    shadow_strength: jnp.ndarray = None
    shadow_bias: jnp.ndarray = None
    background: jnp.ndarray = None
    model_visible: jnp.ndarray = None  # (M,) bool host-controlled visibility
    env_mip_count: jnp.ndarray = None
    tonemap_exposure: jnp.ndarray = None
    tonemap_gamma: jnp.ndarray = None
    cas_sharpness: jnp.ndarray = None
    taa_history_weight: jnp.ndarray = None
    auto_exposure_key: jnp.ndarray = None
    auto_exposure_min: jnp.ndarray = None
    auto_exposure_max: jnp.ndarray = None
    auto_exposure_speed_up: jnp.ndarray = None
    auto_exposure_speed_down: jnp.ndarray = None
    delta_time: jnp.ndarray = None


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceScene:
    # geometry (world space)
    position: jnp.ndarray = None   # (V, 3)
    normal: jnp.ndarray = None     # (V, 3)
    tangent: jnp.ndarray = None    # (V, 4)
    uv: jnp.ndarray = None         # (V, 2)
    color: jnp.ndarray = None      # (V, 4)
    tris: jnp.ndarray = None       # (T, 3) i32
    tri_model: jnp.ndarray = None  # (T,) i32
    # per-model tables (M rows)
    base_color_factor: jnp.ndarray = None  # (M, 3)
    base_color_alpha: jnp.ndarray = None   # (M,)
    metallic_factor: jnp.ndarray = None
    roughness_factor: jnp.ndarray = None
    emissive_factor: jnp.ndarray = None    # (M, 3)
    alpha_mode: jnp.ndarray = None         # (M,) i32
    alpha_cutoff: jnp.ndarray = None
    uv_transform: jnp.ndarray = None       # (M, 4, 4)
    uv_rotation: jnp.ndarray = None        # (M, 4, 2)
    tex_ids: jnp.ndarray = None            # (M, 4) i32 into atlas tables
    has_map: jnp.ndarray = None            # (M, 4) bool base/mr/normal/emissive
    object_ids: jnp.ndarray = None         # (M,) u32
    bounds_min: jnp.ndarray = None         # (M, 3)
    bounds_max: jnp.ndarray = None         # (M, 3)
    # material pyramid quad atlas, bf16: each texel's 2x2 bilinear footprint,
    # arithmetic mip layout -- see textures/atlas.py.  (AH, AW, 64) when
    # combined_material (one fused 16-channel texture per material), else
    # (AH, AW, 16) per-map quads.  Texel data is 8-bit sourced, so bf16
    # storage halves gather bytes at negligible precision cost.
    quad_img: jnp.ndarray = None
    # BRDF split-sum LUT, sampled with hat-function matmuls instead of
    # gathers (small-table gathers are pathologically slow on TPU; see
    # ops/texture.py sample_table_bilinear_matmul)
    brdf_lut: jnp.ndarray = None           # (TH, TW, 2) f32
    # environment cube pyramid quad atlas + per-face base rects
    env_quad: jnp.ndarray = None           # (EH, EW, 64) bf16 packed-trilinear
    env_rect0: jnp.ndarray = None          # (6, 4) f32
    # last env mip per face (the irradiance tap), matmul-sampled like the LUT
    env_tail: jnp.ndarray = None           # (6, th, tw, 4) f32
    # two-gather material resolve records (render/packing.py)
    tri_geo: jnp.ndarray = None            # (T, 48) f32 vertex attributes
    tri_mrec: jnp.ndarray = None           # (T, 64) f32 model constants
    # SoA positions [vertex slot][x/y/z][triangle] -- the same de-indexed
    # vertices as ``position`` laid out lane-dense for the SoA vertex stage
    # (settings.soa_vertex; ops/raster.py VertexSoA).  Built at scene
    # assembly (host transpose, +9 f32/tri HBM).
    pos_soa: jnp.ndarray = None            # (3, 3, T) f32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FrameState:
    """Carried across frames (jit in/out)."""

    taa_history: jnp.ndarray = None      # (H, W, 3) f32
    taa_valid: jnp.ndarray = None        # () bool
    exposure_ev: jnp.ndarray = None      # () f32
    exposure_valid: jnp.ndarray = None   # () bool
    hzb: jnp.ndarray = None              # (H/2, W/2) f32 reverse-Z min-depth
    hzb_valid: jnp.ndarray = None        # () bool
    frame_index: jnp.ndarray = None      # () i32 (TAA jitter sample index)

    @staticmethod
    def initial(width: int, height: int) -> "FrameState":
        from ..ops.hzb import hzb_layout

        _layout, total = hzb_layout(width // 2, height // 2)
        return FrameState(
            taa_history=jnp.zeros((height, width, 3), jnp.float32),
            taa_valid=jnp.array(False),
            exposure_ev=jnp.array(0.0, jnp.float32),
            exposure_valid=jnp.array(False),
            hzb=jnp.zeros(total, jnp.float32),  # packed min-depth pyramid
            hzb_valid=jnp.array(False),
            frame_index=jnp.array(0, jnp.int32),
        )
