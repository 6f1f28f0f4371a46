"""Tiled homogeneous visibility-buffer rasterizer (XLA implementation).

This replaces the D3D12 fixed-function raster pipeline
(``Shaders/DeferredBasePass.hlsl`` VS + the IA/rasterizer stages) with a
TPU-native formulation:

* **Clipless homogeneous rasterization** (Olano-Greer style): edge functions
  are built from 2D cross products of viewport-scaled *homogeneous* vertex
  coordinates, so triangles crossing the w=0 plane rasterize correctly with
  no near-plane clipping and no new vertices -- everything stays
  static-shaped.
* **Depth test as argmax**: reverse-Z depth (near=1, far=0) means "nearest
  wins" is a commutative max/argmax over triangles.  No scatter, no ordering,
  no atomics -- opaque rasterization is a reduction.
* The output is a *visibility buffer* (depth + winning triangle id per
  pixel); materials resolve in a separate per-pixel pass
  (tests/oracle_interpolate.py), the modern GPU-driven structure rather than the
  reference's per-model draw loop.

TPU layout notes: small trailing dims pad to 128 lanes, so per-triangle data
lives either as 1D (T,) component arrays (setup math) or as one packed
(T, 16) record (COEF_* columns below) whose row gathers carry 60B of useful
coefficients each -- never as (T, 3, 3).

Conventions: D3D viewport (x right, y down, pixel centers at +0.5),
D3D triangle orientation (front = clockwise in screen space), top-left fill
rule.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

CULL_NONE = 0
CULL_BACK = 1
CULL_FRONT = 2

DEPTH_MAX = 0  # reverse-Z main pass: nearest = largest z_ndc, clear to 0
DEPTH_MIN = 1  # shadow pass (LESS_EQUAL, D32 cleared to 1): nearest = smallest

# Packed coefficient record columns (T, 16):
#   [0:3]   a coefficients of edges 0..2      (x gradient)
#   [3:6]   b coefficients of edges 0..2      (y gradient)
#   [6:9]   c coefficients of edges 0..2      (constant)
#   [9:12]  depth numerator   (a, b, c)
#   [12:15] depth denominator (a, b, c)
#   [15]    padding
COEF_EA, COEF_EB, COEF_EC = 0, 3, 6
COEF_NZ, COEF_NW = 9, 12
COEF_COLS = 16

# Sub-center cull toggles (see triangle_setup_from_verts); module-level so
# experiments/tests can flip them without threading a parameter through
# every setup call site.
SUBCENTER_CULL = True
SUBCENTER_MARGIN = 1e-2


def viewport_homogeneous(clip: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Clip coords (V,4) -> homogeneous pixel coords (V,3) = (X, Y, w) with
    X/w = pixel x, Y/w = pixel y (D3D viewport: y flipped, origin top-left)."""
    x, y, w = clip[..., 0], clip[..., 1], clip[..., 3]
    px = (x * 0.5 + w * 0.5) * width
    py = (w * 0.5 - y * 0.5) * height
    return jnp.stack([px, py, w], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RasterSetup:
    """Per-triangle rasterization coefficients."""

    coef: jnp.ndarray    # (T, 16) packed record, see COEF_* columns
    valid: jnp.ndarray   # (T,) bool
    bbox: jnp.ndarray    # (4, T) pixel-space AABB rows (x0, y0, x1, y1)


def triangle_setup(
    pix_h: jnp.ndarray,
    z_clip: jnp.ndarray,
    tris: jnp.ndarray,
    tri_mask: jnp.ndarray,
    cull_mode: int = CULL_BACK,
    width: int = 0,
    height: int = 0,
) -> RasterSetup:
    """Setup for an indexed mesh (testing convenience; the render paths
    de-index geometry and use triangle_setup_expanded -- per-triangle vertex
    gathers lower poorly on TPU)."""
    return triangle_setup_from_verts(
        pix_h[tris[:, 0]], pix_h[tris[:, 1]], pix_h[tris[:, 2]],
        z_clip[tris[:, 0]], z_clip[tris[:, 1]], z_clip[tris[:, 2]],
        tri_mask, cull_mode, width, height,
    )


def triangle_setup_expanded(
    pix_h: jnp.ndarray,
    z_clip: jnp.ndarray,
    tri_mask: jnp.ndarray,
    cull_mode: int = CULL_BACK,
    width: int = 0,
    height: int = 0,
) -> RasterSetup:
    """Setup for de-indexed geometry: vertex i of triangle t at row 3t + i.
    Gather-free (reshape + strided slice only)."""
    t = pix_h.shape[0] // 3
    p = pix_h.reshape(t, 3, 3)
    z = z_clip.reshape(t, 3)
    return triangle_setup_from_verts(
        p[:, 0], p[:, 1], p[:, 2], z[:, 0], z[:, 1], z[:, 2],
        tri_mask, cull_mode, width, height,
    )


def triangle_setup_from_verts(
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    z0: jnp.ndarray,
    z1: jnp.ndarray,
    z2: jnp.ndarray,
    tri_mask: jnp.ndarray,
    cull_mode: int = CULL_BACK,
    width: int = 0,
    height: int = 0,
) -> RasterSetup:
    """Setup from per-triangle (T, 3) homogeneous pixel vertices (column
    slices feed the 1D component core)."""
    return triangle_setup_from_components(
        p0[:, 0], p0[:, 1], p0[:, 2],
        p1[:, 0], p1[:, 1], p1[:, 2],
        p2[:, 0], p2[:, 1], p2[:, 2],
        z0, z1, z2, tri_mask, cull_mode, width, height,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VertexSoA:
    """Per-vertex-slot clip/pixel components, each a lane-dense (T,) vector
    (index 0..2 = triangle vertex slot).  Produced by
    render/common.py ``vertex_stage_soa`` from ``DeviceScene.pos_soa``; the
    whole path from position load to setup coefficients stays 1-D, avoiding
    the (V, 3)/(V, 4) minor-dim-3 layouts that waste 124/128 vreg lanes
    (settings.soa_vertex)."""

    px: tuple  # 3 x (T,) homogeneous pixel X (pixel x * clip w)
    py: tuple  # 3 x (T,) homogeneous pixel Y
    pw: tuple  # 3 x (T,) clip w
    z: tuple   # 3 x (T,) clip z

    def pix9(self) -> jnp.ndarray:
        """(T, 9) rows [x0 y0 w0 x1 y1 w1 x2 y2 w2] -- the layout
        build_resolve_records expects (identical to pix_h.reshape(T, 9))."""
        return jnp.stack(
            [self.px[0], self.py[0], self.pw[0],
             self.px[1], self.py[1], self.pw[1],
             self.px[2], self.py[2], self.pw[2]],
            axis=1,
        )


def triangle_setup_from_soa(
    v: VertexSoA,
    tri_mask: jnp.ndarray,
    cull_mode: int = CULL_BACK,
    width: int = 0,
    height: int = 0,
) -> RasterSetup:
    """Setup from SoA vertex components -- bit-identical to
    triangle_setup_from_verts given equal component values (the core math is
    shared; tests/test_raster.py::test_setup_from_soa_matches_expanded).

    The result passes through ``optimization_barrier``: the SoA fma chains
    are fusion-bait, and XLA contracts them differently per consumer
    context -- without the barrier, the compacted and uncompacted rasters
    see coefficient values a few ulp apart (observed: 1267 shadow texels
    off by <=2.4e-5 with compaction on vs off).  The barrier pins ONE set
    of setup values for every consumer; cost is one (T,)-component
    materialization (~17 MB at 263k tris, well under 0.1 ms of HBM)."""
    setup = triangle_setup_from_components(
        v.px[0], v.py[0], v.pw[0],
        v.px[1], v.py[1], v.pw[1],
        v.px[2], v.py[2], v.pw[2],
        v.z[0], v.z[1], v.z[2], tri_mask, cull_mode, width, height,
    )
    return jax.lax.optimization_barrier(setup)


def triangle_setup_from_components(
    x0, y0v, w0, x1, y1v, w1, x2, y2v, w2,
    z0: jnp.ndarray,
    z1: jnp.ndarray,
    z2: jnp.ndarray,
    tri_mask: jnp.ndarray,
    cull_mode: int = CULL_BACK,
    width: int = 0,
    height: int = 0,
) -> RasterSetup:
    """Core edge/depth coefficient build from per-triangle vertices.

    All math runs on 1D (T,) component arrays (lane-friendly; (T, 3) arrays
    would waste 125/128 lanes on TPU).

    Orientation: for a clockwise-on-screen triangle (D3D front face,
    FrontCounterClockwise=FALSE) with all w > 0, det < 0 under the y-down
    viewport mapping (verified against the reference's own BoxTextured
    asset: camera-facing faces carry negative determinants); edge signs are
    flipped so the rasterized interior is always e_k > 0.
    """
    # cross products per edge: e = cross(p_next, p_prev_next)
    def cross(ax, ay, aw, bx, by, bw):
        return (ay * bw - aw * by, aw * bx - ax * bw, ax * by - ay * bx)

    e0a, e0b, e0c = cross(x1, y1v, w1, x2, y2v, w2)
    e1a, e1b, e1c = cross(x2, y2v, w2, x0, y0v, w0)
    e2a, e2b, e2c = cross(x0, y0v, w0, x1, y1v, w1)
    det = e0a * x0 + e0b * y0v + e0c * w0

    front = det < 0.0  # D3D front face (clockwise)
    if cull_mode == CULL_BACK:
        keep = front
        sign = jnp.float32(-1.0)
    elif cull_mode == CULL_FRONT:
        keep = ~front
        sign = jnp.float32(1.0)
    else:
        keep = jnp.ones_like(front)
        sign = jnp.where(front, -1.0, 1.0)

    e0a, e0b, e0c = e0a * sign, e0b * sign, e0c * sign
    e1a, e1b, e1c = e1a * sign, e1b * sign, e1c * sign
    e2a, e2b, e2c = e2a * sign, e2b * sign, e2c * sign

    valid = tri_mask & keep & (det != 0.0)

    nza = e0a * z0 + e1a * z1 + e2a * z2
    nzb = e0b * z0 + e1b * z1 + e2b * z2
    nzc = e0c * z0 + e1c * z1 + e2c * z2
    nwa = e0a * w0 + e1a * w1 + e2a * w2
    nwb = e0b * w0 + e1b * w1 + e2b * w2
    nwc = e0c * w0 + e1c * w1 + e2c * w2

    coef = jnp.stack(
        [e0a, e1a, e2a, e0b, e1b, e2b, e0c, e1c, e2c,
         nza, nzb, nzc, nwa, nwb, nwc, jnp.zeros_like(e0a)],
        axis=1,
    )

    # Conservative pixel bbox; vertices behind the camera get full viewport.
    eps = 1e-9
    any_behind = (w0 <= eps) | (w1 <= eps) | (w2 <= eps)
    iw0 = 1.0 / jnp.maximum(w0, eps)
    iw1 = 1.0 / jnp.maximum(w1, eps)
    iw2 = 1.0 / jnp.maximum(w2, eps)
    sx_min = jnp.minimum(jnp.minimum(x0 * iw0, x1 * iw1), x2 * iw2)
    sx_max = jnp.maximum(jnp.maximum(x0 * iw0, x1 * iw1), x2 * iw2)
    sy_min = jnp.minimum(jnp.minimum(y0v * iw0, y1v * iw1), y2v * iw2)
    sy_max = jnp.maximum(jnp.maximum(y0v * iw0, y1v * iw1), y2v * iw2)
    bx0 = jnp.where(any_behind, 0.0, jnp.floor(sx_min))
    by0 = jnp.where(any_behind, 0.0, jnp.floor(sy_min))
    bx1 = jnp.where(any_behind, float(max(width - 1, 0)), jnp.ceil(sx_max))
    by1 = jnp.where(any_behind, float(max(height - 1, 0)), jnp.ceil(sy_max))
    bbox = jnp.stack(
        [
            jnp.clip(bx0, 0, max(width - 1, 0)),
            jnp.clip(by0, 0, max(height - 1, 0)),
            jnp.clip(bx1, 0, max(width - 1, 0)),
            jnp.clip(by1, 0, max(height - 1, 0)),
        ],
        axis=0,
    )
    on_screen = (bx1 >= 0) & (by1 >= 0) & (bx0 <= width - 1) & (by0 <= height - 1)
    valid = valid & (on_screen | any_behind)

    # Sub-center cull: a pixel can only be covered if its CENTER lies inside
    # the triangle, and every interior point's x/y lies within the vertex
    # hull range -- so a triangle whose hull range contains no pixel center
    # in x or in y can never win a pixel in exact arithmetic.  Culling those
    # (sub-pixel slivers between center rows/columns) shrinks binning pairs
    # + the frame-visible compaction set enormously on dense meshes
    # (pica_pica light space at 256^2: 82% of valid triangles are such
    # slivers).  The 1e-2 margin covers f32 rounding of the HULL computation
    # (~size*2^-22), so no triangle with an exact-hull center is ever
    # dropped (tests/test_raster.py::test_subcenter_cull_exact).  Note the
    # f32 EDGE functions can claim a center that exact arithmetic rejects
    # (sliver coefficients are sign-noise at sub-pixel widths); dropping
    # those claims is an intended accuracy improvement, not a regression --
    # goldens are generated with the cull on.
    if SUBCENTER_CULL:
        m = SUBCENTER_MARGIN
        has_center = (
            (jnp.ceil(sx_min - 0.5 - m) + 0.5 <= sx_max + m)
            & (jnp.ceil(sy_min - 0.5 - m) + 0.5 <= sy_max + m)
        )
        valid = valid & (has_center | any_behind)

    return RasterSetup(coef=coef, valid=valid, bbox=bbox)


def normalize_ortho_setup(setup: RasterSetup) -> RasterSetup:
    """Orthographic-projection specialization (directional-light shadow maps,
    ``RendererUtils.cpp:1117-1137``): with w == 1 for every vertex the depth
    denominator nw(q) is the constant triangle determinant (its gradient is
    the sum of the edge gradients, which telescopes to ~0), so the division
    folds into the numerator coefficients once per triangle.  nw becomes the
    literal (0, 0, 1) plane; kernels with the ``ortho`` flag then skip the
    per-pixel nw evaluation and divide entirely (key = nz'(q)), and the
    generic path computes nz'/1.0 -- bit-identical, so the Pallas/XLA
    cross-checks keep holding."""
    coef = setup.coef
    nwc = coef[:, COEF_NW + 2]
    inv = 1.0 / jnp.where(nwc != 0.0, nwc, 1.0)
    coef = coef.at[:, COEF_NZ : COEF_NZ + 3].multiply(inv[:, None])
    coef = coef.at[:, COEF_NW + 0].set(0.0)
    coef = coef.at[:, COEF_NW + 1].set(0.0)
    coef = coef.at[:, COEF_NW + 2].set(1.0)
    # nw > 0 was part of the visibility test; constant-nw triangles with
    # nw <= 0 can never pass it, so bake that into valid
    valid = setup.valid & (nwc > 0.0)
    return RasterSetup(coef=coef, valid=valid, bbox=setup.bbox)


def flip_depth_key(setup: RasterSetup) -> RasterSetup:
    """Replace the depth numerator with (nw - nz) so key = 1 - depth and the
    max-reduction implements a LESS_EQUAL (shadow) depth test."""
    coef = setup.coef
    coef = coef.at[:, COEF_NZ : COEF_NZ + 3].set(
        coef[:, COEF_NW : COEF_NW + 3] - coef[:, COEF_NZ : COEF_NZ + 3]
    )
    return RasterSetup(coef=coef, valid=setup.valid, bbox=setup.bbox)


def gather_rows_split16(rec: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact f32 row gather as two 16-bit half-table gathers + bitwise
    rebuild.  16-bit tables stay on the TPU fast-gather path up to ~192k
    rows where f32 falls off at ~96k (BENCHLOG gather law); the rebuild
    ``(hi << 16) | lo`` reproduces every f32 bit pattern exactly."""
    bits = rec.view(jnp.uint32)
    hi = (bits >> 16).astype(jnp.uint16)
    lo = (bits & 0xFFFF).astype(jnp.uint16)
    h = hi[idx].astype(jnp.uint32)
    l = lo[idx].astype(jnp.uint32)
    return ((h << 16) | l).view(jnp.float32)


# largest row count measured on the fast gather path for f32 <=128-lane
# tables (BENCHLOG gather law: ~3.5-4 ns/row under ~96k rows, 12-19 ns/row
# beyond); row-split gathers slice tables into parts of at most this
FAST_ROWS_F32 = 94208


def gather_rows_parts(rec: jnp.ndarray, idx: jnp.ndarray,
                      part_rows: int = FAST_ROWS_F32) -> jnp.ndarray:
    """Bit-exact f32 row gather for tables past the ~96k-row f32 cliff:
    slice the TABLE into <=``part_rows``-row parts (each on the fast path)
    and gather every part with its own clamped index vector, then select by
    range.  N parts cost ~N fast gathers (~3.5 ns/row each) -- cheaper than
    one slow-path gather (12-19 ns) for N=2, and measured ~2x cheaper than
    the u16 split-pair (``gather_rows_split16``) whose two 16-bit tables
    each pay their own request stream.

    The clamped index vectors differ per part, so XLA cannot fuse the part
    gathers into one over-wide slow gather (the round-2 law's fusion trap).
    """
    rows = rec.shape[0]
    n_parts = -(-rows // part_rows)
    if n_parts <= 1:
        return rec[idx]
    out = None
    for p in range(n_parts):
        lo_r = p * part_rows
        part = jax.lax.slice_in_dim(rec, lo_r, min(lo_r + part_rows, rows))
        local = jnp.clip(idx - lo_r, 0, part.shape[0] - 1)
        got = part[local]
        out = got if out is None else jnp.where(
            (idx >= lo_r)[..., None], got, out
        )
    return out


def compact_mask(mask: jnp.ndarray, cap: int, mode: str = "sort"):
    """First ``cap`` True rows of ``mask`` in ascending index order.

    Returns ``(ids (cap,) i32, ok (cap,) bool)``.  Three formulations with
    identical outputs (cross-tested):

    * "sort": pack (flag, index) into one i32 and sort -- ~3 ms at
      T=163840 on metal regardless of cap (the frame runs ~6 compactions,
      so this is a real term).
    * "scatter": cumsum ranks + one unique-index scatter -- prof_fuse
      decision rows price it; identical ascending-order semantics (rows
      past the cap drop into a dump slot, counted by the caller via ok).
    * "shift": log-step shift compaction -- O(log T) rolls+selects instead
      of the XLA bitonic sort's O(log^2 T) compare-exchange stages.  Each
      masked element must move left by ``delta = index - rank`` (monotone
      non-decreasing over masked elements); processing delta bits LSB->MSB
      and shifting by 2^k is collision-free (for masked i<j,
      (delta_j & m) - (delta_i & m) <= delta_j - delta_i <= j - i - 1 for
      every bit mask m, so no two elements ever land on one slot), and the
      element arriving at final slot j has original index j + delta, so
      only the delta array is carried -- ~5 vector ops x log2(T) stages.
    """
    t_count = mask.shape[0]
    iota = jnp.arange(t_count, dtype=jnp.int32)
    if mode == "shift":
        cap = min(cap, t_count)  # sort mode's [:cap] truncates to T likewise
        mask_i = mask.astype(jnp.int32)
        rank = jnp.cumsum(mask_i) - mask_i  # exclusive running rank
        delta = jnp.where(mask, iota - rank, 0)
        for k in range(max((t_count - 1).bit_length(), 1)):
            step = jnp.int32(1 << k)
            bit = (delta >> k) & 1
            sh_delta = jnp.roll(delta, -(1 << k))
            sh_bit = (sh_delta >> k) & 1
            # slot p: take the element arriving from p+2^k if it moves this
            # stage; else keep its own if it stays; else the slot empties
            # (delta 0 = background, never taken: its bit is always 0)
            delta = jnp.where(
                sh_bit == 1, sh_delta, jnp.where(bit == 0, delta, 0)
            )
            del step
        total = rank[-1] + mask_i[-1]
        cap_iota = jnp.arange(cap, dtype=jnp.int32)
        ok = cap_iota < jnp.minimum(total, cap)
        return jnp.where(ok, cap_iota + delta[:cap], 0), ok
    if mode == "scatter":
        pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
        dest = jnp.where(mask & (pos < cap), pos, cap)
        out = jnp.full(cap + 1, t_count, jnp.int32).at[dest].set(iota)
        total = jnp.minimum(pos[-1] + 1, cap)
        ok = jnp.arange(cap, dtype=jnp.int32) < total
        return jnp.where(ok, out[:cap], 0), ok
    idx_bits = max((t_count - 1).bit_length(), 1)
    packed = jnp.where(mask, 0, jnp.int32(1 << idx_bits)) + iota
    sp = jnp.sort(packed)[:cap]
    return sp & jnp.int32((1 << idx_bits) - 1), sp < jnp.int32(1 << idx_bits)


def compact_setup(setup: RasterSetup, cap: int, mode: str = "sort"):
    """Frame-visible triangle compaction -- the TPU analog of the
    reference's GPU culling writing per-draw InstanceCounts into the
    indirect-argument buffer (``CullIndirectArgs.hlsl:153-154``): the
    compacted list IS the frame's draw list.

    Returns ``(setup_c, ids, overflow)`` where ``setup_c`` holds the first
    ``cap`` valid triangles in ascending id order (so compact-id order ==
    global-id order and min-id tie-breaks are preserved), ``ids`` is the
    (cap,) i32 map from compact row -> global triangle id, and ``overflow``
    counts valid triangles beyond the cap that were DROPPED (surface it like
    the other raster stats; raise the cap when nonzero).

    Why: per-pixel row gathers fall off the TPU fast path once the table
    exceeds ~96k rows (f32) / ~192k (16-bit) -- see BENCHLOG "gather law".
    Compacting to the visible set keeps the resolve record table under the
    cliff at Sponza-class triangle counts (~263k total, ~100k visible), and
    shrinks every downstream binning sort and gather by the same factor.
    """
    ids, ok = compact_mask(setup.valid, cap, mode)
    overflow = (
        jnp.sum(setup.valid).astype(jnp.int32) - jnp.sum(ok).astype(jnp.int32)
    )
    setup_c = RasterSetup(
        coef=setup.coef[ids], valid=ok, bbox=setup.bbox[:, ids]
    )
    return setup_c, ids, overflow


def shift_setup(setup: RasterSetup, dx, dy) -> RasterSetup:
    """Shift the pixel-space origin by a (possibly traced) offset: e(q + d)
    folds into the constant coefficients, so sharded callers (multi-chip row
    slabs) rasterize in local coordinates."""
    coef = setup.coef
    # edge constants: c += a*dx + b*dy
    coef = coef.at[:, 6:9].add(coef[:, 0:3] * dx + coef[:, 3:6] * dy)
    # depth numerator/denominator constants likewise
    coef = coef.at[:, 11].add(coef[:, 9] * dx + coef[:, 10] * dy)
    coef = coef.at[:, 14].add(coef[:, 12] * dx + coef[:, 13] * dy)
    shift = jnp.asarray([dx, dy, dx, dy], jnp.float32)[:, None]
    return RasterSetup(coef=coef, valid=setup.valid, bbox=setup.bbox - shift)


def _coverage_packed(ev0, ev1, ev2, a, b):
    """Top-left fill rule on packed evaluations.
    ev_i: (..., K); a, b: (K, 3) gradients per edge."""
    def inside(ev, i):
        tl = (a[:, i] > 0.0) | ((a[:, i] == 0.0) & (b[:, i] > 0.0))
        return (ev > 0.0) | ((ev == 0.0) & tl)

    return inside(ev0, 0) & inside(ev1, 1) & inside(ev2, 2)


@partial(
    jax.jit,
    static_argnames=("width", "height", "tile_h", "tile_w", "chunk", "depth_mode"),
)
def rasterize(
    setup: RasterSetup,
    width: int,
    height: int,
    tile_h: int = 32,
    tile_w: int = 64,
    chunk: int = 128,
    depth_mode: int = DEPTH_MAX,
    y_offset=0,
):
    """Rasterize to a visibility buffer (XLA reference implementation).

    Returns (depth (H, W) f32, tri_id (H, W) i32).  tri_id is -1 where empty.
    depth is z_ndc: reverse-Z in DEPTH_MAX mode (0 = empty/far), standard-Z
    in DEPTH_MIN mode (1 = empty/far).

    Brute-force tiling: every tile scans every triangle chunk, with a
    per-(tile, chunk) bbox rejection that XLA turns into masked work (the
    Pallas kernels in ops/pallas_raster.py are the production path).
    """
    pad_w = -(-width // tile_w) * tile_w
    pad_h = -(-height // tile_h) * tile_h
    n_ty, n_tx = pad_h // tile_h, pad_w // tile_w
    n_tiles = n_ty * n_tx
    pix = tile_h * tile_w

    t = setup.coef.shape[0]
    n_chunks = max(1, -(-t // chunk))
    t_pad = n_chunks * chunk

    def pad(x, fill=0):
        pad_n = t_pad - x.shape[-1] if x.ndim > 1 else t_pad - x.shape[0]
        if pad_n == 0:
            return x
        if x.ndim == 1:
            return jnp.pad(x, (0, pad_n), constant_values=fill)
        return jnp.pad(x, ((0, 0), (0, pad_n)), constant_values=fill)

    if depth_mode != DEPTH_MAX:
        setup = flip_depth_key(setup)

    coef = jnp.pad(setup.coef, ((0, t_pad - t), (0, 0))).reshape(n_chunks, chunk, COEF_COLS)
    valid = pad(setup.valid, fill=False).reshape(n_chunks, chunk)
    bbox = pad(setup.bbox).reshape(4, n_chunks, chunk)

    ty_idx = jnp.arange(n_tiles, dtype=jnp.int32) // n_tx
    tx_idx = jnp.arange(n_tiles, dtype=jnp.int32) % n_tx
    yy = jnp.arange(tile_h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(tile_w, dtype=jnp.float32)[None, :]
    y_off = jnp.asarray(y_offset, jnp.float32)
    qx0 = tx_idx[:, None, None] * tile_w + xx[None] + 0.5
    qy0 = ty_idx[:, None, None] * tile_h + yy[None] + 0.5 + y_off
    qx = jnp.broadcast_to(qx0, (n_tiles, tile_h, tile_w)).reshape(n_tiles, pix)
    qy = jnp.broadcast_to(qy0, (n_tiles, tile_h, tile_w)).reshape(n_tiles, pix)

    tile_x0 = (tx_idx * tile_w).astype(jnp.float32)
    tile_y0 = (ty_idx * tile_h).astype(jnp.float32) + y_off
    tile_x1 = tile_x0 + (tile_w - 1)
    tile_y1 = tile_y0 + (tile_h - 1)

    empty_depth = 0.0 if depth_mode == DEPTH_MAX else 1.0

    def chunk_step(carry, inputs):
        best_key, best_id = carry  # (n_tiles, pix) each
        c_coef, c_valid, c_bbox, c_base = inputs
        qx_e = qx[:, :, None]  # (n_tiles, pix, 1)
        qy_e = qy[:, :, None]

        def ev(i):
            return (
                c_coef[None, None, :, 0 + i] * qx_e
                + c_coef[None, None, :, 3 + i] * qy_e
                + c_coef[None, None, :, 6 + i]
            )

        a = c_coef[:, 0:3]
        b = c_coef[:, 3:6]
        cov = _coverage_packed(ev(0), ev(1), ev(2), a, b)
        nz = (
            c_coef[None, None, :, 9] * qx_e
            + c_coef[None, None, :, 10] * qy_e
            + c_coef[None, None, :, 11]
        )
        nw = (
            c_coef[None, None, :, 12] * qx_e
            + c_coef[None, None, :, 13] * qy_e
            + c_coef[None, None, :, 14]
        )
        key = nz / jnp.where(nw != 0.0, nw, 1.0)
        ok = cov & (nw > 0.0) & (key >= 0.0) & (key <= 1.0) & c_valid[None, None, :]
        overlap = (
            (c_bbox[0][None] <= tile_x1[:, None])
            & (c_bbox[2][None] >= tile_x0[:, None])
            & (c_bbox[1][None] <= tile_y1[:, None])
            & (c_bbox[3][None] >= tile_y0[:, None])
        )
        ok = ok & overlap[:, None, :]

        key = jnp.where(ok, key, -1.0)
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
        chunk_step, init, (coef, valid, bbox.transpose(1, 0, 2), bases)
    )

    hit = best_key >= 0.0
    if depth_mode == DEPTH_MAX:
        depth = jnp.where(hit, best_key, empty_depth)
    else:
        depth = jnp.where(hit, 1.0 - best_key, empty_depth)
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
