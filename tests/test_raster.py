"""Rasterizer: coverage, depth test, culling, near-plane (clipless) handling,
barycentric interpolation -- cross-checked against a simple numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from unclerenderer_tpu import mathlib as m
from unclerenderer_tpu.ops.raster import (
    CULL_BACK,
    CULL_FRONT,
    CULL_NONE,
    DEPTH_MAX,
    DEPTH_MIN,
    rasterize,
    triangle_setup,
    viewport_homogeneous,
)
from oracle_interpolate import barycentrics, interpolate

W = H = 64


def _raster(clip, tris, cull=CULL_NONE, width=W, height=H, depth_mode=DEPTH_MAX):
    clip = jnp.asarray(clip, jnp.float32)
    tris = jnp.asarray(tris, jnp.int32)
    pix_h = viewport_homogeneous(clip, width, height)
    mask = jnp.ones(tris.shape[0], bool)
    setup = triangle_setup(pix_h, clip[:, 2], tris, mask, cull, width, height)
    depth, tid = rasterize(
        setup, width, height, tile_h=16, tile_w=16, chunk=8, depth_mode=depth_mode
    )
    return np.asarray(depth), np.asarray(tid), pix_h


def ndc_vertex(x, y, z_ndc, w=1.0):
    """Build a clip-space vertex from NDC + w (reverse-Z z stored directly)."""
    return [x * w, y * w, z_ndc * w, w]


def test_single_triangle_coverage_matches_oracle():
    # (bottom-left, top-middle, bottom-right) traverses counter-clockwise on
    # screen; reverse the order for a D3D front-facing (clockwise) triangle.
    verts = [
        ndc_vertex(-0.5, -0.5, 0.5),
        ndc_vertex(0.5, -0.5, 0.5),
        ndc_vertex(0.0, 0.5, 0.5),
    ]
    depth, tid, _ = _raster(verts, [[0, 1, 2]], cull=CULL_BACK)
    assert (tid >= 0).sum() > 100  # roughly 1/8 of 64x64
    np.testing.assert_allclose(depth[tid >= 0], 0.5, atol=1e-6)

    # Oracle: point-in-triangle in screen space.
    sx = [((v[0] / v[3]) * 0.5 + 0.5) * W for v in verts]
    sy = [(0.5 - (v[1] / v[3]) * 0.5) * H for v in verts]
    cnt = 0
    inside_oracle = np.zeros((H, W), bool)
    for y in range(H):
        for x in range(W):
            px, py = x + 0.5, y + 0.5
            e = []
            for i in range(3):
                j = (i + 1) % 3
                e.append((sx[j] - sx[i]) * (py - sy[i]) - (sy[j] - sy[i]) * (px - sx[i]))
            inside_oracle[y, x] = all(v > 0 for v in e) or all(v < 0 for v in e)
            cnt += inside_oracle[y, x]
    # Edge-exact pixels may differ by the fill rule; interiors must agree.
    got = tid >= 0
    disagree = got != inside_oracle
    assert disagree.sum() <= 8  # only possible on shared-edge pixels


def test_winding_cull_back_and_front():
    # clockwise on screen (D3D front): bottom-left -> bottom-right -> top.
    cw = [
        ndc_vertex(-0.5, -0.5, 0.5),
        ndc_vertex(0.5, -0.5, 0.5),
        ndc_vertex(0.0, 0.5, 0.5),
    ]
    ccw = [cw[0], cw[2], cw[1]]
    _, tid_cw_back, _ = _raster(cw, [[0, 1, 2]], cull=CULL_BACK)
    _, tid_ccw_back, _ = _raster(ccw, [[0, 1, 2]], cull=CULL_BACK)
    assert (tid_cw_back >= 0).sum() > 100
    assert (tid_ccw_back >= 0).sum() == 0  # back-facing culled
    _, tid_cw_front, _ = _raster(cw, [[0, 1, 2]], cull=CULL_FRONT)
    _, tid_ccw_front, _ = _raster(ccw, [[0, 1, 2]], cull=CULL_FRONT)
    assert (tid_cw_front >= 0).sum() == 0
    assert (tid_ccw_front >= 0).sum() > 100


def test_depth_test_reverse_z_nearest_wins():
    # Reverse-Z: larger z_ndc = nearer. Two overlapping quads.
    verts = [
        # far triangle (z=0.2)
        ndc_vertex(-0.8, -0.8, 0.2),
        ndc_vertex(0.0, 0.8, 0.2),
        ndc_vertex(0.8, -0.8, 0.2),
        # near triangle (z=0.7), smaller
        ndc_vertex(-0.4, -0.4, 0.7),
        ndc_vertex(0.0, 0.4, 0.7),
        ndc_vertex(0.4, -0.4, 0.7),
    ]
    depth, tid, _ = _raster(verts, [[0, 2, 1], [3, 5, 4]], cull=CULL_BACK)
    assert set(np.unique(tid)) == {-1, 0, 1}
    # near triangle owns its pixels
    assert np.all(depth[tid == 1] == pytest.approx(0.7))
    assert np.all(depth[tid == 0] == pytest.approx(0.2))
    # order independence: reversed triangle order gives same depth image
    depth2, tid2, _ = _raster(
        [verts[i] for i in [3, 4, 5, 0, 1, 2]], [[0, 2, 1], [3, 5, 4]], cull=CULL_BACK
    )
    np.testing.assert_allclose(depth, depth2)


def test_depth_min_mode_for_shadows():
    verts = [
        ndc_vertex(-0.8, -0.8, 0.2),
        ndc_vertex(0.0, 0.8, 0.2),
        ndc_vertex(0.8, -0.8, 0.2),
        ndc_vertex(-0.4, -0.4, 0.7),
        ndc_vertex(0.0, 0.4, 0.7),
        ndc_vertex(0.4, -0.4, 0.7),
    ]
    depth, tid, _ = _raster(
        verts, [[0, 1, 2], [3, 4, 5]], cull=CULL_NONE, depth_mode=DEPTH_MIN
    )
    # standard-Z: smaller wins; empty = 1.0
    assert np.all(depth[tid == 0] == pytest.approx(0.2))
    assert (tid == 1).sum() == 0  # farther triangle never wins where both cover
    assert np.all(depth[tid == -1] == 1.0)


def test_perspective_camera_cube_inside():
    """Camera inside a cube: every face crosses or faces away; near-plane
    crossing floor/walls must rasterize (clipless homogeneous raster)."""
    from unclerenderer_tpu.scene.mesh import create_cube

    cube = create_cube(4.0)
    view = m.look_to_lh([0.0, 0.0, 0.0], [0, 0, 1], [0, 1, 0])
    proj = m.perspective_reverse_z_infinite(np.pi / 2, 1.0, 0.1)
    vp = jnp.asarray(view @ proj)
    pos = jnp.asarray(cube.position)
    clip = jnp.concatenate([pos, jnp.ones((pos.shape[0], 1))], axis=1) @ vp
    tris = jnp.asarray(cube.indices.reshape(-1, 3), jnp.int32)
    pix_h = viewport_homogeneous(clip, W, H)
    # cube faces point outward; camera inside sees back faces -> CULL_NONE
    setup = triangle_setup(pix_h, clip[:, 2], tris, jnp.ones(12, bool), CULL_NONE, W, H)
    depth, tid = rasterize(setup, W, H, tile_h=16, tile_w=16, chunk=8)
    # every pixel covered (enclosed), all depths valid (0, 1]
    assert np.all(np.asarray(tid) >= 0)
    d = np.asarray(depth)
    assert np.all(d > 0.0) and np.all(d <= 1.0)
    # +Z face is 2 units away: z_ndc = near/viewz = 0.1/2 = 0.05 at center
    assert d[H // 2, W // 2] == pytest.approx(0.05, rel=1e-3)


def test_barycentric_interpolation_perspective_correct():
    """A textured quad receding in depth: interpolation must be
    perspective-correct (compare against per-pixel ray math)."""
    view = m.look_to_lh([0.0, 0.0, 0.0], [0, 0, 1], [0, 1, 0])
    proj = m.perspective_reverse_z_infinite(np.pi / 2, 1.0, 0.1)
    vp = jnp.asarray(view @ proj)
    # Floor quad y=-1, z from 0.5 to 10.
    pos = np.array(
        [[-5, -1, 0.5], [5, -1, 0.5], [5, -1, 10.0], [-5, -1, 10.0]], np.float32
    )
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    tris = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    clip = jnp.concatenate([jnp.asarray(pos), jnp.ones((4, 1))], axis=1) @ vp
    pix_h = viewport_homogeneous(clip, W, H)
    setup = triangle_setup(pix_h, clip[:, 2], jnp.asarray(tris), jnp.ones(2, bool), CULL_NONE, W, H)
    depth, tid = rasterize(setup, W, H, tile_h=16, tile_w=16, chunk=8)
    bary, valid, view_w = barycentrics(pix_h, jnp.asarray(tris), tid, W, H)
    uv_img = np.asarray(interpolate(jnp.asarray(uv), jnp.asarray(tris), tid, bary))
    pos_img = np.asarray(interpolate(jnp.asarray(pos), jnp.asarray(tris), tid, bary))
    tid = np.asarray(tid)
    valid = np.asarray(valid)

    # Check a column of pixels: ray through pixel center must hit y=-1 plane
    # at the interpolated world position.
    ys, xs = np.nonzero(valid)
    idx = np.random.default_rng(0).choice(len(ys), 50, replace=False)
    for k in idx:
        y, x = ys[k], xs[k]
        ndc_x = (x + 0.5) / W * 2 - 1
        ndc_y = 1 - (y + 0.5) / H * 2
        # fov 90, aspect 1: view ray dir = (ndc_x, ndc_y, 1)
        t = -1.0 / ndc_y  # y=-1 plane
        expect = np.array([ndc_x * t, -1.0, t])
        got = pos_img[y, x]
        np.testing.assert_allclose(got, expect, rtol=2e-3, atol=2e-3)
        # uv: u = (wx+5)/10, v = (wz-0.5)/9.5
        np.testing.assert_allclose(
            uv_img[y, x], [(expect[0] + 5) / 10, (expect[2] - 0.5) / 9.5], atol=2e-3
        )
        # view_w is the view-space depth
        np.testing.assert_allclose(np.asarray(view_w)[y, x], t, rtol=2e-3)


def test_shared_edge_no_double_coverage():
    """Two triangles sharing an edge: every covered pixel owned exactly once
    (top-left rule), and the seam has no holes."""
    verts = [
        ndc_vertex(-0.8, -0.8, 0.5),
        ndc_vertex(0.8, -0.8, 0.5),
        ndc_vertex(0.8, 0.8, 0.5),
        ndc_vertex(-0.8, 0.8, 0.5),
    ]
    # quad split along the diagonal, both clockwise on screen
    depth, tid, _ = _raster(verts, [[0, 2, 3], [0, 1, 2]], cull=CULL_BACK)
    covered = (tid >= 0).sum()
    # quad covers 0.8 of both dims: (0.8*64)^2 ≈ 2621 pixels
    assert abs(covered - int(0.8 * 64) ** 2) <= 110
    # the diagonal seam: no empty pixels inside the quad
    inner = tid[10:54, 10:54]
    assert np.all(inner >= 0)


def test_bbox_offscreen_culled():
    verts = [
        ndc_vertex(2.0, 2.0, 0.5),
        ndc_vertex(2.5, 3.0, 0.5),
        ndc_vertex(3.0, 2.0, 0.5),
    ]
    _, tid, _ = _raster(verts, [[0, 1, 2]], cull=CULL_NONE)
    assert (tid >= 0).sum() == 0


def test_compact_setup_preserves_order_and_counts():
    """compact_setup keeps valid triangles in ascending id order (so
    compact-id tie-breaks == global-id tie-breaks), maps ids correctly,
    and counts dropped triangles past the cap."""
    from unclerenderer_tpu.ops.raster import RasterSetup, compact_setup

    t = 37
    rng = np.random.default_rng(0)
    valid = jnp.asarray(rng.random(t) > 0.4)
    coef = jnp.asarray(rng.normal(size=(t, 16)).astype(np.float32))
    bbox = jnp.asarray(rng.normal(size=(4, t)).astype(np.float32))
    setup = RasterSetup(coef=coef, valid=valid, bbox=bbox)

    n_valid = int(np.asarray(valid).sum())
    cap = ((n_valid + 7) // 8) * 8
    sc, ids, overflow = compact_setup(setup, cap)
    assert int(overflow) == 0
    ids_np = np.asarray(ids)
    ok = np.asarray(sc.valid)
    expect = np.nonzero(np.asarray(valid))[0]
    np.testing.assert_array_equal(ids_np[ok], expect)  # ascending order
    np.testing.assert_array_equal(np.asarray(sc.coef)[ok], np.asarray(coef)[expect])
    np.testing.assert_array_equal(np.asarray(sc.bbox)[:, ok], np.asarray(bbox)[:, expect])

    # cap below the valid count: overflow counted, prefix kept in order
    cap2 = max(n_valid - 4, 1)
    sc2, ids2, overflow2 = compact_setup(setup, cap2)
    assert int(overflow2) == n_valid - cap2
    np.testing.assert_array_equal(np.asarray(ids2)[np.asarray(sc2.valid)], expect[:cap2])


def test_split16_gather_bit_exact():
    """The two-half-table 16-bit gather reassembles every f32 bit pattern
    exactly (incl. negatives, denormals, NaN payloads)."""
    from unclerenderer_tpu.ops.raster import gather_rows_split16 as _gather_rows_split16

    rng = np.random.default_rng(1)
    rec = rng.normal(size=(64, 8)).astype(np.float32)
    rec[0, 0] = np.inf
    rec[1, 1] = -0.0
    rec[2, 2] = np.float32(1e-42)  # denormal
    rec[3, 3] = np.nan
    idx = jnp.asarray(rng.integers(0, 64, size=(9, 5)), jnp.int32)
    out = np.asarray(_gather_rows_split16(jnp.asarray(rec), idx))
    expect = rec[np.asarray(idx)]
    np.testing.assert_array_equal(
        out.view(np.uint32), expect.view(np.uint32)
    )


def test_gather_rows_parts_bit_exact():
    """The row-split gather (N fast-path part tables, per-part clamped
    indices) returns exactly table[idx] for any part size, incl. a table
    not divisible by the part size and multi-dim index shapes."""
    from unclerenderer_tpu.ops.raster import gather_rows_parts

    rng = np.random.default_rng(3)
    rec = rng.normal(size=(100, 8)).astype(np.float32)
    rec[0, 0] = np.inf
    rec[1, 1] = -0.0
    rec[3, 3] = np.nan
    idx = jnp.asarray(rng.integers(0, 100, size=(7, 11)), jnp.int32)
    for part_rows in (100, 64, 33, 7):
        out = np.asarray(gather_rows_parts(jnp.asarray(rec), idx, part_rows))
        np.testing.assert_array_equal(
            out.view(np.uint32), rec[np.asarray(idx)].view(np.uint32),
            err_msg=f"part_rows={part_rows}",
        )


def test_subcenter_cull_exact():
    """The sub-center cull (triangle_setup_from_verts) may only drop
    triangles whose EXACT vertex hull contains no pixel center: over random
    meshes incl. sub-pixel slivers, every culled triangle must fail the
    float64 hull-center test, and every kept+valid triangle's coverage is
    unchanged.  (Measured on pica_pica: the cull drops 82% of light-space
    shadow triangles at 256^2 with zero exact-hull violations -- the texels
    those slivers claimed came from f32 edge-function noise on triangles
    that miss every center in exact arithmetic.)"""
    from unclerenderer_tpu.ops import raster as rm

    rng = np.random.default_rng(7)
    w = h = 64
    n = 4000
    # mix: many sub-pixel slivers (thin in x or y), some normal triangles
    ctr = rng.uniform(0, w, (n, 2))
    dx = np.where(rng.random(n) < 0.5, rng.uniform(0.01, 0.9, n), rng.uniform(1, 20, n))
    dy = np.where(rng.random(n) < 0.5, rng.uniform(0.01, 0.9, n), rng.uniform(1, 20, n))
    v0 = ctr + rng.uniform(-0.5, 0.5, (n, 2)) * np.stack([dx, dy], 1)
    v1 = ctr + rng.uniform(-0.5, 0.5, (n, 2)) * np.stack([dx, dy], 1)
    v2 = ctr + rng.uniform(-0.5, 0.5, (n, 2)) * np.stack([dx, dy], 1)

    def to_h(v):
        # pixel coords -> the homogeneous (X, Y, w=1) form the setup expects
        return jnp.asarray(
            np.concatenate([v, np.ones((n, 1))], 1).astype(np.float32)
        )

    z = jnp.asarray(rng.uniform(0.1, 0.9, n).astype(np.float32))
    mask = jnp.ones(n, bool)

    assert rm.SUBCENTER_CULL
    s_on = rm.triangle_setup_from_verts(
        to_h(v0), to_h(v1), to_h(v2), z, z, z, mask, rm.CULL_NONE, w, h)
    rm.SUBCENTER_CULL = False
    try:
        s_off = rm.triangle_setup_from_verts(
            to_h(v0), to_h(v1), to_h(v2), z, z, z, mask, rm.CULL_NONE, w, h)
    finally:
        rm.SUBCENTER_CULL = True

    culled = np.asarray(s_off.valid) & ~np.asarray(s_on.valid)
    assert culled.sum() > 100  # slivers are actually being culled
    # exact f64 hull-center test for every culled triangle
    xs = np.stack([v0[:, 0], v1[:, 0], v2[:, 0]], 1)
    ys = np.stack([v0[:, 1], v1[:, 1], v2[:, 1]], 1)
    cx = np.ceil(xs.min(1) - 0.5) + 0.5
    cy = np.ceil(ys.min(1) - 0.5) + 0.5
    has_center = (cx <= xs.max(1)) & (cy <= ys.max(1))
    bad = culled & has_center
    assert bad.sum() == 0, f"cull dropped {bad.sum()} triangles with an exact-hull center"

    # and rasterization with the cull differs from without ONLY on pixels
    # won by exact-miss slivers (f32 edge noise); no pixel may LOSE coverage
    # to background unless its winner was such a sliver
    d_on, t_on = rm.rasterize(s_on, w, h, tile_h=16, tile_w=64, chunk=32)
    d_off, t_off = rm.rasterize(s_off, w, h, tile_h=16, tile_w=64, chunk=32)
    diff = np.asarray(t_on) != np.asarray(t_off)
    t_off_np = np.asarray(t_off)
    for yy, xx in zip(*np.nonzero(diff)):
        old_winner = t_off_np[yy, xx]
        assert old_winner >= 0 and not has_center[old_winner]


def test_compaction_cap_auto_policy():
    """Auto camera cap must never be a window the bench orbit's measured
    visible set (~97k after the sub-center cull at the 263k tier) can
    overflow: 163840 (split16 window), off under the f32 cliff, off for
    masked scenes, off when half the scene could plausibly be visible."""
    import dataclasses

    from unclerenderer_tpu.render.common import (
        compaction_cap, shadow_compaction_cap,
    )
    from unclerenderer_tpu.render.params import RenderSettings

    s = RenderSettings(has_masked_models=False)
    assert compaction_cap(s, 90_000) == 0          # already under the cliff
    assert compaction_cap(s, 263_184) == 163_840   # split16 window
    assert compaction_cap(s, 400_000) == 0         # drops plausible -> off
    assert compaction_cap(
        dataclasses.replace(s, compact_cap=94_208), 263_184) == 94_208
    assert compaction_cap(
        dataclasses.replace(s, has_masked_models=True), 263_184) == 0
    # shadow cap: depth-only, id-free -- stays at the split16 window
    assert shadow_compaction_cap(s, 263_184) == 163_840
    assert shadow_compaction_cap(s, 90_000) == 0


def test_shadow_compaction_bit_exact_and_overflow():
    """Light-space compaction in raster_shadow must leave the shadow map
    bit-identical (depth-only: ids never surface, compaction only reorders
    the min-depth reduction's inputs), and casters dropped past the cap must
    be counted, never silent."""
    import dataclasses

    import jax

    from unclerenderer_tpu.render import common
    from unclerenderer_tpu.render.params import RenderSettings
    from unclerenderer_tpu.render.testing import (
        synthetic_device_scene,
        synthetic_frame_params,
    )

    scene, data = synthetic_device_scene(8, sphere_res=(10, 8), ground=True)
    params = synthetic_frame_params(data, 64, 64)
    base = RenderSettings(
        width=64, height=64, shadow_map_size=128, raster_backend="xla"
    )
    opaque, _ = common.tri_draw_masks(scene, params.model_visible)
    t_count = int(scene.position.shape[0]) // 3

    def shadow(settings):
        d, ov = jax.jit(
            lambda sc, l, mk: common.raster_shadow(sc, l, mk, settings)
        )(scene, params.light_view_proj, opaque)
        return np.asarray(d), int(ov)

    d_off, ov_off = shadow(dataclasses.replace(base, shadow_compact_cap=0))
    assert ov_off == 0

    # light-space valid count (front-cull + subcenter) sizes the caps.
    # Derived through raster_shadow's own jitted pipeline (an eager setup
    # recomputation can flip a few sliver-cull edge cases by f32 fusion
    # differences): overflow at a small cap = valid - cap.
    probe_cap = 32
    _d, ov_probe = shadow(
        dataclasses.replace(base, shadow_compact_cap=probe_cap)
    )
    n_valid = probe_cap + ov_probe
    assert probe_cap < n_valid < t_count

    # roomy cap: parity must be bit-exact, zero overflow
    d_on, ov_on = shadow(
        dataclasses.replace(base, shadow_compact_cap=n_valid + 8)
    )
    assert ov_on == 0
    np.testing.assert_array_equal(d_on, d_off)

    # tight cap: every dropped caster is counted
    drop = 5
    _d, ov_tight = shadow(
        dataclasses.replace(base, shadow_compact_cap=n_valid - drop)
    )
    assert ov_tight == drop


def test_binning_split16_coef_window_bit_exact():
    """bin_triangles' coefficient gather switches to the bit-exact 16-bit
    split gather in the (94208, 163840] table-row window (gather law); the
    produced blocks must be identical to the plain-gather path."""
    from unclerenderer_tpu.ops.binning import bin_triangles
    from unclerenderer_tpu.ops.raster import RasterSetup

    rng = np.random.default_rng(7)
    t_small = 512
    coef = rng.normal(size=(t_small, 16)).astype(np.float32)
    bbox = np.zeros((4, t_small), np.float32)
    bbox[0] = rng.uniform(0, 50, t_small)
    bbox[1] = rng.uniform(0, 50, t_small)
    bbox[2] = bbox[0] + rng.uniform(0, 10, t_small)
    bbox[3] = bbox[1] + rng.uniform(0, 10, t_small)
    valid = rng.uniform(size=t_small) < 0.8

    def blocks(t_rows):
        # place the same triangles in a table of t_rows rows (tail invalid);
        # only the table SIZE changes, so outputs must agree on the shared
        # prefix ids
        c = np.zeros((t_rows, 16), np.float32)
        c[:t_small] = coef
        b = np.zeros((4, t_rows), np.float32)
        b[:, :t_small] = bbox
        v = np.zeros(t_rows, bool)
        v[:t_small] = valid
        st = RasterSetup(
            coef=jnp.asarray(c), valid=jnp.asarray(v), bbox=jnp.asarray(b)
        )
        out = bin_triangles(st, 64, 64, 16, 64, 32)
        return np.asarray(out.coef), np.asarray(out.tri_id), np.asarray(out.valid)

    c_plain, t_plain, v_plain = blocks(94208)      # plain-gather path
    c_split, t_split, v_split = blocks(94209)      # split16 window path
    np.testing.assert_array_equal(t_plain, t_split)
    np.testing.assert_array_equal(v_plain, v_split)
    np.testing.assert_array_equal(
        c_plain.view(np.uint32), c_split.view(np.uint32)
    )


def test_setup_from_soa_matches_expanded():
    """triangle_setup_from_soa is the SAME core math as
    triangle_setup_expanded -- given equal component values the coefficient
    records, valid masks, and bboxes are bit-identical (the SoA vertex stage
    only changes the layout feeding it)."""
    from unclerenderer_tpu.ops.raster import (
        VertexSoA,
        triangle_setup_expanded,
        triangle_setup_from_soa,
    )

    rng = np.random.default_rng(11)
    t = 97
    pix_h = rng.normal(0, 40.0, (3 * t, 3)).astype(np.float32) + np.array(
        [32.0, 32.0, 2.0], np.float32
    )
    # a few behind-camera / degenerate w rows exercise the bbox fallbacks
    pix_h[5::17, 2] = -0.5
    pix_h[7::31, 2] = 0.0
    z = rng.uniform(0, 1, 3 * t).astype(np.float32)
    mask = rng.uniform(size=t) > 0.2

    a = triangle_setup_expanded(
        jnp.asarray(pix_h), jnp.asarray(z), jnp.asarray(mask), CULL_BACK, W, H
    )
    p = pix_h.reshape(t, 3, 3)
    zz = z.reshape(t, 3)
    v = VertexSoA(
        px=tuple(jnp.asarray(p[:, i, 0]) for i in range(3)),
        py=tuple(jnp.asarray(p[:, i, 1]) for i in range(3)),
        pw=tuple(jnp.asarray(p[:, i, 2]) for i in range(3)),
        z=tuple(jnp.asarray(zz[:, i]) for i in range(3)),
    )
    b = triangle_setup_from_soa(v, jnp.asarray(mask), CULL_BACK, W, H)
    np.testing.assert_array_equal(
        np.asarray(a.coef).view(np.uint32), np.asarray(b.coef).view(np.uint32)
    )
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.bbox), np.asarray(b.bbox))
    # pix9 row layout matches pix_h.reshape(T, 9) exactly
    np.testing.assert_array_equal(np.asarray(v.pix9()), pix_h.reshape(t, 9))


def test_compact_mask_scatter_matches_sort():
    """compact_mask's two formulations (packed sort vs cumsum+scatter) are
    interchangeable: identical ids and validity at every cap, including
    overflow and all-False masks."""
    import numpy as np

    from unclerenderer_tpu.ops.raster import compact_mask

    rng = np.random.default_rng(3)
    for tc, cap, p in [(997, 64, 0.3), (4096, 4096, 0.5), (2048, 16, 0.9),
                       (64, 32, 0.0)]:
        m = jnp.asarray(rng.random(tc) < p)
        ids_a, ok_a = compact_mask(m, min(cap, tc), "sort")
        ids_b, ok_b = compact_mask(m, min(cap, tc), "scatter")
        np.testing.assert_array_equal(np.asarray(ok_a), np.asarray(ok_b))
        np.testing.assert_array_equal(
            np.where(np.asarray(ok_a), np.asarray(ids_a), 0),
            np.where(np.asarray(ok_b), np.asarray(ids_b), 0),
        )


def test_compact_mask_shift_matches_sort():
    """The log-step shift compaction (mode="shift") is interchangeable with
    the packed sort: identical validity and masked ids at every cap,
    including overflow, all-False and all-True masks (round-5 formulation;
    collision-freeness argument in the compact_mask docstring)."""
    import numpy as np

    from unclerenderer_tpu.ops.raster import compact_mask

    rng = np.random.default_rng(7)
    for tc, cap, p in [(997, 64, 0.3), (4096, 4096, 0.5), (2048, 16, 0.9),
                       (64, 32, 0.0), (128, 128, 1.0), (1000, 2000, 0.4)]:
        m = jnp.asarray(rng.random(tc) < p)
        ids_a, ok_a = compact_mask(m, min(cap, tc), "sort")
        ids_b, ok_b = compact_mask(m, min(cap, tc), "shift")
        np.testing.assert_array_equal(np.asarray(ok_a), np.asarray(ok_b))
        np.testing.assert_array_equal(
            np.where(np.asarray(ok_a), np.asarray(ids_a), 0),
            np.where(np.asarray(ok_b), np.asarray(ids_b), 0),
        )


def test_binned_raster_compact_scatter_bit_exact():
    """rasterize_binned(compact_mode="scatter") reproduces the sort-mode
    image bit-for-bit (the mid/giant level compactions flow through it)."""
    import numpy as np

    from unclerenderer_tpu.ops.pallas_raster import rasterize_binned
    from tests.test_pallas_kernels import _setup

    setup = _setup(60, seed=7, size=0.4)
    kw = dict(tile_h=16, tile_w=64, chunk=32, big_tile_h=32, big_tile_w=128,
              big_chunk=32, mid_divisor=2, giant_divisor=4, interpret=True)
    d1, i1, _ = rasterize_binned(setup, 256, 256, compact_mode="sort", **kw)
    d2, i2, _ = rasterize_binned(setup, 256, 256, compact_mode="scatter", **kw)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
