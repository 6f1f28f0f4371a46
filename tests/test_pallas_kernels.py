"""Pallas raster kernels cross-checked against the XLA rasterize() via the
Pallas interpreter (runs on the CI CPU; the same kernel code compiles with
Mosaic on TPU).  Covers the brute-force kernel, the three-level binned
kernel, depth-tie determinism, and the overflow counters (SURVEY.md section 4
plan item (c); VERDICT round-1 items 3/5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from unclerenderer_tpu.ops.binning import _sort_pairs, bin_triangles
from unclerenderer_tpu.ops.pallas_raster import rasterize_binned, rasterize_pallas
from unclerenderer_tpu.ops.raster import (
    CULL_NONE,
    DEPTH_MAX,
    DEPTH_MIN,
    rasterize,
    triangle_setup,
    viewport_homogeneous,
)


def _setup(n=100, seed=0, w=256, h=256, size=0.05, z=None):
    rng = np.random.default_rng(seed)
    ctr = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    ctr[:, 2] = rng.uniform(0.1, 0.9, n) if z is None else z
    d1 = rng.normal(0, size, (n, 3)).astype(np.float32)
    d2 = rng.normal(0, size, (n, 3)).astype(np.float32)
    v = np.stack([ctr - d1, ctr + d2, ctr + d1], 1).reshape(-1, 3)
    clip = jnp.asarray(
        np.concatenate([v[:, :2], v[:, 2:3], np.ones((3 * n, 1), np.float32)], 1)
    )
    tris = jnp.arange(3 * n, dtype=jnp.int32).reshape(n, 3)
    pix_h = viewport_homogeneous(clip, w, h)
    return triangle_setup(pix_h, clip[:, 2], tris, jnp.ones(n, bool), CULL_NONE, w, h)


def _assert_same(pl_out, xla_out):
    d_p, i_p = np.asarray(pl_out[0]), np.asarray(pl_out[1])
    d_x, i_x = np.asarray(xla_out[0]), np.asarray(xla_out[1])
    np.testing.assert_array_equal(i_p, i_x)
    np.testing.assert_array_equal(d_p, d_x)


@pytest.mark.parametrize("onepass", [False, True])
@pytest.mark.parametrize("size,depth_mode", [(0.05, DEPTH_MAX), (0.3, DEPTH_MAX), (0.05, DEPTH_MIN)])
def test_rasterize_pallas_matches_xla(size, depth_mode, onepass):
    """Both grid shapes -- the 2D (tiles x chunks) grid and the one-pass
    in-kernel chunk loop (the giant-level production path) -- must match
    the XLA raster bit-for-bit."""
    setup = _setup(80, seed=1, size=size)
    got = rasterize_pallas(
        setup, 256, 256, tile_h=16, tile_w=64, chunk=32,
        depth_mode=depth_mode, interpret=True, onepass=onepass,
    )
    want = rasterize(setup, 256, 256, tile_h=16, tile_w=64, chunk=32, depth_mode=depth_mode)
    _assert_same(got, want)


def test_rasterize_pallas_onepass_depth_only_matches():
    """want_ids=False (the shadow giant level) on the one-pass grid."""
    setup = _setup(60, seed=4, size=0.3)
    from unclerenderer_tpu.ops.raster import flip_depth_key

    raw_1p, _ = rasterize_pallas(
        flip_depth_key(setup), 256, 256, tile_h=16, tile_w=64, chunk=32,
        want_ids=False, interpret=True, onepass=True,
    )
    raw_2d, _ = rasterize_pallas(
        flip_depth_key(setup), 256, 256, tile_h=16, tile_w=64, chunk=32,
        want_ids=False, interpret=True, onepass=False,
    )
    np.testing.assert_array_equal(np.asarray(raw_1p), np.asarray(raw_2d))


@pytest.mark.parametrize("seed,n,size", [(0, 150, 0.04), (2, 60, 0.2), (3, 40, 0.6)])
def test_rasterize_binned_matches_xla(seed, n, size):
    """Mixed triangle sizes exercise all three levels (fine bins, coarse
    bins, giant brute force) and their merges."""
    setup = _setup(n, seed=seed, size=size)
    d, i, stats = rasterize_binned(
        setup, 256, 256, tile_h=16, tile_w=64, chunk=32,
        big_tile_h=32, big_tile_w=128, big_chunk=32,
        mid_divisor=2, giant_divisor=4, interpret=True,
    )
    want = rasterize(setup, 256, 256, tile_h=16, tile_w=64, chunk=32)
    _assert_same((d, i), want)
    assert int(stats["pair_overflow"]) == 0
    assert int(stats["giant_truncated"]) == 0


def test_binned_depth_tie_breaks_to_min_id():
    """Coplanar identical triangles at every level must resolve to the min
    triangle id, matching XLA (argmax-first) semantics run-to-run."""
    # three identical small triangles + three identical giant ones
    tri_small = np.array([[10.0, 10.0, 0.5], [40.0, 10.0, 0.5], [10.0, 40.0, 0.5]], np.float32)
    tri_big = np.array([[0.0, 0.0, 0.7], [250.0, 0.0, 0.7], [0.0, 250.0, 0.7]], np.float32)
    v = np.concatenate([np.tile(tri_small, (3, 1)), np.tile(tri_big, (3, 1))])
    # to clip space: x_ndc = 2x/w - 1, y_ndc = 1 - 2y/h at w=1
    clip = np.stack(
        [v[:, 0] / 128.0 - 1.0, 1.0 - v[:, 1] / 128.0, v[:, 2], np.ones(len(v), np.float32)],
        axis=1,
    )
    tris = jnp.arange(len(v), dtype=jnp.int32).reshape(-1, 3)
    pix_h = viewport_homogeneous(jnp.asarray(clip), 256, 256)
    setup = triangle_setup(
        pix_h, jnp.asarray(clip[:, 2]), tris, jnp.ones(6, bool), CULL_NONE, 256, 256
    )
    d, i, _ = rasterize_binned(
        setup, 256, 256, tile_h=16, tile_w=64, chunk=32,
        mid_divisor=2, giant_divisor=2, interpret=True,
    )
    want_d, want_i = rasterize(setup, 256, 256, tile_h=16, tile_w=64, chunk=32)
    _assert_same((d, i), (want_d, want_i))
    ids = np.unique(np.asarray(i))
    # winners are exactly the first of each identical group (and background)
    assert set(ids.tolist()) <= {-1, 0, 3}


def test_bin_budget_overflow_is_counted_not_garbage():
    """With a starved block budget, dropped pairs must be counted and the
    output must stay a subset of the exhaustive raster -- never garbage from
    uninitialized tiles (round-1 ADVICE: tile_used gating)."""
    # n_blocks floors at n_tiles, so overflow needs tiles demanding multiple
    # blocks: 2000 small triangles over 64 tiles at chunk 32 want ~4 each
    setup = _setup(2000, seed=5, size=0.04)
    bins = bin_triangles(setup, 256, 256, 16, 64, 32, budget_factor=0.001)
    assert int(np.asarray(bins.overflow)) > 0
    tile_used = np.asarray(bins.tile_used)
    blk_tile = np.asarray(bins.blk_tile)
    n_blocks = blk_tile.shape[0]
    # every used tile must own at least one materialized (in-budget) block
    first_flags = np.asarray(bins.blk_first)
    covered = set(blk_tile[(first_flags == 1)].tolist())
    for t in np.nonzero(tile_used)[0]:
        assert int(t) in covered, f"tile {t} marked used but no block writes it"

    d, i, stats = rasterize_binned(
        setup, 256, 256, tile_h=16, tile_w=64, chunk=32,
        budget_factor=0.001, interpret=True,
    )
    want_d, want_i = rasterize(setup, 256, 256, tile_h=16, tile_w=64, chunk=32)
    d, i = np.asarray(d), np.asarray(i)
    want_d, want_i = np.asarray(want_d), np.asarray(want_i)
    assert int(stats["pair_overflow"]) > 0
    # subset property: pixels either match the full raster or show geometry
    # that is *behind* it (a dropped nearer triangle), never garbage
    t_count = 2000
    assert np.all(i >= -1) and np.all(i < t_count)
    assert np.all(d <= want_d + 1e-6)
    same = i == want_i
    np.testing.assert_array_equal(d[same], want_d[same])


def test_giant_truncation_counted():
    setup = _setup(64, seed=7, size=0.8)  # most triangles giant
    d, i, stats = rasterize_binned(
        setup, 256, 256, tile_h=16, tile_w=64, chunk=32,
        big_chunk=32, mid_divisor=64, giant_divisor=64, interpret=True,
    )
    # caps of 32 (big_chunk floor) against ~40+ giants must truncate
    n_giant = int(stats["giant_truncated"])
    assert n_giant > 0
    assert np.all(np.asarray(i) < 64)


def test_sort_pairs_matches_stable_argsort():
    rng = np.random.default_rng(11)
    for n_tiles, n_pairs in [(64, 4096), (2048, 100_000), (4095, 1 << 20)]:
        keys = rng.integers(0, n_tiles + 1, n_pairs).astype(np.int32)
        sk, st = _sort_pairs(jnp.asarray(keys), n_tiles, 4)
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(np.asarray(sk), keys[order])
        np.testing.assert_array_equal(np.asarray(st), order // 4)


@pytest.mark.parametrize("size", [256, 4096])
def test_shadow_blocks_matches_reference(size):
    """Superblock PCF (fast-gather f32 table + Pallas lane select) must
    reproduce the packed-tail semantics with unquantized f32 depths.
    size=256 covers the square-block 128-lane f32 path; size=4096 (the
    reference's shadow resolution) covers the wide 8x16-block 256-lane
    path with the 16-bit split gather (131k rows > the f32 cliff).  The
    want below feeds the shared _pcf_tail with directly-sliced depth
    planes, isolating the fetch machinery (superblock gather + lane
    select) as the only thing under test.  (The unpacked shadow_factor
    differs at map borders by construction -- it re-derives coordinates
    per tap; both packed layouts share the clamp-mask border.)"""
    from unclerenderer_tpu.ops.shadow import (
        _pcf_tail,
        _shadow_project,
        pack_shadow_blocks,
        shadow_factor_blocks,
    )

    rng = np.random.default_rng(3)
    shadow_map = jnp.asarray(rng.uniform(0.3, 1.0, (size, size)).astype(np.float32))
    # receivers spread over and beyond the map (border behavior included)
    world = jnp.asarray(rng.uniform(-8.0, 8.0, (64, 96, 3)).astype(np.float32))
    lvp = jnp.asarray(
        np.array(
            [[0.15, 0.0, 0.0, 0.0],
             [0.0, -0.15, 0.02, 0.0],
             [0.01, 0.02, 0.08, 0.0],
             [0.0, 0.0, 0.55, 1.0]], np.float32)
    )
    padded = jnp.pad(shadow_map, ((0, 2), (0, 2)), constant_values=jnp.inf)
    for pcf in ("deferred", "forward"):
        uv, compare, fx, fy, xi, yi, xi0, yi0 = _shadow_project(
            world, lvp, size, jnp.float32(2e-3)
        )
        nb9 = [padded[yi0 + dy, xi0 + dx] for dy in range(3) for dx in range(3)]
        want = _pcf_tail(nb9, compare, fx, fy, uv, xi, yi, xi0, yi0, size,
                         jnp.float32(0.9), pcf)
        got = shadow_factor_blocks(
            pack_shadow_blocks(shadow_map), size, world, lvp,
            jnp.float32(0.9), jnp.float32(2e-3), pcf=pcf, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_superblock_u16_matches_quantized_oracle():
    """The u16 PCF table (round-5 staged experiment) must equal an oracle
    that performs the SAME ceil-quantized comparisons on directly-sliced
    planes -- i.e. the only divergence vs the f32 path is the documented
    quantization of the compare itself, not the fetch machinery.  Also
    bound the drift vs the f32 superblock path on the final factor."""
    from unclerenderer_tpu.ops.shadow import (
        _pcf_tail,
        _shadow_project,
        pack_shadow_blocks,
        pack_shadow_blocks_u16,
        shadow_factor_blocks,
    )

    size = 256
    rng = np.random.default_rng(9)
    shadow_map = jnp.asarray(rng.uniform(0.3, 1.0, (size, size)).astype(np.float32))
    world = jnp.asarray(rng.uniform(-8.0, 8.0, (48, 64, 3)).astype(np.float32))
    lvp = jnp.asarray(
        np.array(
            [[0.15, 0.0, 0.0, 0.0],
             [0.0, -0.15, 0.02, 0.0],
             [0.01, 0.02, 0.08, 0.0],
             [0.0, 0.0, 0.55, 1.0]], np.float32)
    )
    q = jnp.clip(jnp.ceil(shadow_map * 65535.0), 0.0, 65535.0)
    padded_q = jnp.pad(q, ((0, 2), (0, 2)), constant_values=65535.0)
    uv, compare, fx, fy, xi, yi, xi0, yi0 = _shadow_project(
        world, lvp, size, jnp.float32(2e-3)
    )
    cq = jnp.clip(jnp.ceil(compare * 65535.0), 0.0, 65536.0)
    nb9 = [padded_q[yi0 + dy, xi0 + dx] for dy in range(3) for dx in range(3)]
    want = _pcf_tail(nb9, cq, fx, fy, uv, xi, yi, xi0, yi0, size,
                     jnp.float32(0.9), "deferred")
    got = shadow_factor_blocks(
        pack_shadow_blocks_u16(shadow_map), size, world, lvp,
        jnp.float32(0.9), jnp.float32(2e-3), pcf="deferred", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # vs the f32 table: only boundary slivers may flip a tap; with 12k
    # receivers over a smooth random map the factor drift stays tiny
    got_f32 = shadow_factor_blocks(
        pack_shadow_blocks(shadow_map), size, world, lvp,
        jnp.float32(0.9), jnp.float32(2e-3), pcf="deferred", interpret=True,
    )
    diff = np.abs(np.asarray(got) - np.asarray(got_f32))
    assert (diff > 0).mean() < 0.01, f"u16 flipped {100 * (diff > 0).mean():.2f}% of pixels"


def test_depth_only_matches_full():
    """want_ids=False (shadow path) must produce the exact same depth as
    the full raster at both depth modes."""
    from unclerenderer_tpu.ops.raster import DEPTH_MIN

    setup = _setup(512, seed=5)
    for mode in (None, DEPTH_MIN):
        kw = {} if mode is None else {"depth_mode": mode}
        d_full, i_full, _ = rasterize_binned(
            setup, 256, 256, tile_h=16, tile_w=64, chunk=32, big_chunk=32,
            interpret=True, **kw,
        )
        d_only, i_none, _ = rasterize_binned(
            setup, 256, 256, tile_h=16, tile_w=64, chunk=32, big_chunk=32,
            interpret=True, want_ids=False, **kw,
        )
        assert i_none is None
        np.testing.assert_array_equal(np.asarray(d_only), np.asarray(d_full))


def test_fused_attr_emission_matches_gather():
    """records= attr emission: the winner's record selected in-kernel (MXU
    one-hot dot) across all three levels must equal records[tri_id] exactly
    (and zero where no triangle won)."""
    rng = np.random.default_rng(9)
    for seed, size in ((2, 0.08), (5, 0.4)):  # small tris / mid+giant spill
        setup = _setup(512, seed=seed, size=size)
        t_count = 512
        records = jnp.asarray(rng.standard_normal((t_count, 128)).astype(np.float32))
        d, i, stats, attr = rasterize_binned(
            setup, 256, 256, tile_h=16, tile_w=64, chunk=32, big_chunk=32,
            interpret=True, records=records,
        )
        d2, i2, _ = rasterize_binned(
            setup, 256, 256, tile_h=16, tile_w=64, chunk=32, big_chunk=32,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i2))
        ids = np.asarray(i)
        want = np.where(
            (ids >= 0)[..., None], np.asarray(records)[ids.clip(0)], 0.0
        )
        np.testing.assert_array_equal(np.asarray(attr), want)
        assert (ids >= 0).sum() > 500


def test_full_pallas_frame_matches_xla():
    """End-to-end deferred frame on the FULL Pallas path (binned raster,
    fused attribute resolve, superblock PCF) in interpret mode vs the XLA
    path.  depth/tri_id must match exactly; color within the shadow-table
    quantization difference (the pallas path compares f32 depths, the xla
    path f16)."""
    import dataclasses
    import functools

    import jax

    from unclerenderer_tpu.render.deferred import deferred_frame
    from unclerenderer_tpu.render.params import FrameState, RenderSettings
    from unclerenderer_tpu.render.testing import (
        synthetic_device_scene,
        synthetic_frame_params,
    )

    base = RenderSettings(
        renderer_type="deferred", enable_ibl=False, enable_sky=True,
        has_masked_models=True, width=128, height=128, shadow_map_size=64,
        tile_h=16, tile_w=64, chunk=32, shadow_chunk=32,
    )
    scene, data = synthetic_device_scene(6, with_masked=True)
    params = synthetic_frame_params(data, 128, 128)
    state = FrameState.initial(128, 128)

    outs = {}
    for backend in ("xla", "pallas"):
        s = dataclasses.replace(
            base, raster_backend=backend,
            pallas_interpret=(backend == "pallas"),
            fused_resolve="on" if backend == "pallas" else "auto",
        )
        out, _ = jax.jit(functools.partial(deferred_frame, settings=s))(
            scene, params, state
        )
        outs[backend] = {k: np.asarray(v) for k, v in out.items()
                         if hasattr(v, "shape")}
    np.testing.assert_array_equal(outs["pallas"]["tri_id"], outs["xla"]["tri_id"])
    np.testing.assert_array_equal(outs["pallas"]["depth"], outs["xla"]["depth"])
    assert (outs["pallas"]["tri_id"] >= 0).sum() > 300
    # color: identical resolve records; only the PCF depth representation
    # differs (f32 vs lifted-f16), which flips a few shadow-boundary
    # comparisons -- and through auto-exposure (a global EV scalar) shifts
    # every tonemapped pixel by a tiny amount.  Gate on pre-exposure HDR:
    # only true shadow flips may differ there.
    np.testing.assert_allclose(
        outs["pallas"]["color"], outs["xla"]["color"], atol=5e-2
    )
    hdr_mism = (
        np.abs(outs["pallas"]["hdr"] - outs["xla"]["hdr"]).max(-1) > 1e-5
    ).mean()
    assert hdr_mism < 0.05, f"too many differing HDR pixels: {hdr_mism:.3%}"


def test_full_pallas_forward_matches_xla():
    """Forward renderer on the full Pallas path (binned raster, fused
    resolve, superblock PCF) vs XLA, interpret mode."""
    import dataclasses
    import functools

    import jax

    from unclerenderer_tpu.render.forward import forward_frame
    from unclerenderer_tpu.render.params import RenderSettings
    from unclerenderer_tpu.render.testing import (
        synthetic_device_scene,
        synthetic_frame_params,
    )

    base = RenderSettings(
        renderer_type="forward", enable_ibl=False, enable_sky=False,
        has_masked_models=True, width=128, height=128, shadow_map_size=64,
        tile_h=16, tile_w=64, chunk=32, shadow_chunk=32,
        enable_taa=False, enable_cas=False, enable_auto_exposure=False,
    )
    scene, data = synthetic_device_scene(6, with_masked=True)
    params = synthetic_frame_params(data, 128, 128)
    outs = {}
    for backend in ("xla", "pallas"):
        s = dataclasses.replace(
            base, raster_backend=backend,
            pallas_interpret=(backend == "pallas"),
            fused_resolve="on" if backend == "pallas" else "auto",
        )
        out = jax.jit(functools.partial(forward_frame, settings=s))(scene, params)
        outs[backend] = {k: np.asarray(v) for k, v in out.items()
                         if hasattr(v, "shape")}
    np.testing.assert_array_equal(outs["pallas"]["tri_id"], outs["xla"]["tri_id"])
    assert (outs["pallas"]["tri_id"] >= 0).sum() > 300
    mism = (np.abs(outs["pallas"]["color"].astype(np.float32)
                   - outs["xla"]["color"].astype(np.float32)).max(-1) > 1e-4).mean()
    assert mism < 0.05, f"too many differing pixels: {mism:.3%}"


@pytest.mark.parametrize("soa", [False, True])
def test_sharded_pallas_slab_matches_singlechip(soa):
    """The Pallas y_offset slab path UNDER shard_map (2-device CPU mesh,
    interpret mode) reproduces the single-chip Pallas frame bit-for-bit --
    closes the gap where the sharded render was only CI-tested with the XLA
    raster backend (Mosaic cannot run on a virtual CPU mesh; interpret can).
    Parametrized over settings.soa_vertex: the SoA setup + dist slab
    combination has no other coverage."""
    import dataclasses
    import functools

    import jax

    from unclerenderer_tpu.parallel.multichip import (
        make_render_mesh,
        render_frame_multichip,
    )
    from unclerenderer_tpu.render.deferred import deferred_frame
    from unclerenderer_tpu.render.params import FrameState, RenderSettings
    from unclerenderer_tpu.render.testing import (
        synthetic_device_scene,
        synthetic_frame_params,
    )

    n = 2
    assert len(jax.devices()) >= n
    settings = RenderSettings(
        renderer_type="deferred", enable_ibl=False, enable_sky=False,
        width=64, height=32, shadow_map_size=32,
        tile_h=8, tile_w=64, chunk=32, shadow_chunk=32,
        raster_backend="pallas", pallas_interpret=True,
        enable_taa=False, enable_cas=False, enable_auto_exposure=False,
        has_masked_models=False, soa_vertex=soa,
    )
    scene, data = synthetic_device_scene(4, sphere_res=(8, 6))
    params = synthetic_frame_params(data, settings.width, settings.height)
    state_s = FrameState.initial(settings.width, settings.height)
    state_m = FrameState.initial(settings.width, settings.height)

    single = jax.jit(lambda sc, p, st: deferred_frame(sc, p, st, settings))
    mesh = make_render_mesh(jax.devices()[:n])
    multi = jax.jit(
        functools.partial(render_frame_multichip, settings=settings, mesh=mesh)
    )
    out_s, _ = single(scene, params, state_s)
    out_m, _ = multi(scene, params, state_m)
    np.testing.assert_array_equal(
        np.asarray(out_m["tri_id"]), np.asarray(out_s["tri_id"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_m["depth"]), np.asarray(out_s["depth"])
    )
    assert (np.asarray(out_s["tri_id"]) >= 0).sum() > 50
    np.testing.assert_allclose(
        np.asarray(out_m["color"]), np.asarray(out_s["color"]), atol=1e-5
    )


def test_binned_raster_mat_idx_bit_exact():
    """rasterize_binned(mat_idx=True) -- the Pallas-identity
    materialization boundary on the coef-gather indices -- reproduces the
    default image bit-for-bit."""
    setup = _setup(60, seed=9, size=0.3)
    kw = dict(tile_h=16, tile_w=64, chunk=32, big_tile_h=32, big_tile_w=128,
              big_chunk=32, mid_divisor=2, giant_divisor=4, interpret=True)
    d1, i1, _ = rasterize_binned(setup, 256, 256, mat_idx=False, **kw)
    d2, i2, _ = rasterize_binned(setup, 256, 256, mat_idx=True, **kw)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
