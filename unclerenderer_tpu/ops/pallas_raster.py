"""Pallas TPU rasterization kernel.

The XLA reference implementation (ops/raster.py) materializes
[tiles, pixels, 3*chunk] intermediates in HBM; this kernel keeps everything
in VMEM: grid = (tiles, triangle chunks), the visibility buffer lives in the
revisited output block as the reduction accumulator, chunk coefficient
blocks stream in via the automatic double-buffered BlockSpec pipeline, and a
scalar-prefetched tile x chunk overlap bitmap skips chunks whose triangle
bboxes miss the tile entirely (the Pallas analog of binning; real per-tile
triangle lists come on top of this).

Math and conventions are identical to ops/raster.py (same triangle_setup),
and the two implementations are cross-tested.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import DEPTH_MAX, RasterSetup


def _raster_kernel(
    # inputs
    overlap_ref,  # (1, 1, n_chunks) int32 in SMEM: per-chunk work bits for this tile
    ea_ref,   # (1, 3, chunk) edge a-coefficients (rows: e0, e1, e2)
    eb_ref,   # (1, 3, chunk)
    ec_ref,   # (1, 3, chunk)
    nz_ref,   # (1, 3, chunk) depth numerator coeffs (a, b, c rows)
    nw_ref,   # (1, 3, chunk)
    valid_ref,  # (1, 1, chunk) f32 (1 = valid)
    # outputs (blocked per tile, revisited across chunks)
    key_ref,  # (1, tile_h, tile_w) f32
    id_ref,   # (1, tile_h, tile_w) i32
    *,
    tile_h: int,
    tile_w: int,
    chunk: int,
    n_tx: int,
    y_offset: int,
):
    t = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        key_ref[...] = jnp.full((1, tile_h, tile_w), -1.0, jnp.float32)
        id_ref[...] = jnp.full((1, tile_h, tile_w), -1, jnp.int32)

    @pl.when(overlap_ref[0, 0, c] != 0)
    def _body():
        ty = t // n_tx
        tx = t % n_tx
        x0 = (tx * tile_w).astype(jnp.float32)
        y0 = (ty * tile_h).astype(jnp.float32) + float(y_offset)

        pix = tile_h * tile_w
        # Flat pixel coordinates (1, pix): lane dim = pixels.
        col_i = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
        qx = x0 + jnp.mod(col_i, tile_w).astype(jnp.float32) + 0.5
        qy = y0 + (col_i // tile_w).astype(jnp.float32) + 0.5

        def edge_vals(i):
            a = ea_ref[0, i, :][None, :]  # (1, chunk)
            b = eb_ref[0, i, :][None, :]
            cc = ec_ref[0, i, :][None, :]
            # (chunk, pix) = outer(a, qx) + outer(b, qy) + c
            ev = a.T * qx + b.T * qy + cc.T
            # top-left fill rule
            tl = (a.T > 0.0) | ((a.T == 0.0) & (b.T > 0.0))
            inside = (ev > 0.0) | ((ev == 0.0) & tl)
            return inside

        ok = edge_vals(0) & edge_vals(1) & edge_vals(2)

        nz = nz_ref[0, 0, :][None, :].T * qx + nz_ref[0, 1, :][None, :].T * qy + nz_ref[0, 2, :][None, :].T
        nw = nw_ref[0, 0, :][None, :].T * qx + nw_ref[0, 1, :][None, :].T * qy + nw_ref[0, 2, :][None, :].T
        depth = nz / jnp.where(nw != 0.0, nw, 1.0)
        ok = ok & (nw > 0.0) & (depth >= 0.0) & (depth <= 1.0)
        ok = ok & (valid_ref[0, 0, :][None, :].T > 0.0)

        key = jnp.where(ok, depth, -1.0)  # (chunk, pix)
        k_best = jnp.max(key, axis=0, keepdims=True)  # (1, pix)
        k_arg = jnp.argmax(key, axis=0).astype(jnp.int32)[None, :]

        acc_key = key_ref[...].reshape(1, pix)
        acc_id = id_ref[...].reshape(1, pix)
        better = k_best > acc_key
        new_key = jnp.where(better, k_best, acc_key)
        new_id = jnp.where(better, c * chunk + k_arg, acc_id)
        key_ref[...] = new_key.reshape(1, tile_h, tile_w)
        id_ref[...] = new_id.reshape(1, tile_h, tile_w)


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_h", "tile_w", "chunk", "depth_mode", "y_offset"
    ),
)
def rasterize_pallas(
    setup: RasterSetup,
    width: int,
    height: int,
    tile_h: int = 32,
    tile_w: int = 128,
    chunk: int = 256,
    depth_mode: int = DEPTH_MAX,
    y_offset: int = 0,
):
    """Drop-in replacement for ops.raster.rasterize on TPU."""
    pad_w = -(-width // tile_w) * tile_w
    pad_h = -(-height // tile_h) * tile_h
    n_ty, n_tx = pad_h // tile_h, pad_w // tile_w
    n_tiles = n_ty * n_tx

    t = setup.edges.shape[0]
    n_chunks = max(1, -(-t // chunk))
    t_pad = n_chunks * chunk

    def pad(x, fill=0):
        pad_n = t_pad - x.shape[0]
        if pad_n == 0:
            return x
        cfg = [(0, pad_n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    # For DEPTH_MIN (shadow) flip the key so the kernel's max is a min.
    num_z = setup.num_z
    if depth_mode != DEPTH_MAX:
        # key = 1 - depth = (nw - nz) / nw
        num_z = setup.num_w - setup.num_z

    edges = pad(setup.edges)  # (T, 3, 3)
    # layout: (n_chunks, 3 coeff-rows, chunk) with coefficient split by a/b/c
    ea = edges[..., 0].reshape(n_chunks, chunk, 3).transpose(0, 2, 1)
    eb = edges[..., 1].reshape(n_chunks, chunk, 3).transpose(0, 2, 1)
    ec = edges[..., 2].reshape(n_chunks, chunk, 3).transpose(0, 2, 1)
    nz = pad(num_z).reshape(n_chunks, chunk, 3).transpose(0, 2, 1)
    nw = pad(setup.num_w).reshape(n_chunks, chunk, 3).transpose(0, 2, 1)
    valid = pad(setup.valid.astype(jnp.float32)).reshape(n_chunks, 1, chunk)

    # tile x chunk overlap bitmap (computed in XLA; tiny).
    bbox = pad(setup.bbox).reshape(n_chunks, chunk, 4)
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tx0 = (tile_ids % n_tx * tile_w).astype(jnp.float32)
    ty0 = (tile_ids // n_tx * tile_h).astype(jnp.float32) + y_offset
    ov = (
        (bbox[None, :, :, 0] <= (tx0[:, None, None] + (tile_w - 1)))
        & (bbox[None, :, :, 2] >= tx0[:, None, None])
        & (bbox[None, :, :, 1] <= (ty0[:, None, None] + (tile_h - 1)))
        & (bbox[None, :, :, 3] >= ty0[:, None, None])
    )
    ov = ov & pad(setup.valid, fill=False).reshape(n_chunks, chunk)[None]
    overlap = jnp.any(ov, axis=2).astype(jnp.int32)[:, None, :]  # (n_tiles, 1, n_chunks)

    grid_spec = pl.GridSpec(
        grid=(n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, n_chunks), lambda t, c: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, chunk), lambda t, c: (c, 0, 0)),
            pl.BlockSpec((1, 3, chunk), lambda t, c: (c, 0, 0)),
            pl.BlockSpec((1, 3, chunk), lambda t, c: (c, 0, 0)),
            pl.BlockSpec((1, 3, chunk), lambda t, c: (c, 0, 0)),
            pl.BlockSpec((1, 3, chunk), lambda t, c: (c, 0, 0)),
            pl.BlockSpec((1, 1, chunk), lambda t, c: (c, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, tile_w), lambda t, c: (t, 0, 0)),
            pl.BlockSpec((1, tile_h, tile_w), lambda t, c: (t, 0, 0)),
        ],
    )

    kernel = partial(
        _raster_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        chunk=chunk,
        n_tx=n_tx,
        y_offset=int(y_offset),
    )
    best_key, best_id = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.int32),
        ],
    )(overlap, ea, eb, ec, nz, nw, valid)

    hit = best_key >= 0.0
    if depth_mode == DEPTH_MAX:
        depth = jnp.where(hit, best_key, 0.0)
    else:
        depth = jnp.where(hit, 1.0 - best_key, 1.0)
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


# ---------------------------------------------------------------------------
# Binned rasterization: 1D grid over bin blocks (ops/binning.py layout).
# ---------------------------------------------------------------------------


def _binned_kernel(
    # scalar prefetch
    blk_tile_ref,   # (n_blocks,) i32
    blk_first_ref,  # (n_blocks,) i32
    # blocked inputs
    ea_ref, eb_ref, ec_ref, nz_ref, nw_ref,  # (1, 3, chunk)
    tid_ref,    # (1, 1, chunk) i32
    valid_ref,  # (1, 1, chunk) f32
    # outputs (revisited across consecutive blocks of the same tile)
    key_ref,  # (1, 1, pix) f32
    id_ref,   # (1, 1, pix) i32
    *,
    tile_h: int,
    tile_w: int,
    chunk: int,
    n_tx: int,
    y_offset: int,
):
    b = pl.program_id(0)
    pix = tile_h * tile_w

    @pl.when(blk_first_ref[b] == 1)
    def _init():
        key_ref[...] = jnp.full((1, 1, pix), -1.0, jnp.float32)
        id_ref[...] = jnp.full((1, 1, pix), -1, jnp.int32)

    t = blk_tile_ref[b]
    ty = t // n_tx
    tx = t % n_tx
    x0 = (tx * tile_w).astype(jnp.float32)
    y0 = (ty * tile_h).astype(jnp.float32) + float(y_offset)

    col_i = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    qx = x0 + jnp.mod(col_i, tile_w).astype(jnp.float32) + 0.5
    qy = y0 + (col_i // tile_w).astype(jnp.float32) + 0.5

    def edge_inside(i):
        a = ea_ref[0, i, :][None, :]
        bb = eb_ref[0, i, :][None, :]
        cc = ec_ref[0, i, :][None, :]
        ev = a.T * qx + bb.T * qy + cc.T
        tl = (a.T > 0.0) | ((a.T == 0.0) & (bb.T > 0.0))
        return (ev > 0.0) | ((ev == 0.0) & tl)

    ok = edge_inside(0) & edge_inside(1) & edge_inside(2)
    nzv = nz_ref[0, 0, :][None, :].T * qx + nz_ref[0, 1, :][None, :].T * qy + nz_ref[0, 2, :][None, :].T
    nwv = nw_ref[0, 0, :][None, :].T * qx + nw_ref[0, 1, :][None, :].T * qy + nw_ref[0, 2, :][None, :].T
    depth = nzv / jnp.where(nwv != 0.0, nwv, 1.0)
    ok = ok & (nwv > 0.0) & (depth >= 0.0) & (depth <= 1.0)
    ok = ok & (valid_ref[0, 0, :][None, :].T > 0.0)

    key = jnp.where(ok, depth, -1.0)
    k_best = jnp.max(key, axis=0, keepdims=True)
    # winning *global* triangle id: min id among rows tied at the max key
    # (select + reduce instead of a gather, which Mosaic can't vectorize).
    ids_col = tid_ref[0, 0, :][None, :].T  # (chunk, 1)
    big_id = jnp.int32(0x7FFFFFFF)
    k_id = jnp.min(
        jnp.where((key == k_best) & ok, ids_col, big_id), axis=0, keepdims=True
    )

    acc_key = key_ref[0]  # (1, pix)
    acc_id = id_ref[0]
    better = k_best > acc_key
    key_ref[0] = jnp.where(better, k_best, acc_key)
    id_ref[0] = jnp.where(better, k_id, acc_id)


def _run_binned_kernel(bins, width, height, tile_h, tile_w, chunk, y_offset):
    """Launch the binned kernel for one level; returns (key_img, id_img)
    cropped to (height, width), key = -1 where empty."""
    pad_w = -(-width // tile_w) * tile_w
    pad_h = -(-height // tile_h) * tile_h
    n_ty, n_tx = pad_h // tile_h, pad_w // tile_w
    n_tiles = n_ty * n_tx
    n_blocks = bins.ea.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 3, chunk), lambda b, bt, bf: (b, 0, 0)),
            pl.BlockSpec((1, 3, chunk), lambda b, bt, bf: (b, 0, 0)),
            pl.BlockSpec((1, 3, chunk), lambda b, bt, bf: (b, 0, 0)),
            pl.BlockSpec((1, 3, chunk), lambda b, bt, bf: (b, 0, 0)),
            pl.BlockSpec((1, 3, chunk), lambda b, bt, bf: (b, 0, 0)),
            pl.BlockSpec((1, 1, chunk), lambda b, bt, bf: (b, 0, 0)),
            pl.BlockSpec((1, 1, chunk), lambda b, bt, bf: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_h * tile_w), lambda b, bt, bf: (bt[b], 0, 0)),
            pl.BlockSpec((1, 1, tile_h * tile_w), lambda b, bt, bf: (bt[b], 0, 0)),
        ],
    )
    kernel = partial(
        _binned_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        chunk=chunk,
        n_tx=n_tx,
        y_offset=int(y_offset),
    )
    best_key, best_id = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, tile_h * tile_w), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, tile_h * tile_w), jnp.int32),
        ],
    )(
        bins.blk_tile,
        bins.blk_first,
        bins.ea, bins.eb, bins.ec, bins.nz, bins.nw,
        bins.tri_id, bins.valid,
    )

    # tiles never visited hold garbage -> mask by usage
    used = bins.tile_used[:, None, None]
    best_key = jnp.where(used, best_key, -1.0).reshape(n_tiles, tile_h, tile_w)
    best_id = jnp.where(used, best_id, -1).reshape(n_tiles, tile_h, tile_w)

    key_img = (
        best_key.reshape(n_ty, n_tx, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(pad_h, pad_w)[:height, :width]
    )
    id_img = (
        best_id.reshape(n_ty, n_tx, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(pad_h, pad_w)[:height, :width]
    )
    return key_img, id_img


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_h", "tile_w", "chunk", "depth_mode", "y_offset",
        "max_span", "budget_factor", "big_tile_h", "big_tile_w", "big_chunk",
    ),
)
def rasterize_binned(
    setup: RasterSetup,
    width: int,
    height: int,
    tile_h: int = 16,
    tile_w: int = 64,
    chunk: int = 128,
    depth_mode: int = DEPTH_MAX,
    y_offset: int = 0,
    max_span: int = 2,
    budget_factor: float = 3.0,
    big_tile_h: int = 32,
    big_tile_w: int = 128,
    big_chunk: int = 64,
):
    """Binned visibility raster, three levels merged by depth key:

    1. fine tiles + sorted per-tile lists for small triangles,
    2. coarse tiles + lists for medium triangles,
    3. brute-force kernel for the remaining giant ones (walls, floors).

    Work scales with (pairs x tile pixels) instead of (tiles x triangles).
    """
    from .binning import bin_triangles

    num_z = setup.num_z
    if depth_mode != DEPTH_MAX:
        num_z = setup.num_w - setup.num_z

    bins = bin_triangles(
        setup, num_z, width, height, tile_h, tile_w, chunk,
        max_span=max_span, budget_factor=budget_factor,
    )
    key_img, id_img = _run_binned_kernel(
        bins, width, height, tile_h, tile_w, chunk, y_offset
    )

    # Medium triangles: second binning level with coarse tiles.
    mid_setup = RasterSetup(
        edges=setup.edges,
        num_z=setup.num_z,
        num_w=setup.num_w,
        valid=bins.big_mask,
        bbox=setup.bbox,
    )
    mid_bins = bin_triangles(
        mid_setup, num_z, width, height, big_tile_h, big_tile_w, big_chunk,
        max_span=4, budget_factor=2.0,
    )
    mid_key, mid_id = _run_binned_kernel(
        mid_bins, width, height, big_tile_h, big_tile_w, big_chunk, y_offset
    )
    take_mid = mid_key > key_img
    key_img = jnp.where(take_mid, mid_key, key_img)
    id_img = jnp.where(take_mid, mid_id, id_img)

    # Remaining giant triangles (walls/floors): brute-force, few by now.
    giant_setup = RasterSetup(
        edges=setup.edges,
        num_z=setup.num_z,
        num_w=setup.num_w,
        valid=mid_bins.big_mask,
        bbox=setup.bbox,
    )
    big_depth, big_id = rasterize_pallas(
        giant_setup, width, height,
        tile_h=big_tile_h, tile_w=big_tile_w, chunk=32,
        depth_mode=depth_mode, y_offset=y_offset,
    )
    big_key = big_depth if depth_mode == DEPTH_MAX else (1.0 - big_depth)
    big_key = jnp.where(big_id >= 0, big_key, -1.0)

    take_big = big_key > key_img
    key_img = jnp.where(take_big, big_key, key_img)
    id_img = jnp.where(take_big, big_id, id_img)

    hit = key_img >= 0.0
    if depth_mode == DEPTH_MAX:
        depth = jnp.where(hit, key_img, 0.0)
    else:
        depth = jnp.where(hit, 1.0 - key_img, 1.0)
    tri_id = jnp.where(hit, id_img, -1)
    return depth, tri_id


def shift_setup(setup: RasterSetup, dx, dy) -> RasterSetup:
    """Shift the pixel-space origin of a RasterSetup by a (possibly traced)
    offset: e(q + d) folds into the constant coefficient, so sharded callers
    (multi-chip row slabs) can rasterize in local coordinates with static
    y_offset=0.  bbox shifts accordingly."""
    def shift(coef):  # (T, ..., 3) with last dim (a, b, c)
        return coef.at[..., 2].add(coef[..., 0] * dx + coef[..., 1] * dy)

    return RasterSetup(
        edges=shift(setup.edges),
        num_z=shift(setup.num_z),
        num_w=shift(setup.num_w),
        valid=setup.valid,
        bbox=setup.bbox - jnp.asarray([dx, dy, dx, dy], jnp.float32),
    )
