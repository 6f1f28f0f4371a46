"""Pallas TPU rasterization kernels.

Two kernels over the packed-coefficient RasterSetup layout (ops/raster.py):

* ``rasterize_pallas``: brute-force grid (tiles x chunks) with a per-chunk
  SMEM skip bitmap -- used for the few giant triangles.
* ``rasterize_binned``: the production path; 1D grid over bin blocks
  (ops/binning.py) with scalar-prefetched block->tile output mapping and
  accumulator revisiting, three levels (fine bins / coarse bins /
  brute force) merged by depth key.

Everything stays in VMEM: the visibility buffer lives in the revisited
output block and chunk coefficient blocks stream through the automatic
double-buffered BlockSpec pipeline.  Both kernels are bit-compatible with
the XLA rasterize() and cross-tested against it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import COEF_COLS, DEPTH_MAX, RasterSetup, flip_depth_key, shift_setup  # noqa: F401


def _eval_chunk(coef_ref, valid_row, qx, qy, ortho: bool = False, ci=0):
    """Shared kernel math: packed coefficient rows -> (key, ok) over
    (chunk, pix).  coef_ref block is (1, 16, chunk): 512 B contiguous DMA
    rows -- a (1, chunk, 16) block instead degrades the DMA to 128 strided
    64 B reads (~15x slower end to end, measured).

    ortho: the setup was normalize_ortho_setup'd (nw == (0, 0, 1), nw > 0
    baked into valid), so the per-pixel nw evaluation and divide are skipped
    -- key = nz(q) directly, bit-identical to nz(q)/1.0.

    ci: leading-dim chunk index into a multi-chunk VMEM-resident coef block
    (the one-pass kernel keeps the whole table in VMEM and loops chunks
    in-kernel; traced scalar indices on the untiled leading dim are fine)."""

    def row(i):
        return coef_ref[ci, i, :][None, :].T  # (chunk, 1)

    def edge_inside(i):
        a = row(0 + i)
        b = row(3 + i)
        c = row(6 + i)
        ev = a * qx + b * qy + c
        tl = (a > 0.0) | ((a == 0.0) & (b > 0.0))
        return (ev > 0.0) | ((ev == 0.0) & tl)

    ok = edge_inside(0) & edge_inside(1) & edge_inside(2)
    key = row(9) * qx + row(10) * qy + row(11)
    if not ortho:
        nw = row(12) * qx + row(13) * qy + row(14)
        key = key / jnp.where(nw != 0.0, nw, 1.0)
        ok = ok & (nw > 0.0)
    ok = ok & (key >= 0.0) & (key <= 1.0) & valid_row
    return jnp.where(ok, key, -1.0), ok


def _emit_records(match, rec, pix):
    """Winner-record emission: (chunk, pix) one-hot match x (chunk, R)
    records -> (pix, R), EXACT.

    R == 1 (the giant level's global-id column) uses a VPU multiply-sum --
    exact in f32 (one nonzero per column) with no matmul temporaries.  The
    MXU alternative is a trap on both ends: DEFAULT precision is one bf16
    pass (silently rounded ids > 255 -- caught by the round-6 on-metal
    parity gate; interpret tests use exact f32 dots and cannot see it),
    and HIGHEST (bf16x3) allocates lane-padded pass temporaries that blow
    the 16 MB scoped-VMEM limit at production tile sizes (measured 24 MB
    at pix=8192).  Wider records (fused resolve) keep the MXU dot at
    HIGHEST, which is exact for f32 records."""
    r_cols = rec.shape[-1]
    if r_cols == 1:
        return jnp.sum(match * rec[:, 0][:, None], axis=0)[:, None]
    return jax.lax.dot_general(
        match, rec,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# ---------------------------------------------------------------------------
# Brute-force kernel (tiles x chunks grid)
# ---------------------------------------------------------------------------


def _raster_kernel(
    yoff_ref,     # (1,) f32 SMEM: slab row offset (global pixel coords)
    overlap_ref,  # (1, 1, n_chunks) i32 SMEM: per-chunk work bits for tile
    coef_ref,     # (1, 16, chunk)
    valid_ref,    # (1, 1, chunk) f32
    rec_ref=None,  # (1, chunk, R) f32 per-pair records (want_attrs only)
    key_ref=None,  # (1, 1, pix) f32 out (revisited across chunks)
    id_ref=None,   # (1, 1, pix) i32 out (absent when want_ids=False)
    attr_ref=None,  # (1, pix, R) f32 out (want_attrs only)
    *,
    tile_h: int,
    tile_w: int,
    chunk: int,
    n_tx: int,
    want_ids: bool = True,
    want_attrs: bool = False,
    ortho: bool = False,
):
    if not want_ids:
        key_ref = rec_ref
        rec_ref = id_ref = attr_ref = None
    elif not want_attrs:
        key_ref, id_ref = rec_ref, key_ref
        rec_ref = attr_ref = None
    t = pl.program_id(0)
    c = pl.program_id(1)
    pix = tile_h * tile_w

    @pl.when(c == 0)
    def _init():
        key_ref[...] = jnp.full((1, 1, pix), -1.0, jnp.float32)
        if want_ids:
            id_ref[...] = jnp.full((1, 1, pix), -1, jnp.int32)
        if want_attrs:
            attr_ref[...] = jnp.zeros_like(attr_ref)

    @pl.when(overlap_ref[0, 0, c] != 0)
    def _body():
        ty = t // n_tx
        tx = t % n_tx
        x0 = (tx * tile_w).astype(jnp.float32)
        y0 = (ty * tile_h).astype(jnp.float32) + yoff_ref[0]
        col_i = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
        qx = x0 + jnp.mod(col_i, tile_w).astype(jnp.float32) + 0.5
        qy = y0 + (col_i // tile_w).astype(jnp.float32) + 0.5

        valid_row = valid_ref[0, 0, :][None, :].T > 0.0
        key, _ok = _eval_chunk(coef_ref, valid_row, qx, qy, ortho)

        k_best = jnp.max(key, axis=0, keepdims=True)
        if not want_ids:
            key_ref[0] = jnp.maximum(k_best, key_ref[0])
            return
        k_arg = jnp.argmax(key, axis=0).astype(jnp.int32)[None, :]
        k_id = c * chunk + k_arg  # argmax = first max -> min id within chunk

        acc_key = key_ref[0]
        acc_id = id_ref[0]
        better = k_best > acc_key
        # depth ties resolve to the min triangle id, matching the XLA
        # rasterize() exactly (rows are in ascending-id order here)
        tie = (k_best == acc_key) & (k_best >= 0.0)
        key_ref[0] = jnp.where(better, k_best, acc_key)
        id_ref[0] = jnp.where(
            better, k_id, jnp.where(tie, jnp.minimum(k_id, acc_id), acc_id)
        )
        if want_attrs:
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, pix), 0)
            match = ((row_iota == k_arg) & (k_best >= 0.0)).astype(jnp.float32)
            attr_blk = _emit_records(match, rec_ref[0], pix)
            # f32 mask before the minor-dim insert (Mosaic cannot
            # reshape 1-bit vectors across dims)
            take = jnp.where(better | (tie & (k_id < acc_id)), 1.0, 0.0)
            attr_ref[0] = jnp.where(take[0][:, None] > 0.5, attr_blk, attr_ref[0])


def _raster_kernel_onepass(
    yoff_ref,     # (1,) f32 SMEM: slab row offset (global pixel coords)
    overlap_ref,  # (1, 1, n_chunks) i32 SMEM: per-chunk work bits for tile
    coef_ref,     # (n_chunks, 16, chunk) -- the WHOLE table, VMEM-resident
    valid_ref,    # (n_chunks, 1, chunk) f32
    rec_ref=None,  # (n_chunks, chunk, R) f32 records (want_attrs only)
    key_ref=None,  # (1, 1, pix) f32 out
    id_ref=None,   # (1, 1, pix) i32 out (absent when want_ids=False)
    attr_ref=None,  # (1, pix, R) f32 out (want_attrs only)
    *,
    tile_h: int,
    tile_w: int,
    chunk: int,
    n_chunks: int,
    n_tx: int,
    want_ids: bool = True,
    want_attrs: bool = False,
    ortho: bool = False,
):
    """One-pass variant of ``_raster_kernel``: 1D grid over tiles, chunk
    loop INSIDE the kernel over the VMEM-resident coefficient table.

    The 2D (tiles x chunks) grid pays a grid-step (dispatch + block DMA)
    for every (tile, chunk) pair even when the skip bit says there is no
    work -- at the giant level that is almost all of them (263k-tri tier:
    40 chunks of cap, ~1 with live giants), and at a 4096^2 shadow map the
    ~41k skipped steps cost more than the rasterization.  Here a skipped
    chunk is one scalar branch; the coef table (<= a few hundred KB at
    giant caps) stays resident, so per tile only live chunks touch the
    VPU.  Bit-identical accumulation order (ascending chunk ids)."""
    if not want_ids:
        key_ref = rec_ref
        rec_ref = id_ref = attr_ref = None
    elif not want_attrs:
        key_ref, id_ref = rec_ref, key_ref
        rec_ref = attr_ref = None
    t = pl.program_id(0)
    pix = tile_h * tile_w

    key_ref[...] = jnp.full((1, 1, pix), -1.0, jnp.float32)
    if want_ids:
        id_ref[...] = jnp.full((1, 1, pix), -1, jnp.int32)
    if want_attrs:
        attr_ref[...] = jnp.zeros_like(attr_ref)

    ty = t // n_tx
    tx = t % n_tx
    x0 = (tx * tile_w).astype(jnp.float32)
    y0 = (ty * tile_h).astype(jnp.float32) + yoff_ref[0]
    col_i = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    qx = x0 + jnp.mod(col_i, tile_w).astype(jnp.float32) + 0.5
    qy = y0 + (col_i // tile_w).astype(jnp.float32) + 0.5

    def chunk_step(c, carry):
        @pl.when(overlap_ref[0, 0, c] != 0)
        def _body():
            valid_row = valid_ref[c, 0, :][None, :].T > 0.0
            key, _ok = _eval_chunk(coef_ref, valid_row, qx, qy, ortho, ci=c)
            k_best = jnp.max(key, axis=0, keepdims=True)
            if not want_ids:
                key_ref[0] = jnp.maximum(k_best, key_ref[0])
                return
            k_arg = jnp.argmax(key, axis=0).astype(jnp.int32)[None, :]
            k_id = c * chunk + k_arg
            acc_key = key_ref[0]
            acc_id = id_ref[0]
            better = k_best > acc_key
            tie = (k_best == acc_key) & (k_best >= 0.0)
            key_ref[0] = jnp.where(better, k_best, acc_key)
            id_ref[0] = jnp.where(
                better, k_id, jnp.where(tie, jnp.minimum(k_id, acc_id), acc_id)
            )
            if want_attrs:
                row_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, pix), 0)
                match = ((row_iota == k_arg) & (k_best >= 0.0)).astype(jnp.float32)
                attr_blk = _emit_records(match, rec_ref[c], pix)
                take = jnp.where(better | (tie & (k_id < acc_id)), 1.0, 0.0)
                attr_ref[0] = jnp.where(
                    take[0][:, None] > 0.5, attr_blk, attr_ref[0]
                )
        return carry

    jax.lax.fori_loop(0, n_chunks, chunk_step, 0)


# one-pass auto threshold: whole coef table in VMEM = t_pad * 16 rows * 4 B
# (1 MB at 16384 tris) + valid (+ records when present -- those can carry
# up to 128 f32 columns, so the attrs path keeps the tighter bound: at
# 16384 rows a 128-col record block alone is 8 MB of the 16 MB budget).
# Falling off this threshold costs a 2D (tiles x chunks) grid whose DEAD
# steps dominate (the round-5 faithful-tier first run paid ~1.4 s of
# skipped grid steps at a 16k giant cap).
_ONEPASS_MAX_TRIS = 16384
_ONEPASS_MAX_TRIS_ATTRS = 4096


def _mat_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def materialize_rows(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Identity Pallas kernel = a hard materialization boundary.

    prof_coef (round 6, metal) measured the block-aligned coef gather at
    3.9-4.8 ms with PARAMETER indices but 15-19 ms when the index array is
    produced in-graph by the align computation -- a ~3x fusion penalty that
    ``optimization_barrier`` does NOT remove (binparts BARRIER row).
    Routing the indices through a real kernel boundary forces XLA to
    materialize them, putting the downstream gather back on the fast
    emitter for ~0.1 ms of copy.  Bit-exact identity."""
    n = x.shape[0]
    rest = 1
    for d in x.shape[1:]:
        rest *= d
    row_bytes = max(rest * x.dtype.itemsize, 1)
    blk = max(1, min(n, (4 << 20) // row_bytes))
    while n % blk:
        blk -= 1
    if x.ndim >= 2 and blk < n:
        # Mosaic tiling: when the leading dim is one of the block's last
        # two dims, it must divide the (8, 128) tile -- walk down to a
        # multiple of 8 that divides n (whole-array fallback otherwise)
        b8 = blk - blk % 8
        while b8 >= 8 and n % b8:
            b8 -= 8
        blk = b8 if b8 >= 8 else n
    nd = x.ndim
    return pl.pallas_call(
        _mat_kernel,
        grid=(n // blk,),
        in_specs=[pl.BlockSpec((blk,) + x.shape[1:],
                               lambda i: (i,) + (0,) * (nd - 1))],
        out_specs=pl.BlockSpec((blk,) + x.shape[1:],
                               lambda i: (i,) + (0,) * (nd - 1)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x)


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_h", "tile_w", "chunk", "depth_mode",
        "interpret", "want_ids", "ortho", "onepass",
    ),
)
def rasterize_pallas(
    setup: RasterSetup,
    width: int,
    height: int,
    tile_h: int = 32,
    tile_w: int = 128,
    chunk: int = 64,
    depth_mode: int = DEPTH_MAX,
    y_offset=0,
    interpret: bool = False,
    want_ids: bool = True,
    records: jnp.ndarray | None = None,
    ortho: bool = False,
    onepass: bool | None = None,
):
    """Brute-force Pallas raster (every tile scans every chunk, with SMEM
    skip bits).  Use rasterize_binned for real scenes.

    onepass (None = auto when the table fits VMEM): 1D tile grid with the
    chunk loop in-kernel over the resident coef table -- skipped chunks
    cost one scalar branch instead of a whole grid step, which is the
    difference between ~18 ms and ~2 ms at the binned raster's giant level
    (see _raster_kernel_onepass).  Bit-identical output either way.

    y_offset (traced ok) renders the row slab [y_offset, y_offset+height) of
    the viewport the setup was built for, in GLOBAL pixel coordinates -- the
    per-pixel math is bit-identical to the full-frame render (sharding
    cannot change the image)."""
    if records is not None and not want_ids:
        # both kernels rewire refs assuming want_attrs implies want_ids;
        # the combination would silently emit a garbage attr block
        raise ValueError("rasterize_pallas: records requires want_ids=True")
    pad_w = -(-width // tile_w) * tile_w
    pad_h = -(-height // tile_h) * tile_h
    n_ty, n_tx = pad_h // tile_h, pad_w // tile_w
    n_tiles = n_ty * n_tx

    if depth_mode != DEPTH_MAX:
        setup = flip_depth_key(setup)

    t = setup.coef.shape[0]
    n_chunks = max(1, -(-t // chunk))
    t_pad = n_chunks * chunk

    coef = jnp.pad(setup.coef, ((0, t_pad - t), (0, 0)))
    coef = coef.reshape(n_chunks, chunk, COEF_COLS).transpose(0, 2, 1)
    valid = jnp.pad(setup.valid.astype(jnp.float32), (0, t_pad - t)).reshape(
        n_chunks, 1, chunk
    )

    # tile x chunk overlap bitmap
    bbox = jnp.pad(setup.bbox, ((0, 0), (0, t_pad - t)))
    bbox = bbox.reshape(4, n_chunks, chunk)
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    yoff = jnp.asarray(y_offset, jnp.float32)
    tx0 = (tile_ids % n_tx * tile_w).astype(jnp.float32)
    ty0 = (tile_ids // n_tx * tile_h).astype(jnp.float32) + yoff
    ov = (
        (bbox[0][None] <= (tx0[:, None, None] + (tile_w - 1)))
        & (bbox[2][None] >= tx0[:, None, None])
        & (bbox[1][None] <= (ty0[:, None, None] + (tile_h - 1)))
        & (bbox[3][None] >= ty0[:, None, None])
    )
    ov = ov & (
        jnp.pad(setup.valid, (0, t_pad - t), constant_values=False)
        .reshape(n_chunks, chunk)[None]
    )
    overlap = jnp.any(ov, axis=2).astype(jnp.int32)[:, None, :]

    want_attrs = records is not None
    pix = tile_h * tile_w
    if onepass is None:
        # narrow records (the giant level's 1-col id emission) are VMEM-
        # cheap; only WIDE record blocks (fused resolve, up to 128 cols)
        # keep the tight bound
        wide_rec = records is not None and records.shape[-1] > 8
        onepass = t_pad <= (
            _ONEPASS_MAX_TRIS_ATTRS if wide_rec else _ONEPASS_MAX_TRIS
        )
    out_shape = [jax.ShapeDtypeStruct((n_tiles, 1, pix), jnp.float32)]
    if want_ids:
        out_shape.append(jax.ShapeDtypeStruct((n_tiles, 1, pix), jnp.int32))
    if onepass:
        out_specs = [pl.BlockSpec((1, 1, pix), lambda t: (t, 0, 0))] * len(out_shape)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_chunks), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_chunks, COEF_COLS, chunk), lambda t: (0, 0, 0)),
            pl.BlockSpec((n_chunks, 1, chunk), lambda t: (0, 0, 0)),
        ]
    else:
        out_specs = [pl.BlockSpec((1, 1, pix), lambda t, c: (t, 0, 0))] * len(out_shape)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n_chunks), lambda t, c: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, COEF_COLS, chunk), lambda t, c: (c, 0, 0)),
            pl.BlockSpec((1, 1, chunk), lambda t, c: (c, 0, 0)),
        ]
    inputs = [yoff.reshape(1), overlap, coef, valid]
    if want_attrs:
        rec_cols = records.shape[-1]
        rec = jnp.pad(records, ((0, t_pad - t), (0, 0))).reshape(n_chunks, chunk, rec_cols)
        if onepass:
            in_specs.append(
                pl.BlockSpec((n_chunks, chunk, rec_cols), lambda t: (0, 0, 0))
            )
        else:
            in_specs.append(pl.BlockSpec((1, chunk, rec_cols), lambda t, c: (c, 0, 0)))
        inputs.append(rec)
        out_shape.append(jax.ShapeDtypeStruct((n_tiles, pix, rec_cols), jnp.float32))
        if onepass:
            out_specs.append(pl.BlockSpec((1, pix, rec_cols), lambda t: (t, 0, 0)))
        else:
            out_specs.append(pl.BlockSpec((1, pix, rec_cols), lambda t, c: (t, 0, 0)))
    grid_spec = pl.GridSpec(
        grid=(n_tiles,) if onepass else (n_tiles, n_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    if onepass:
        kernel = partial(
            _raster_kernel_onepass,
            tile_h=tile_h,
            tile_w=tile_w,
            chunk=chunk,
            n_chunks=n_chunks,
            n_tx=n_tx,
            want_ids=want_ids,
            want_attrs=want_attrs,
            ortho=ortho,
        )
    else:
        kernel = partial(
            _raster_kernel,
            tile_h=tile_h,
            tile_w=tile_w,
            chunk=chunk,
            n_tx=n_tx,
            want_ids=want_ids,
            want_attrs=want_attrs,
            ortho=ortho,
        )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)

    if not want_ids:
        # depth-only: return the RAW key image (-1 = miss, ascending =
        # nearer under the flipped key) so callers can merge levels before
        # converting to depth
        pad_w_ = pad_w
        key_img = (
            outs[0].reshape(n_tiles, tile_h, tile_w)
            .reshape(n_ty, n_tx, tile_h, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(pad_h, pad_w_)[:height, :width]
        )
        return key_img, None
    depth, tri_id = _untile(
        outs[0].reshape(n_tiles, tile_h, tile_w),
        outs[1].reshape(n_tiles, tile_h, tile_w),
        width, height, tile_h, tile_w, depth_mode,
    )
    if not want_attrs:
        return depth, tri_id
    rec_cols = records.shape[-1]
    attr_img = (
        outs[2].reshape(n_ty, n_tx, tile_h, tile_w, rec_cols)
        .transpose(0, 2, 1, 3, 4)
        .reshape(pad_h, pad_w, rec_cols)[:height, :width]
    )
    return depth, tri_id, attr_img


def _untile(best_key, best_id, width, height, tile_h, tile_w, depth_mode):
    pad_w = -(-width // tile_w) * tile_w
    pad_h = -(-height // tile_h) * tile_h
    n_ty, n_tx = pad_h // tile_h, pad_w // tile_w
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
# Binned kernel: 1D grid over bin blocks
# ---------------------------------------------------------------------------


def _binned_kernel(
    blk_src_ref,    # (n_blocks,) i32 scalar prefetch (input block routing)
    blk_otile_ref,  # (n_blocks,) i32 scalar prefetch (output tile routing)
    blk_tile_ref,   # (n_blocks,) i32 scalar prefetch
    blk_first_ref,  # (n_blocks,) i32 scalar prefetch (live first-of-tile)
    blk_live_ref,   # (n_blocks,) i32 scalar prefetch
    yoff_ref,       # (1,) f32 scalar prefetch: slab row offset
    coef_ref,       # (1, 16, chunk)
    tid_ref,        # (1, 1, chunk) i32 (absent when want_ids=False)
    valid_ref,      # (1, 1, chunk) f32
    rec_ref=None,   # (1, chunk, R) f32 per-pair records (want_attrs only)
    key_ref=None,   # (1, 1, pix) f32 out (revisited per tile)
    id_ref=None,    # (1, 1, pix) i32 out (absent when want_ids=False)
    attr_ref=None,  # (1, pix, R) f32 out (want_attrs only)
    *,
    tile_h: int,
    tile_w: int,
    chunk: int,
    n_tx: int,
    debug_print: bool = False,
    want_ids: bool = True,
    want_attrs: bool = False,
    ortho: bool = False,
):
    if not want_ids:
        # depth-only layout (shadow maps): no tid input, no id output
        key_ref = valid_ref
        valid_ref = tid_ref
        tid_ref = id_ref = rec_ref = attr_ref = None
    elif not want_attrs:
        # (coef, tid, valid) in -> (key, id) out
        key_ref, id_ref = rec_ref, key_ref
        rec_ref = attr_ref = None
    b = pl.program_id(0)
    pix = tile_h * tile_w

    @pl.when(blk_first_ref[b] == 1)
    def _init():
        key_ref[...] = jnp.full((1, 1, pix), -1.0, jnp.float32)
        if want_ids:
            id_ref[...] = jnp.full((1, 1, pix), -1, jnp.int32)
        if want_attrs:
            attr_ref[...] = jnp.zeros_like(attr_ref)

    # Dead steps (block budget beyond actual demand) route their input DMA
    # to the last live block (elided: same index as the previous step) and
    # their output to the scratch tile; all compute is skipped.  The kernel
    # cost therefore scales with ACTUAL bin demand, not the static budget.
    @pl.when(blk_live_ref[b] == 1)
    def _body():
        t = blk_tile_ref[b]
        if debug_print:
            # device-side printf (GpuDebugPrint.hlsl analog), compiled in
            # only when RenderSettings.kernel_debug_print is set
            pl.debug_print("binned raster: block {} -> tile {}", b, t)
        ty = t // n_tx
        tx = t % n_tx
        x0 = (tx * tile_w).astype(jnp.float32)
        y0 = (ty * tile_h).astype(jnp.float32) + yoff_ref[0]
        col_i = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
        qx = x0 + jnp.mod(col_i, tile_w).astype(jnp.float32) + 0.5
        qy = y0 + (col_i // tile_w).astype(jnp.float32) + 0.5

        valid_row = valid_ref[0, 0, :][None, :].T > 0.0
        key, ok = _eval_chunk(coef_ref, valid_row, qx, qy, ortho)

        k_best = jnp.max(key, axis=0, keepdims=True)
        acc_key = key_ref[0]
        if not want_ids:
            key_ref[0] = jnp.maximum(k_best, acc_key)
            return
        # winning global triangle id: min id among rows tied at the max key
        # (select + reduce instead of a gather, which Mosaic can't
        # vectorize).
        ids_col = tid_ref[0, 0, :][None, :].T  # (chunk, 1)
        big_id = jnp.int32(0x7FFFFFFF)
        k_id = jnp.min(
            jnp.where((key == k_best) & ok, ids_col, big_id), axis=0, keepdims=True
        )

        acc_id = id_ref[0]
        better = k_best > acc_key
        # cross-block depth ties also resolve to the min global triangle id
        # (bit-compatible with the XLA rasterize() for coplanar pixels)
        tie = (k_best == acc_key) & (k_best >= 0.0)
        key_ref[0] = jnp.where(better, k_best, acc_key)
        id_ref[0] = jnp.where(
            better, k_id, jnp.where(tie, jnp.minimum(k_id, acc_id), acc_id)
        )
        if want_attrs:
            # one-hot select of the winning row's record on the MXU: the
            # match row is unique (a triangle appears once per tile list),
            # so the f32 dot adds zeros -- the selection is exact
            match = ((key == k_best) & ok & (ids_col == k_id)).astype(jnp.float32)
            attr_blk = jax.lax.dot_general(
                match, rec_ref[0],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # HIGHEST = bf16x3 passes: exact for record f32s and for
                # integer id columns < 2^24.  DEFAULT is ONE bf16 pass on
                # TPU -- it silently rounded emitted ids > 255 (caught by
                # the round-6 on-metal parity gate; interpret-mode tests
                # use exact f32 dots and cannot see it).
                precision=jax.lax.Precision.HIGHEST,
            )  # (pix, R)
            # f32 mask before the minor-dim insert (Mosaic cannot reshape
            # 1-bit vectors across dims)
            take = jnp.where(better | (tie & (k_id < acc_id)), 1.0, 0.0)
            attr_ref[0] = jnp.where(take[0][:, None] > 0.5, attr_blk, attr_ref[0])


def _run_binned_kernel(
    bins, width, height, tile_h, tile_w, chunk, y_offset,
    interpret=False, debug_print=False, want_ids=True, ortho=False,
):
    """Launch the binned kernel for one level; returns (key_img, id_img)
    cropped to (height, width), key = -1 where empty.  When ``bins.rec``
    is set, also returns the winner's record image (height, width, R)
    (fused attribute emission) as a third element."""
    want_attrs = bins.rec is not None
    pad_w = -(-width // tile_w) * tile_w
    pad_h = -(-height // tile_h) * tile_h
    n_ty, n_tx = pad_h // tile_h, pad_w // tile_w
    n_tiles = n_ty * n_tx
    n_blocks = bins.coef.shape[0]
    pix = tile_h * tile_w

    # Route dead budget blocks (beyond actual demand) to elided input DMAs
    # and a scratch output tile (row n_tiles, cropped below); their compute
    # is pl.when-skipped in the kernel.
    blk_ids = jnp.arange(n_blocks, dtype=jnp.int32)
    live = bins.blk_live
    last_live = jnp.maximum(jnp.sum(live) - 1, 0)
    blk_src = jnp.where(live == 1, blk_ids, last_live)
    blk_otile = jnp.where(live == 1, bins.blk_tile, n_tiles)
    blk_first = bins.blk_first * live

    blk_spec = pl.BlockSpec((1, 1, chunk), lambda b, bs, bo, bt, bf, bl, yo: (bs[b], 0, 0))
    out_spec = pl.BlockSpec((1, 1, pix), lambda b, bs, bo, bt, bf, bl, yo: (bo[b], 0, 0))
    in_specs = [
        pl.BlockSpec((1, COEF_COLS, chunk), lambda b, bs, bo, bt, bf, bl, yo: (bs[b], 0, 0)),
    ] + ([blk_spec] if want_ids else []) + [blk_spec]
    out_shape = [jax.ShapeDtypeStruct((n_tiles + 1, 1, pix), jnp.float32)]
    if want_ids:
        out_shape.append(jax.ShapeDtypeStruct((n_tiles + 1, 1, pix), jnp.int32))
    out_specs = [out_spec] * len(out_shape)
    inputs = (bins.coef, bins.tri_id, bins.valid) if want_ids else (bins.coef, bins.valid)
    if want_attrs:
        rec_cols = bins.rec.shape[-1]
        in_specs.append(
            pl.BlockSpec((1, chunk, rec_cols), lambda b, bs, bo, bt, bf, bl, yo: (bs[b], 0, 0))
        )
        inputs = inputs + (bins.rec,)
        out_shape.append(jax.ShapeDtypeStruct((n_tiles + 1, pix, rec_cols), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, pix, rec_cols), lambda b, bs, bo, bt, bf, bl, yo: (bo[b], 0, 0))
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    kernel = partial(
        _binned_kernel,
        tile_h=tile_h,
        tile_w=tile_w,
        chunk=chunk,
        n_tx=n_tx,
        debug_print=debug_print,
        want_ids=want_ids,
        want_attrs=want_attrs,
        ortho=ortho,
    )
    yoff = jnp.asarray(y_offset, jnp.float32).reshape(1)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(blk_src, blk_otile, bins.blk_tile, blk_first, live, yoff, *inputs)

    with jax.named_scope("Untile"):
        used = bins.tile_used[:, None, None]

        def untile(x):
            return (
                x.reshape(n_ty, n_tx, tile_h, tile_w)
                .transpose(0, 2, 1, 3)
                .reshape(pad_h, pad_w)[:height, :width]
            )

        best_key = jnp.where(used, outs[0][:n_tiles], -1.0).reshape(n_tiles, tile_h, tile_w)
        key_img = untile(best_key)
        if not want_ids:
            return key_img, None
        best_id = jnp.where(used, outs[1][:n_tiles], -1).reshape(n_tiles, tile_h, tile_w)
        id_img = untile(best_id)
        if not want_attrs:
            return key_img, id_img
        rec_cols = bins.rec.shape[-1]
        # zero unused tiles (their blocks were never visited -> uninitialized)
        attr = jnp.where(bins.tile_used[:, None, None], outs[2][:n_tiles], 0.0)
        attr_img = (
            attr.reshape(n_ty, n_tx, tile_h, tile_w, rec_cols)
            .transpose(0, 2, 1, 3, 4)
            .reshape(pad_h, pad_w, rec_cols)[:height, :width]
        )
        return key_img, id_img, attr_img


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tile_h", "tile_w", "chunk", "depth_mode",
        "max_span", "budget_factor", "big_tile_h", "big_tile_w", "big_chunk",
        "mid_divisor", "giant_divisor", "giant_tile_h", "giant_tile_w",
        "giant_chunk",
        "interpret", "debug_print",
        "want_ids", "ortho", "align_scatter", "compact_mode", "mat_idx",
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
    y_offset=0,
    max_span: int = 2,
    budget_factor: float = 2.0,
    big_tile_h: int = 32,
    big_tile_w: int = 128,
    big_chunk: int = 32,
    mid_divisor: int = 16,
    giant_divisor: int = 128,
    giant_tile_h: int = 0,
    giant_tile_w: int = 0,
    giant_chunk: int = 0,
    interpret: bool = False,
    debug_print: bool = False,
    want_ids: bool = True,
    records: jnp.ndarray | None = None,
    ortho: bool = False,
    align_scatter: bool = False,
    compact_mode: str = "sort",
    mat_idx: bool = False,
):
    """Binned visibility raster, three levels merged by depth key:

    1. fine tiles + sorted per-tile lists for small triangles,
    2. coarse tiles + lists for medium triangles,
    3. brute-force kernel for the remaining giant ones (walls, floors).

    Work scales with (pairs x tile pixels) instead of (tiles x triangles).

    mid/giant_divisor size the compacted level capacities (t_count //
    divisor).  Measured on pica_pica (76k tris, 1080p): 2.2k mid / 0.3k
    giant, so the defaults carry 4-10x margin; a scene that overflows the
    mid cap spills to giant.

    Returns (depth, tri_id, stats) where stats carries scalar i32 overflow
    counters: ``pair_overflow`` (fine/mid pairs dropped at the bin budget)
    and ``giant_truncated`` (giant triangles beyond the compaction cap that
    were NOT rasterized).  Surface them (Renderer.stats()) like the
    reference's on-screen culling counters (``GpuDebugPrintStats.hlsl``);
    raise RenderSettings.bin_* when nonzero.
    """
    from .binning import bin_triangles

    if depth_mode != DEPTH_MAX:
        setup = flip_depth_key(setup)

    want_attrs = records is not None
    with jax.named_scope("FineBinning"):
        bins = bin_triangles(
            setup, width, height, tile_h, tile_w, chunk,
            max_span=max_span, budget_factor=budget_factor, y_offset=y_offset,
            records=records, align_scatter=align_scatter,
            mat_idx=mat_idx, interpret=interpret,
        )
    with jax.named_scope("RasterKernel"):
        fine_out = _run_binned_kernel(
            bins, width, height, tile_h, tile_w, chunk, y_offset, interpret,
            debug_print, want_ids, ortho=ortho,
        )
    key_img, id_img = fine_out[0], fine_out[1]
    attr_img = fine_out[2] if want_attrs else None

    t_count = setup.coef.shape[0]

    def compact(mask, cap):
        # indices of True entries first, fixed cap, preserving ascending
        # order (so compacted-local id order == global id order and the
        # kernels' min-id tie-breaks stay exact); ops/raster.compact_mask
        from .raster import compact_mask

        return compact_mask(mask, cap, compact_mode)

    # Medium triangles: second binning level with coarse tiles, over a
    # COMPACTED list (the full-T grid would spend more time skipping empty
    # chunks than rasterizing).
    with jax.named_scope("MidLevel"):
        cap_mid = min(t_count, max(big_chunk, -(-(t_count // mid_divisor) // big_chunk) * big_chunk))
        cap_g = min(t_count, max(big_chunk, -(-(t_count // giant_divisor) // big_chunk) * big_chunk))
        # ONE full-T sort serves BOTH levels: compact() packs valid rows in
        # ascending id order, so rows [0, cap_mid) are the mid list and
        # rows [cap_mid, cap_mid+cap_g) are exactly the mid-cap OVERFLOW
        # (every overflow id > every mid id) -- the giant level below
        # consumes that slice instead of running its own full-T sort
        # (~3 ms each at T=163840, round-6 prof_giant).
        ext_idx, ext_valid = compact(bins.big_mask, min(cap_mid + cap_g, t_count))
        mid_idx, mid_valid = ext_idx[:cap_mid], ext_valid[:cap_mid]
        mid_setup = RasterSetup(
            coef=setup.coef[mid_idx], valid=mid_valid, bbox=setup.bbox[:, mid_idx]
        )
        mid_bins = bin_triangles(
            mid_setup, width, height, big_tile_h, big_tile_w, big_chunk,
            max_span=4, budget_factor=2.0, tri_ids=mid_idx, y_offset=y_offset,
            records=None if records is None else records[mid_idx],
            align_scatter=align_scatter,
            mat_idx=mat_idx, interpret=interpret,
        )
        mid_out = _run_binned_kernel(
            mid_bins, width, height, big_tile_h, big_tile_w, big_chunk, y_offset,
            interpret, want_ids=want_ids, ortho=ortho,
        )
        mid_key, mid_id = mid_out[0], mid_out[1]
    if want_ids:
        take_mid = mid_key > key_img
        tie_mid = (mid_key == key_img) & (mid_key >= 0.0)
        key_img = jnp.where(take_mid, mid_key, key_img)
        sel_mid = take_mid | (tie_mid & (mid_id < id_img))
        id_img = jnp.where(sel_mid, mid_id, id_img)
        if want_attrs:
            attr_img = jnp.where(sel_mid[..., None], mid_out[2], attr_img)
    else:
        key_img = jnp.maximum(key_img, mid_key)

    # Remaining giant triangles (walls/floors): brute-force over a small
    # compacted list.  The set is (mid rows whose coarse binning flagged
    # them giant) ∪ (mid-cap overflow rows); both parts come pre-sorted --
    # part A from a cap_mid-space compact (a ~10k sort), part B as the
    # [cap_mid, cap_mid+cap_g) slice of the SAME full-T sort the mid level
    # ran, and every B id exceeds every A id, so their concatenation is
    # already in ascending global order.  Bit-identical giant set to the
    # old full-T re-sort, minus ~3 ms/raster.
    with jax.named_scope("GiantLevel"):
      with jax.named_scope("GiantCompact"):
        a_mask = mid_bins.big_mask & mid_valid
        a_local, a_ok = compact(a_mask, cap_g)
        a_ids = jnp.where(a_ok, mid_idx[a_local], 0)
        b_ids = ext_idx[cap_mid:]
        b_ok = ext_valid[cap_mid:]
        cat_ids = jnp.concatenate([a_ids, b_ids])
        cat_ok = jnp.concatenate([a_ok, b_ok])
        g_local, g_valid = compact(cat_ok, cap_g)
        g_idx = jnp.where(g_valid, cat_ids[g_local], 0)
        # truncation: union rows past cap_g, plus big-mask rows that never
        # made it into the extended window at all, plus mid-list giants the
        # A-side compact dropped past cap_g BEFORE cat_ok was formed (the
        # g-compact sum alone cannot see those)
        n_big = jnp.sum(bins.big_mask).astype(jnp.int32)
        lost_beyond = jnp.maximum(n_big - jnp.int32(min(cap_mid + cap_g, t_count)), 0)
        lost_a = jnp.maximum(
            jnp.sum(a_mask).astype(jnp.int32)
            - jnp.sum(a_ok).astype(jnp.int32), 0
        )
        giant_truncated = (
            jnp.sum(cat_ok).astype(jnp.int32)
            - jnp.sum(g_valid).astype(jnp.int32)
            + lost_beyond
            + lost_a
        )
        giant_setup = RasterSetup(
            coef=setup.coef[g_idx], valid=g_valid, bbox=setup.bbox[:, g_idx]
        )
      # (dedent: kernel under its own sub-scope)
      with jax.named_scope("GiantKernel"):
        # The winner's GLOBAL id is emitted by the kernel's record matmul
        # (last record column = g_idx as f32; ids < 2^24 are exact) instead
        # of a per-pixel ``g_idx[big_id_local]`` remap afterwards -- that
        # remap is a 2M-request gather from a ~1.3k-row table, the
        # PATHOLOGICAL small-table gather path (~12 ms of the round-6
        # LevelMerge attribution; cf. ops/texture.py
        # sample_table_bilinear_matmul's 146 ms/16KB measurement).
        rec_g = None
        if want_ids:
            # the global id rides an f32 record column: exact only below 2^24
            assert t_count < (1 << 24), (
                f"giant-level f32 id emission is exact only for ids < 2^24 "
                f"(t_count={t_count}); use the gather-based remap above that"
            )
            id_col = g_idx.astype(jnp.float32)[:, None]
            rec_g = (
                id_col if records is None
                else jnp.concatenate([records[g_idx], id_col], axis=1)
            )
        gth = giant_tile_h or big_tile_h
        gtw = giant_tile_w or big_tile_w
        # giant-level chunk: the population is TINY (12-45 triangles at the
        # bench tiers) but overlaps most tiles, so chunk granularity is the
        # waste: chunk 32 evaluates 32 rows per live (tile, chunk) step for
        # ~3 actually-overlapping giants (round-5 CPU diagnosis: 450
        # Mpix-tri evaluated vs 46 real at 4096^2).  A small giant chunk
        # tightens the skip granularity; bit-identical for any chunk size
        # (ascending-chunk accumulation, min-id ties).
        g_chunk = giant_chunk or big_chunk
        # the record-emission path adds (chunk, pix) one-hot/attr
        # intermediates; at 64x256 tiles that lands 128 KB past the 16 MB
        # VMEM scope (measured compile OOM) -- halve the tile rows until
        # the working set fits with margin
        while rec_g is not None and gth * gtw > 8192 and gth > 8:
            gth //= 2
        big_out = rasterize_pallas(
            giant_setup, width, height,
            tile_h=gth, tile_w=gtw,
            chunk=g_chunk,
            y_offset=y_offset, interpret=interpret, want_ids=want_ids,
            records=rec_g,
            ortho=ortho,
        )
        big_depth, big_id_local = big_out[0], big_out[1]
    with jax.named_scope("LevelMerge"):
        if want_ids:
            big_id = jnp.where(
                big_id_local >= 0,
                big_out[2][..., -1].astype(jnp.int32), -1,
            )
            big_key = jnp.where(big_id >= 0, big_depth, -1.0)

            take_big = big_key > key_img
            tie_big = (big_key == key_img) & (big_key >= 0.0)
            key_img = jnp.where(take_big, big_key, key_img)
            sel_big = take_big | (tie_big & (big_id < id_img))
            id_img = jnp.where(sel_big, big_id, id_img)
            if want_attrs:
                attr_img = jnp.where(
                    sel_big[..., None], big_out[2][..., :-1], attr_img
                )
        else:
            # big_depth is the RAW key image here (-1 = miss)
            key_img = jnp.maximum(key_img, big_depth)

        hit = key_img >= 0.0
        if depth_mode == DEPTH_MAX:
            depth = jnp.where(hit, key_img, 0.0)
        else:
            depth = jnp.where(hit, 1.0 - key_img, 1.0)
        tri_id = jnp.where(hit, id_img, -1) if want_ids else None
    stats = {
        "pair_overflow": bins.overflow + mid_bins.overflow,
        "giant_truncated": giant_truncated,
    }
    if want_attrs:
        return depth, tri_id, stats, attr_img
    return depth, tri_id, stats
