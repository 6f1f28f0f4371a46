"""Sort-based triangle binning: per-tile triangle lists in XLA.

This is the TPU replacement for the reference's GPU-driven indirect draw
structure: instead of per-model ExecuteIndirect commands, triangles bin into
screen tiles so raster work scales with (tiles x triangles-per-tile), the
same scaling the reference gets from culling + early-Z
(``SURVEY.md`` section 5.7).

Pipeline (all static-shaped XLA, no scatter):
 1. expand each triangle into up to S (tile, tri) pairs from its pixel bbox
    (triangles spanning more than S tiles go to the "big" list handled by a
    coarser level / the brute-force kernel);
 2. sort pairs by tile id (radix sort on TPU);
 3. block-align by *gather*: block slot (b, s) reads sorted pair
    starts[tile(b)] + (b - blk_start[tile(b)]) * chunk + s;
 4. gather the packed (T, 16) coefficient records into block layout
    (n_blocks, 16, chunk) -- one gather feeds all raster coefficients.

A fixed pair budget keeps shapes static; overflowing pairs are counted and
dropped (reported like the reference's culling counters).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .raster import COEF_COLS, RasterSetup


def _sort_pairs(keys: jnp.ndarray, n_tiles: int, s_slots: int):
    """Sort (tile, pair) by tile id.  Packs tile key and TRIANGLE index into
    ONE integer and runs a single-operand sort -- measurably cheaper on TPU
    than the two-operand argsort (the variadic comparator path), and stable
    by construction, so equal-depth resolution is deterministic.

    The packed payload is the triangle row, not the pair index: a triangle's
    slots all map to *different* tiles (slot_tile enumerates distinct tiles
    of its bbox), so (tile, tri) is unique among real pairs and the pair
    identity is never needed downstream.  That saves log2(s_slots) payload
    bits, which keeps the single-operand fast path up to 4x more tiles
    (a 4096-tile span at 256k triangles packs into 31 bits where pair
    packing needs 33 and fell back to the slow argsort).

    Returns (sorted_key, sorted_tri): tile id and originating triangle row of
    each pair in tile order (pairs of one tile are ascending in triangle id).
    """
    n_pairs = keys.shape[0]
    key_bits = max(int(n_tiles).bit_length(), 1)  # values reach n_tiles (sentinel)
    n_tris = max(n_pairs // s_slots, 1)
    tri_bits = max((n_tris - 1).bit_length(), 1)
    tri = jnp.arange(n_pairs, dtype=jnp.int32) // s_slots
    if key_bits + tri_bits <= 31:
        packed = keys * jnp.int32(1 << tri_bits) + tri
        sp = jnp.sort(packed)
        return sp >> tri_bits, sp & jnp.int32((1 << tri_bits) - 1)
    if key_bits + tri_bits <= 32:
        packed = keys.astype(jnp.uint32) * jnp.uint32(1 << tri_bits) + tri.astype(
            jnp.uint32
        )
        sp = jnp.sort(packed)
        return (
            (sp >> tri_bits).astype(jnp.int32),
            (sp & jnp.uint32((1 << tri_bits) - 1)).astype(jnp.int32),
        )
    order = jnp.argsort(keys, stable=True)
    return keys[order], order // s_slots


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinnedTriangles:
    """Block-aligned per-tile triangle lists + gathered coefficients."""

    coef: jnp.ndarray      # (n_blocks, 16, chunk) packed records, transposed
    tri_id: jnp.ndarray    # (n_blocks, 1, chunk) i32 original triangle ids
    valid: jnp.ndarray     # (n_blocks, 1, chunk) f32
    blk_tile: jnp.ndarray  # (n_blocks,) i32 tile id of each block
    blk_first: jnp.ndarray  # (n_blocks,) i32 1 = first block of its tile
    blk_live: jnp.ndarray  # (n_blocks,) i32 1 = block holds real pairs
    tile_used: jnp.ndarray  # (n_tiles,) bool tile has any content
    big_mask: jnp.ndarray  # (T,) bool triangles for the next level
    overflow: jnp.ndarray  # () i32 dropped pair count
    # optional per-pair resolve records (n_blocks, chunk, R) -- fused
    # attribute emission (ops/pallas_raster.py); None otherwise
    rec: jnp.ndarray | None = None


def _pair_keys(
    setup: RasterSetup,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    max_span: int,
    y_offset=0,
):
    """Expand each triangle's pixel bbox into up to S tile keys.

    Returns (keys (T*S,) i32 with ``n_tiles`` as the invalid sentinel,
    big (T,) bool triangles spanning more than SxS tiles)."""
    n_tx = -(-width // tile_w)
    n_tiles = n_tx * (-(-height // tile_h))
    s_slots = max_span * max_span

    bbox = setup.bbox  # (4, T)
    yoff = jnp.asarray(y_offset, jnp.float32)
    by0 = jnp.clip(bbox[1] - yoff, 0.0, height - 1)
    by1 = jnp.clip(bbox[3] - yoff, 0.0, height - 1)
    row_in = (bbox[3] >= yoff) & (bbox[1] <= yoff + (height - 1))
    tx0 = (bbox[0] // tile_w).astype(jnp.int32)
    ty0 = (by0 // tile_h).astype(jnp.int32)
    tx1 = (bbox[2] // tile_w).astype(jnp.int32)
    ty1 = (by1 // tile_h).astype(jnp.int32)
    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    small = setup.valid & row_in & (span_w <= max_span) & (span_h <= max_span)
    big = setup.valid & row_in & ~small

    # (T, S) candidate tiles
    s = jnp.arange(s_slots, dtype=jnp.int32)
    sy = s[None, :] // span_w[:, None]
    sx = s[None, :] % span_w[:, None]
    slot_tile = (ty0[:, None] + sy) * n_tx + tx0[:, None] + sx
    slot_ok = small[:, None] & (s[None, :] < (span_w * span_h)[:, None])
    sentinel = jnp.int32(n_tiles)
    keys = jnp.where(slot_ok, slot_tile, sentinel).reshape(-1)
    return keys, big


def _align_pairs(
    sorted_key,
    sorted_tri,
    n_tiles: int,
    chunk: int,
    n_blocks: int,
    use_scatter: bool = False,
):
    """Block-align sorted (tile, tri) pairs: block slot (b, s) reads sorted
    pair ``starts[tile(b)] + (b - blk_start[tile(b)]) * chunk + s``.

    use_scatter replaces that pair-source gather (n_pairs-row table -- past
    the TPU f32 gather cliff, ~12-19 ns/request) with a unique-index scatter:
    a sorted pair at position p lands at ``p + adjust[tile]`` where
    ``adjust = blk_start * chunk - starts`` is constant per tile, so
    broadcasting adjust to pairs is a (n_tiles+1)-point delta scatter + an
    i32 cumsum (NOT a tiny-table gather, which is pathological on TPU --
    BENCHLOG gather law), and the scatter's indices are unique by
    construction.  Bit-identical results either way
    (tests/test_binning.py::test_align_scatter_bit_exact); staged experiment,
    flip ``RenderSettings.bin_align_scatter`` when the binparts profile row
    confirms on metal.

    Returns (blocks_tid, slot_valid, blk_tile, blk_first, in_use, tile_used,
    overflow) -- everything downstream of the sort except the coefficient
    gather."""
    # scan_unrolled: log2(n_pairs) VECTORIZED gather steps over the small
    # (n_tiles+1,) query array; the default method lowered to a while loop
    # (~1-2 ms per raster in the round-5 op dump)
    starts = jnp.searchsorted(
        sorted_key, jnp.arange(n_tiles + 1, dtype=jnp.int32),
        method="scan_unrolled")
    counts = jnp.diff(starts)

    nblk = -(-counts // chunk)
    blk_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nblk).astype(jnp.int32)]
    )
    total_used = blk_start[-1]

    blk_ids = jnp.arange(n_blocks, dtype=jnp.int32)
    blk_tile = jnp.clip(
        jnp.searchsorted(
            blk_start, blk_ids, side="right", method="scan_unrolled"
        ).astype(jnp.int32) - 1,
        0,
        n_tiles - 1,
    )
    in_use = blk_ids < total_used
    blk_first = (blk_ids == blk_start[blk_tile]).astype(jnp.int32)

    slot = jnp.arange(chunk, dtype=jnp.int32)[None, :]
    pair_src = (
        starts[blk_tile][:, None]
        + (blk_ids - blk_start[blk_tile])[:, None] * chunk
        + slot
    )
    slot_valid = in_use[:, None] & (pair_src < starts[blk_tile + 1][:, None])
    if use_scatter:
        n_pairs = sorted_tri.shape[0]
        adjust = blk_start * chunk - starts  # (n_tiles + 1,) i32
        delta = jnp.concatenate([adjust[:1], jnp.diff(adjust)])
        # empty tiles stack their deltas at one position (scatter-add);
        # starts[k] == n_pairs (no sentinel pairs) drops harmlessly
        per_pair = jnp.zeros(n_pairs, jnp.int32).at[starts].add(
            delta, mode="drop"
        )
        dst = jnp.arange(n_pairs, dtype=jnp.int32) + jnp.cumsum(per_pair)
        # unique dst by construction; tile blocks past the budget and
        # sentinel pairs land out of range / in dead slots -- both are
        # masked by slot_valid below, exactly like the gather path
        raw_tid = (
            jnp.zeros(n_blocks * chunk, jnp.int32)
            .at[dst].set(sorted_tri, mode="drop")
            .reshape(n_blocks, chunk)
        )
    else:
        pair_src_c = jnp.clip(pair_src, 0, sorted_tri.shape[0] - 1)
        raw_tid = sorted_tri[pair_src_c]
    blocks_tid = jnp.where(slot_valid, raw_tid, 0)
    overflow = jnp.maximum(
        starts[n_tiles] - jnp.sum(slot_valid.astype(jnp.int32)), 0
    )
    # A tile is only usable if its first block fits the block budget;
    # otherwise no kernel instance ever initializes its output block and
    # merging it would read garbage (its pairs are counted in overflow).
    tile_used = (counts > 0) & (blk_start[:-1] < n_blocks)
    return blocks_tid, slot_valid, blk_tile, blk_first, in_use, tile_used, overflow


def bin_triangles(
    setup: RasterSetup,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    chunk: int,
    max_span: int = 2,
    budget_factor: float = 3.0,
    tri_ids: jnp.ndarray | None = None,
    y_offset=0,
    records: jnp.ndarray | None = None,
    align_scatter: bool = False,
    mat_idx: bool = False,
    interpret: bool = False,
) -> BinnedTriangles:
    """tri_ids (optional) maps local rows of a compacted setup back to
    global triangle ids for the output id buffers.

    y_offset (traced ok) bins against a row slab [y_offset, y_offset+height)
    of the full viewport the (global-coordinate) bboxes live in; triangles
    entirely outside the slab bin nowhere (sharded rendering)."""
    n_tx = -(-width // tile_w)
    n_ty = -(-height // tile_h)
    n_tiles = n_tx * n_ty
    t_count = setup.coef.shape[0]
    s_slots = max_span * max_span

    keys, big = _pair_keys(
        setup, width, height, tile_h, tile_w, max_span, y_offset
    )
    sorted_key, sorted_tri = _sort_pairs(keys, n_tiles, s_slots)

    n_blocks = int(budget_factor * t_count) // chunk + n_tiles
    n_blocks = max(n_blocks, 2)
    (
        blocks_tid, slot_valid, blk_tile, blk_first, in_use, tile_used,
        overflow,
    ) = _align_pairs(
        sorted_key, sorted_tri, n_tiles, chunk, n_blocks,
        use_scatter=align_scatter,
    )
    blocks_valid = slot_valid.astype(jnp.float32)
    out_tid = blocks_tid if tri_ids is None else jnp.where(
        slot_valid, tri_ids[blocks_tid], 0
    )

    # ONE packed-record gather feeds every raster coefficient; the
    # minor-dim transpose fuses into the gather for free (measured:
    # gather 16.2 ms, gather+transpose 16.25 ms at 1.3M rows), and the
    # (16, chunk) layout keeps the kernel's DMA rows contiguous (512 B) --
    # a (chunk, 16) block layout degrades the block DMA to 128 strided
    # 64 B reads and is ~15x slower end to end (measured).
    #
    # Plain f32 gather at every table size: the round-4 on-metal prober
    # measured plain 128-lane f32 gathers fast to >=262k rows and the u16
    # split-pair a 2.3x LOSS on the current toolchain (BENCHLOG round-4
    # gather law) -- the round-3 (94208, 163840] split16 window is gone.
    #
    # mat_idx: route the index array through a Pallas identity kernel
    # first -- the gather behind the IN-GRAPH align producer runs ~3x
    # slower than the same gather with materialized indices, and a plain
    # optimization_barrier does not recover it (round-6 prof_coef /
    # prof_fuse; pallas_raster.materialize_rows).
    gather_tid = blocks_tid
    if mat_idx:
        from .pallas_raster import materialize_rows

        gather_tid = materialize_rows(blocks_tid, interpret=interpret)
    coef = setup.coef[gather_tid]  # (n_blocks, chunk, 16)
    coef = coef.transpose(0, 2, 1)  # (n_blocks, 16, chunk)

    # optional per-pair resolve records for fused attribute emission;
    # (chunk, R) layout: 512 B contiguous DMA rows at R = 128
    rec = None if records is None else records[gather_tid]

    return BinnedTriangles(
        coef=coef,
        tri_id=out_tid[:, None, :],
        valid=blocks_valid[:, None, :],
        blk_tile=blk_tile,
        blk_first=blk_first,
        blk_live=in_use.astype(jnp.int32),
        tile_used=tile_used,
        big_mask=big,
        overflow=overflow.astype(jnp.int32),
        rec=rec,
    )
