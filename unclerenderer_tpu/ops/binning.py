"""Sort-based triangle binning: per-tile triangle lists in XLA.

This is the TPU replacement for the reference's GPU-driven indirect draw
structure: instead of per-model ExecuteIndirect commands, triangles bin into
screen tiles so raster work scales with (tiles x triangles-per-tile), the
same scaling the reference gets from culling + early-Z
(``SURVEY.md`` section 5.7).

Pipeline (all static-shaped XLA):
 1. expand each triangle into up to S (tile, tri) pairs from its pixel bbox
    (triangles spanning more than S tiles go to the "big" list and take the
    brute-force kernel -- they cover many pixels anyway);
 2. sort pairs by tile id (radix sort on TPU);
 3. block-align: each tile's pair run is padded up to the raster chunk size
    so the Pallas kernel can stream (chunk)-sized coefficient blocks with a
    scalar-prefetched block->tile map;
 4. gather raster coefficients into block layout.

A fixed pair budget (TOTAL pairs <= budget_factor * T + n_tiles * chunk)
keeps shapes static; overflowing pairs are counted and dropped (reported as
a stat, like the reference's culling counters).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .raster import RasterSetup


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BinnedTriangles:
    """Block-aligned per-tile triangle lists + gathered coefficients."""

    ea: jnp.ndarray        # (n_blocks, 3, chunk) edge a coefficients
    eb: jnp.ndarray        # (n_blocks, 3, chunk)
    ec: jnp.ndarray        # (n_blocks, 3, chunk)
    nz: jnp.ndarray        # (n_blocks, 3, chunk)
    nw: jnp.ndarray        # (n_blocks, 3, chunk)
    tri_id: jnp.ndarray    # (n_blocks, 1, chunk) i32 original triangle ids
    valid: jnp.ndarray     # (n_blocks, 1, chunk) f32
    blk_tile: jnp.ndarray  # (n_blocks,) i32 tile id of each block
    blk_first: jnp.ndarray  # (n_blocks,) i32 1 = first block of its tile
    tile_used: jnp.ndarray  # (n_tiles,) bool tile has any content
    big_mask: jnp.ndarray  # (T,) bool triangles for the brute-force pass
    overflow: jnp.ndarray  # () i32 dropped pair count


def bin_triangles(
    setup: RasterSetup,
    num_z: jnp.ndarray,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    chunk: int,
    max_span: int = 2,       # triangles spanning <= max_span tiles per axis
    budget_factor: float = 3.0,
) -> BinnedTriangles:
    """Build block-aligned bins.  num_z allows the caller to pre-flip the
    depth key for DEPTH_MIN mode."""
    n_tx = -(-width // tile_w)
    n_ty = -(-height // tile_h)
    n_tiles = n_tx * n_ty
    t_count = setup.edges.shape[0]
    s_slots = max_span * max_span

    bbox = setup.bbox
    tx0 = (bbox[:, 0] // tile_w).astype(jnp.int32)
    ty0 = (bbox[:, 1] // tile_h).astype(jnp.int32)
    tx1 = (bbox[:, 2] // tile_w).astype(jnp.int32)
    ty1 = (bbox[:, 3] // tile_h).astype(jnp.int32)
    span_w = tx1 - tx0 + 1
    span_h = ty1 - ty0 + 1
    small = setup.valid & (span_w <= max_span) & (span_h <= max_span)
    big = setup.valid & ~small

    # (T, S) candidate tiles
    s = jnp.arange(s_slots, dtype=jnp.int32)
    sy = s[None, :] // span_w[:, None]
    sx = s[None, :] % span_w[:, None]
    slot_tile = (ty0[:, None] + sy) * n_tx + tx0[:, None] + sx
    slot_ok = small[:, None] & (s[None, :] < (span_w * span_h)[:, None])
    sentinel = jnp.int32(n_tiles)
    keys = jnp.where(slot_ok, slot_tile, sentinel).reshape(-1)
    tri_of_slot = jnp.broadcast_to(
        jnp.arange(t_count, dtype=jnp.int32)[:, None], (t_count, s_slots)
    ).reshape(-1)

    order = jnp.argsort(keys)
    sorted_key = keys[order]
    sorted_tri = tri_of_slot[order]

    # per-tile ranges in the sorted pair array
    starts = jnp.searchsorted(sorted_key, jnp.arange(n_tiles + 1, dtype=jnp.int32))
    counts = jnp.diff(starts)  # (n_tiles,)

    n_blocks = int(budget_factor * t_count) // chunk + n_tiles
    n_blocks = max(n_blocks, 2)
    nblk = -(-counts // chunk)  # ceil
    blk_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nblk).astype(jnp.int32)]
    )
    total_used = blk_start[-1]

    # block -> tile map + first-block flags
    blk_ids = jnp.arange(n_blocks, dtype=jnp.int32)
    blk_tile = jnp.clip(
        jnp.searchsorted(blk_start, blk_ids, side="right").astype(jnp.int32) - 1,
        0,
        n_tiles - 1,
    )
    in_use = blk_ids < total_used
    blk_first = (blk_ids == blk_start[blk_tile]).astype(jnp.int32)

    # Gather-based block fill (no scatter -- TPU-friendly): slot (b, s) reads
    # sorted pair starts[tile(b)] + (b - blk_start[tile(b)]) * chunk + s.
    slot = jnp.arange(chunk, dtype=jnp.int32)[None, :]
    pair_src = (
        starts[blk_tile][:, None]
        + (blk_ids - blk_start[blk_tile])[:, None] * chunk
        + slot
    )
    slot_valid = in_use[:, None] & (pair_src < starts[blk_tile + 1][:, None])
    pair_src = jnp.clip(pair_src, 0, sorted_tri.shape[0] - 1)
    blocks_tid = jnp.where(slot_valid, sorted_tri[pair_src], 0)
    blocks_valid = slot_valid.astype(jnp.float32)
    # overflow: pairs beyond the block budget are simply never gathered
    overflow = jnp.maximum(
        starts[n_tiles] - jnp.sum(blocks_valid).astype(jnp.int32), 0
    )

    # gather coefficients into block layout: (n_blocks, chunk, ...)
    e = setup.edges[blocks_tid]          # (n_blocks, chunk, 3, 3)
    ea = e[..., 0].transpose(0, 2, 1)    # (n_blocks, 3, chunk)
    eb = e[..., 1].transpose(0, 2, 1)
    ec = e[..., 2].transpose(0, 2, 1)
    nz = num_z[blocks_tid].transpose(0, 2, 1)
    nw = setup.num_w[blocks_tid].transpose(0, 2, 1)

    return BinnedTriangles(
        ea=ea,
        eb=eb,
        ec=ec,
        nz=nz,
        nw=nw,
        tri_id=blocks_tid[:, None, :],
        valid=blocks_valid[:, None, :],
        blk_tile=blk_tile,
        blk_first=blk_first,
        tile_used=counts > 0,
        big_mask=big,
        overflow=overflow.astype(jnp.int32),
    )
