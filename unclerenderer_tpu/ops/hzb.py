"""Hierarchical-Z buffer: min-depth mip pyramid packed into one flat buffer.

Port of ``BuildHZB.hlsl`` (min-filter 2x2 downsample chain at half the render
resolution) -- the groupshared multi-mip cascade becomes a simple reduction
chain that XLA schedules; the pyramid packs into one 1D buffer with static
per-mip offsets so the occlusion test (ops/cull.py) can gather any mip with
one index computation (and the pyramid stays a single pytree leaf in
FrameState).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.passes import named_pass


def hzb_layout(width: int, height: int):
    """Static (offsets, sizes) for a pyramid starting at (height, width).
    Returns list of (offset, w, h) and total length."""
    layout = []
    off = 0
    w, h = width, height
    while True:
        layout.append((off, w, h))
        off += w * h
        if w == 1 and h == 1:
            break
        w, h = max(1, w // 2), max(1, h // 2)
    return layout, off


def _reduce_level(cur: jnp.ndarray, w: int, h: int) -> jnp.ndarray:
    """One min-downsample level with the HLSL's clamped-edge/crop semantics.

    Written as pad/crop + reshape(h, 2, w, 2) + min-reduce: strided slices
    (``cur[0::2, 0::2]``) lower to general gathers, which round-4 metal
    measured pathologically slow in XLA (24.5 ms for the whole chain, ~800x
    its bandwidth floor) and which Mosaic refuses outright; the reshape form
    is a layout-friendly reduction both compilers handle.  Identical values
    (same 2x2 min tree, no NaNs in depth)."""
    ch, cw = cur.shape
    th, tw = h * 2, w * 2
    if ch < th:
        cur = jnp.concatenate([cur, cur[-1:, :]], axis=0)
    elif ch > th:
        cur = cur[:th, :]
    if cw < tw:
        cur = jnp.concatenate([cur, cur[:, -1:]], axis=1)
    elif cw > tw:
        cur = cur[:, :tw]
    return cur.reshape(h, 2, w, 2).min(axis=(1, 3))


def _extract_matrices(src: int, dst: int, offset: int, dtype=jnp.float32):
    """(src, dst) one-hot extraction matrix E with E[j, i] = 1 iff
    j == clamp(2*i + offset, 0, src-1) -- column i of ``X @ E`` selects
    source column 2i+offset with the HLSL chain's clamp-at-edge/crop
    semantics folded in (clamping reproduces the duplicate-last pad; columns
    past 2*dst are never selected, reproducing the crop)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (src, dst), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (src, dst), 1)
    want = jnp.clip(2 * cols + offset, 0, src - 1)
    return (rows == want).astype(dtype)


def _reduce_level_mxu(cur: jnp.ndarray, w: int, h: int) -> jnp.ndarray:
    """_reduce_level for Mosaic: 2x2 min via four one-hot MXU extractions
    (rows then columns) -- no gathers, no lane-dim reshapes, bit-identical
    to _reduce_level for finite depths (0*x = 0 and one-hot sums add exact
    zeros; depth buffers carry no NaN/inf)."""
    ch, cw = cur.shape
    r_even = _extract_matrices(ch, h, 0).T @ cur   # (h, cw)
    r_odd = _extract_matrices(ch, h, 1).T @ cur
    rmin = jnp.minimum(r_even, r_odd)
    c_even = rmin @ _extract_matrices(cw, w, 0)    # (h, w)
    c_odd = rmin @ _extract_matrices(cw, w, 1)
    return jnp.minimum(c_even, c_odd)


@named_pass("BuildHZB")
def build_hzb(depth: jnp.ndarray, layout, pallas_tail: bool = False,
              interpret: bool = False) -> jnp.ndarray:
    """Full-res reverse-Z depth (H, W) -> packed min-depth pyramid.

    Mip 0 of the pyramid is half the render resolution
    (``DeferredRenderer.cpp:2801-2878``); empty pixels carry depth 0 (far),
    min-propagation matches the HLSL's clamped-edge SampleDepth.

    pallas_tail: compute every level past the first two in ONE Pallas
    launch (the whole tail fits VMEM) instead of ~9 separate tiny XLA
    reductions -- the mip-cascade analog of BuildHZB.hlsl's 4-mips-per-
    dispatch groupshared loop.  Bit-identical values (same min tree).
    """
    n_xla = len(layout) if not pallas_tail else min(2, len(layout))
    parts = []
    cur = depth
    for _off, w, h in layout[:n_xla]:
        cur = _reduce_level(cur, w, h)
        parts.append(cur.reshape(-1))
    if n_xla < len(layout):
        parts.extend(
            t.reshape(-1) for t in _hzb_tail_pallas(cur, layout[n_xla:], interpret)
        )
    return jnp.concatenate(parts)


def _hzb_tail_pallas(top: jnp.ndarray, tail_layout, interpret: bool):
    """All remaining pyramid levels in one kernel: ``top`` (the last
    XLA-computed level, <= ~0.5 MB at 1080p) loads into VMEM once and the
    unrolled min cascade writes each level to its own output ref."""
    from jax.experimental import pallas as pl

    def kernel(in_ref, *out_refs):
        cur = in_ref[...]
        for (_off, w, h), ref in zip(tail_layout, out_refs):
            cur = _reduce_level_mxu(cur, w, h)
            ref[...] = cur

    out_shape = [
        jax.ShapeDtypeStruct((h, w), jnp.float32) for _off, w, h in tail_layout
    ]
    return pl.pallas_call(kernel, out_shape=out_shape, interpret=interpret)(top)


def hzb_load(pyramid: jnp.ndarray, layout, mip: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Point-load pyramid[mip][y, x] with dynamic mip/coords (any shape)."""
    offsets = jnp.asarray([o for o, _w, _h in layout], jnp.int32)
    widths = jnp.asarray([w for _o, w, _h in layout], jnp.int32)
    heights = jnp.asarray([h for _o, _w, h in layout], jnp.int32)
    mip = jnp.clip(mip, 0, len(layout) - 1)
    w = widths[mip]
    h = heights[mip]
    xi = jnp.clip(x, 0, w - 1)
    yi = jnp.clip(y, 0, h - 1)
    return pyramid[offsets[mip] + yi * w + xi]
