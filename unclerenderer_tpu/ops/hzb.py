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
    """One min-downsample level with the HLSL's clamped-edge/crop semantics
    (written as 4 strided slices + elementwise min so the same code lowers
    in both XLA and Mosaic -- identical values to reshape(h,2,w,2).min)."""
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
    return jnp.minimum(
        jnp.minimum(cur[0::2, 0::2], cur[1::2, 0::2]),
        jnp.minimum(cur[0::2, 1::2], cur[1::2, 1::2]),
    )


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
            cur = _reduce_level(cur, w, h)
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
