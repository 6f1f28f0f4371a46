"""Hierarchical-Z buffer: min-depth mip pyramid packed into one flat buffer.

Port of ``BuildHZB.hlsl`` (min-filter 2x2 downsample chain at half the render
resolution) -- the groupshared multi-mip cascade becomes a simple reduction
chain that XLA schedules; the pyramid packs into one 1D buffer with static
per-mip offsets so the occlusion test (ops/cull.py) can gather any mip with
one index computation (and the pyramid stays a single pytree leaf in
FrameState).
"""

from __future__ import annotations

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


@named_pass("BuildHZB")
def build_hzb(depth: jnp.ndarray, layout) -> jnp.ndarray:
    """Full-res reverse-Z depth (H, W) -> packed min-depth pyramid.

    Mip 0 of the pyramid is half the render resolution
    (``DeferredRenderer.cpp:2801-2878``); empty pixels carry depth 0 (far),
    min-propagation matches the HLSL's clamped-edge SampleDepth.
    """
    parts = []
    cur = depth
    for _off, w, h in layout:
        ch, cw = cur.shape
        # clamp-pad odd dims like SampleDepth's min(coord, size-1)
        th, tw = h * 2, w * 2
        if ch != th or cw != tw:
            cur = jnp.pad(cur, ((0, max(0, th - ch)), (0, max(0, tw - cw))), mode="edge")[
                :th, :tw
            ]
        cur = cur.reshape(h, 2, w, 2).min(axis=(1, 3))
        parts.append(cur.reshape(-1))
    return jnp.concatenate(parts)


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
