"""TEST ORACLE -- independent visibility-buffer attribute interpolation.

Not part of the production path (render/common.py resolve_materials has its
own fused resolve); tests/test_raster.py uses this standalone implementation
to cross-check the rasterizer's homogeneous edge functions.

The homogeneous edge functions e_k(q) from the rasterizer are (up to a common
scale) the *object-space* barycentric coordinates of the fragment, so
``sum(e_k * a_k) / sum(e_k)`` interpolates any vertex attribute with
perspective correction built in -- this replaces the hardware interpolators
feeding ``DeferredBasePass.hlsl`` / ``ForwardPS.hlsl`` pixel shaders.
"""

from __future__ import annotations

import jax.numpy as jnp


def barycentrics(
    pix_h: jnp.ndarray,
    tris: jnp.ndarray,
    tri_id: jnp.ndarray,
    width: int,
    height: int,
):
    """Per-pixel unnormalized barycentrics for the winning triangle.

    pix_h: (V, 3) homogeneous pixel coords (from viewport_homogeneous).
    tris: (T, 3); tri_id: (H, W) int32 (-1 = empty).

    Returns (bary (H, W, 3) normalized weights, valid (H, W) bool,
    view_w (H, W) interpolated clip w = view-space depth).
    """
    safe_id = jnp.maximum(tri_id, 0)
    v = tris[safe_id]  # (H, W, 3)
    p0 = pix_h[v[..., 0]]
    p1 = pix_h[v[..., 1]]
    p2 = pix_h[v[..., 2]]

    yy = jnp.arange(height, dtype=jnp.float32)[:, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, :]
    qx = xx + 0.5
    qy = yy + 0.5

    def edge(pa, pb):
        # cross(pa, pb) . (qx, qy, 1)
        cx = pa[..., 1] * pb[..., 2] - pa[..., 2] * pb[..., 1]
        cy = pa[..., 2] * pb[..., 0] - pa[..., 0] * pb[..., 2]
        cz = pa[..., 0] * pb[..., 1] - pa[..., 1] * pb[..., 0]
        return cx * qx + cy * qy + cz

    e0 = edge(p1, p2)
    e1 = edge(p2, p0)
    e2 = edge(p0, p1)
    s = e0 + e1 + e2
    s = jnp.where(s != 0.0, s, 1.0)
    bary = jnp.stack([e0 / s, e1 / s, e2 / s], axis=-1)
    valid = tri_id >= 0
    view_w = (
        bary[..., 0] * p0[..., 2] + bary[..., 1] * p1[..., 2] + bary[..., 2] * p2[..., 2]
    )
    return bary, valid, view_w


def interpolate(
    attr: jnp.ndarray, tris: jnp.ndarray, tri_id: jnp.ndarray, bary: jnp.ndarray
) -> jnp.ndarray:
    """Interpolate one vertex attribute (V, C) -> (H, W, C)."""
    safe_id = jnp.maximum(tri_id, 0)
    v = tris[safe_id]  # (H, W, 3)
    a = attr[v]  # (H, W, 3, C)
    return jnp.einsum("hwk,hwkc->hwc", bary, a)


def interpolate_many(attrs: dict, tris: jnp.ndarray, tri_id: jnp.ndarray, bary: jnp.ndarray) -> dict:
    """Interpolate a dict of vertex attributes, sharing the index gather."""
    safe_id = jnp.maximum(tri_id, 0)
    v = tris[safe_id]
    out = {}
    for name, attr in attrs.items():
        a = attr[v]
        out[name] = jnp.einsum("hwk,hwkc->hwc", bary, a)
    return out


# --- de-indexed (expanded) variants: vertex i of triangle t at row 3t+i ---
# No index-buffer gathers: per-pixel vertex rows follow arithmetically from
# the winning triangle id, and vertex data gathers pull from the expanded
# (3T, C) arrays directly.


def barycentrics_expanded(
    pix_h: jnp.ndarray,
    tri_id: jnp.ndarray,
    width: int,
    height: int,
):
    """Like barycentrics() for de-indexed geometry; pix_h is (3T, 3)."""
    safe_id = jnp.maximum(tri_id, 0)
    t = pix_h.shape[0] // 3
    tri_verts = pix_h.reshape(t, 3 * 3)  # one row per triangle
    pv = tri_verts[safe_id]  # (H, W, 9) -- single gather
    p0 = pv[..., 0:3]
    p1 = pv[..., 3:6]
    p2 = pv[..., 6:9]

    yy = jnp.arange(height, dtype=jnp.float32)[:, None]
    xx = jnp.arange(width, dtype=jnp.float32)[None, :]
    qx = xx + 0.5
    qy = yy + 0.5

    def edge(pa, pb):
        cx = pa[..., 1] * pb[..., 2] - pa[..., 2] * pb[..., 1]
        cy = pa[..., 2] * pb[..., 0] - pa[..., 0] * pb[..., 2]
        cz = pa[..., 0] * pb[..., 1] - pa[..., 1] * pb[..., 0]
        return cx * qx + cy * qy + cz

    e0 = edge(p1, p2)
    e1 = edge(p2, p0)
    e2 = edge(p0, p1)
    s = e0 + e1 + e2
    s = jnp.where(s != 0.0, s, 1.0)
    bary = jnp.stack([e0 / s, e1 / s, e2 / s], axis=-1)
    valid = tri_id >= 0
    view_w = (
        bary[..., 0] * p0[..., 2] + bary[..., 1] * p1[..., 2] + bary[..., 2] * p2[..., 2]
    )
    return bary, valid, view_w


def interpolate_expanded(
    attr: jnp.ndarray, tri_id: jnp.ndarray, bary: jnp.ndarray
) -> jnp.ndarray:
    """Interpolate a de-indexed vertex attribute (3T, C) -> (H, W, C) with a
    single per-pixel row gather of the packed (T, 3C) layout."""
    safe_id = jnp.maximum(tri_id, 0)
    t = attr.shape[0] // 3
    c = attr.shape[1]
    packed = attr.reshape(t, 3 * c)
    av = packed[safe_id]  # (H, W, 3C)
    a = av.reshape(av.shape[:-1] + (3, c))
    return jnp.einsum("hwk,hwkc->hwc", bary, a)


def interpolate_many_expanded(attrs: dict, tri_id: jnp.ndarray, bary: jnp.ndarray) -> dict:
    """Interpolate several de-indexed attributes with ONE fused gather:
    concatenate the per-vertex channels, gather once, split."""
    names = list(attrs)
    chans = [attrs[n].shape[1] for n in names]
    t = attrs[names[0]].shape[0] // 3
    packed = jnp.concatenate(
        [attrs[n].reshape(t, 3 * attrs[n].shape[1]) for n in names], axis=1
    )  # (T, sum(3C))
    safe_id = jnp.maximum(tri_id, 0)
    av = packed[safe_id]  # (H, W, total)
    out = {}
    off = 0
    for n, c in zip(names, chans):
        block = av[..., off : off + 3 * c].reshape(av.shape[:-1] + (3, c))
        out[n] = jnp.einsum("hwk,hwkc->hwc", bary, block)
        off += 3 * c
    return out
