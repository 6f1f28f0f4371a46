"""Visibility-buffer attribute resolve: per-pixel barycentrics + interpolation.

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
