"""GPU-driven culling: frustum + HZB occlusion over per-model AABBs.

Port of ``CullIndirectArgs.hlsl`` CSMain: the 64-thread model-cull dispatch
becomes one vectorized op over the (M,) model tables; instead of writing
InstanceCount into indirect-args bytes, the result is a boolean draw mask
that the rasterizer's triangle-mask input consumes (static shapes -- mask,
don't compact).  Occlusion uses the previous frame's HZB pyramid
(one-frame latency, ``DeferredRenderer.cpp:519-520, 996, 1209-1210``).
"""

from __future__ import annotations

import jax.numpy as jnp

from .hzb import hzb_load


def frustum_cull(bounds_min: jnp.ndarray, bounds_max: jnp.ndarray, planes: jnp.ndarray) -> jnp.ndarray:
    """Positive-vertex test (``CullIndirectArgs.hlsl:24-41``).
    bounds_*: (M, 3); planes: (6, 4).  True = visible."""
    pv = jnp.where(planes[None, :, :3] >= 0.0, bounds_max[:, None, :], bounds_min[:, None, :])
    dist = jnp.einsum("mpc,pc->mp", pv, planes[:, :3]) + planes[None, :, 3]
    return jnp.all(dist >= 0.0, axis=1)


def occlusion_cull(
    bounds_min: jnp.ndarray,
    bounds_max: jnp.ndarray,
    view_proj: jnp.ndarray,
    hzb_pyramid: jnp.ndarray,
    layout,
    hzb_width: int,
    hzb_height: int,
) -> jnp.ndarray:
    """HZB occlusion test (``CullIndirectArgs.hlsl:48-130``).
    Returns True where the model is OCCLUDED."""
    m = bounds_min.shape[0]
    # 8 corners (M, 8, 3)
    sel = jnp.asarray(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], jnp.float32
    )
    corners = bounds_min[:, None, :] + (bounds_max - bounds_min)[:, None, :] * sel[None]
    hom = jnp.concatenate([corners, jnp.ones((m, 8, 1), jnp.float32)], axis=-1)
    clip = jnp.einsum("mkc,cd->mkd", hom, view_proj)

    w = clip[..., 3]
    any_behind = jnp.any(w <= 0.0, axis=1)
    w_safe = jnp.where(w > 0.0, w, 1.0)
    ndc = clip[..., :3] / w_safe[..., None]
    uv_x = ndc[..., 0] * 0.5 + 0.5
    uv_y = 1.0 - (ndc[..., 1] * 0.5 + 0.5)

    min_u = jnp.min(uv_x, axis=1)
    max_u = jnp.max(uv_x, axis=1)
    min_v = jnp.min(uv_y, axis=1)
    max_v = jnp.max(uv_y, axis=1)
    max_depth = jnp.max(ndc[..., 2], axis=1)

    off_screen = (max_u < 0.0) | (max_v < 0.0) | (min_u > 1.0) | (min_v > 1.0)

    min_u = jnp.clip(min_u, 0.0, 1.0)
    max_u = jnp.clip(max_u, 0.0, 1.0)
    min_v = jnp.clip(min_v, 0.0, 1.0)
    max_v = jnp.clip(max_v, 0.0, 1.0)

    ext_x = (max_u - min_u) * hzb_width
    ext_y = (max_v - min_v) * hzb_height
    max_dim = jnp.maximum(ext_x, ext_y)
    n_mips = len(layout)
    mip = jnp.where(
        max_dim > 1.0,
        jnp.clip(jnp.floor(jnp.log2(jnp.maximum(max_dim, 1.0))), 0.0, n_mips - 1.0),
        0.0,
    ).astype(jnp.int32)

    mip_w = jnp.maximum(1, hzb_width >> mip)
    mip_h = jnp.maximum(1, hzb_height >> mip)
    min_cx = jnp.minimum((min_u * mip_w).astype(jnp.int32), mip_w - 1)
    max_cx = jnp.minimum((max_u * mip_w).astype(jnp.int32), mip_w - 1)
    min_cy = jnp.minimum((min_v * mip_h).astype(jnp.int32), mip_h - 1)
    max_cy = jnp.minimum((max_v * mip_h).astype(jnp.int32), mip_h - 1)

    d = jnp.minimum(
        jnp.minimum(
            hzb_load(hzb_pyramid, layout, mip, min_cx, min_cy),
            hzb_load(hzb_pyramid, layout, mip, max_cx, min_cy),
        ),
        jnp.minimum(
            hzb_load(hzb_pyramid, layout, mip, min_cx, max_cy),
            hzb_load(hzb_pyramid, layout, mip, max_cx, max_cy),
        ),
    )
    occluded = max_depth < d
    return occluded & ~any_behind & ~off_screen
