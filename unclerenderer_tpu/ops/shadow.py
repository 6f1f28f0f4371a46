"""Directional shadow mapping: comparison sampling + PCF.

The shadow map itself comes from the shared rasterizer in DEPTH_MIN mode
(depth-only, front-face culled, LESS_EQUAL -- ``Renderer.cpp:271-296``).
This module ports the receiver side:

* ``SampleCmpLevelZero`` with a **linear comparison sampler** and BORDER
  addressing (border depth 1.0 = unoccluded) -- deferred path
  (``DeferredRenderer.cpp:1723-1726``),
* the 4-tap PCF patterns of both shaders: deferred taps at +x, +y, +xy
  (``DeferredLighting.hlsl:62-72``), forward taps at the four half-texel
  diagonals (``ForwardPS.hlsl:110-121``).
"""

from __future__ import annotations

import jax.numpy as jnp


def _cmp_gather(shadow_map: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray, compare: jnp.ndarray) -> jnp.ndarray:
    """Point comparison fetch with BORDER = 1.0 (pass) outside the map."""
    h, w = shadow_map.shape
    inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    sx = jnp.clip(ix, 0, w - 1)
    sy = jnp.clip(iy, 0, h - 1)
    depth = shadow_map[sy, sx]
    # LESS_EQUAL comparison: 1 when compare <= stored depth (lit).
    passed = (compare <= depth).astype(jnp.float32)
    return jnp.where(inside, passed, 1.0)


def sample_cmp_linear(shadow_map: jnp.ndarray, uv: jnp.ndarray, compare: jnp.ndarray) -> jnp.ndarray:
    """Linear-comparison sample (hardware PCF): compare at the 4 bilinear
    texels, then bilinearly blend the 0/1 results."""
    h, w = shadow_map.shape
    tx = uv[..., 0] * w - 0.5
    ty = uv[..., 1] * h - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    c00 = _cmp_gather(shadow_map, x0i, y0i, compare)
    c10 = _cmp_gather(shadow_map, x0i + 1, y0i, compare)
    c01 = _cmp_gather(shadow_map, x0i, y0i + 1, compare)
    c11 = _cmp_gather(shadow_map, x0i + 1, y0i + 1, compare)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def sample_cmp_point(shadow_map: jnp.ndarray, uv: jnp.ndarray, compare: jnp.ndarray) -> jnp.ndarray:
    """Point-comparison sample (forward path sampler,
    ``ForwardRenderer.cpp:970-973``)."""
    h, w = shadow_map.shape
    ix = jnp.floor(uv[..., 0] * w).astype(jnp.int32)
    iy = jnp.floor(uv[..., 1] * h).astype(jnp.int32)
    return _cmp_gather(shadow_map, ix, iy, compare)


def shadow_factor(
    shadow_map: jnp.ndarray,
    world_pos: jnp.ndarray,
    light_view_proj: jnp.ndarray,
    shadow_strength: float,
    shadow_bias: float,
    pcf: str = "deferred",
) -> jnp.ndarray:
    """Full receiver math shared by both shaders: project into light space,
    4-tap PCF, lerp(1, shadow, strength); outside-map or strength<=0 -> 1."""
    h, w = shadow_map.shape
    p = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], axis=-1)
    sp = p @ light_view_proj
    coord = sp[..., :3] / jnp.where(sp[..., 3:4] != 0.0, sp[..., 3:4], 1.0)
    uv = jnp.stack(
        [coord[..., 0] * 0.5 + 0.5, coord[..., 1] * -0.5 + 0.5], axis=-1
    )
    compare = coord[..., 2] - shadow_bias

    texel = jnp.array([1.0 / w, 1.0 / h], jnp.float32)
    if pcf == "deferred":
        # DeferredLighting.hlsl:62-72 (linear cmp sampler)
        s = 0.25 * (
            sample_cmp_linear(shadow_map, uv, compare)
            + sample_cmp_linear(shadow_map, uv + jnp.array([texel[0], 0.0]), compare)
            + sample_cmp_linear(shadow_map, uv + jnp.array([0.0, texel[1]]), compare)
            + sample_cmp_linear(shadow_map, uv + texel, compare)
        )
    else:
        # ForwardPS.hlsl:110-121 (point cmp sampler, half-texel diagonals)
        ht = 0.5 * texel
        s = 0.25 * (
            sample_cmp_point(shadow_map, uv + jnp.array([ht[0], ht[1]]), compare)
            + sample_cmp_point(shadow_map, uv + jnp.array([-ht[0], ht[1]]), compare)
            + sample_cmp_point(shadow_map, uv + jnp.array([ht[0], -ht[1]]), compare)
            + sample_cmp_point(shadow_map, uv + jnp.array([-ht[0], -ht[1]]), compare)
        )
    s = 1.0 + (s - 1.0) * shadow_strength  # lerp(1, s, strength)

    in_range = (
        (uv[..., 0] >= 0.0) & (uv[..., 0] <= 1.0) & (uv[..., 1] >= 0.0) & (uv[..., 1] <= 1.0)
    )
    enabled = shadow_strength > 0.0
    return jnp.where(enabled & in_range, s, 1.0)
