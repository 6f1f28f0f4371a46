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


# ---------------------------------------------------------------------------
# Packed-neighborhood PCF: the deferred 4-tap pattern reads a 3x3 texel
# footprint; packing each texel's 3x3 neighborhood into one 12-channel row
# (built per frame from the fresh shadow map) turns 16 comparison gathers
# into ONE row gather per pixel.
# ---------------------------------------------------------------------------


def pack_shadow9(shadow_map: jnp.ndarray) -> jnp.ndarray:
    """(S, S) depth -> (S, S, 12) f16: channels [dy*3+dx] = depth(y+dy, x+dx)
    for dy, dx in 0..2, padded with +inf outside (BORDER = always lit).

    Stored as float16 to halve the per-pixel gather bytes (measured ~20%
    faster at 4096^2).  The stored depth is lifted by 5e-4 (> one f16 ulp in
    [0.5, 1)) before quantization so rounding can never pull a blocker below
    its true depth -- no acne; the effective comparison bias grows by at most
    1e-3 against a 2e-3 default bias."""
    s = shadow_map.shape[0]
    inf = jnp.float32(jnp.inf)
    padded = jnp.pad(shadow_map + 5e-4, ((0, 2), (0, 2)), constant_values=inf)
    chans = [padded[dy : dy + s, dx : dx + s] for dy in range(3) for dx in range(3)]
    chans += [jnp.zeros_like(shadow_map)] * 3  # pad to 12 for alignment
    return jnp.stack(chans, axis=-1).astype(jnp.float16)


def shadow_factor_packed(
    shadow9_flat: jnp.ndarray,
    size: int,
    world_pos: jnp.ndarray,
    light_view_proj: jnp.ndarray,
    shadow_strength,
    shadow_bias,
    pcf: str = "deferred",
) -> jnp.ndarray:
    """shadow_factor with one packed-neighborhood gather per pixel.
    shadow9_flat: (S*S, 12) from pack_shadow9."""
    p = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], axis=-1)
    sp = p @ light_view_proj
    coord = sp[..., :3] / jnp.where(sp[..., 3:4] != 0.0, sp[..., 3:4], 1.0)
    uv = jnp.stack(
        [coord[..., 0] * 0.5 + 0.5, coord[..., 1] * -0.5 + 0.5], axis=-1
    )
    compare = coord[..., 2] - shadow_bias

    tx = uv[..., 0] * size - 0.5
    ty = uv[..., 1] * size - 0.5
    x0 = jnp.floor(tx)
    y0 = jnp.floor(ty)
    fx = tx - x0
    fy = ty - y0
    # clamp the base so out-of-range neighborhoods read the +inf border
    xi = jnp.clip(x0.astype(jnp.int32), -2, size - 1)
    yi = jnp.clip(y0.astype(jnp.int32), -2, size - 1)
    # negative bases: shift into the padded region by clamping to 0 and
    # selecting border behavior via the in-range test below instead
    xi0 = jnp.clip(xi, 0, size - 1)
    yi0 = jnp.clip(yi, 0, size - 1)
    nb = jnp.take(shadow9_flat, yi0 * size + xi0, axis=0).astype(jnp.float32)

    # comparison results for the 3x3 block; texels whose true coordinate was
    # clamped (base off the map) behave as border (lit) via the in-map mask.
    passed = []
    for dy in range(3):
        for dx in range(3):
            txc = xi0 + dx
            tyc = yi0 + dy
            true_x = xi + dx
            true_y = yi + dy
            in_map = (true_x >= 0) & (true_x < size) & (true_y >= 0) & (true_y < size)
            d = nb[..., dy * 3 + dx]
            ok = (compare <= d) | ~in_map | (txc != true_x) | (tyc != true_y)
            passed.append(ok.astype(jnp.float32))

    def lin(dx, dy):
        c00 = passed[dy * 3 + dx]
        c10 = passed[dy * 3 + dx + 1]
        c01 = passed[(dy + 1) * 3 + dx]
        c11 = passed[(dy + 1) * 3 + dx + 1]
        return (c00 * (1 - fx) + c10 * fx) * (1 - fy) + (c01 * (1 - fx) + c11 * fx) * fy

    if pcf == "deferred":
        s4 = 0.25 * (lin(0, 0) + lin(1, 0) + lin(0, 1) + lin(1, 1))
    else:
        # forward: 4 point taps at +-half-texel diagonals = the 2x2 corners
        s4 = 0.25 * (passed[0] + passed[1] + passed[3] + passed[4])
    s4 = 1.0 + (s4 - 1.0) * shadow_strength

    in_range = (
        (uv[..., 0] >= 0.0) & (uv[..., 0] <= 1.0) & (uv[..., 1] >= 0.0) & (uv[..., 1] <= 1.0)
    )
    return jnp.where((shadow_strength > 0.0) & in_range, s4, 1.0)
