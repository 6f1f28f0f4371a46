"""Texture sampling: atlas gathers with wrap/clamp, bilinear/trilinear, cube.

TPUs have no texture units, so D3D sampler state becomes explicit math over
the packed atlas (textures/atlas.py).  Implements the reference's sampler
set: material sampler = WRAP + mips (``ForwardRenderer.cpp:956-959``,
anisotropic approximated as trilinear), IBL sampler = CLAMP linear
(``:982-985``), shadow comparison sampling lives in ops/shadow.py.

Mip selection follows the D3D spec: level = log2(max axis of the UV
footprint), from screen-space UV derivatives (forward differences, the
software analog of the GPU's 2x2 quad derivatives).
"""

from __future__ import annotations

import jax.numpy as jnp

ADDRESS_WRAP = 0
ADDRESS_CLAMP = 1


def _wrap_index(i: jnp.ndarray, size: jnp.ndarray, mode: int) -> jnp.ndarray:
    if mode == ADDRESS_WRAP:
        return jnp.mod(i, size)
    return jnp.clip(i, 0, size - 1)


def uv_screen_lod(uv: jnp.ndarray, base_w: jnp.ndarray, base_h: jnp.ndarray,
                  same_tri_x: jnp.ndarray, same_tri_y: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel LOD from screen-space UV derivatives.

    uv: (H, W, 2).  base_w/base_h: (H, W) mip-0 texture size per pixel.
    same_tri_x/y: (H, W) bool -- whether the +x / +y neighbor belongs to the
    same triangle (derivatives across triangle edges are garbage; we fall
    back to the other direction or 0, akin to GPU quad helper lanes).
    """
    dx = jnp.diff(uv, axis=1, append=uv[:, -1:, :])
    dy = jnp.diff(uv, axis=0, append=uv[-1:, :, :])
    # Backward difference where the forward neighbor crosses a triangle edge.
    bx = jnp.diff(uv, axis=1, prepend=uv[:, :1, :])
    by = jnp.diff(uv, axis=0, prepend=uv[:1, :, :])
    dx = jnp.where(same_tri_x[..., None], dx, bx)
    dy = jnp.where(same_tri_y[..., None], dy, by)
    sz = jnp.stack([base_w.astype(jnp.float32), base_h.astype(jnp.float32)], axis=-1)
    lx = jnp.sum((dx * sz) ** 2, axis=-1)
    ly = jnp.sum((dy * sz) ** 2, axis=-1)
    rho2 = jnp.maximum(lx, ly)
    return 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12))


def apply_texture_transform(uv: jnp.ndarray, offset_scale: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """KHR_texture_transform as the shaders apply it
    (``DeferredBasePass.hlsl:49-56``): scale, rotate, offset.

    offset_scale: (..., 4) = (off.x, off.y, scale.x, scale.y)
    rotation: (..., 2) = (cos, sin)
    """
    scaled = uv * offset_scale[..., 2:4]
    cos_r = rotation[..., 0]
    sin_r = rotation[..., 1]
    rot = jnp.stack(
        [
            scaled[..., 0] * cos_r - scaled[..., 1] * sin_r,
            scaled[..., 0] * sin_r + scaled[..., 1] * cos_r,
        ],
        axis=-1,
    )
    return rot + offset_scale[..., 0:2]


def cube_direction_to_face_uv(direction: jnp.ndarray):
    """D3D cubemap addressing: direction (..., 3) -> (face (...,) i32,
    uv (..., 2) in [0,1]).  Face order +X,-X,+Y,-Y,+Z,-Z."""
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)

    face = jnp.where(
        is_x,
        jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)

    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-20)
    # D3D face (u, v) conventions (D3D11 spec 18.9 "Cube Map Face Fetch")
    u = jnp.where(
        is_x,
        jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x)),
    )
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y >= 0, z, -z), -y))
    uv = jnp.stack([(u / ma + 1.0) * 0.5, (v / ma + 1.0) * 0.5], axis=-1)
    return face, uv



# ---------------------------------------------------------------------------
# Quad-tap sampling: one gather per bilinear tap.
#
# TPU gathers are latency-bound (tens of ns per element, nearly independent
# of row width), so the quad atlas (textures/atlas.py build_quad_atlas)
# stores each texel's full 2x2 bilinear footprint in one 16-channel row and
# sampling fetches it with a single row gather.  Wrap for the +1 neighbors is
# baked into the quads at build time.
# ---------------------------------------------------------------------------


_MIP_RECT_LEVELS = 14


def _pyramid_rect(rect0, level):
    """rect0: (..., 4) float (x0, y0, w0, h0); level: (...,) int32 ->
    (x, y, w, h) of that mip, level clamped to the chain length.

    Mip L of a pow2 texture sits at x-offset 2*(w0 - (w0 >> L)) in the
    pyramid atlas row (textures/atlas.py build_pyramid_quad_atlas), so the
    rect computes with shifts -- no per-pixel table lookups.
    """
    x0 = rect0[..., 0].astype(jnp.int32)
    y0 = rect0[..., 1].astype(jnp.int32)
    w0 = rect0[..., 2].astype(jnp.int32)
    h0 = rect0[..., 3].astype(jnp.int32)
    mx = jnp.maximum(w0, h0).astype(jnp.float32)
    lmax = jnp.round(jnp.log2(jnp.maximum(mx, 1.0))).astype(jnp.int32)
    lv = jnp.clip(level, 0, lmax)
    w = jnp.maximum(w0 >> lv, 1)
    h = jnp.maximum(h0 >> lv, 1)
    x = x0 + 2 * (w0 - jnp.maximum(w0 >> lv, 1))
    return x, y0, w, h


def sample_pyramid_bilinear(
    quad_flat: jnp.ndarray,
    atlas_width: int,
    rect0: jnp.ndarray,
    uv: jnp.ndarray,
    level: jnp.ndarray,
    address_mode: int = ADDRESS_WRAP,
) -> jnp.ndarray:
    """One bilinear tap = one 16-channel quad gather; mip rect arithmetic."""
    x, y, w, h = _pyramid_rect(rect0, level)
    tx = uv[..., 0] * w.astype(jnp.float32) - 0.5
    ty = uv[..., 1] * h.astype(jnp.float32) - 0.5
    fx0 = jnp.floor(tx)
    fy0 = jnp.floor(ty)
    fx = (tx - fx0)[..., None]
    fy = (ty - fy0)[..., None]
    ix = _wrap_index(fx0.astype(jnp.int32), w, address_mode)
    iy = _wrap_index(fy0.astype(jnp.int32), h, address_mode)
    flat = (y + iy) * atlas_width + (x + ix)
    quad = jnp.take(quad_flat, flat, axis=0).astype(jnp.float32)
    top = quad[..., 0:4] * (1.0 - fx) + quad[..., 4:8] * fx
    bot = quad[..., 8:12] * (1.0 - fx) + quad[..., 12:16] * fx
    return top * (1.0 - fy) + bot * fy


def sample_pyramid_trilinear(
    quad_flat: jnp.ndarray,
    atlas_width: int,
    rect0: jnp.ndarray,
    uv: jnp.ndarray,
    lod: jnp.ndarray,
    address_mode: int = ADDRESS_WRAP,
) -> jnp.ndarray:
    lod = jnp.maximum(lod, 0.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)[..., None]
    a = sample_pyramid_bilinear(quad_flat, atlas_width, rect0, uv, l0, address_mode)
    b = sample_pyramid_bilinear(quad_flat, atlas_width, rect0, uv, l0 + 1, address_mode)
    return a * (1.0 - frac) + b * frac


def sample_cube_pyramid(
    env_quad_flat: jnp.ndarray,
    atlas_width: int,
    face_rect0,
    direction: jnp.ndarray,
    lod: jnp.ndarray,
) -> jnp.ndarray:
    """Cubemap sampling over the pyramid atlas.  face_rect0: (6, 4) traced
    array; the per-pixel face select uses 6 static slices + where (no
    gather)."""
    face, uv = cube_direction_to_face_uv(direction)
    rect = jnp.zeros(face.shape + (4,), jnp.float32)
    for f in range(6):
        rect = jnp.where((face == f)[..., None], face_rect0[f].astype(jnp.float32), rect)
    lod = jnp.maximum(lod, 0.0)
    l0 = jnp.floor(lod).astype(jnp.int32)
    frac = jnp.clip(lod - l0.astype(jnp.float32), 0.0, 1.0)[..., None]
    a = sample_pyramid_bilinear(env_quad_flat, atlas_width, rect, uv, l0, ADDRESS_CLAMP)
    b = sample_pyramid_bilinear(env_quad_flat, atlas_width, rect, uv, l0 + 1, ADDRESS_CLAMP)
    return a * (1.0 - frac) + b * frac


def sample_cube_pyramid_level(
    env_quad_flat: jnp.ndarray,
    atlas_width: int,
    face_rect0,
    direction: jnp.ndarray,
    level: jnp.ndarray,
) -> jnp.ndarray:
    """Single-tap cube sample at an integer mip (the reference's
    SampleLevel(maxMip) irradiance fetch)."""
    face, uv = cube_direction_to_face_uv(direction)
    rect = jnp.zeros(face.shape + (4,), jnp.float32)
    for f in range(6):
        rect = jnp.where((face == f)[..., None], face_rect0[f].astype(jnp.float32), rect)
    return sample_pyramid_bilinear(env_quad_flat, atlas_width, rect, uv, level, ADDRESS_CLAMP)
