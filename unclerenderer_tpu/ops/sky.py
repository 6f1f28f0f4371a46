"""Sky / atmosphere: exact port of ``Shaders/SkyAtmosphere.hlsl``.

The reference draws a camera-centered sphere with depth test GREATER_EQUAL
and no depth write; since the sphere surrounds the camera, the net effect is
"shade every pixel the geometry left empty (depth == far) with
ApplyAtmosphere(viewDir)".  We evaluate the same analytic sky directly on the
empty-pixel mask -- no sphere mesh needed.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.passes import named_pass

PI = 3.14159265


def rayleigh_phase(cos_theta):
    k = 3.0 / (16.0 * PI)
    return k * (1.0 + cos_theta * cos_theta)


def mie_phase(cos_theta, g):
    g2 = g * g
    denom = (1.0 + g2 - 2.0 * g * cos_theta) ** 1.5
    return (1.0 - g2) / (4.0 * PI * jnp.maximum(denom, 1e-3))


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


@named_pass("SkyAtmosphere")
def apply_atmosphere(view_dir, camera_pos, light_dir, light_color):
    """``ApplyAtmosphere`` (SkyAtmosphere.hlsl:60-92).

    view_dir: (..., 3) normalized; camera_pos: (3,); light_dir: (3,)
    (pointing toward the light); light_color: (3,).
    """
    horizon_falloff = jnp.clip(
        (1.0 - jnp.clip(view_dir[..., 1] * 0.5 + 0.5, 0.0, 1.0)) ** 3.0, 0.0, 1.0
    )
    zenith = jnp.array([0.05, 0.12, 0.22], jnp.float32)
    horizon = jnp.array([0.52, 0.68, 0.86], jnp.float32)
    base_sky = zenith + (horizon - zenith) * horizon_falloff[..., None]

    l = _normalize(light_dir)
    cos_sun_view = jnp.sum(view_dir * l, axis=-1)
    cos_sun_up = l[1]

    rayleigh_scale_height = 8000.0
    mie_scale_height = 1200.0
    view_height = jnp.maximum(0.0, camera_pos[1])
    rayleigh_density = jnp.exp(-view_height / rayleigh_scale_height)
    mie_density = jnp.exp(-view_height / mie_scale_height)

    r_phase = rayleigh_phase(cos_sun_view)
    m_phase = mie_phase(cos_sun_view, 0.76)

    rayleigh_color = jnp.array([0.650, 0.570, 0.475], jnp.float32)
    scattered = rayleigh_color * (rayleigh_density * r_phase)[..., None]
    scattered = scattered + light_color * (mie_density * m_phase * 0.8)[..., None]

    sun_attenuation = jnp.clip(jnp.exp(-jnp.maximum(0.0, 1.0 - cos_sun_up) * 2.0), 0.0, 1.0)
    return base_sky + scattered * sun_attenuation


def sky_view_directions(
    width: int,
    height: int,
    camera_pos,
    view: jnp.ndarray,
    proj: jnp.ndarray,
    row0=0,
    out_h: int | None = None,
):
    """Per-pixel world-space view direction through each pixel center.

    Inverts the viewport + projection mapping analytically: for the
    reference's projection (x' = x*m00, y' = y*m11, w' = z_view), the ray in
    view space is (ndc_x/m00, ndc_y/m11, 1).

    row0/out_h select a horizontal slab of the full height-row viewport
    (sharded rendering); the default is the whole frame.
    """
    out_h = height if out_h is None else out_h
    yy = (jnp.arange(out_h, dtype=jnp.float32)[:, None] + row0 + 0.5) / height
    xx = (jnp.arange(width, dtype=jnp.float32)[None, :] + 0.5) / width
    ndc_x = xx * 2.0 - 1.0
    ndc_y = 1.0 - yy * 2.0
    vx = ndc_x / proj[0, 0]
    vy = ndc_y / proj[1, 1]
    ones = jnp.ones((out_h, width), jnp.float32)
    view_ray = jnp.stack([vx * ones, vy * ones, ones], axis=-1)
    # view space -> world: rotate by the inverse (transpose) of the view
    # rotation (row-vector convention: world = view_ray @ R^T with R = view[:3,:3]).
    world_ray = view_ray @ view[:3, :3].T
    return _normalize(world_ray)
