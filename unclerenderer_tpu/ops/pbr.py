"""PBR shading math: exact port of ``Shaders/PBRCommon.hlsl``.

Parity notes (quirks preserved deliberately):
* diffuse is **not** divided by pi (``PBRCommon.hlsl:45`` comments it out),
* k = (roughness+1)^2 / 8 Schlick-GGX geometry term,
* denominators clamped at 1e-4 exactly like the HLSL.
All functions are elementwise jnp -- XLA fuses them into the lighting pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.passes import named_pass

PI = 3.14159265


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def distribution_ggx(n_dot_h, alpha):
    alpha2 = alpha * alpha
    denom = (n_dot_h * n_dot_h) * (alpha2 - 1.0) + 1.0
    return alpha2 / jnp.maximum(PI * denom * denom, 1e-4)


def geometry_schlick_ggx(n_dot_x, k):
    return n_dot_x / (n_dot_x * (1.0 - k) + k)


def fresnel_schlick(v_dot_h, f0):
    return f0 + (1.0 - f0) * (1.0 - v_dot_h[..., None]) ** 5


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def evaluate_pbr(albedo, metallic, roughness, f0, n, v, l):
    """``EvaluatePBR`` (PBRCommon.hlsl:26-48): (diffuse + specular) * NdotL.

    albedo/f0/n/v/l: (..., 3); metallic/roughness: (...,).
    """
    h = normalize(v + l)
    n_dot_l = saturate(_dot(n, l))
    n_dot_v = saturate(_dot(n, v))
    n_dot_h = saturate(_dot(n, h))
    v_dot_h = saturate(_dot(v, h))

    alpha = roughness * roughness
    d = distribution_ggx(n_dot_h, alpha)

    k = (roughness + 1.0)
    k = (k * k) / 8.0
    g = geometry_schlick_ggx(n_dot_v, k) * geometry_schlick_ggx(n_dot_l, k)

    f = fresnel_schlick(v_dot_h, f0)

    specular = (d * g)[..., None] * f / jnp.maximum(
        4.0 * n_dot_l * n_dot_v, 1e-4
    )[..., None]
    kd = (1.0 - f) * (1.0 - metallic[..., None])
    diffuse = kd * albedo  # NOT divided by pi (parity with the reference)
    return (diffuse + specular) * n_dot_l[..., None]


def reconstruct_normal_z(rg):
    """Two-channel (BC5) normal map Z reconstruction
    (``DeferredBasePass.hlsl:88-90``)."""
    z2 = 1.0 - jnp.sum(rg * rg, axis=-1)
    return jnp.sqrt(saturate(z2))


def apply_normal_map(vertex_normal, tangent4, tangent_normal):
    """TBN normal mapping (``DeferredBasePass.hlsl:83-97`` /
    ``ForwardPS.hlsl:51-69``): Gram-Schmidt tangent, bitangent from cross *
    handedness, degenerate fallback to (0,0,1) tangent-space normal."""
    n = normalize(vertex_normal)
    t_raw = tangent4[..., :3]
    t = normalize(t_raw - n * _dot(n, t_raw)[..., None])
    b = normalize(jnp.cross(n, t)) * tangent4[..., 3:4]

    tn_len = jnp.linalg.norm(tangent_normal, axis=-1, keepdims=True)
    tn = jnp.where(tn_len < 1e-5, jnp.array([0.0, 0.0, 1.0]), tangent_normal)

    world = tn[..., 0:1] * t + tn[..., 1:2] * b + tn[..., 2:3] * n
    return normalize(world)


@named_pass("IBLAmbient")
def ibl_ambient(
    albedo,
    metallic,
    f0,
    n_world,
    v_world,
    env_sample_fn,
    brdf_lut_sample_fn,
    env_mip_count,
    roughness,
    env_sample_level_fn=None,
):
    """Split-sum IBL (``DeferredLighting.hlsl:76-91`` / ``ForwardPS.hlsl:125-137``):
    prefiltered env cube at mip = roughness * (mips-1) for specular, last mip
    as irradiance for diffuse, BRDF LUT scale/bias.

    env_sample_fn(direction, lod) -> (..., 3); brdf_lut_sample_fn(uv) -> (..., 2).
    """
    reflection = 2.0 * _dot(n_world, v_world)[..., None] * n_world - v_world
    max_mip = jnp.maximum(0.0, env_mip_count - 1.0)
    mip = roughness * max_mip
    prefiltered = env_sample_fn(reflection, mip)

    n_dot_v = saturate(_dot(n_world, v_world))
    brdf = brdf_lut_sample_fn(jnp.stack([n_dot_v, roughness], axis=-1))
    specular_ibl = prefiltered * (f0 * brdf[..., 0:1] + brdf[..., 1:2])

    # the reference samples the last mip at an exact integer level
    # (DeferredLighting.hlsl:90): one bilinear tap, no mip blend needed.
    if env_sample_level_fn is not None:
        irradiance = env_sample_level_fn(
            n_world, jnp.broadcast_to(max_mip, roughness.shape).astype(jnp.int32)
        )
    else:
        irradiance = env_sample_fn(n_world, jnp.broadcast_to(max_mip, roughness.shape))
    diffuse_ibl = irradiance * albedo * (1.0 - metallic[..., None])
    return diffuse_ibl + specular_ibl
