"""Deferred PBR shading — the Cook-Torrance core of src/shaders/main.wgsl.

All functions are elementwise jnp over (H, W, ...) pixel maps; XLA fuses the
whole lighting loop into one pass over the GBuffer. Light counts are static
(Python ints) so the per-light loop is unrolled at trace time, mirroring the
reference's uniform-driven loop (main.wgsl:225-250) without dynamic control
flow.

Formulas are ported 1:1 (Fresnel-Schlick main.wgsl:127-133, GGX NDF
:135-145, Smith-Schlick k=(r+1)^2/8 :147-163, kD=(1-F)(1-metal), diffuse
albedo/pi :165-189, IBL ambient :191-200, inverse-square point attenuation
:230-233).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import sampling
from .resolve import GBuffer

F32 = jnp.float32

PI = 3.14159265359
F0_NON_METALLIC = 0.04


def fresnel_schlick(cos_theta, f0):
    return f0 + (1.0 - f0) * jnp.clip(1.0 - cos_theta, 0.0, 1.0) ** 5


def fresnel_schlick_roughness(cos_theta, f0, roughness):
    return f0 + (jnp.maximum(1.0 - roughness, f0) - f0) * \
        jnp.clip(1.0 - cos_theta, 0.0, 1.0) ** 5


def distribution_ggx(n_dot_h, roughness):
    r2 = roughness * roughness
    r4 = r2 * r2
    nh2 = n_dot_h * n_dot_h
    denom = nh2 * (r4 - 1.0) + 1.0
    return r4 / (PI * denom * denom)


def geometry_schlick_ggx(n_dot_v, roughness):
    r = roughness + 1.0
    k = r * r / 8.0
    return n_dot_v / (n_dot_v * (1.0 - k) + k)


def geometry_smith(n_dot_v, n_dot_l, roughness):
    return geometry_schlick_ggx(n_dot_v, roughness) * \
        geometry_schlick_ggx(n_dot_l, roughness)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def light_contribution(pixel_to_light, light_color, attenuation,
                       pixel_to_camera, normal, albedo, metalness, roughness):
    """main.wgsl:165-189 calculate_light_contribution. All (..., 3)/(..., 1)."""
    half_dir = _normalize(pixel_to_camera + pixel_to_light)
    radiance = light_color * attenuation

    f0 = jnp.full_like(albedo, F0_NON_METALLIC) * (1.0 - metalness) + albedo * metalness
    f = fresnel_schlick(jnp.maximum(_dot(half_dir, pixel_to_camera), 0.0), f0)

    n_dot_h = jnp.maximum(_dot(normal, half_dir), 0.0)
    n_dot_v = jnp.maximum(_dot(normal, pixel_to_camera), 0.0)
    n_dot_l = jnp.maximum(_dot(normal, pixel_to_light), 0.0)

    ndf = distribution_ggx(n_dot_h, roughness)
    g = geometry_smith(n_dot_v, n_dot_l, roughness)

    specular = (ndf * g * f) / (4.0 * n_dot_v * n_dot_l + 0.0001)
    k_d = (1.0 - f) * (1.0 - metalness)
    return (k_d * albedo / PI + specular) * radiance * n_dot_l


def diffuse_irradiance_ambient(normal, view, roughness, albedo, metalness,
                               irradiance_sh):
    """main.wgsl:191-200 get_diffuse_irradiance.

    The irradiance signal arrives as SH-9 coefficients (projected from the
    baked irradiance cubemap, env.sh_project_cubemap) so the per-pixel
    lookup is a polynomial evaluation instead of a TPU-hostile gather."""
    from . import env as envops
    f0 = jnp.full_like(albedo, F0_NON_METALLIC) * (1.0 - metalness) + albedo * metalness
    ks = fresnel_schlick_roughness(jnp.maximum(_dot(normal, view), 0.0), f0, roughness)
    kd = 1.0 - ks
    irr = jnp.maximum(envops.sh_eval_irradiance(irradiance_sh, normal), 0.0)
    return kd * irr * albedo


class ShadingLights(NamedTuple):
    """Static-count unpacked light state (device arrays)."""

    point_position: jax.Array   # (P, 3)
    point_color: jax.Array     # (P, 3)
    dir_direction: jax.Array   # (D, 3)
    dir_color: jax.Array       # (D, 3)
    dir_viewproj: jax.Array    # (D, 4, 4)


@jax.named_scope("deferred_shading")
def shade_deferred(g: GBuffer, camera_pos: jax.Array, lights: ShadingLights,
                   num_point: int, num_directional: int,
                   irradiance_sh: jax.Array | None,
                   point_shadow_fn=None, dir_shadow_fn=None) -> jax.Array:
    """Deferred shading compute pass (main.wgsl:202-259) -> HDR (H, W, 3).

    ``point_shadow_fn(i, world_pos) -> (H, W) visibility`` and
    ``dir_shadow_fn(i, world_pos) -> (H, W)``; None = fully lit.
    """
    pos = g.position
    normal = g.normal
    albedo = g.albedo
    rough = g.rough_metal_ao[..., 0:1]
    metal = g.rough_metal_ao[..., 1:2]
    ao = g.rough_metal_ao[..., 2:3]

    to_cam = _normalize(camera_pos[None, None, :] - pos)

    hdr = jnp.zeros_like(albedo)
    for i in range(num_point):
        lp = lights.point_position[i]
        shadow = (point_shadow_fn(i, pos) if point_shadow_fn is not None
                  else jnp.ones(pos.shape[:2], F32))
        to_light = lp[None, None, :] - pos
        dist2 = jnp.maximum(jnp.sum(to_light * to_light, axis=-1, keepdims=True), 1e-8)
        contrib = light_contribution(
            to_light / jnp.sqrt(dist2), lights.point_color[i][None, None, :],
            1.0 / dist2, to_cam, normal, albedo, metal, rough)
        # The reference *gates* on shadow > 0 rather than scaling by the PCF
        # fraction (main.wgsl:228-237 `if shadow > 0.0`): reproduce that.
        hdr = hdr + contrib * (shadow > 0.0).astype(F32)[..., None]

    for i in range(num_directional):
        shadow = (dir_shadow_fn(i, pos) if dir_shadow_fn is not None
                  else jnp.ones(pos.shape[:2], F32))
        contrib = light_contribution(
            -lights.dir_direction[i][None, None, :],
            lights.dir_color[i][None, None, :], 1.0,
            to_cam, normal, albedo, metal, rough)
        hdr = hdr + contrib * (shadow > 0.0).astype(F32)[..., None]

    if irradiance_sh is not None:
        ambient = diffuse_irradiance_ambient(normal, to_cam, rough, albedo,
                                             metal, irradiance_sh) * ao
        hdr = hdr + ambient

    return jnp.where(g.mask[..., None], hdr, 0.0)


def _normalize(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
