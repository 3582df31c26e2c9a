"""Post-processing: tone mapping + gamma, SSR, mip generation.

Replaces the SimpleCP compute chain (src/post_process_manager.rs:38-76):
- tone_map: src/shaders/tone_mapping.wgsl:30-41 — type 1 exposure
  ``1 - exp(-c*k)``, type 2 Reinhard ``c/(c+1)``, else identity; then gamma
  1/2.2 and 8-bit quantization (the rgba8unorm store).
- screen-space reflections: src/shaders/screen_space_reflection.wgsl —
  texture-space ray march (up to 256 steps) against the depth buffer with a
  thickness test. NOTE: the reference's final store writes the *source*
  color (:135), i.e. the pass is wired up but visually a pass-through; we
  compute the reflection and blend with ``ssr_strength`` (0 by default =
  reference behavior).
- box mip filter lives in assets/textures.py (host) and here for device use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

F32 = jnp.float32

TONE_MAP_NONE = 0
TONE_MAP_EXPOSURE = 1
TONE_MAP_REINHARD = 2


@jax.named_scope("tone_map")
def tone_map(hdr: jax.Array, tone_type: jax.Array, exposure: jax.Array) -> jax.Array:
    """(H, W, 3) HDR -> (H, W, 3) u8 SDR. tone_type/exposure are traced
    scalars (from GlobalParams) so changing them never retraces."""
    t = tone_type.astype(jnp.int32)
    ldr_exposure = 1.0 - jnp.exp(-hdr * exposure)
    ldr_reinhard = hdr / (hdr + 1.0)
    ldr = jnp.where(t == TONE_MAP_EXPOSURE, ldr_exposure,
                    jnp.where(t == TONE_MAP_REINHARD, ldr_reinhard, hdr))
    gamma = jnp.power(jnp.clip(ldr, 0.0, 1.0), 1.0 / 2.2)
    return jnp.clip(gamma * 255.0 + 0.5, 0.0, 255.0).astype(jnp.uint8)


@jax.named_scope("ssr")
def screen_space_reflections(hdr: jax.Array, depth: jax.Array,
                             position: jax.Array, normal: jax.Array,
                             view_proj: jax.Array, camera_pos: jax.Array,
                             thickness: jax.Array, strength: jax.Array,
                             num_steps: int = 64) -> jax.Array:
    """Texture-space SSR march (screen_space_reflection.wgsl:58-121).

    Marches the reflection ray in world space, projecting each step into
    screen space and comparing reverse-Z depth with a thickness window.
    Blended by ``strength`` (reference ships with an effective 0).
    """
    H, W = depth.shape
    view = position - camera_pos[None, None, :]
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9)
    refl = view - 2.0 * jnp.sum(view * normal, axis=-1, keepdims=True) * normal

    step_len = 0.25
    hit_uv = jnp.zeros((H, W, 2), F32)
    hit_found = jnp.zeros((H, W), bool)

    def body(i, carry):
        hit_uv, hit_found = carry
        p = position + refl * (step_len * (i + 1.0))
        ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        c = jnp.einsum("hwj,ij->hwi", ph, view_proj, preferred_element_type=F32)
        w = jnp.maximum(c[..., 3], 1e-6)
        ndc = c[..., :3] / w[..., None]
        u = ndc[..., 0] * 0.5 + 0.5
        v = 0.5 - ndc[..., 1] * 0.5
        xi = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
        scene_z = jnp.take(depth.reshape(-1), yi * W + xi)
        ray_z = ndc[..., 2]
        inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
        # reverse-Z: scene in front of ray point when scene_z > ray_z
        hit = inside & (scene_z > ray_z) & (scene_z - ray_z < thickness) & (scene_z > 0)
        newly = hit & (~hit_found)
        hit_uv = jnp.where(newly[..., None], jnp.stack([u, v], axis=-1), hit_uv)
        hit_found = hit_found | hit
        return hit_uv, hit_found

    hit_uv, hit_found = jax.lax.fori_loop(0, num_steps, body, (hit_uv, hit_found))

    xi = jnp.clip((hit_uv[..., 0] * W).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip((hit_uv[..., 1] * H).astype(jnp.int32), 0, H - 1)
    refl_color = jnp.take(hdr.reshape(-1, 3), yi * W + xi, axis=0)
    blend = strength * hit_found.astype(F32)[..., None]
    return hdr * (1.0 - blend) + refl_color * blend


def box_mip(img: jax.Array) -> jax.Array:
    """Device-side 2x2 box mip reduction (mipmap_generator.wgsl:22-30)."""
    h, w, c = img.shape
    return img.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))
