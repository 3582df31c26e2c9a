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

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# ---------------------------------------------------------------------------
# Fused shading tile kernel (TPU fast path)
# ---------------------------------------------------------------------------
#
# The unfused chain materializes several full-frame intermediates between
# the gather stages: the (H, W, 15) relayout of the select+eval kernel's
# channel-first attribute output, the normalized TBN planes, the assembled
# GBuffer arrays, and the per-light shading temporaries — each a fusion
# boundary's worth of HBM traffic plus (C, H, W) -> (H, W, C) relayout
# copies (~2 ms of the 1080p trace). This kernel consumes the select+eval
# outputs, the compacted material sample, the shadow gates and the sky —
# ALL channel-first, the layout the producers already have or can produce
# for free — and evaluates normalize + TBN normal mapping + material
# select + the whole Cook-Torrance light loop + SH-9 ambient + sky
# composite in VMEM, writing only the (3, H, W) HDR result.
#
# Same math as resolve._attrs_from_split + resolve.resolve_gbuffer_from_
# attrs (elementwise tail) + shade_deferred (main.wgsl:202-259); light
# counts are static so the loop unrolls at trace time.

def pack_shading_consts(camera_pos: jax.Array, lights: ShadingLights,
                        num_point: int, num_dir: int,
                        irradiance_sh: jax.Array | None) -> jax.Array:
    """(1, NC) f32 SMEM operand for the fused kernel: [camera 3 |
    (pos 3, color 3) per point | (dir 3, color 3) per directional |
    SH-9 row-major 27 when IBL]."""
    parts = [jnp.asarray(camera_pos, F32).reshape(-1)]
    for i in range(num_point):
        parts += [lights.point_position[i], lights.point_color[i]]
    for i in range(num_dir):
        parts += [lights.dir_direction[i], lights.dir_color[i]]
    if irradiance_sh is not None:
        parts.append(irradiance_sh.reshape(-1))
    return jnp.concatenate(parts).astype(F32)[None, :]


def _norm3(x, y, z):
    # divide (not multiply-by-reciprocal): ULP parity with _safe_normalize
    d = jnp.maximum(jnp.sqrt(x * x + y * y + z * z), 1e-12)
    return x / d, y / d, z / d


def _shade_kernel(consts_ref, tid_ref, outf_ref, outh_ref, *refs,
                  num_point: int, num_dir: int,
                  has_ibl: bool, has_sky: bool, has_rec: bool = True,
                  slim: bool = False):
    idx = 0
    rec_ref = None
    if has_rec:
        rec_ref = refs[idx]
        idx += 1
    gates_ref = refs[idx]
    idx += 1
    sky_ref = None
    if has_sky:
        sky_ref = refs[idx]
        idx += 1
    hdr_ref = refs[idx]
    c = consts_ref

    valid = tid_ref[...] >= 0                         # (bh, bw) bool
    h = outh_ref[...].astype(F32)                     # (15, bh, bw)
    ngx, ngy, ngz = _norm3(h[0], h[1], h[2])          # geometric normal

    if has_rec:
        tx, ty, tz = _norm3(h[3], h[4], h[5])         # tangent
        bx, by, bz = _norm3(h[6], h[7], h[8])         # bitangent
        # flat material params [albedo3 rough metal use_tex]
        use_tex = h[14] > 0.5

        rec = rec_ref[...]                            # (9, bh, bw)
        # tangent-space normal -> world (resolve_gbuffer_from_attrs TBN)
        ntx = rec[4] * 2.0 - 1.0
        nty = rec[5] * 2.0 - 1.0
        ntz = rec[6] * 2.0 - 1.0
        mx, my, mz = _norm3(ntx * tx + nty * bx + ntz * ngx,
                            ntx * ty + nty * by + ntz * ngy,
                            ntx * tz + nty * bz + ntz * ngz)
        nx = jnp.where(use_tex, mx, ngx)
        ny = jnp.where(use_tex, my, ngy)
        nz = jnp.where(use_tex, mz, ngz)
        alb = [jnp.where(use_tex, rec[k], h[9 + k]) for k in range(3)]
        rough = jnp.where(use_tex, rec[7], h[12])
        metal = jnp.where(use_tex, rec[8], h[13])
    elif slim:
        # slim flat-only layout (resolve slim=True): outh [normal3 flat6]
        nx, ny, nz = ngx, ngy, ngz
        alb = [h[3 + k] for k in range(3)]
        rough, metal = h[6], h[7]
    else:
        # flat-only scene (cfg.any_textured False): geometric normal +
        # flat params, no material plane
        nx, ny, nz = ngx, ngy, ngz
        alb = [h[9 + k] for k in range(3)]
        rough, metal = h[12], h[13]

    px, py, pz = outf_ref[0], outf_ref[1], outf_ref[2]   # world position
    vx, vy, vz = _norm3(c[0, 0] - px, c[0, 1] - py, c[0, 2] - pz)  # to cam

    one_m = 1.0 - metal
    f0 = [F0_NON_METALLIC * one_m + a * metal for a in alb]
    n_dot_v = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)
    kg = (rough + 1.0) * (rough + 1.0) / 8.0          # Smith-Schlick k
    gv = n_dot_v / (n_dot_v * (1.0 - kg) + kg)
    r2 = rough * rough
    r4 = r2 * r2

    hdr = [jnp.zeros_like(px) for _ in range(3)]

    def add_light(hdr, lx, ly, lz, radiance, gate):
        """One light's Cook-Torrance contribution (light_contribution)."""
        hx, hy, hz = _norm3(vx + lx, vy + ly, vz + lz)
        h_dot_v = jnp.maximum(hx * vx + hy * vy + hz * vz, 0.0)
        fres5 = jnp.clip(1.0 - h_dot_v, 0.0, 1.0) ** 5
        n_dot_h = jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0)
        n_dot_l = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
        denom = n_dot_h * n_dot_h * (r4 - 1.0) + 1.0
        ndf = r4 / (PI * denom * denom)
        gl = n_dot_l / (n_dot_l * (1.0 - kg) + kg)
        spec_s = ndf * (gv * gl) / (4.0 * n_dot_v * n_dot_l + 1e-4)
        w = n_dot_l * gate
        out = []
        for ch in range(3):
            f = f0[ch] + (1.0 - f0[ch]) * fres5
            kd = (1.0 - f) * one_m
            out.append(hdr[ch] + (kd * alb[ch] / PI + f * spec_s)
                       * radiance[ch] * w)
        return out

    for i in range(num_point):
        b0 = 3 + 6 * i
        tlx = c[0, b0] - px
        tly = c[0, b0 + 1] - py
        tlz = c[0, b0 + 2] - pz
        d2 = jnp.maximum(tlx * tlx + tly * tly + tlz * tlz, 1e-8)
        dist = jnp.sqrt(d2)
        atten = 1.0 / d2
        gate = (gates_ref[i] > 0.0).astype(F32)
        radiance = [c[0, b0 + 3 + ch] * atten for ch in range(3)]
        hdr = add_light(hdr, tlx / dist, tly / dist, tlz / dist,
                        radiance, gate)

    for i in range(num_dir):
        b0 = 3 + 6 * num_point + 6 * i
        gate = (gates_ref[num_point + i] > 0.0).astype(F32)
        radiance = [jnp.full_like(px, c[0, b0 + 3 + ch]) for ch in range(3)]
        hdr = add_light(hdr, -c[0, b0], -c[0, b0 + 1], -c[0, b0 + 2],
                        radiance, gate)

    if has_ibl:
        s0 = 3 + 6 * (num_point + num_dir)
        # fresnel_schlick_roughness + SH-9 evaluation (env.sh_eval_
        # irradiance with env._sh_basis inlined; exact f32 on the VPU)
        from .env import _SH_C
        basis = [None, _SH_C[1] * ny, _SH_C[1] * nz, _SH_C[1] * nx,
                 _SH_C[2] * nx * ny, _SH_C[2] * ny * nz,
                 _SH_C[3] * (3.0 * nz * nz - 1.0),
                 _SH_C[2] * nx * nz, _SH_C[4] * (nx * nx - ny * ny)]
        fres5 = jnp.clip(1.0 - n_dot_v, 0.0, 1.0) ** 5
        for ch in range(3):
            irr = c[0, s0 + ch] * _SH_C[0]
            for k in range(1, 9):
                irr = irr + c[0, s0 + 3 * k + ch] * basis[k]
            irr = jnp.maximum(irr, 0.0)
            ks = f0[ch] + (jnp.maximum(1.0 - rough, f0[ch]) - f0[ch]) * fres5
            hdr[ch] = hdr[ch] + (1.0 - ks) * irr * alb[ch]

    if has_sky:
        sky = sky_ref[...]
        out = [jnp.where(valid, hdr[ch], sky[ch]) for ch in range(3)]
    else:
        out = [jnp.where(valid, hdr[ch], 0.0) for ch in range(3)]
    hdr_ref[...] = jnp.stack(out, axis=0)


def _shade_block_dims(H: int, W: int) -> tuple[int, int]:
    bh = next((b for b in (32, 16, 8) if H % b == 0), H)
    bw = next((b for b in (512, 384, 256, 128) if W % b == 0), W)
    return bh, bw


@jax.named_scope("deferred_shading_fused")
def shade_deferred_fused(tri_id: jax.Array, outf_c: jax.Array,
                         outh_c: jax.Array, rec_c: jax.Array,
                         gates_c: jax.Array, sky_c: jax.Array | None,
                         camera_pos: jax.Array, lights: ShadingLights,
                         num_point: int, num_dir: int,
                         irradiance_sh: jax.Array | None) -> jax.Array:
    """Fused deferred shading + sky composite -> (3, H, W) HDR.

    tri_id (H, W) i32; outf_c (7, H, W) f32 / outh_c (15, H, W) f32|bf16:
    the select+eval kernel's raw split outputs (resolve.select_eval_*,
    raw=True); rec_c (9, H, W) material sample, or None for a statically
    flat-only scene (cfg.any_textured False — geometric normals + flat
    params, no material plane read). PRECONDITION: rec_c=None requires
    outh_c's use_tex plane (h[14]) to be 0 everywhere — textured pixels
    would silently shade with flat white albedo otherwise. The engine
    guarantees this by deriving cfg.any_textured from the pack
    (scene_gpu counts textured materials referenced by deferred
    triangles); callers constructing inputs by hand must too.
    gates_c (L, H, W) 0/1 shadow gates, points first
    (L == num_point + num_dir); sky_c (3, H, W) or None."""
    H, W = tri_id.shape
    L = max(num_point + num_dir, 1)
    assert gates_c.shape[0] == num_point + num_dir or (
        num_point + num_dir == 0)
    bh, bw = _shade_block_dims(H, W)
    if outh_c.dtype == jnp.bfloat16 and bh < 16:
        bh = 16  # bf16 sublane minimum
    consts = pack_shading_consts(camera_pos, lights, num_point, num_dir,
                                 irradiance_sh)
    has_sky = sky_c is not None
    has_rec = rec_c is not None
    # slim flat-only input layout (resolve select_eval slim=True):
    # outf [world3 oid], outh [normal3 flat6]
    slim = outf_c.shape[0] == 4
    assert not (slim and has_rec), "slim layout carries no uv/record"
    kernel = functools.partial(_shade_kernel, num_point=num_point,
                               num_dir=num_dir,
                               has_ibl=irradiance_sh is not None,
                               has_sky=has_sky, has_rec=has_rec,
                               slim=slim)

    def cmap(C):
        return pl.BlockSpec((C, bh, bw), lambda i, j: (0, i, j),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
        cmap(outf_c.shape[0]), cmap(outh_c.shape[0]),
    ]
    args = [consts, tri_id, outf_c, outh_c]
    if has_rec:
        in_specs.append(cmap(9))
        args.append(rec_c)
    in_specs.append(cmap(L))
    args.append(gates_c if num_point + num_dir > 0 else
                jnp.ones((1, H, W), F32))
    if has_sky:
        in_specs.append(cmap(3))
        args.append(sky_c)
    interpret = jax.default_backend() != "tpu"
    rec_bytes = rec_c.size * 4 if has_rec else 0
    return pl.pallas_call(
        kernel,
        grid=(H // bh, W // bw),
        interpret=interpret,
        in_specs=in_specs,
        out_specs=cmap(3),
        out_shape=jax.ShapeDtypeStruct((3, H, W), F32),
        cost_estimate=pl.CostEstimate(
            flops=int(H * W * (80 + 90 * (num_point + num_dir))),
            bytes_accessed=(outf_c.size + 3 * H * W) * 4 + rec_bytes
            + outh_c.size * outh_c.dtype.itemsize,
            transcendentals=0),
    )(*args)
