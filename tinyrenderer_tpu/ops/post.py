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


def _project_ray_points(position, refl, ts, view_proj):
    """World-space points position + refl*t projected to (u, v, ray_z)."""
    p = position + refl * ts[..., None]
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    c = jnp.einsum("hwj,ij->hwi", ph, view_proj, preferred_element_type=F32)
    w = jnp.maximum(c[..., 3], 1e-6)
    ndc = c[..., :3] / w[..., None]
    u = ndc[..., 0] * 0.5 + 0.5
    v = 0.5 - ndc[..., 1] * 0.5
    return u, v, ndc[..., 2]


@jax.named_scope("ssr")
def screen_space_reflections(hdr: jax.Array, depth: jax.Array,
                             position: jax.Array, normal: jax.Array,
                             view_proj: jax.Array, camera_pos: jax.Array,
                             thickness: jax.Array, strength: jax.Array,
                             num_steps: int = 256,
                             mask: jax.Array = None,
                             roughness: jax.Array = None,
                             tap_hdr: jax.Array = None,
                             y0: jax.Array = None) -> jax.Array:
    """Texture-space SSR with the reference's 256-step range
    (screen_space_reflection.wgsl:58-121), restructured TPU-first.

    A GPU HiZ march adapts its step per pixel (divergent control flow);
    XLA wants static shapes, and a TPU gather costs the same per issued
    row regardless of the source table size — so what matters is the
    NUMBER of depth taps, not where they read. The march therefore runs
    in two fixed-length phases covering ``num_steps`` fine steps of ray
    distance in num_steps/4 + 8 taps:

    1. coarse: num_steps/4 strided taps against a 4x4 max-reduced depth
       grid (reverse-Z max = nearest surface in the footprint — the
       conservative bound, like a HiZ max pyramid level: a surface the
       fine march could hit is never stepped over);
    2. refine: 8 bisection taps of the full-res depth inside the
       bracketed interval, recovering fine-step precision.

    Blended by ``strength`` (the reference ships its SSR storing the
    source color, :135 — strength 0 reproduces that).

    Band use (parallel/sharded.py): per-pixel inputs (hdr, position,
    normal, mask, roughness) may cover only a horizontal band of the
    frame while the ray TAPS read full-frame buffers — pass the
    all-gathered frame as ``depth``/``tap_hdr`` and the band's first
    screen row as ``y0`` (the projection is frame-global already; y0
    only anchors the self-hit pixel test).
    """
    H, W = depth.shape                    # tap space: the full frame
    Bh = position.shape[0]                # per-pixel rows (== H unbanded)
    tap_hdr = hdr if tap_hdr is None else tap_hdr
    y0 = jnp.int32(0) if y0 is None else y0
    view = position - camera_pos[None, None, :]
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True), 1e-9)
    refl = view - 2.0 * jnp.sum(view * normal, axis=-1, keepdims=True) * normal

    step_len = 0.25
    coarse_steps = max(num_steps // 4, 1)

    # 4x4 max-reduce (reverse-Z: max depth = closest surface). Pad so the
    # grid divides; padding with 0 (= far plane) never creates fake hits.
    Hp, Wp = -(-H // 4) * 4, -(-W // 4) * 4
    dpad = jnp.pad(depth, ((0, Hp - H), (0, Wp - W)))
    dmax = dpad.reshape(Hp // 4, 4, Wp // 4, 4).max(axis=(1, 3))
    Hc, Wc = Hp // 4, Wp // 4

    def coarse_body(i, carry):
        t_hit, hit_found = carry
        t = step_len * 4.0 * (i + 1.0)
        u, v, ray_z = _project_ray_points(position, refl,
                                          jnp.full((Bh, W), t, F32), view_proj)
        xi = jnp.clip((u * Wc).astype(jnp.int32), 0, Wc - 1)
        yi = jnp.clip((v * Hc).astype(jnp.int32), 0, Hc - 1)
        scene_z = jnp.take(dmax.reshape(-1), yi * Wc + xi)
        inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
        # conservative interval test: the footprint's nearest surface is in
        # front of the ray point (no thickness window yet — refine applies it)
        hit = inside & (scene_z > ray_z) & (scene_z > 0)
        newly = hit & (~hit_found)
        t_hit = jnp.where(newly, t, t_hit)
        hit_found = hit_found | hit
        return t_hit, hit_found

    t_hit, coarse_found = jax.lax.fori_loop(
        0, coarse_steps, coarse_body,
        (jnp.zeros((Bh, W), F32), jnp.zeros((Bh, W), bool)))

    # bisection refine inside (t_hit - 4*step, t_hit]: 8 full-res taps give
    # step_len/64 precision — finer than the reference's linear step.
    t_lo = jnp.maximum(t_hit - step_len * 4.0, 0.0)
    t_hi = t_hit

    def refine_body(_, carry):
        t_lo, t_hi = carry
        tm = 0.5 * (t_lo + t_hi)
        u, v, ray_z = _project_ray_points(position, refl, tm, view_proj)
        xi = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
        scene_z = jnp.take(depth.reshape(-1), yi * W + xi)
        front = (scene_z > ray_z) & (scene_z > 0)
        return jnp.where(front, t_lo, tm), jnp.where(front, tm, t_hi)

    t_lo, t_hi = jax.lax.fori_loop(0, 8, refine_body, (t_lo, t_hi))

    # final full-res visibility + thickness test at the refined point
    u, v, ray_z = _project_ray_points(position, refl, t_hi, view_proj)
    xi = jnp.clip((u * W).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip((v * H).astype(jnp.int32), 0, H - 1)
    scene_z = jnp.take(depth.reshape(-1), yi * W + xi)
    inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1)
    hit_found = (coarse_found & inside & (scene_z > ray_z)
                 & (scene_z - ray_z < thickness) & (scene_z > 0))

    # self-hit rejection: a glancing ray that converges back onto (or next
    # to) its own pixel is reflecting its own surface — the source of
    # smear streaks along walls
    px = jax.lax.broadcasted_iota(jnp.int32, (Bh, W), 1)
    py = jax.lax.broadcasted_iota(jnp.int32, (Bh, W), 0) + y0
    hit_found = hit_found & ((jnp.abs(xi - px) + jnp.abs(yi - py)) > 2)

    if mask is not None:
        # background pixels carry no valid GBuffer position/normal — the
        # reference's SSR likewise only shades lit geometry
        hit_found = hit_found & mask
    refl_color = jnp.take(tap_hdr.reshape(-1, 3), yi * W + xi, axis=0)
    blend = strength * hit_found.astype(F32)[..., None]
    if roughness is not None:
        # only smooth surfaces mirror: scale by (1 - roughness)^2 so the
        # rough default walls stay diffuse (the physically expected gate a
        # strength-only blend lacks)
        gloss = jnp.clip(1.0 - roughness, 0.0, 1.0)[..., None]
        blend = blend * gloss * gloss
    return hdr * (1.0 - blend) + refl_color * blend


def box_mip(img: jax.Array) -> jax.Array:
    """Device-side 2x2 box mip reduction (mipmap_generator.wgsl:22-30)."""
    h, w, c = img.shape
    return img.reshape(h // 2, 2, w // 2, 2, c).mean(axis=(1, 3))


def _upsample_axis(img: jax.Array, s: int, axis: int) -> jax.Array:
    """Exact integer-factor bilinear upsample along one axis.

    Matches jax.image.resize(..., method='bilinear') for integer factors
    (same half-pixel-center convention, clamp-at-edge), but lowers as
    ``s`` phase-wise shifted weighted adds + one interleave instead of the
    resize's dense (out, in) matmul pair — pure VPU/bandwidth, fusable
    into neighboring elementwise ops. At 1080p x 9 channels the resize's
    two GEMMs cost ~1-2 ms; this is one pass over the output."""
    n = img.shape[axis]

    def shift(k):  # in[i + k] with clamp-at-edge, along `axis`
        if k == 0:
            return img
        sl = [slice(None)] * img.ndim
        pad = [slice(None)] * img.ndim
        if k > 0:
            sl[axis] = slice(k, None)
            pad[axis] = slice(n - k, None)
            return jnp.concatenate(
                [img[tuple(sl)]] + [img[tuple(pad)]], axis=axis)
        sl[axis] = slice(None, k)
        pad[axis] = slice(None, -k)
        return jnp.concatenate(
            [img[tuple(pad)]] + [img[tuple(sl)]], axis=axis)

    lo, hi = shift(-1), shift(1)
    phases = []
    for k in range(s):
        f = (k + 0.5) / s - 0.5        # offset of out phase k from in[i]
        if f < 0.0:
            phases.append(img * (1.0 + f) + lo * (-f))
        else:
            phases.append(img * (1.0 - f) + hi * f)
    out = jnp.stack(phases, axis=axis + 1)          # (..., n, s, ...)
    shape = list(img.shape)
    shape[axis] = n * s
    return out.reshape(shape)


def upsample_bilinear_int(img: jax.Array, sy: int, sx: int) -> jax.Array:
    """(H, W, *C) -> (H*sy, W*sx, *C) bilinear upsample for integer
    factors; numerically equal to jax.image.resize's bilinear (which
    separates into per-axis passes for exact integer ratios)."""
    out = _upsample_axis(img, sy, 0) if sy > 1 else img
    return _upsample_axis(out, sx, 1) if sx > 1 else out


def upsample_bilinear_int_cf(img: jax.Array, sy: int, sx: int) -> jax.Array:
    """(C, H, W) channel-first variant of :func:`upsample_bilinear_int`
    (the fused shading kernel's sky input layout)."""
    out = _upsample_axis(img, sy, 1) if sy > 1 else img
    return _upsample_axis(out, sx, 2) if sx > 1 else out


def _shift_clamped(img: jax.Array, k: int, axis: int) -> jax.Array:
    """in[i + k] along ``axis`` with clamp-at-edge (edge row replicated
    |k| times), any |k| < n."""
    if k == 0:
        return img
    n = img.shape[axis]
    sl = [slice(None)] * img.ndim
    edge = [slice(None)] * img.ndim
    if k > 0:
        sl[axis] = slice(k, None)
        edge[axis] = slice(n - 1, None)
        rep = [img[tuple(edge)]] * k
        return jnp.concatenate([img[tuple(sl)]] + rep, axis=axis)
    sl[axis] = slice(None, k)
    edge[axis] = slice(None, 1)
    rep = [img[tuple(edge)]] * (-k)
    return jnp.concatenate(rep + [img[tuple(sl)]], axis=axis)


def _cr_weights(p: float) -> tuple[float, float, float, float]:
    """Catmull-Rom (a = -0.5) weights for taps at offsets -1, 0, 1, 2
    around the base sample, at fraction ``p`` in [0, 1)."""
    p2, p3 = p * p, p * p * p
    return (-0.5 * p3 + p2 - 0.5 * p,
            1.5 * p3 - 2.5 * p2 + 1.0,
            -1.5 * p3 + 2.0 * p2 + 0.5 * p,
            0.5 * p3 - 0.5 * p2)


def _upsample_axis_cubic(img: jax.Array, s: int, axis: int) -> jax.Array:
    """Exact integer-factor Catmull-Rom upsample along one axis
    (half-pixel-center convention, clamp-at-edge), as s phase-wise
    4-tap weighted adds — pure fusable VPU work like _upsample_axis.

    For SMOOTH signals (the skybox: an env-map sample through a C-inf
    unprojection) the cubic kernel's curvature correction cuts the
    coarse-grid interpolation error by ~an order of magnitude over
    bilinear at the same sample count."""
    shifts = {k: _shift_clamped(img, k, axis) for k in (-2, -1, 0, 1, 2)}
    phases = []
    for k in range(s):
        f = (k + 0.5) / s - 0.5
        m = -1 if f < 0.0 else 0
        p = f - m
        w = _cr_weights(p)
        phases.append(w[0] * shifts[m - 1] + w[1] * shifts[m]
                      + w[2] * shifts[m + 1] + w[3] * shifts[m + 2])
    out = jnp.stack(phases, axis=axis + 1)
    shape = list(img.shape)
    shape[axis] = img.shape[axis] * s
    return out.reshape(shape)


def upsample_bicubic_int(img: jax.Array, sy: int, sx: int) -> jax.Array:
    """(H, W, *C) integer-factor Catmull-Rom upsample (separable)."""
    out = _upsample_axis_cubic(img, sy, 0) if sy > 1 else img
    return _upsample_axis_cubic(out, sx, 1) if sx > 1 else out


def upsample_bicubic_int_cf(img: jax.Array, sy: int, sx: int) -> jax.Array:
    """(C, H, W) channel-first variant of :func:`upsample_bicubic_int`."""
    out = _upsample_axis_cubic(img, sy, 1) if sy > 1 else img
    return _upsample_axis_cubic(out, sx, 2) if sx > 1 else out
