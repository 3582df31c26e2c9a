"""Environment pipeline: equirect -> cubemap, diffuse irradiance bake,
skybox.

Replaces src/equirectangular_to_cubemap_renderer.rs +
equirectangular_to_cubemap.wgsl (direction -> spherical uv with the
0.1591/0.3183 constants and pow-2.2 decode),
src/diffuse_irradiance_renderer.rs + diffuse_irradiance_bake.wgsl (hemisphere
Riemann sum, dPhi=0.125 / dTheta=0.025 ~= 3213 samples per texel), and
src/shaders/skybox.wgsl (fullscreen unproject + cube sample).

On TPU these are one-shot jitted precomputes over cubemap texel grids: no
cube rasterization needed — texel directions are generated analytically.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import sampling

F32 = jnp.float32


def sample_equirect(equirect: jax.Array, d: jax.Array) -> jax.Array:
    """Spherical mapping of equirectangular_to_cubemap.wgsl:48-56:
    uv = (atan2(z, x), asin(y)) * (0.1591, 0.3183) + 0.5, v flipped."""
    dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
    u = jnp.arctan2(dn[..., 2], dn[..., 0]) * 0.1591 + 0.5
    v = 1.0 - (jnp.arcsin(jnp.clip(dn[..., 1], -1.0, 1.0)) * 0.3183 + 0.5)

    h, w = equirect.shape[:2]
    fu = u * w - 0.5
    fv = jnp.clip(v * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(fu)
    y0 = jnp.floor(fv)
    fx = (fu - x0)[..., None]
    fy = (fv - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = y0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    flat = equirect.reshape(h * w, equirect.shape[-1])

    def tex(xi, yi):
        return jnp.take(flat, yi * w + xi, axis=0)

    return ((tex(x0i, y0i) * (1 - fx) + tex(x1i, y0i) * fx) * (1 - fy)
            + (tex(x0i, y1i) * (1 - fx) + tex(x1i, y1i) * fx) * fy)


def equirect_to_cubemap(equirect: jax.Array, size: int,
                        gamma_decode: bool = True) -> jax.Array:
    """Bake a (6, S, S, 3) environment cubemap from an equirect HDR image.

    gamma_decode applies pow(c, 2.2) like the reference's bake shader
    (equirectangular_to_cubemap.wgsl:37-39).
    """
    dirs = sampling.face_texel_dirs(size)          # (6, S, S, 3)
    c = sample_equirect(equirect, dirs)
    if gamma_decode:
        c = jnp.power(jnp.maximum(c, 0.0), 2.2)
    return c.astype(F32)


def irradiance_sample_dirs() -> tuple[np.ndarray, np.ndarray, int]:
    """Tangent-space hemisphere sample dirs + cos*sin weights, exactly the
    loop of diffuse_irradiance_bake.wgsl:59-73 (phi += 0.125 while < 2pi,
    theta += 0.025 while < pi/2)."""
    phis = np.arange(0.0, 2.0 * math.pi, 0.125)
    thetas = np.arange(0.0, 0.5 * math.pi, 0.025)
    ph, th = np.meshgrid(phis, thetas, indexing="ij")
    ph, th = ph.ravel(), th.ravel()
    dirs = np.stack([np.sin(th) * np.cos(ph),
                     np.sin(th) * np.sin(ph),
                     np.cos(th)], axis=1).astype(np.float32)
    weights = (np.cos(th) * np.sin(th)).astype(np.float32)
    return dirs, weights, dirs.shape[0]


@jax.named_scope("irradiance_bake")
def bake_irradiance(env_cube: jax.Array, size: int, chunk: int = 128) -> jax.Array:
    """Diffuse irradiance convolution -> (6, S, S, 3).

    irradiance = pi * sum(env(dir) * cos(theta) * sin(theta)) / N over the
    hemisphere around each texel normal (diffuse_irradiance_bake.wgsl:49-77).
    Runs as a lax.scan over sample-direction chunks to bound memory.
    """
    normals = sampling.face_texel_dirs(size)       # (6, S, S, 3)
    n = normals.reshape(-1, 3)                     # (T, 3)
    guessed_up = jnp.array([0.0, 1.0, 0.0], F32)
    right = jnp.cross(jnp.broadcast_to(guessed_up, n.shape), n)
    right = right / jnp.maximum(jnp.linalg.norm(right, axis=-1, keepdims=True), 1e-6)
    up = jnp.cross(n, right)
    up = up / jnp.maximum(jnp.linalg.norm(up, axis=-1, keepdims=True), 1e-6)

    dirs_np, w_np, total = irradiance_sample_dirs()
    pad = (-len(w_np)) % chunk
    dirs_np = np.pad(dirs_np, ((0, pad), (0, 0)))
    w_np = np.pad(w_np, (0, pad))
    dirs = jnp.asarray(dirs_np.reshape(-1, chunk, 3))
    weights = jnp.asarray(w_np.reshape(-1, chunk))

    def step(acc, chunk_data):
        d, w = chunk_data                          # (chunk, 3), (chunk,)
        # world dir = x*right + y*up + z*normal, per texel per sample
        world = (d[None, :, 0:1] * right[:, None, :]
                 + d[None, :, 1:2] * up[:, None, :]
                 + d[None, :, 2:3] * n[:, None, :])   # (T, chunk, 3)
        c = sampling.sample_cubemap(env_cube, world)  # (T, chunk, 3)
        return acc + jnp.sum(c * w[None, :, None], axis=1), None

    acc0 = jnp.zeros((n.shape[0], 3), F32)
    acc, _ = jax.lax.scan(step, acc0, (dirs, weights))
    irr = math.pi * acc / float(total)
    return irr.reshape(6, size, size, 3)


# ---------------------------------------------------------------------------
# Spherical-harmonics irradiance (TPU-native replacement for the per-pixel
# irradiance-cubemap gather: random gathers cost ~9 ns/element on TPU, while
# an SH-9 evaluation is pure VPU math. Diffuse irradiance is low-frequency —
# 9 coefficients capture >99% of it (Ramamoorthi & Hanrahan 2001).
# ---------------------------------------------------------------------------

# Y_lm basis constants
_SH_C = (
    0.282095,                      # Y00
    0.488603,                      # Y1m1 (y), Y10 (z), Y11 (x)
    1.092548,                      # Y2m2 (xy), Y2m1 (yz), Y21 (xz)
    0.315392,                      # Y20 (3z^2 - 1)
    0.546274,                      # Y22 (x^2 - y^2)
)


def _sh_basis(d: jax.Array) -> jax.Array:
    """(..., 3) unit dirs -> (..., 9) SH basis values."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack([
        jnp.full_like(x, _SH_C[0]),
        _SH_C[1] * y, _SH_C[1] * z, _SH_C[1] * x,
        _SH_C[2] * x * y, _SH_C[2] * y * z,
        _SH_C[3] * (3.0 * z * z - 1.0),
        _SH_C[2] * x * z,
        _SH_C[4] * (x * x - y * y),
    ], axis=-1)


def sh_project_cubemap(cube: jax.Array) -> jax.Array:
    """Project a (6, S, S, 3) cubemap onto SH-9 -> (9, 3) coefficients.

    Texel solid angles weight the sum (cube texels near corners cover less
    of the sphere)."""
    size = cube.shape[1]
    dirs = sampling.face_texel_dirs(size)               # (6, S, S, 3)
    t = (jnp.arange(size, dtype=F32) + 0.5) / size * 2.0 - 1.0
    v, u = jnp.meshgrid(t, t, indexing="ij")
    r2 = 1.0 + u * u + v * v
    domega = 4.0 / (jnp.sqrt(r2) * r2)                  # per-texel solid angle
    w = jnp.broadcast_to(domega, (6, size, size))
    basis = _sh_basis(dirs)                             # (6, S, S, 9)
    coeffs = jnp.einsum("fijk,fijc,fij->kc", basis, cube, w,
                        preferred_element_type=F32)
    total = jnp.sum(w)
    return coeffs * (4.0 * jnp.pi / total)


def sh_eval_irradiance(sh: jax.Array, n: jax.Array) -> jax.Array:
    """Evaluate SH-9 coefficients of an *irradiance* signal at normals
    ``n`` (..., 3) -> (..., 3). Pure elementwise math — no gathers."""
    return jnp.einsum("...k,kc->...c", _sh_basis(n), sh,
                      preferred_element_type=F32)


@jax.named_scope("skybox")
def skybox_colors(env_cube: jax.Array, proj_inv: jax.Array,
                  view_rot_inv: jax.Array, width: int, height: int,
                  y0: int = 0, full_height: int = 0,
                  rgbe_win: jax.Array | None = None) -> jax.Array:
    """Per-pixel skybox color (skybox.wgsl:23-53): unproject the pixel NDC,
    rotate into world by the inverse view rotation, sample the env cube.

    ``y0``/``full_height`` render a horizontal band [y0, y0+height) of a
    ``full_height``-tall image — used by the spatially sharded multi-chip
    frame (parallel/sharded.py) where each device owns a band of rows.

    ``rgbe_win``: optional (6, S, S, 16) u8 windowed-RGBE cube
    (sampling.encode_rgbe_windowed) — the bilinear sample then costs ONE
    gather per pixel instead of four (the steady-state display path; the
    f32 cube stays the source of truth for bakes).
    """
    fh = full_height or height
    x = ((jnp.arange(width, dtype=F32) + 0.5) / width) * 2.0 - 1.0
    y = -(((jnp.arange(height, dtype=F32) + y0 + 0.5) / fh) * 2.0 - 1.0)
    xg, yg = jnp.meshgrid(x, y, indexing="xy")
    ndc = jnp.stack([xg, yg, jnp.zeros_like(xg), jnp.ones_like(xg)], axis=-1)
    un = jnp.einsum("hwj,ij->hwi", ndc, proj_inv, preferred_element_type=F32)
    d = jnp.einsum("hwj,ij->hwi", un[..., :3], view_rot_inv,
                   preferred_element_type=F32)
    if rgbe_win is not None:
        return sampling.sample_cubemap_rgbe_windowed(rgbe_win, d)
    return sampling.sample_cubemap(env_cube, d)


def skybox_colors_blocks(env_cube: jax.Array, proj_inv: jax.Array,
                         view_rot_inv: jax.Array, slots: jax.Array,
                         bh: int, bw: int, nbx: int,
                         width: int, height: int,
                         y0: int = 0, full_height: int = 0,
                         rgbe_win: jax.Array | None = None) -> jax.Array:
    """Skybox colors for a compacted block work list — (K, bh, bw, 3).

    ``slots``: (K,) block indices (compact.BlockPlan.slots; -1 = empty)
    over the (height//bh, width//bw) row-major block grid of a
    ``width`` x ``height`` image (band [y0, y0+height) of a
    ``full_height``-tall frame for the sharded path). Sky only matters on
    background pixels, so evaluating it FULL-RATE on the blocks that
    contain any (exact where visible) costs a fraction of the dense
    full-rate pass while eliminating the coarse-grid upsample error —
    the largest single >1-LSB source vs reference_parity (sky_scale=8
    measured 1.71% vs sky_scale=1's 0.98% at 1080p; dense full-rate sky
    cost +15 ms, this costs ~the background fraction of that). Pixel
    directions are closed-form in the block coordinates — no gather of
    per-pixel inputs, only the cube-sample gather itself."""
    fh = full_height or height
    b = jnp.clip(slots, 0, None)
    by = (b // nbx).astype(F32)                     # (K,)
    bx = (b % nbx).astype(F32)
    xs = jnp.arange(bw, dtype=F32)[None, None, :]   # (1, 1, bw)
    ys = jnp.arange(bh, dtype=F32)[None, :, None]   # (1, bh, 1)
    px = bx[:, None, None] * bw + xs + 0.5
    py = by[:, None, None] * bh + ys + y0 + 0.5
    px, py = jnp.broadcast_arrays(px, py)           # (K, bh, bw)
    x = (px / width) * 2.0 - 1.0
    y = -((py / fh) * 2.0 - 1.0)
    ndc = jnp.stack([x, y, jnp.zeros_like(x), jnp.ones_like(x)], axis=-1)
    un = jnp.einsum("khwj,ij->khwi", ndc, proj_inv,
                    preferred_element_type=F32)
    d = jnp.einsum("khwj,ij->khwi", un[..., :3], view_rot_inv,
                   preferred_element_type=F32)
    if rgbe_win is not None:
        cols = sampling.sample_cubemap_rgbe_windowed(rgbe_win, d)
    else:
        cols = sampling.sample_cubemap(env_cube, d)
    return jnp.where((slots >= 0)[:, None, None, None], cols, 0.0)
