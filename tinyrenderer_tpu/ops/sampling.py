"""Texture sampling primitives: pooled 2D mip sampling and cubemaps.

The wgpu samplers (src/texture.rs) become explicit gathers. Material
textures live in one static pool (see assets/textures.py): each mip level
``l`` of texture ``t`` occupies a contiguous region of a flattened texel
array, so any (texture, level, y, x) sample is a single dynamic gather —
TPU-friendly and shape-static.

Cubemaps are (6, S, S, C) arrays with the face order of
scene/lights.py::CUBE_FACE_DIRS (+X, -X, +Y, -Y, +Z, -Z). ``cubemap_dir``
and ``cubemap_face_uv`` are exact inverses (round-trip tested), so bake and
lookup share one convention — this replaces the reference's x-flip dance
(src/shaders/shadow.wgsl:39-48, equirectangular_to_cubemap.wgsl:22-33).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32

# Windowed-blend domain (A/B flag for tools/profile_frame.py --set
# wblend). Interleaved 1080p A/B: flat (N, 4C) rows 27.2 ms vs (H, W, 4C)
# image tensors 23.9 — image shapes WIN despite the ~1.5 ms of relayout
# copies the trace attributes between gather/convert/blend, because XLA
# lays (H, W, C) out with W in the 128 lanes (full occupancy) while a
# flat (N, C<128) blend output pads C to the lanes (14x bloat at C=9).
# Rule of thumb: flat 2D rows for GATHER TABLES and per-row/triangle
# math; image-shaped tensors for bulk per-pixel math.
_FLAT_WINDOW_BLEND = False

# Windowed u8 blend engine. The XLA image-domain blend pays a channel-
# major relayout of the 36 B gather rows (0.84 ms at 1080p), a dense
# f32 decode materialization and the blend pass (~2.1 ms total in the
# trace). The Pallas kernel consumes the FLAT (N, 4C) u8 gather output
# in its native row-major layout (no relayout), decodes and blends in
# VMEM, and writes only the C blended channels, channel-first.
# MEASURED SLOWER (interleaved A/B at 1080p test.lvl): 24.2 vs 23.2 ms
# — the (C, N) kernel output must transpose back to channel-last for
# the block-compacted (K, bh*bw*C) scatter rows, and that transpose
# fuses into downstream selects as expensive ops (first attempt with a
# flat 1D index gather was +3.1 ms from s32[N,1]{0,1:T(1,128)} index
# layouts; the image-shaped gather fixed that but +1.0 ms remains).
# Kept for A/B via tools/profile_frame.py --set wblend; default OFF.
_WINDOWED_BLEND_PALLAS = False

# Pallas windowed blend for the CHANNEL-FIRST dense sample (fused shading
# path). The +1.0 ms that shelved _WINDOWED_BLEND_PALLAS was the (C, N) ->
# channel-last transpose for the compacted scatter; the fused kernel
# consumes (C, H, W) directly, so the kernel's native channel-first output
# is now layout-free. tools/ab_frame.py toggle; ~1 ULP vs the jnp blend.
_CF_BLEND_PALLAS = False


def _windowed_blend_kernel(rows_ref, fx_ref, fy_ref, out_ref, *, C: int):
    """One (R, 4C) u8 row block -> (C, R) blended texels.

    Channels sit in the minor dim of the gathered rows (36 of 128 lanes
    at C=9), so per-channel math there wastes ~93% of the VPU. An MXU
    identity dot transposes the block to (4C, R) — pixels in the lanes —
    and the bilinear blend runs at full occupancy. The one-hot identity
    matmul copies rows exactly at any matmul precision; the decode/blend
    op order matches the jnp windowed path (equal to within 1 ULP — the
    two layouts FMA-contract differently)."""
    # Mosaic has no u8->f32 cast; widen through i32 (exact for 0..255)
    t = rows_ref[...].astype(I32).astype(F32) * (1.0 / 255.0)  # (R, 4C)
    tt = jax.lax.dot_general(
        jnp.eye(4 * C, dtype=F32), t, (((1,), (1,)), ((), ())),
        preferred_element_type=F32)                          # (4C, R)
    fx = fx_ref[0, :]
    fy = fy_ref[0, :]
    c00, c10 = tt[0:C], tt[C:2 * C]
    c01, c11 = tt[2 * C:3 * C], tt[3 * C:4 * C]
    out_ref[...] = ((c00 * (1.0 - fx) + c10 * fx) * (1.0 - fy)
                    + (c01 * (1.0 - fx) + c11 * fx) * fy)


def _windowed_blend_u8(texels: jax.Array, idx: jax.Array, fx: jax.Array,
                       fy: jax.Array, C: int,
                       channel_first: bool = False) -> jax.Array | None:
    """Pallas windowed blend: gather (N, 4C) u8 rows flat, blend on-chip.

    idx: (...) int32 window-row indices; fx/fy: (..., 1) f32 corner
    fractions. Returns (..., C) f32, or None when the shape doesn't fit
    the kernel (caller falls back to the jnp image-domain blend)."""
    N = int(np.prod(idx.shape))
    R = 2048
    while R > N or N % R:
        R //= 2
    if R < 256 or not (_WINDOWED_BLEND_PALLAS or channel_first):
        return None
    # gather with the ORIGINAL index shape: a flat (N,) index vector got
    # laid out (N, 1) T(1,128) with a 2.2 ms materialized clamp pass; the
    # image-shaped gather keeps the clamp fused into the gather custom
    # call. The (N, 4C) reshape of its row-major output is a free bitcast.
    rows = jnp.take(texels, idx, axis=0).reshape(N, texels.shape[-1])
    fxf = fx.reshape(1, N)
    fyf = fy.reshape(1, N)
    out = pl.pallas_call(
        functools.partial(_windowed_blend_kernel, C=C),
        grid=(N // R,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((R, 4 * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, R), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, N), F32),
        cost_estimate=pl.CostEstimate(
            flops=N * C * 8, bytes_accessed=N * (4 * C + 8 + C * 4),
            transcendentals=0),
    )(rows, fxf, fyf)
    if channel_first:
        return out.reshape((C,) + idx.shape)
    return jnp.moveaxis(out.reshape((C,) + idx.shape), 0, -1)


@jax.tree_util.register_pytree_node_class
class TexturePoolGPU:
    """Flattened mip pyramid pool on device.

    The texel array is the only traced leaf; layout metadata (level sizes/
    offsets, window flag) is static pytree aux data so samplers can branch
    on it at trace time.

    When ``windowed`` is True each row stores the texel together with its
    +x, +y and +x+y neighbors (4C channels): a full bilinear tap is then
    ONE gather instead of four — TPU gathers pay per ROW (~4-13 ms per
    full-res tap), so row width is nearly free while tap count is the
    dominant frame cost.

    When ``morton`` is True each level's texels are stored in Morton
    (Z-curve) order instead of row-major, so screen-coherent uv streams
    (floors, walls) hit nearby pool rows in both u and v — sequential-ish
    gathers measured ~5x faster than random on a v5e.
    """

    def __init__(self, texels, level_offsets, level_sizes, texels_per_tex,
                 windowed=False, base_channels=4, u8=False, morton=False):
        self.texels = texels              # (num_tex * texels_per_tex, C|4C)
        self.level_offsets = tuple(level_offsets)
        self.level_sizes = tuple(level_sizes)
        self.texels_per_tex = int(texels_per_tex)
        self.windowed = bool(windowed)
        self.base_channels = int(base_channels)
        self.u8 = bool(u8)
        self.morton = bool(morton)

    def _decode(self, rows):
        """u8-quantized pools decode to [0,1] floats after the gather."""
        if self.u8:
            return rows.astype(jnp.float32) * (1.0 / 255.0)
        return rows

    def _texel_index(self, yi, xi, sizes):
        """In-level texel index under the pool's layout."""
        if self.morton:
            return _morton2(yi, xi)
        return yi * sizes + xi

    def tree_flatten(self):
        return (self.texels,), (self.level_offsets, self.level_sizes,
                                self.texels_per_tex, self.windowed,
                                self.base_channels, self.u8, self.morton)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def _part1by1(v):
    """Spread the low 16 bits of v to even bit positions (int32 jnp)."""
    v = v & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def _morton2(y, x):
    """Interleave (y, x) -> Z-curve index (valid for power-of-two sizes)."""
    return (_part1by1(y) << 1) | _part1by1(x)


def _morton2_np(y: np.ndarray, x: np.ndarray) -> np.ndarray:
    def p(v):
        v = v.astype(np.int64) & 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v
    return (p(y) << 1) | p(x)


def window_rows(img: np.ndarray, wrap: bool = True) -> np.ndarray:
    """(s, s, C) -> (s, s, 4C): [self | +x | +y | +x+y] neighbors."""
    if wrap:
        right = np.roll(img, -1, axis=-2)
        down = np.roll(img, -1, axis=-3)
        diag = np.roll(down, -1, axis=-2)
    else:
        right = np.concatenate([img[..., :, 1:, :], img[..., :, -1:, :]], axis=-2)
        down = np.concatenate([img[..., 1:, :, :], img[..., -1:, :, :]], axis=-3)
        diag = np.concatenate([down[..., :, 1:, :], down[..., :, -1:, :]], axis=-2)
    return np.concatenate([img, right, down, diag], axis=-1)


def window_rows_device(img: jax.Array, wrap: bool = True) -> jax.Array:
    """jnp mirror of :func:`window_rows` for device-resident re-mips."""
    if wrap:
        right = jnp.roll(img, -1, axis=-2)
        down = jnp.roll(img, -1, axis=-3)
        diag = jnp.roll(down, -1, axis=-2)
    else:
        right = jnp.concatenate([img[..., :, 1:, :], img[..., :, -1:, :]],
                                axis=-2)
        down = jnp.concatenate([img[..., 1:, :, :], img[..., -1:, :, :]],
                               axis=-3)
        diag = jnp.concatenate([down[..., :, 1:, :], down[..., :, -1:, :]],
                               axis=-2)
    return jnp.concatenate([img, right, down, diag], axis=-1)


def remip_pool_device(pool: TexturePoolGPU,
                      wrap: bool = True) -> TexturePoolGPU:
    """Rebuild every texture's mip chain from its level-0 texels ON DEVICE.

    The runtime analog of the reference's compute-shader mip generator
    (src/mipmap_generator.rs:108 + mipmap_generator.wgsl:22-30), which can
    re-mip a GPU-resident texture without a host round trip — e.g. after a
    device-side bake or procedural edit wrote new level-0 texels into the
    pool. Jit-compatible: one chain of 2x2 box reductions + a static
    repack of the flat pool rows (no host transfers). Windowed pools
    re-derive their neighbor windows per level; ``wrap`` must match the
    pack-time setting. Morton pools are not supported (Z-order would need
    a per-level permutation gather).

    Returns a new TexturePoolGPU with identical static metadata.
    """
    assert not pool.morton, "remip_pool_device: morton layout unsupported"
    sizes = pool.level_sizes
    assert all(sizes[i] == 2 * sizes[i + 1] for i in range(len(sizes) - 1)),\
        "remip_pool_device needs a 2x mip chain"
    tpt = pool.texels_per_tex
    n = pool.texels.shape[0] // tpt
    Cw = pool.texels.shape[-1]
    C = pool.base_channels
    S0 = sizes[0]
    per_tex = pool.texels.reshape(n, tpt, Cw)
    lvl0 = per_tex[:, pool.level_offsets[0]:pool.level_offsets[0] + S0 * S0]
    lvl0 = lvl0.reshape(n, S0, S0, Cw)[..., :C]          # self channels
    if pool.u8:
        lvl0 = lvl0.astype(F32) * (1.0 / 255.0)
    mips = [lvl0]
    for _ in range(len(sizes) - 1):
        m = mips[-1]
        h, w = m.shape[1:3]
        mips.append(m.reshape(n, h // 2, 2, w // 2, 2, C).mean(axis=(2, 4)))
    if pool.windowed:
        mips = [window_rows_device(m, wrap) for m in mips]
    regions = [m.reshape(n, s * s, Cw) for m, s in zip(mips, sizes)]
    flat = jnp.concatenate(regions, axis=1)              # (n, tpt, Cw)
    if pool.u8:
        flat = jnp.clip(flat * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    return TexturePoolGPU(flat.reshape(n * tpt, Cw), pool.level_offsets,
                          sizes, tpt, pool.windowed, C, pool.u8,
                          pool.morton)


def pack_texture_pool(mips: list[np.ndarray],
                      windowed: bool = False,
                      wrap: bool = True,
                      u8: bool = False,
                      morton: bool = False) -> TexturePoolGPU:
    """Flatten host mip arrays [(N, s, s, C) per level] into one pool.

    ``u8`` stores texels as uint8 (values must be in [0,1]) — matches the
    reference's RGBA8 texture storage AND gathers ~3x faster than f32 rows
    (9B vs 36B per row). ``morton`` stores each level in Z-curve order
    (power-of-two sizes only) for 2D gather locality."""
    n = mips[0].shape[0]
    base_channels = mips[0].shape[-1]
    if windowed:
        mips = [window_rows(m, wrap) for m in mips]
    channels = mips[0].shape[-1]
    level_sizes = tuple(int(m.shape[1]) for m in mips)
    if morton:
        assert all(s & (s - 1) == 0 for s in level_sizes), \
            "morton layout needs power-of-two level sizes"
    offsets, off = [], 0
    for s in level_sizes:
        offsets.append(off)
        off += s * s
    texels_per_tex = off
    flat = np.zeros((n * texels_per_tex, channels), np.float32)
    for l, m in enumerate(mips):
        s = level_sizes[l]
        region = m.reshape(n, s * s, channels)
        if morton:
            ys, xs = np.mgrid[0:s, 0:s]
            z = _morton2_np(ys, xs).reshape(s * s)
            reordered = np.empty_like(region)
            reordered[:, z] = region           # row-major texel -> Z slot
            region = reordered
        for_all = np.arange(n) * texels_per_tex + offsets[l]
        for t in range(n):
            flat[for_all[t]:for_all[t] + s * s] = region[t]
    if u8:
        flat = np.clip(flat * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return TexturePoolGPU(jnp.asarray(flat), tuple(offsets), level_sizes,
                          texels_per_tex, windowed, base_channels, u8,
                          morton)


def _gather_texel(pool: TexturePoolGPU, tex: jax.Array, level: int,
                  ix: jax.Array, iy: jax.Array) -> jax.Array:
    s = pool.level_sizes[level]
    ix = jnp.clip(ix, 0, s - 1)
    iy = jnp.clip(iy, 0, s - 1)
    idx = (tex * pool.texels_per_tex + pool.level_offsets[level]
           + pool._texel_index(iy, ix, s))
    return jnp.take(pool.texels, idx, axis=0)


def sample_pool_bilinear_level(pool: TexturePoolGPU, tex: jax.Array,
                               uv: jax.Array, level: int,
                               wrap: bool = True) -> jax.Array:
    """Bilinear sample at one mip level. uv: (..., 2); tex: (...) int32."""
    s = pool.level_sizes[level]
    u = uv[..., 0] * s - 0.5
    v = uv[..., 1] * s - 0.5
    if wrap:
        u = jnp.mod(u, s)
        v = jnp.mod(v, s)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]
    x0i = x0.astype(I32)
    y0i = y0.astype(I32)
    if wrap:
        x1i = jnp.mod(x0i + 1, s)
        y1i = jnp.mod(y0i + 1, s)
        x0i = jnp.mod(x0i, s)
        y0i = jnp.mod(y0i, s)
    else:
        x1i, y1i = x0i + 1, y0i + 1
    c00 = pool._decode(_gather_texel(pool, tex, level, x0i, y0i))
    c10 = pool._decode(_gather_texel(pool, tex, level, x1i, y0i))
    c01 = pool._decode(_gather_texel(pool, tex, level, x0i, y1i))
    c11 = pool._decode(_gather_texel(pool, tex, level, x1i, y1i))
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def _sample_bilinear_dynamic_level(pool: TexturePoolGPU, tex: jax.Array,
                                   uv: jax.Array, level_i: jax.Array,
                                   wrap: bool,
                                   channel_first: bool = False) -> jax.Array:
    """Bilinear sample where the mip level is a per-pixel traced int.

    Level sizes/offsets are small static tuples, so the texel address is
    pure arithmetic on gathered per-pixel (size, offset) pairs — 4 gathers
    per sample instead of unrolling every level at every call site (which
    multiplied both compile time and HBM gathers by the level count).
    """
    S0 = pool.level_sizes[0]
    is_pow2_chain = all(
        pool.level_sizes[i] == S0 >> i and
        pool.level_offsets[i] == (S0 * S0 - (S0 >> i) ** 2) * 4 // 3
        for i in range(len(pool.level_sizes)))
    if is_pow2_chain:
        # closed-form level addressing (no per-pixel table gathers):
        # size(l) = S0 >> l; offset(l) = (S0^2 - size^2) * 4/3
        sizes = jnp.right_shift(jnp.int32(S0), level_i)
        offs = (S0 * S0 - sizes * sizes) * jnp.int32(4) // jnp.int32(3)
    else:
        sizes = jnp.take(jnp.asarray(pool.level_sizes, I32), level_i)
        offs = jnp.take(jnp.asarray(pool.level_offsets, I32), level_i)
    sf = sizes.astype(F32)
    u = uv[..., 0] * sf - 0.5
    v = uv[..., 1] * sf - 0.5
    if wrap:
        u = jnp.mod(u, sf)
        v = jnp.mod(v, sf)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]
    x0i = x0.astype(I32)
    y0i = y0.astype(I32)
    if wrap:
        x1i = jnp.mod(x0i + 1, sizes)
        y1i = jnp.mod(y0i + 1, sizes)
        x0i = jnp.mod(x0i, sizes)
        y0i = jnp.mod(y0i, sizes)
    else:
        x1i = jnp.minimum(x0i + 1, sizes - 1)
        y1i = jnp.minimum(y0i + 1, sizes - 1)

    base = tex * pool.texels_per_tex + offs

    if pool.windowed:
        # one gather fetches all 4 bilinear corners (window layout)
        x0c = jnp.clip(x0i, 0, sizes - 1)
        y0c = jnp.clip(y0i, 0, sizes - 1)
        idx = base + pool._texel_index(y0c, x0c, sizes)
        C = pool.base_channels
        if channel_first:
            # channel-first consumer (the fused shading kernel): blend
            # each channel as an (H, W) plane and stack to (C, H, W) —
            # the per-channel slices read the gather result in its
            # XLA-chosen planar layout and the stack IS the kernel's
            # input layout, skipping the full-res (H, W, C) -> (C, H, W)
            # relayout the channel-last path pays (~0.6 ms at 1080p).
            # Arithmetic per channel is identical to the channel-last
            # blend (bit-exact).
            if pool.u8 and _CF_BLEND_PALLAS:
                out = _windowed_blend_u8(pool.texels, idx, fx, fy, C,
                                         channel_first=True)
                if out is not None:
                    return out
            row = pool._decode(jnp.take(pool.texels, idx, axis=0))
            fx2 = fx[..., 0]
            fy2 = fy[..., 0]
            planes = []
            for c in range(C):
                p00 = row[..., c]
                p10 = row[..., C + c]
                p01 = row[..., 2 * C + c]
                p11 = row[..., 3 * C + c]
                planes.append((p00 * (1 - fx2) + p10 * fx2) * (1 - fy2)
                              + (p01 * (1 - fx2) + p11 * fx2) * fy2)
            return jnp.stack(planes, axis=0)
        if pool.u8 and not _FLAT_WINDOW_BLEND:
            out = _windowed_blend_u8(pool.texels, idx, fx, fy, C)
            if out is not None:
                return out
        if _FLAT_WINDOW_BLEND:
            # decode + blend on the FLAT (N, 4C) gathered rows instead of
            # (H, W, 4C) 3D tensors (layout-relayout A/B; see flag note)
            row = pool._decode(jnp.take(pool.texels, idx.reshape(-1),
                                        axis=0))
            fxf = fx.reshape(-1, 1)
            fyf = fy.reshape(-1, 1)
            out = ((row[:, 0:C] * (1 - fxf) + row[:, C:2 * C] * fxf)
                   * (1 - fyf)
                   + (row[:, 2 * C:3 * C] * (1 - fxf)
                      + row[:, 3 * C:4 * C] * fxf) * fyf)
            return out.reshape(*idx.shape, C)
        row = pool._decode(jnp.take(pool.texels, idx, axis=0))
        c00 = row[..., 0:C]
        c10 = row[..., C:2 * C]
        c01 = row[..., 2 * C:3 * C]
        c11 = row[..., 3 * C:4 * C]
        return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
                + (c01 * (1 - fx) + c11 * fx) * fy)

    def texel(xi, yi):
        xi = jnp.clip(xi, 0, sizes - 1)
        yi = jnp.clip(yi, 0, sizes - 1)
        return pool._decode(jnp.take(
            pool.texels, base + pool._texel_index(yi, xi, sizes), axis=0))

    out = ((texel(x0i, y0i) * (1 - fx) + texel(x1i, y0i) * fx) * (1 - fy)
           + (texel(x0i, y1i) * (1 - fx) + texel(x1i, y1i) * fx) * fy)
    return jnp.moveaxis(out, -1, 0) if channel_first else out


_BAYER4 = np.array([[0, 8, 2, 10], [12, 4, 14, 6],
                    [3, 11, 1, 9], [15, 7, 13, 5]], np.float32) / 16.0 \
    + 1.0 / 32.0


def _bayer_threshold(shape2d: tuple, phase: int = 0) -> jax.Array:
    """(h, w) tiled 4x4 Bayer thresholds in (0, 1). ``phase`` rotates the
    pattern so independent stochastic decisions (mip level, u, v) decorrelate
    instead of reusing one threshold.

    Built host-side with np.tile so it lowers as a compile-time constant —
    an indexed construction (bayer[y % 4, x % 4]) lowers to a per-pixel
    gather, which on TPU costs as much as a texture tap."""
    h, w = shape2d
    bayer = np.roll(_BAYER4.reshape(-1), 5 * phase).reshape(4, 4)
    full = np.tile(bayer, ((h + 3) // 4, (w + 3) // 4))[:h, :w]
    return jnp.asarray(full)


def _sample_stochastic_dynamic_level(pool: TexturePoolGPU, tex: jax.Array,
                                     uv: jax.Array, level_i: jax.Array,
                                     wrap: bool) -> jax.Array:
    """Stochastic-bilinear sample: ONE texel gather per pixel, with the
    bilinear corner chosen by Bayer-threshold tests on the subtexel
    fractions (P(x0+1) = fx, P(y0+1) = fy). The ordered dither averages the
    bilinear blend over the pixel neighborhood — the same trick 'dithered'
    plays on the mip fraction, applied to the footprint. TPU gathers pay per
    row, so this is the cheapest possible full-rate tap (1 row vs 4)."""
    S0 = pool.level_sizes[0]
    is_pow2_chain = all(
        pool.level_sizes[i] == S0 >> i and
        pool.level_offsets[i] == (S0 * S0 - (S0 >> i) ** 2) * 4 // 3
        for i in range(len(pool.level_sizes)))
    if is_pow2_chain:
        sizes = jnp.right_shift(jnp.int32(S0), level_i)
        offs = (S0 * S0 - sizes * sizes) * jnp.int32(4) // jnp.int32(3)
    else:
        sizes = jnp.take(jnp.asarray(pool.level_sizes, I32), level_i)
        offs = jnp.take(jnp.asarray(pool.level_offsets, I32), level_i)
    sf = sizes.astype(F32)
    u = uv[..., 0] * sf - 0.5
    v = uv[..., 1] * sf - 0.5
    if wrap:
        u = jnp.mod(u, sf)
        v = jnp.mod(v, sf)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    tu = _bayer_threshold(u.shape[-2:], phase=1)
    tv = _bayer_threshold(v.shape[-2:], phase=2)
    xi = x0.astype(I32) + ((u - x0) > tu).astype(I32)
    yi = y0.astype(I32) + ((v - y0) > tv).astype(I32)
    if wrap:
        xi = jnp.mod(xi, sizes)
        yi = jnp.mod(yi, sizes)
    else:
        xi = jnp.clip(xi, 0, sizes - 1)
        yi = jnp.clip(yi, 0, sizes - 1)
    base = tex * pool.texels_per_tex + offs
    row = pool._decode(jnp.take(
        pool.texels, base + pool._texel_index(yi, xi, sizes), axis=0))
    if pool.windowed:
        row = row[..., :pool.base_channels]
    return row


def sample_pool_mip(pool: TexturePoolGPU, tex: jax.Array, uv: jax.Array,
                    level_f: jax.Array, wrap: bool = True,
                    filter: str = "dithered",
                    duv: jax.Array = None,
                    channel_first: bool = False) -> jax.Array:
    """Mipmapped bilinear sample with a per-pixel fractional level.

    filter:
    - 'trilinear': two bilinear taps blended by the level fraction (the
      reference's mipmap_filter: Linear, src/texture.rs:264-266) — 8 gathers.
    - 'dithered' (default): one bilinear tap at lo or lo+1 chosen by a 4x4
      Bayer threshold on the level fraction — 4 gathers. Deterministic and
      visually equivalent to trilinear (the dither averages the blend over
      the pixel neighborhood); the industry-standard gather-halving trick.
    - 'bilinear': nearest mip level — 4 gathers, visible mip seams.
    - 'stochastic': dithered mip choice + stochastic-bilinear footprint —
      1 gather, ordered-dither noise at texel scale (speed preset).
    """
    if isinstance(pool, NativeTexturePoolGPU):
        out = sample_native_pool_mip(pool, tex, uv, level_f, wrap=wrap,
                                     filter=filter, duv=duv)
        return jnp.moveaxis(out, -1, 0) if channel_first else out
    nlev = len(pool.level_sizes)
    lf = jnp.clip(level_f, 0.0, nlev - 1.0)
    if filter == "trilinear":
        lo = jnp.floor(lf).astype(I32)
        frac = (lf - lo.astype(F32))[..., None]
        out_lo = _sample_bilinear_dynamic_level(pool, tex, uv, lo, wrap,
                                                channel_first=channel_first)
        out_hi = _sample_bilinear_dynamic_level(
            pool, tex, uv, jnp.minimum(lo + 1, nlev - 1), wrap,
            channel_first=channel_first)
        if channel_first:
            frac = jnp.moveaxis(frac, -1, 0)             # (1, H, W)
        return out_lo * (1.0 - frac) + out_hi * frac
    if filter in ("dithered", "stochastic"):
        lo = jnp.floor(lf).astype(I32)
        frac = lf - lo.astype(F32)
        thresh = _bayer_threshold((lf.shape[-2], lf.shape[-1]))
        level = jnp.minimum(lo + (frac > thresh).astype(I32), nlev - 1)
        if filter == "stochastic":
            out = _sample_stochastic_dynamic_level(pool, tex, uv, level,
                                                   wrap)
            return jnp.moveaxis(out, -1, 0) if channel_first else out
        return _sample_bilinear_dynamic_level(pool, tex, uv, level, wrap,
                                              channel_first=channel_first)
    # 'bilinear'
    level = jnp.clip(jnp.round(lf), 0, nlev - 1).astype(I32)
    return _sample_bilinear_dynamic_level(pool, tex, uv, level, wrap,
                                          channel_first=channel_first)


def uv_derivatives(uv: jax.Array) -> jax.Array:
    """Screen-space finite-difference uv derivatives, (..., 4) channels
    (dx_u, dx_v, dy_u, dy_v). Shares mip_level_from_uv's conventions:
    one-sided differences at row/column 0, wrap-aware fractional steps.

    Used by the native-size texture pool, whose per-RECORD dimensions mean
    the mip level cannot be a single pre-biased scalar: a 256x1024 texture
    needs log2(|d_s uv| * (w0, h0)) with the record's own (w0, h0) on each
    uv axis (sample_native_pool_mip computes it after its base_tab
    gather). The fixed pyramid keeps the cheaper scalar level."""
    du = uv - jnp.roll(uv, 1, axis=-2)
    dv = uv - jnp.roll(uv, 1, axis=-3)
    du = du.at[..., :, 0, :].set(du[..., :, 1, :])
    dv = dv.at[..., 0, :, :].set(dv[..., 1, :, :])
    du = du - jnp.round(du)
    dv = dv - jnp.round(dv)
    return jnp.concatenate([du, dv], axis=-1)


def mip_level_from_uv(uv: jax.Array, base_size: int) -> jax.Array:
    """Per-pixel mip level via screen-space finite differences of the
    resolved UV map (the quad-derivative analog). uv: (..., H, W, 2) —
    leading dims (e.g. compacted tile slots) are independent images.

    One-sided differences at row/column 0 (a rolled difference would pair
    the first row with the last — wrong for the image edge, and a source of
    band-boundary artifacts in the sharded frame)."""
    d = uv_derivatives(uv)
    du, dv = d[..., 0:2], d[..., 2:4]
    rho = jnp.maximum(jnp.sum(du * du, axis=-1), jnp.sum(dv * dv, axis=-1))
    texel_d2 = rho * (base_size * base_size)
    return jnp.maximum(0.5 * jnp.log2(jnp.maximum(texel_d2, 1e-12)), 0.0)


# ---------------------------------------------------------------------------
# Cubemaps
# ---------------------------------------------------------------------------

# For each face (order matches CUBE_FACE_DIRS): dir = normalize(f + u*ru + v*rv)
# with u, v in [-1, 1].
_FACE_AXES = np.array([
    # forward        right(u)        down(v)
    [[1, 0, 0], [0, 0, -1], [0, -1, 0]],   # +X
    [[-1, 0, 0], [0, 0, 1], [0, -1, 0]],   # -X
    [[0, 1, 0], [1, 0, 0], [0, 0, 1]],     # +Y
    [[0, -1, 0], [1, 0, 0], [0, 0, -1]],   # -Y
    [[0, 0, 1], [1, 0, 0], [0, -1, 0]],    # +Z
    [[0, 0, -1], [-1, 0, 0], [0, -1, 0]],  # -Z
], np.float32)


def cubemap_dir(face: int, u: jax.Array, v: jax.Array) -> jax.Array:
    """(face, u, v in [-1,1]) -> unnormalized direction (..., 3)."""
    f, ru, rv = _FACE_AXES[face]
    d = (jnp.asarray(f) + u[..., None] * jnp.asarray(ru)
         + v[..., None] * jnp.asarray(rv))
    return d


def cubemap_face_uv(d: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """direction (..., 3) -> (face int32, u, v in [-1,1])."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    # face major axis
    is_x = (ax >= ay) & (ax >= az)
    is_y = (ay > ax) & (ay >= az)
    face = jnp.where(is_x, jnp.where(x >= 0, 0, 1),
                     jnp.where(is_y, jnp.where(y >= 0, 2, 3),
                               jnp.where(z >= 0, 4, 5)))
    major = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    major = jnp.maximum(major, 1e-20)
    # invert dir = f + u*ru + v*rv scaled by major
    u = jnp.where(is_x, jnp.where(x >= 0, -z, z),
                  jnp.where(is_y, x, jnp.where(z >= 0, x, -x)))
    v = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y >= 0, z, -z), -y))
    return face.astype(I32), u / major, v / major


def sample_cubemap(cube: jax.Array, d: jax.Array) -> jax.Array:
    """Bilinear cubemap sample (no seam blending). cube: (6, S, S, C),
    d: (..., 3) direction -> (..., C)."""
    S = cube.shape[1]
    face, u, v = cubemap_face_uv(d)
    fu = jnp.clip((u * 0.5 + 0.5) * S - 0.5, 0.0, S - 1.0)
    fv = jnp.clip((v * 0.5 + 0.5) * S - 0.5, 0.0, S - 1.0)
    x0 = jnp.floor(fu)
    y0 = jnp.floor(fv)
    fx = (fu - x0)[..., None]
    fy = (fv - y0)[..., None]
    x0 = x0.astype(I32)
    y0 = y0.astype(I32)
    x1 = jnp.minimum(x0 + 1, S - 1)
    y1 = jnp.minimum(y0 + 1, S - 1)

    flat = cube.reshape(6 * S * S, cube.shape[-1])

    def tex(xi, yi):
        return jnp.take(flat, (face * S + yi) * S + xi, axis=0)

    return ((tex(x0, y0) * (1 - fx) + tex(x1, y0) * fx) * (1 - fy)
            + (tex(x0, y1) * (1 - fx) + tex(x1, y1) * fx) * fy)


@jax.tree_util.register_pytree_node_class
class NativeTexturePoolGPU:
    """Flattened NATIVE-size per-record mip chains (cfg.native_texture_pool).

    Unlike TexturePoolGPU's uniform pyramid, each record keeps its own
    dimensions and level count (the reference's per-texture storage,
    src/texture.rs:98-252) — parity holds for assets of any size with no
    resampling loss. Addressing goes through two small device tables
    (per-record base info + per-(record, level) regions), costing two
    extra 16-byte gathers per tap; this is the quality path, the fixed
    pyramid remains the speed path.
    """

    def __init__(self, texels, base_tab, level_tab, max_levels, base_size,
                 windowed=False, base_channels=9, u8=True):
        self.texels = texels        # (N, C | 4C)
        self.base_tab = base_tab    # (R, 4) i32: w0, h0, n_levels, 0
        self.level_tab = level_tab  # (R * Lmax, 4) i32: offset, w, h, 0
        self.max_levels = int(max_levels)
        self.base_size = int(base_size)   # max base dim (mip_level_from_uv)
        self.windowed = bool(windowed)
        self.base_channels = int(base_channels)
        self.u8 = bool(u8)

    @property
    def level_sizes(self):
        # mip_level_from_uv compatibility: level 0 at the largest base;
        # the sampler rebiasess per record (log2(w_rec / base_size))
        return (self.base_size,) * self.max_levels

    def _decode(self, rows):
        if self.u8:
            return rows.astype(jnp.float32) * (1.0 / 255.0)
        return rows

    def tree_flatten(self):
        return ((self.texels, self.base_tab, self.level_tab),
                (self.max_levels, self.base_size, self.windowed,
                 self.base_channels, self.u8))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def pack_native_pool(chains: list, windowed: bool = False,
                     wrap: bool = True, u8: bool = True
                     ) -> NativeTexturePoolGPU:
    """chains: [record -> [(h, w, C) f32 per level]] (native sizes)."""
    R = len(chains)
    Lmax = max(len(c) for c in chains) if chains else 1
    base_size = max(max(c[0].shape[:2]) for c in chains) if chains else 1
    C = chains[0][0].shape[-1] if chains else 9
    parts, base_rows, level_rows = [], [], []
    off = 0
    for c in chains:
        h0, w0 = c[0].shape[:2]
        base_rows.append([w0, h0, len(c), 0])
        for li in range(Lmax):
            m = c[min(li, len(c) - 1)]      # clamp: replicate last level
            if li < len(c):
                h, w = m.shape[:2]
                rows = window_rows(m, wrap) if windowed else m
                parts.append(rows.reshape(h * w, -1))
                level_rows.append([off, w, h, 0])
                off += h * w
            else:
                level_rows.append(level_rows[-1])  # clamped region
    flat = (np.concatenate(parts, axis=0) if parts
            else np.zeros((1, C * (4 if windowed else 1)), np.float32))
    if u8:
        flat = np.clip(flat * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return NativeTexturePoolGPU(
        jnp.asarray(flat), jnp.asarray(np.array(base_rows, np.int32)),
        jnp.asarray(np.array(level_rows, np.int32)), Lmax, base_size,
        windowed=windowed, base_channels=C, u8=u8)


def _sample_native_level(pool: NativeTexturePoolGPU, rec: jax.Array,
                         uv: jax.Array, level_i: jax.Array, wrap: bool,
                         stochastic: bool = False) -> jax.Array:
    """One bilinear (or stochastic 1-texel) tap at a per-pixel level."""
    tab = jnp.take(pool.level_tab,
                   rec * pool.max_levels + level_i, axis=0)  # (..., 4)
    off, w, h = tab[..., 0], tab[..., 1], tab[..., 2]
    wf, hf = w.astype(F32), h.astype(F32)
    u = uv[..., 0] * wf - 0.5
    v = uv[..., 1] * hf - 0.5
    if wrap:
        u = jnp.mod(u, wf)
        v = jnp.mod(v, hf)
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]
    x0i = x0.astype(I32)
    y0i = y0.astype(I32)

    if stochastic:
        tu = _bayer_threshold(u.shape[-2:], phase=1)
        tv = _bayer_threshold(v.shape[-2:], phase=2)
        xi = x0i + ((u - x0) > tu).astype(I32)
        yi = y0i + ((v - y0) > tv).astype(I32)
        xi = jnp.mod(xi, w) if wrap else jnp.clip(xi, 0, w - 1)
        yi = jnp.mod(yi, h) if wrap else jnp.clip(yi, 0, h - 1)
        row = pool._decode(jnp.take(pool.texels, off + yi * w + xi, axis=0))
        return row[..., :pool.base_channels]

    if pool.windowed:
        x0c = jnp.clip(x0i, 0, w - 1) if not wrap else jnp.mod(x0i, w)
        y0c = jnp.clip(y0i, 0, h - 1) if not wrap else jnp.mod(y0i, h)
        row = pool._decode(jnp.take(pool.texels, off + y0c * w + x0c, axis=0))
        C = pool.base_channels
        c00, c10 = row[..., 0:C], row[..., C:2 * C]
        c01, c11 = row[..., 2 * C:3 * C], row[..., 3 * C:4 * C]
        return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
                + (c01 * (1 - fx) + c11 * fx) * fy)

    def texel(xi, yi):
        xi = jnp.mod(xi, w) if wrap else jnp.clip(xi, 0, w - 1)
        yi = jnp.mod(yi, h) if wrap else jnp.clip(yi, 0, h - 1)
        return pool._decode(jnp.take(pool.texels, off + yi * w + xi, axis=0))

    return ((texel(x0i, y0i) * (1 - fx) + texel(x0i + 1, y0i) * fx)
            * (1 - fy)
            + (texel(x0i, y0i + 1) * (1 - fx)
               + texel(x0i + 1, y0i + 1) * fx) * fy)


def sample_native_pool_mip(pool: NativeTexturePoolGPU, rec: jax.Array,
                           uv: jax.Array, level_f: jax.Array,
                           wrap: bool = True,
                           filter: str = "trilinear",
                           duv: jax.Array = None) -> jax.Array:
    """Mip-filtered native-pool sample.

    ``duv`` (..., 4) — uv_derivatives() components — gives EXACT per-record
    level selection: level = 0.5*log2(max_s((d_s u*w0)^2 + (d_s v*h0)^2))
    with the record's own (w0, h0) scaling each uv axis; a non-square
    texture gets the correct level even when the minor-axis derivative
    dominates. Without ``duv``, ``level_f`` (computed against
    pool.base_size) is rebiased by log2(w0/base) — exact only for square
    textures (kept as the fallback for callers without derivatives)."""
    base = jnp.take(pool.base_tab, rec, axis=0)              # (..., 4)
    w0 = base[..., 0].astype(F32)
    h0 = base[..., 1].astype(F32)
    nlev = base[..., 2].astype(F32)
    if duv is not None:
        tx2 = (duv[..., 0] * w0) ** 2 + (duv[..., 1] * h0) ** 2
        ty2 = (duv[..., 2] * w0) ** 2 + (duv[..., 3] * h0) ** 2
        texel_d2 = jnp.maximum(tx2, ty2)   # max over the two screen axes
        lf = jnp.maximum(
            0.5 * jnp.log2(jnp.maximum(texel_d2, 1e-12)), 0.0)
        lf = jnp.clip(lf, 0.0, nlev - 1.0)
    else:
        bias = (jnp.log2(jnp.maximum(w0, 1.0))
                - jnp.log2(float(pool.base_size)))
        lf = jnp.clip(level_f + bias, 0.0, nlev - 1.0)
    if filter == "trilinear":
        lo = jnp.floor(lf).astype(I32)
        hi = jnp.minimum(lo + 1, (nlev - 1.0).astype(I32))
        frac = (lf - lo.astype(F32))[..., None]
        out_lo = _sample_native_level(pool, rec, uv, lo, wrap)
        out_hi = _sample_native_level(pool, rec, uv, hi, wrap)
        return out_lo * (1.0 - frac) + out_hi * frac
    lo = jnp.floor(lf).astype(I32)
    frac = lf - lo.astype(F32)
    thresh = _bayer_threshold((lf.shape[-2], lf.shape[-1]))
    level = jnp.minimum(lo + (frac > thresh).astype(I32),
                        (nlev - 1.0).astype(I32))
    if filter == "stochastic":
        return _sample_native_level(pool, rec, uv, level, wrap,
                                    stochastic=True)
    if filter == "bilinear":
        level = jnp.clip(jnp.round(lf), 0.0, nlev - 1.0).astype(I32)
    return _sample_native_level(pool, rec, uv, level, wrap)


def encode_rgbe_windowed(cube: jax.Array) -> jax.Array:
    """(6, S, S, 3) f32 HDR cube -> (6, S, S, 16) u8 windowed RGBE.

    Each row packs the texel and its +x/+y/+x+y neighbors (clamp at face
    edges) as shared-exponent RGBE (u8 mantissas, exponent biased 128), so
    a full bilinear sky tap is ONE 16-byte gather instead of four 12-byte
    f32 gathers — TPU gathers pay per issued row (a plain windowed f32
    cube measured +1.3 ms: 48B rows lose; 16B u8 rows win). 8-bit
    mantissas are sub-LSB after tone mapping.
    """
    m = jnp.max(cube, axis=-1)
    e = jnp.where(m > 1e-30,
                  jnp.ceil(jnp.log2(jnp.maximum(m, 1e-30))), -127.0)
    scale = jnp.exp2(-e)[..., None]
    mant = jnp.clip(jnp.round(cube * scale * 255.0), 0, 255)
    rgbe = jnp.concatenate(
        [mant, jnp.clip(e[..., None] + 128.0, 0, 255)], axis=-1)  # (6,S,S,4)
    right = jnp.concatenate([rgbe[:, :, 1:], rgbe[:, :, -1:]], axis=2)
    down = jnp.concatenate([rgbe[:, 1:, :], rgbe[:, -1:, :]], axis=1)
    diag = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    return jnp.concatenate([rgbe, right, down, diag],
                           axis=-1).astype(jnp.uint8)


def _decode_rgbe(q: jax.Array) -> jax.Array:
    """(..., 4) u8 RGBE -> (..., 3) f32 linear."""
    f = q.astype(F32)
    return f[..., :3] * (jnp.exp2(f[..., 3] - 128.0) / 255.0)[..., None]


# u32-packed sky gather rows (tools/ab_frame.py toggle; see use site).
# MEASURED SLOWER r5 interleaved 1080p: +1.07 ms — the u8[N,16] gather's
# column-major result layout that looks pathological in traces is in fact
# what the downstream planar consumers want; forcing u32 rows + VPU byte
# unpack re-introduces the relayout on the consumer side. OFF.
_SKY_U32_ROWS = False


def _decode_rgbe_u32(q: jax.Array) -> jax.Array:
    """(...,) u32 little-endian-packed RGBE -> (..., 3) f32 linear
    (bit-identical to _decode_rgbe on the bitcast bytes)."""
    r = (q & 0xFF).astype(F32)
    g = ((q >> 8) & 0xFF).astype(F32)
    b = ((q >> 16) & 0xFF).astype(F32)
    e = (q >> 24).astype(F32)
    scale = (jnp.exp2(e - 128.0) / 255.0)[..., None]
    return jnp.stack([r, g, b], axis=-1) * scale


def sample_cubemap_rgbe_windowed(win: jax.Array, d: jax.Array) -> jax.Array:
    """Bilinear cubemap sample from a windowed RGBE cube — one gather.

    win: (6, S, S, 16) u8 from encode_rgbe_windowed; d: (..., 3)."""
    S = win.shape[1]
    face, u, v = cubemap_face_uv(d)
    fu = jnp.clip((u * 0.5 + 0.5) * S - 0.5, 0.0, S - 1.0)
    fv = jnp.clip((v * 0.5 + 0.5) * S - 0.5, 0.0, S - 1.0)
    x0 = jnp.floor(fu)
    y0 = jnp.floor(fv)
    fx = (fu - x0)[..., None]
    fy = (fv - y0)[..., None]
    x0 = x0.astype(I32)
    y0 = y0.astype(I32)
    idx = (face * S + y0) * S + x0
    if _SKY_U32_ROWS:
        # gather u32[N, 4] rows instead of u8[N, 16]: the u8 gather result
        # gets a column-major layout from XLA (each row's 16 bytes strided
        # across 16 separate streams — 1.7 ms attributed in the r5 1080p
        # trace); 4 u32 lanes unpacked by VPU shifts keep the row payload
        # contiguous. Bit-identical decode (little-endian byte order).
        flat32 = jax.lax.bitcast_convert_type(
            win.reshape(6 * S * S, 4, 4), jnp.uint32)        # (6SS, 4)
        row = jnp.take(flat32, idx, axis=0)                  # (..., 4)
        c00 = _decode_rgbe_u32(row[..., 0])
        c10 = _decode_rgbe_u32(row[..., 1])
        c01 = _decode_rgbe_u32(row[..., 2])
        c11 = _decode_rgbe_u32(row[..., 3])
    else:
        flat = win.reshape(6 * S * S, 16)
        row = jnp.take(flat, idx, axis=0)
        c00 = _decode_rgbe(row[..., 0:4])
        c10 = _decode_rgbe(row[..., 4:8])
        c01 = _decode_rgbe(row[..., 8:12])
        c11 = _decode_rgbe(row[..., 12:16])
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def face_texel_dirs(size: int) -> jax.Array:
    """(6, S, S, 3) unit direction of every cubemap texel center."""
    t = (jnp.arange(size, dtype=F32) + 0.5) / size * 2.0 - 1.0
    v, u = jnp.meshgrid(t, t, indexing="ij")
    dirs = []
    for f in range(6):
        d = cubemap_dir(f, u, v)
        dirs.append(d / jnp.linalg.norm(d, axis=-1, keepdims=True))
    return jnp.stack(dirs, axis=0)
