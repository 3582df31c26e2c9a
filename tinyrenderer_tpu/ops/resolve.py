"""Visibility-buffer resolve: winning triangle -> interpolated attributes ->
GBuffer planes.

TPU-native replacement for the GBuffer fragment shaders
(src/shaders/gbuffer_geometry.wgsl:87-136 and
gbuffer_geometry_flat_parameter.wgsl): instead of interpolating varyings in
hardware, the resolve pass re-evaluates the winning triangle's barycentric
planes at each pixel, gathers the three vertex attribute rows, and
interpolates perspective-correctly (lambda_i * w_i^-1 / sum).

GBuffer layout (matches the 4 MRTs + depth of
src/gbuffer_geometry_renderer.rs:26 plus the pick id of
src/object_picker.rs, emitted here as a 5th by-construction-exact channel):
world position, shaded normal, albedo, (roughness, metalness, ao),
object_id, material params.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import sampling

F32 = jnp.float32
I32 = jnp.int32


class GBuffer(NamedTuple):
    position: jax.Array    # (H, W, 3) world position
    normal: jax.Array      # (H, W, 3) normal-mapped shading normal
    albedo: jax.Array      # (H, W, 3)
    rough_metal_ao: jax.Array  # (H, W, 3)
    depth: jax.Array       # (H, W) reverse-Z
    object_id: jax.Array   # (H, W) i32, 0 = none (src/world.rs:47)
    mask: jax.Array        # (H, W) bool: geometry present


class VertexAttrs(NamedTuple):
    """Per-vertex interpolation sources (world-space)."""

    world: jax.Array       # (V, 3)
    uv: jax.Array          # (V, 2)
    normal: jax.Array      # (V, 3)
    tangent: jax.Array     # (V, 3)
    bitangent: jax.Array   # (V, 3)

    def rows(self) -> jax.Array:
        return jnp.concatenate([self.world, self.uv, self.normal,
                                self.tangent, self.bitangent], axis=1)


def interpolate(tri_id: jax.Array, setup_rows: jax.Array, tri_vidx: jax.Array,
                attr_rows: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Perspective-correct attribute interpolation.

    tri_id: (H, W) int32 (-1 none); setup_rows: (T, 16); tri_vidx: (T, 3);
    attr_rows: (V, C). Returns ((H, W, C) attrs, (H, W) valid mask).
    """
    H, W = tri_id.shape
    valid = tri_id >= 0
    tid = jnp.maximum(tri_id, 0)
    rows = jnp.take(setup_rows, tid, axis=0)     # (H, W, 16)

    px = (jnp.arange(W, dtype=F32) + 0.5)[None, :]
    py = (jnp.arange(H, dtype=F32) + 0.5)[:, None]
    l0 = rows[..., 0] * px + rows[..., 1] * py + rows[..., 2]
    l1 = rows[..., 3] * px + rows[..., 4] * py + rows[..., 5]
    l2 = rows[..., 6] * px + rows[..., 7] * py + rows[..., 8]
    lam = jnp.stack([l0, l1, l2], axis=-1)       # (H, W, 3)
    iw = rows[..., 13:16]
    lam_p = lam * iw
    denom = jnp.sum(lam_p, axis=-1, keepdims=True)
    bary = lam_p / jnp.where(jnp.abs(denom) > 1e-20, denom, 1.0)

    vidx = jnp.take(tri_vidx, tid, axis=0)       # (H, W, 3)
    attrs = jnp.take(attr_rows, vidx, axis=0)    # (H, W, 3, C)
    out = jnp.einsum("hwk,hwkc->hwc", bary, attrs, preferred_element_type=F32)
    return out, valid


@jax.named_scope("gbuffer_resolve")
def resolve_gbuffer(tri_id: jax.Array, depth: jax.Array, setup_rows: jax.Array,
                    tri_vidx: jax.Array, tri_instance: jax.Array,
                    attrs: VertexAttrs,
                    inst_object_id: jax.Array, inst_material: jax.Array,
                    mat_tex_slots: jax.Array, mat_flat: jax.Array,
                    pool: sampling.TexturePoolGPU) -> GBuffer:
    """Full GBuffer resolve including material evaluation.

    REFERENCE IMPLEMENTATION — not on any frame path. This is the plain
    per-pixel-gather resolve the production paths (select_rows_onehot /
    select_eval_pallas / select_eval_stream) are differential-tested
    against; it stays because it is the readable spec of what they
    compute. Production avoids its per-pixel table gathers (~5 ms/frame
    at 1080p, CLAUDE.md gather-cost rules).

    mat_tex_slots: (M, 4) int32 [albedo, normal, roughness, metalness].
    mat_flat: (M, 6) f32 [albedo rgb, roughness, metalness, use_textures].
    """
    interp, valid = interpolate(tri_id, setup_rows, tri_vidx, attrs.rows())
    world = interp[..., 0:3]
    uv = interp[..., 3:5]
    n_geom = _safe_normalize(interp[..., 5:8])
    tangent = _safe_normalize(interp[..., 8:11])
    bitangent = _safe_normalize(interp[..., 11:14])

    tid = jnp.maximum(tri_id, 0)
    inst = jnp.take(tri_instance, tid)
    mat = jnp.take(inst_material, inst)              # (H, W)
    tex_slots = jnp.take(mat_tex_slots, mat, axis=0)  # (H, W, 4)
    flat = jnp.take(mat_flat, mat, axis=0)           # (H, W, 6)
    use_tex = flat[..., 5] > 0.5

    level = sampling.mip_level_from_uv(uv, pool.level_sizes[0])
    duv = (sampling.uv_derivatives(uv)
           if isinstance(pool, sampling.NativeTexturePoolGPU) else None)
    # textures: albedo, normal, roughness (R), metalness (R)
    albedo_t = sampling.sample_pool_mip(pool, tex_slots[..., 0], uv, level,
                                        duv=duv)[..., :3]
    normal_t = sampling.sample_pool_mip(pool, tex_slots[..., 1], uv, level,
                                        duv=duv)[..., :3]
    rough_t = sampling.sample_pool_mip(pool, tex_slots[..., 2], uv, level,
                                       duv=duv)[..., 0]
    metal_t = sampling.sample_pool_mip(pool, tex_slots[..., 3], uv, level,
                                       duv=duv)[..., 0]

    # TBN normal mapping (gbuffer_geometry.wgsl:118-125)
    nt = normal_t * 2.0 - 1.0
    n_mapped = _safe_normalize(
        nt[..., 0:1] * tangent + nt[..., 1:2] * bitangent + nt[..., 2:3] * n_geom)

    albedo = jnp.where(use_tex[..., None], albedo_t, flat[..., 0:3])
    normal = jnp.where(use_tex[..., None], n_mapped, n_geom)
    rough = jnp.where(use_tex, rough_t, flat[..., 3])
    metal = jnp.where(use_tex, metal_t, flat[..., 4])

    object_id = jnp.where(valid, jnp.take(inst_object_id, inst), 0)
    vm = valid[..., None]
    return GBuffer(
        position=jnp.where(vm, world, 0.0),
        normal=jnp.where(vm, normal, 0.0),
        albedo=jnp.where(vm, albedo, 0.0),
        rough_metal_ao=jnp.where(
            vm, jnp.stack([rough, metal, jnp.ones_like(rough)], axis=-1), 0.0),
        depth=depth,
        object_id=object_id,
        mask=valid,
    )


# ---------------------------------------------------------------------------
# One-hot tile resolve: TPU gathers cost ~5-10 ns *per element* regardless of
# table size, so per-pixel id-indexed gathers (setup rows, vertex attrs,
# materials) dominated the frame. Instead: fold every per-triangle quantity
# into ONE table row — attribute numerator planes (affine in screen space:
# P_c = sum_i a_ci * inv_w_i * E_i), the 1/w denominator plane, and flat
# per-triangle constants — then select each pixel's row with a per-tile
# one-hot matmul against the (K, D) binned table on the MXU. Zero per-pixel
# gathers; everything else is plane evaluation on the VPU.
# ---------------------------------------------------------------------------

# Table layout: [denominator plane (3: x, y, c) | attribute numerator
# planes as three COMPONENT BLOCKS A_x (14), A_y (14), A_c (14) | consts].
# The block form lets the table build and the plane evaluation run as
# (T/P, 14)-wide ops — the previous per-attribute (c, j) interleave
# needed a (T, 14, 3) tensor whose minor dims tile-pad to vector
# registers (measured ~3x bandwidth bloat on 131k-triangle pools).
_N_ATTR = 14          # world3 uv2 normal3 tangent3 bitangent3
_PLANES = 3 * (_N_ATTR + 1)   # + the 1/w denominator plane
_AX, _AY, _AC = 3, 3 + _N_ATTR, 3 + 2 * _N_ATTR   # block starts
CONST_FLAT = _PLANES          # mat_flat: 6
CONST_REC = _PLANES + 6       # composite material record index
CONST_OBJ = _PLANES + 7       # object id
ROW_D = _PLANES + 8


def build_gbuffer_table(setup, tri_vidx: jax.Array, attrs: "VertexAttrs",
                        tri_instance: jax.Array, inst_object_id: jax.Array,
                        inst_material: jax.Array, mat_record: jax.Array,
                        mat_flat: jax.Array, slim: bool = False) -> jax.Array:
    """(T, ROW_D) per-triangle resolve table (triangle-level gathers only).

    Corner attributes are gathered per corner ((T, 14) rows) and the
    plane accumulation runs block-wise: A_j = sum_k (attrs_k / w_k) *
    E_kj for j in {x, y, c} — all (T, 14) full-width ops, no (T, 3, C)
    intermediates.

    ``slim`` builds the flat-only layout (statically untextured scenes):
    attrs [world3 normal3], consts [flat6 oid] — 28 channels instead of
    53, halving the per-(tile, pair) select/eval MXU work and table DMA;
    uv/tangent/bitangent/record are never read when no deferred triangle
    references a textured material (XLA also dead-code-eliminates their
    vertex-stage math through the unused columns)."""
    attr_rows = attrs.rows()                                 # (V, 14)
    if slim:
        attr_rows = jnp.concatenate(
            [attr_rows[:, 0:3], attr_rows[:, 5:8]], axis=1)  # world, normal
    # Channel-first accumulation: (T, C) intermediates lane-pad C -> 128
    # (64 MB each at T=131k — the round-4 high-poly trace's top fusion
    # group), so the plane accumulation runs on (14, T) full-lane tensors
    # and ONE final transpose pays the (T, ROW_D) table's physical write.
    blocks = [None, None, None]                              # A_x, A_y, A_c
    pw = [None, None, None]
    for k in range(3):
        ak = jnp.take(attr_rows, tri_vidx[:, k], axis=0).T   # (14, T)
        iwk = setup.inv_w[:, k]
        awk = ak * iwk[None, :]
        for j in range(3):                                   # e_kj columns
            e = setup.rows[:, 3 * k + j]
            blocks[j] = awk * e[None, :] if blocks[j] is None \
                else blocks[j] + awk * e[None, :]
            pw[j] = iwk * e if pw[j] is None else pw[j] + iwk * e
    mat = jnp.take(inst_material, tri_instance)
    consts = [
        jnp.take(mat_flat, mat, axis=0).T,                   # (6, T)
        jnp.take(mat_record, mat).astype(F32)[None, :],      # (1, T)
        jnp.take(inst_object_id, tri_instance).astype(F32)[None, :],
    ]
    if slim:
        consts = [consts[0], consts[2]]                      # no record
    rows_cf = jnp.concatenate([jnp.stack(pw, axis=0)] + blocks + consts,
                              axis=0)                        # (ROW_D, T)
    return jnp.where(setup.valid[None, :], rows_cf, 0.0).T


def select_rows_onehot(tri_id: jax.Array, bin_ids: jax.Array,
                       table: jax.Array, tile_h: int, tile_w: int
                       ) -> jax.Array:
    """Per-pixel row selection: (H, W) winner ids + (ty, tx, K) bin lists +
    (T, D) table -> (H, W, D), via one MXU einsum per frame."""
    H, W = tri_id.shape
    ty, tx, K = bin_ids.shape
    T = table.shape[0]
    tiles = tri_id.reshape(ty, tile_h, tx, tile_w).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(ty, tx, tile_h * tile_w)           # (ty, tx, P)
    onehot = (tiles[..., None] == bin_ids[:, :, None, :]).astype(jnp.bfloat16)
    rows_tile = jnp.take(table, jnp.clip(bin_ids, 0, T - 1), axis=0)
    rows_tile = jnp.where((bin_ids >= 0)[..., None], rows_tile, 0.0)
    # onehot is exact in bf16 (0/1); rows stay f32 for plane precision
    sel = jnp.einsum("typk,tykd->typd", onehot, rows_tile,
                     preferred_element_type=F32)             # MXU
    sel = sel.reshape(ty, tx, tile_h, tile_w, -1).transpose(0, 2, 1, 3, 4)
    return sel.reshape(H, W, -1)


class ResolvedAttrs(NamedTuple):
    """Per-pixel interpolated attributes + per-triangle constants."""

    world: jax.Array       # (H, W, 3)
    uv: jax.Array          # (H, W, 2)
    normal: jax.Array      # (H, W, 3) geometric (normalized)
    tangent: jax.Array     # (H, W, 3)
    bitangent: jax.Array   # (H, W, 3)
    flat: jax.Array        # (H, W, 6) material flat params
    record: jax.Array      # (H, W) i32 composite material record
    object_id: jax.Array   # (H, W) i32 (0 = none)
    valid: jax.Array       # (H, W) bool


def resolve_attrs_from_sel_at(tri_id: jax.Array, sel: jax.Array,
                              px: jax.Array, py: jax.Array) -> ResolvedAttrs:
    """Evaluate selected table rows at explicit pixel centers.

    tri_id: (...); sel: (..., D); px/py: broadcastable to (..., 1) pixel
    centers — the standard full-screen grid, or per-slot global coordinates
    for tile-compacted domains."""
    denom = (sel[..., 0:1] * px + sel[..., 1:2] * py + sel[..., 2:3])
    denom = jnp.where(jnp.abs(denom) > 1e-20, denom, 1.0)
    a = (sel[..., _AX:_AY] * px + sel[..., _AY:_AC] * py
         + sel[..., _AC:_PLANES]) / denom                    # (..., 14)

    valid = tri_id >= 0
    return ResolvedAttrs(
        world=a[..., 0:3],
        uv=a[..., 3:5],
        normal=_safe_normalize(a[..., 5:8]),
        tangent=_safe_normalize(a[..., 8:11]),
        bitangent=_safe_normalize(a[..., 11:14]),
        flat=sel[..., CONST_FLAT:CONST_FLAT + 6],
        record=jnp.round(sel[..., CONST_REC]).astype(I32),
        object_id=jnp.where(valid, jnp.round(sel[..., CONST_OBJ]).astype(I32), 0),
        valid=valid,
    )


def resolve_attrs_from_sel(tri_id: jax.Array, sel: jax.Array) -> ResolvedAttrs:
    """Evaluate the selected per-pixel table rows -> interpolated attributes
    (the shared epilogue of the two-pass and fused-kernel resolve paths)."""
    H, W = tri_id.shape
    px = (jnp.arange(W, dtype=F32) + 0.5)[None, :, None]
    py = (jnp.arange(H, dtype=F32) + 0.5)[:, None, None]
    return resolve_attrs_from_sel_at(tri_id, sel, px, py)


def resolve_attrs_tiled(tri_id: jax.Array, bin_ids: jax.Array,
                        table: jax.Array, tile_h: int, tile_w: int
                        ) -> ResolvedAttrs:
    """One-hot select + plane evaluation entirely in the tiled domain.

    The select einsum naturally produces (ty, tx, P, D); evaluating the
    planes there and untiling only the ~22 result channels (attrs + flat
    + record + oid) avoids transposing the full D=53-channel sel tensor
    through HBM (the untile of sel cost ~5 ms of layout reshapes/copies
    in the 1080p trace). Bit-identical to select_rows_onehot +
    resolve_attrs_from_sel (same elementwise math per pixel)."""
    H, W = tri_id.shape
    ty, tx, K = bin_ids.shape
    T = table.shape[0]
    tiles = tri_id.reshape(ty, tile_h, tx, tile_w).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(ty, tx, tile_h * tile_w)           # (ty, tx, P)
    onehot = (tiles[..., None] == bin_ids[:, :, None, :]).astype(jnp.bfloat16)
    rows_tile = jnp.take(table, jnp.clip(bin_ids, 0, T - 1), axis=0)
    rows_tile = jnp.where((bin_ids >= 0)[..., None], rows_tile, 0.0)
    sel = jnp.einsum("typk,tykd->typd", onehot, rows_tile,
                     preferred_element_type=F32)             # (ty, tx, P, D)

    # per-slot global pixel centers
    p = jnp.arange(tile_h * tile_w, dtype=F32)
    lx = jnp.remainder(p, float(tile_w))
    ly = jnp.floor_divide(p, float(tile_w))
    px = ((jnp.arange(tx, dtype=F32) * tile_w)[None, :, None]
          + lx + 0.5)[..., None]
    py = ((jnp.arange(ty, dtype=F32) * tile_h)[:, None, None]
          + ly + 0.5)[..., None]

    denom = sel[..., 0:1] * px + sel[..., 1:2] * py + sel[..., 2:3]
    denom = jnp.where(jnp.abs(denom) > 1e-20, denom, 1.0)
    a = (sel[..., _AX:_AY] * px + sel[..., _AY:_AC] * py
         + sel[..., _AC:_PLANES]) / denom                    # (.., P, 14)
    out_t = jnp.concatenate([a, sel[..., _PLANES:ROW_D]], axis=-1)  # 22ch

    # single untile of the evaluated channels
    out = out_t.reshape(ty, tx, tile_h, tile_w, -1).transpose(0, 2, 1, 3, 4)
    out = out.reshape(H, W, -1)
    valid = tri_id >= 0
    return ResolvedAttrs(
        world=out[..., 0:3],
        uv=out[..., 3:5],
        normal=_safe_normalize(out[..., 5:8]),
        tangent=_safe_normalize(out[..., 8:11]),
        bitangent=_safe_normalize(out[..., 11:14]),
        flat=out[..., 14:20],
        record=jnp.round(out[..., 20]).astype(I32),
        object_id=jnp.where(valid, jnp.round(out[..., 21]).astype(I32), 0),
        valid=valid,
    )


def _write_eval(acc, i, j, out_refs, tile_h: int, tile_w: int,
                n_attr: int = _N_ATTR) -> None:
    """Shared finish step of the select+eval kernels: evaluate the
    numerator/denominator planes of the accumulated (Dp, P) selection at
    this tile's pixel centers and write the result channels.

    Outputs are CHANNEL-FIRST image blocks (C, tile_h, tile_w) of a
    (C, H, W) array — the (C, P) accumulator reshapes into them for
    free, and (C, H, W) keeps W in the 128 vector lanes so downstream
    slicing/moveaxis is one healthy relayout instead of the multi-copy
    untile chain the old (ty, tx, C, P) output needed (~1.8 ms at
    1080p). One out ref: all channels f32 (rows [attrs 14 | flat 6 |
    record | oid]). Two out refs (cfg.bf16_attrs): the f32 ref carries
    [world3 uv2 record oid] and the bf16 ref [normal3 tangent3
    bitangent3 flat6] — the channels that tolerate 8 mantissa bits.

    ``n_attr`` = 6 selects the SLIM flat-only layout (build_gbuffer_table
    slim=True): attrs [world3 normal3], consts [flat6 oid] — one ref
    [world3 normal3 flat6 oid] (13), split refs [world3 oid] (4) +
    [normal3 flat6] (9)."""
    P = tile_h * tile_w
    ax, ay = 3, 3 + n_attr
    ac = 3 + 2 * n_attr
    planes = 3 * (n_attr + 1)
    n_const = 8 if n_attr == _N_ATTR else 7
    ox = (j * tile_w).astype(F32) + 0.5
    oy = (i * tile_h).astype(F32) + 0.5
    xs = jax.lax.broadcasted_iota(I32, (1, P), 1).astype(F32)
    px = jnp.remainder(xs, float(tile_w)) + ox               # (1, P)
    py = jnp.floor_divide(xs, float(tile_w)) + oy

    denom = acc[0:1] * px + acc[1:2] * py + acc[2:3]         # (1, P)
    denom = jnp.where(jnp.abs(denom) > 1e-20, denom, 1.0)
    attrs = (acc[ax:ay] * px + acc[ay:ac] * py
             + acc[ac:planes]) / denom                       # (n_attr, P)
    consts = acc[planes:planes + n_const]
    n_vec = 5 if n_attr == _N_ATTR else 3     # f32-precision attr prefix
    if len(out_refs) == 2:
        outf_ref, outh_ref = out_refs
        outf_ref[...] = jnp.concatenate(
            [attrs[0:n_vec], consts[6:n_const]],
            axis=0).reshape(n_vec + n_const - 6, tile_h, tile_w)
        outh_ref[...] = jnp.concatenate(
            [attrs[n_vec:n_attr], consts[0:6]],
            axis=0).astype(outh_ref.dtype).reshape(
                n_attr - n_vec + 6, tile_h, tile_w)
    else:
        (out_ref,) = out_refs
        out_ref[...] = jnp.concatenate(
            [attrs, consts], axis=0).reshape(n_attr + n_const,
                                             tile_h, tile_w)


def _select_eval_kernel(counts_ref, tid_ref, ids_ref, rows_ref, *refs,
                        tile_h: int, tile_w: int, chunk: int,
                        kblock: int, nk: int, n_attr: int = _N_ATTR):
    """Per-tile one-hot select + plane evaluation, onehot kept in VMEM.

    The jnp select materializes the (tiles, P, K) one-hot tensor in HBM
    (~1 GB/frame at 1080p, K=256) because XLA does not fuse elementwise
    producers into dot operands. Here each tile builds its one-hot chunk
    in VMEM, accumulates sel = table^T @ onehot on the MXU, evaluates the
    numerator/denominator planes in-register, and writes only the 22
    result channels.

    The bin dimension K is streamed through the innermost grid dimension
    in ``kblock`` slices with the (Dp, P) accumulator in VMEM scratch
    (persistent across grid steps), so VMEM use is bounded by kblock —
    grown bin capacities (8192+ for high-poly scenes) would otherwise
    blow the 16 MB scoped-vmem limit with whole-K operand blocks.
    """
    *out_refs, acc_ref = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    count = counts_ref[i, j]
    P = tile_h * tile_w
    Dp = rows_ref.shape[-1]          # padded table width

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    tid = tid_ref[0, 0].reshape(1, P).astype(F32)
    # valid ids are a contiguous prefix: rows of this k-slice that are
    # in [0, count - k*kblock) still need the matmul
    local = jnp.clip(count - k * kblock, 0, kblock)
    nchunks = pl.cdiv(local, chunk)

    def body(c, acc):
        idf = ids_ref[0, 0, pl.ds(c * chunk, chunk), :]      # (chunk, 1) f32
        t = rows_ref[0, 0, pl.ds(c * chunk, chunk), :]       # (chunk, Dp)
        onehot = ((idf == tid) & (idf >= 0.0)).astype(F32)   # (chunk, P)
        return acc + jax.lax.dot_general(
            t, onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=F32)                      # (Dp, P)

    acc_ref[...] = jax.lax.fori_loop(0, nchunks, body, acc_ref[...])

    @pl.when(k == nk - 1)
    def _finish():
        _write_eval(acc_ref[...], i, j, out_refs, tile_h, tile_w,
                    n_attr=n_attr)


def _split_out_shapes(H: int, W: int, tile_h: int, tile_w: int,
                      hdtype=jnp.bfloat16, slim: bool = False):
    """(out_shape, out_specs) for the split-output layout: channel-first
    (7, H, W) f32 [world3 uv2 record oid] + (15, H, W) ``hdtype``
    [normal3 tangent3 bitangent3 flat6] (bf16 under cfg.bf16_attrs, f32
    for the fused-shading path at full precision). ``slim`` (flat-only):
    (4, H, W) f32 [world3 oid] + (9, H, W) [normal3 flat6]."""
    cf, ch = (4, 9) if slim else (7, 15)

    def spec(c):
        return pl.BlockSpec((c, tile_h, tile_w),
                            lambda *g: (0, g[0], g[1]),
                            memory_space=pltpu.VMEM)
    shapes = (jax.ShapeDtypeStruct((cf, H, W), F32),
              jax.ShapeDtypeStruct((ch, H, W), hdtype))
    return shapes, (spec(cf), spec(ch))


def _to_hwc(out_cfirst: jax.Array) -> jax.Array:
    """(C, H, W) kernel output -> (H, W, C) for the downstream per-pixel
    math (one relayout; W stays in the vector lanes on both sides)."""
    return jnp.moveaxis(out_cfirst, 0, -1)


def select_eval_pallas(tri_id: jax.Array, bin_ids: jax.Array,
                       table: jax.Array, tile_h: int, tile_w: int,
                       chunk: int = 128,
                       counts: jax.Array | None = None,
                       bf16: bool = False, raw: bool = False,
                       slim: bool = False):
    """(H, W) winner ids + (ty, tx, K) bins + (T, ROW_D) table ->
    (H, W, 22) evaluated channels [attrs 14 | flat 6 | record | oid],
    numerically identical to resolve_attrs_tiled's pre-normalize output
    (one-hot selection copies rows exactly at any matmul precision).
    With ``bf16`` returns ((H, W, 7) f32 [world3 uv2 record oid],
    (H, W, 9+6) bf16 [normal/tangent/bitangent 9 | flat 6]).
    With ``raw`` the split outputs stay CHANNEL-FIRST ((7, H, W) f32,
    (15, H, W) bf16|f32) — the fused shading kernel's input layout,
    skipping the (H, W, 15) relayout entirely."""
    H, W = tri_id.shape
    ty, tx, K = bin_ids.shape
    T, D = table.shape
    pad = (-D) % 8
    table_p = jnp.pad(table, ((0, 0), (0, pad))) if pad else table
    Dp = table_p.shape[1]
    rows_tile = jnp.take(table_p, jnp.clip(bin_ids, 0, T - 1), axis=0)
    rows_tile = jnp.where((bin_ids >= 0)[..., None], rows_tile, 0.0)
    idsf = bin_ids.astype(F32)[..., None]                    # (ty, tx, K, 1)
    tid_tiles = tri_id.reshape(ty, tile_h, tx, tile_w).transpose(0, 2, 1, 3)

    P = tile_h * tile_w
    C_OUT = 13 if slim else 22
    if counts is None:  # valid ids are a contiguous prefix of each bin
        counts = jnp.sum((bin_ids >= 0).astype(I32), axis=2)
    # stream K through the innermost grid dim so VMEM stays bounded when
    # bin capacity grows (largest power-of-two divisor of K, <= 2048)
    kblock = K
    while kblock > 2048 and kblock % 2 == 0:
        kblock //= 2
    nk = K // kblock
    kernel = functools.partial(_select_eval_kernel, tile_h=tile_h,
                               tile_w=tile_w, chunk=min(chunk, kblock),
                               kblock=kblock, nk=nk,
                               n_attr=6 if slim else _N_ATTR)
    if bf16 or raw:
        hdtype = jnp.bfloat16 if bf16 else F32
        out_shape, out_specs = _split_out_shapes(H, W, tile_h, tile_w,
                                                 hdtype, slim=slim)
        cf, ch = (4, 9) if slim else (7, 15)
        out_bytes = ty * tx * P * (cf * 4 + ch * (2 if bf16 else 4))
    else:
        out_shape = jax.ShapeDtypeStruct((C_OUT, H, W), F32)
        out_specs = pl.BlockSpec((C_OUT, tile_h, tile_w),
                                 lambda i, j, k: (0, i, j),
                                 memory_space=pltpu.VMEM)
        out_bytes = ty * tx * C_OUT * P * 4
    interpret = jax.default_backend() != "tpu"
    out_tiles = pl.pallas_call(
        kernel,
        grid=(ty, tx, nk),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tile_h, tile_w),
                         lambda i, j, k: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kblock, 1), lambda i, j, k: (i, j, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kblock, Dp), lambda i, j, k: (i, j, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((Dp, P), F32)],
        cost_estimate=pl.CostEstimate(
            flops=int(K * P * (2 * Dp + 8)) * ty * tx,
            bytes_accessed=rows_tile.size * 4 + tri_id.size * 4 + out_bytes,
            transcendentals=0),
    )(counts, tid_tiles, idsf, rows_tile)

    if raw:
        return out_tiles
    if bf16:
        outf, outh = out_tiles
        return _to_hwc(outf), _to_hwc(outh)
    return _to_hwc(out_tiles)


def _attrs_from_split(tri_id: jax.Array, outf: jax.Array,
                      outh: jax.Array,
                      slim: bool = False) -> ResolvedAttrs:
    """Assemble ResolvedAttrs from the bf16_attrs split kernel outputs.

    Slim (flat-only) inputs carry no uv/tangent/bitangent/record; the
    fields are filled with zeros / the geometric normal — nothing
    downstream reads them when cfg.any_textured is False."""
    valid = tri_id >= 0
    h = outh.astype(F32)
    if slim:
        n = _safe_normalize(h[..., 0:3])
        return ResolvedAttrs(
            world=outf[..., 0:3],
            uv=jnp.zeros(tri_id.shape + (2,), F32),
            normal=n, tangent=n, bitangent=n,
            flat=h[..., 3:9],
            record=jnp.zeros(tri_id.shape, I32),
            object_id=jnp.where(valid,
                                jnp.round(outf[..., 3]).astype(I32), 0),
            valid=valid,
        )
    return ResolvedAttrs(
        world=outf[..., 0:3],
        uv=outf[..., 3:5],
        normal=_safe_normalize(h[..., 0:3]),
        tangent=_safe_normalize(h[..., 3:6]),
        bitangent=_safe_normalize(h[..., 6:9]),
        flat=h[..., 9:15],
        record=jnp.round(outf[..., 5]).astype(I32),
        object_id=jnp.where(valid, jnp.round(outf[..., 6]).astype(I32), 0),
        valid=valid,
    )


def _attrs_from_single(tri_id: jax.Array, out: jax.Array,
                       slim: bool = False) -> ResolvedAttrs:
    """Assemble ResolvedAttrs from the single-ref (all-f32) kernel output
    ([attrs | consts] channels; see _write_eval)."""
    valid = tri_id >= 0
    if slim:
        n = _safe_normalize(out[..., 3:6])
        return ResolvedAttrs(
            world=out[..., 0:3],
            uv=jnp.zeros(tri_id.shape + (2,), F32),
            normal=n, tangent=n, bitangent=n,
            flat=out[..., 6:12],
            record=jnp.zeros(tri_id.shape, I32),
            object_id=jnp.where(valid,
                                jnp.round(out[..., 12]).astype(I32), 0),
            valid=valid,
        )
    return ResolvedAttrs(
        world=out[..., 0:3],
        uv=out[..., 3:5],
        normal=_safe_normalize(out[..., 5:8]),
        tangent=_safe_normalize(out[..., 8:11]),
        bitangent=_safe_normalize(out[..., 11:14]),
        flat=out[..., 14:20],
        record=jnp.round(out[..., 20]).astype(I32),
        object_id=jnp.where(valid, jnp.round(out[..., 21]).astype(I32), 0),
        valid=valid,
    )


def resolve_attrs_pallas(tri_id: jax.Array, bin_ids: jax.Array,
                         table: jax.Array, tile_h: int, tile_w: int,
                         counts: jax.Array | None = None,
                         bf16: bool = False,
                         slim: bool = False) -> ResolvedAttrs:
    """ResolvedAttrs via the VMEM select+eval kernel (TPU fast path;
    bit-compatible with resolve_attrs_tiled when not ``bf16``)."""
    out = select_eval_pallas(tri_id, bin_ids, table, tile_h, tile_w,
                             counts=counts, bf16=bf16, slim=slim)
    if bf16:
        return _attrs_from_split(tri_id, *out, slim=slim)
    return _attrs_from_single(tri_id, out, slim=slim)


def _select_eval_stream_kernel(starts_ref, tid_ref, ids_ref, rows_ref,
                               *refs, tile_h: int, tile_w: int,
                               chunk: int, kb: int, nb: int, nblocks: int,
                               tiles_x: int, n_attr: int = _N_ATTR):
    """CSR-stream variant of _select_eval_kernel: the tile's bin is the
    stream segment [starts[t], starts[t+1]) walked in ``kb`` blocks by
    grid dim 2 (raster.StreamBins). Rows outside the segment — neighbor
    tiles sharing a block — are masked out of the one-hot, so cost and
    DMA track actual pair counts, not tiles * capacity."""
    from . import raster

    *out_refs, acc_ref = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    b = pl.program_id(2)
    t = i * tiles_x + j
    start = starts_ref[t]
    end = starts_ref[t + 1]
    blk = raster._stream_block(start, end, b, kb, nblocks)
    base = blk * kb
    lo = jnp.clip(start - base, 0, kb)
    hi = jnp.clip(end - base, 0, kb)
    # padding steps (b past the segment's last block) clamp to a repeated
    # block index; unlike the raster's idempotent depth race, the select
    # ACCUMULATES — each block must contribute exactly once
    sblk = start // kb
    eblk = jnp.maximum((end - 1) // kb, sblk)
    fresh = (sblk + b) <= jnp.minimum(eblk, nblocks - 1)
    hi = jnp.where(fresh, hi, lo)

    P = tile_h * tile_w
    Dp = rows_ref.shape[-1]

    @pl.when(b == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    tid = tid_ref[0, 0].reshape(1, P).astype(F32)

    def body(c, acc):
        idf = ids_ref[pl.ds(c * chunk, chunk), :]            # (chunk, 1) f32
        trow = rows_ref[pl.ds(c * chunk, chunk), :]          # (chunk, Dp)
        rowpos = c * chunk + jax.lax.broadcasted_iota(I32, (chunk, 1), 0)
        seg = (rowpos >= lo) & (rowpos < hi)
        onehot = ((idf == tid) & (idf >= 0.0) & seg).astype(F32)  # (chunk, P)
        return acc + jax.lax.dot_general(
            trow, onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=F32)                      # (Dp, P)

    acc_ref[...] = jax.lax.fori_loop(lo // chunk, pl.cdiv(hi, chunk),
                                     body, acc_ref[...])

    @pl.when(b == nb - 1)
    def _finish():
        _write_eval(acc_ref[...], i, j, out_refs, tile_h, tile_w,
                    n_attr=n_attr)


def select_eval_stream(tri_id: jax.Array, sbins, table: jax.Array,
                       tile_h: int, tile_w: int, kmax: int,
                       chunk: int = 128, bf16: bool = False,
                       raw: bool = False, slim: bool = False):
    """select_eval_pallas over CSR stream bins (raster.StreamBins).

    The dense variant gathers + DMAs (tiles, K, Dp) table rows — at a
    grown K that is tens of times the actual occupancy. Here the table
    is gathered once on the stream (one row per actual (tile, triangle)
    pair) and each tile walks only its segment's blocks."""
    H, W = tri_id.shape
    ty, tx = sbins.counts.shape
    T, D = table.shape
    pad = (-D) % 8
    table_p = jnp.pad(table, ((0, 0), (0, pad))) if pad else table
    Dp = table_p.shape[1]
    rows = jnp.take(table_p, jnp.clip(sbins.ids, 0, T - 1), axis=0)
    rows = jnp.where((sbins.ids >= 0)[:, None], rows, 0.0)   # (Ls, Dp)
    idsf = sbins.ids.astype(F32)[:, None]                    # (Ls, 1)
    tid_tiles = tri_id.reshape(ty, tile_h, tx, tile_w).transpose(0, 2, 1, 3)

    from . import raster
    P = tile_h * tile_w
    C_OUT = 13 if slim else 22
    Ls = sbins.ids.shape[0]
    kb = min(2048, Ls)
    nblocks = Ls // kb
    nb = min(-(-kmax // kb) + 1, nblocks)
    kernel = functools.partial(_select_eval_stream_kernel, tile_h=tile_h,
                               tile_w=tile_w, chunk=min(chunk, kb), kb=kb,
                               nb=nb, nblocks=nblocks, tiles_x=tx,
                               n_attr=6 if slim else _N_ATTR)

    def stream_map(i, j, b, starts):
        t = i * tx + j
        return (raster._stream_block(starts[t], starts[t + 1], b, kb,
                                     nblocks), 0)

    if bf16 or raw:
        hdtype = jnp.bfloat16 if bf16 else F32
        out_shape, out_specs = _split_out_shapes(H, W, tile_h, tile_w,
                                                 hdtype, slim=slim)
        cf, ch = (4, 9) if slim else (7, 15)
        out_bytes = ty * tx * P * (cf * 4 + ch * (2 if bf16 else 4))
    else:
        out_shape = jax.ShapeDtypeStruct((C_OUT, H, W), F32)
        out_specs = pl.BlockSpec((C_OUT, tile_h, tile_w),
                                 lambda i, j, b, starts: (0, i, j),
                                 memory_space=pltpu.VMEM)
        out_bytes = ty * tx * C_OUT * P * 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ty, tx, nb),
        in_specs=[
            pl.BlockSpec((1, 1, tile_h, tile_w),
                         lambda i, j, b, starts: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, 1), stream_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, Dp), stream_map, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((Dp, P), F32)],
    )
    interpret = jax.default_backend() != "tpu"
    out_tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=int(Ls * P * (2 * Dp + 8)),
            bytes_accessed=rows.size * 4 + tri_id.size * 4 + out_bytes,
            transcendentals=0),
    )(sbins.starts, tid_tiles, idsf, rows)

    if raw:
        return out_tiles
    if bf16:
        outf, outh = out_tiles
        return _to_hwc(outf), _to_hwc(outh)
    return _to_hwc(out_tiles)


def resolve_attrs_stream(tri_id: jax.Array, sbins, table: jax.Array,
                         tile_h: int, tile_w: int, kmax: int,
                         bf16: bool = False,
                         slim: bool = False) -> ResolvedAttrs:
    """ResolvedAttrs via the CSR-stream select+eval kernel (bit-compatible
    with resolve_attrs_pallas on the same bin contents)."""
    out = select_eval_stream(tri_id, sbins, table, tile_h, tile_w, kmax,
                             bf16=bf16, slim=slim)
    if bf16:
        return _attrs_from_split(tri_id, *out, slim=slim)
    return _attrs_from_single(tri_id, out, slim=slim)


def resolve_attrs_onehot(tri_id: jax.Array, setup, bin_ids: jax.Array,
                         tri_vidx: jax.Array, tri_instance: jax.Array,
                         attrs: "VertexAttrs", inst_object_id: jax.Array,
                         inst_material: jax.Array, mat_record: jax.Array,
                         mat_flat: jax.Array,
                         tile_h: int, tile_w: int,
                         use_pallas: bool = False,
                         counts: jax.Array | None = None,
                         bf16: bool = False) -> ResolvedAttrs:
    """Gather-free per-pixel attribute resolve (two-pass variant: the fused
    Pallas path selects rows inside the raster kernel instead)."""
    table = build_gbuffer_table(setup, tri_vidx, attrs, tri_instance,
                                inst_object_id, inst_material,
                                mat_record, mat_flat)
    if use_pallas:
        return resolve_attrs_pallas(tri_id, bin_ids, table, tile_h, tile_w,
                                    counts=counts, bf16=bf16)
    return resolve_attrs_tiled(tri_id, bin_ids, table, tile_h, tile_w)


def resolve_gbuffer_from_attrs(r: "ResolvedAttrs", tri_id: jax.Array,
                               depth: jax.Array,
                               pool: sampling.TexturePoolGPU,
                               texture_filter: str = "dithered",
                               texture_scale: int = 1,
                               tex_block_capacity: int = 0,
                               sample_textures: bool = True
                               ) -> tuple[GBuffer, jax.Array]:
    """Material evaluation + GBuffer assembly from resolved attributes.

    ``pool`` is the composite material-record pool: each texel carries
    [albedo rgba | normal rgb | rough | metal], so the whole material reads
    in ONE mip-filtered sample. ``tex_block_capacity`` > 0 compacts the
    sample onto the screen blocks that contain textured pixels (see
    ops/compact.py) — flat-material and background blocks issue no gathers.

    Returns (GBuffer, () i32 needed-block count — the compaction capacity
    monitor, 0 when dense)."""
    from . import compact

    world, uv = r.world, r.uv
    n_geom, tangent, bitangent = r.normal, r.tangent, r.bitangent
    flat, object_id, valid = r.flat, r.object_id, r.valid
    use_tex = flat[..., 5] > 0.5

    if not sample_textures:
        # static flat-only scene (cfg.any_textured False): no material in
        # the pack uses textures, so skip the mip/uv math and the sampling
        # machinery entirely (the flat-parameter pipeline variant)
        vm = valid[..., None]
        return GBuffer(
            position=jnp.where(vm, world, 0.0),
            normal=jnp.where(vm, n_geom, 0.0),
            albedo=jnp.where(vm, flat[..., 0:3], 0.0),
            rough_metal_ao=jnp.where(
                vm, jnp.stack([flat[..., 3], flat[..., 4],
                               jnp.ones_like(flat[..., 3])], axis=-1), 0.0),
            depth=depth,
            object_id=object_id,
            mask=valid,
        ), jnp.int32(0)

    if texture_scale > 1:
        s = texture_scale
        uv_lo, rec_lo = uv[::s, ::s], r.record[::s, ::s]
        # dilate so the full-res bilinear upsample of a textured pixel never
        # reads a zeroed (unselected) strided neighbor
        need_lo = compact.dilate_mask(
            compact.to_blocks((use_tex & valid), s, s).any(axis=(1, 2))
            .reshape(uv.shape[0] // s, uv.shape[1] // s))
        level = sampling.mip_level_from_uv(uv_lo, pool.level_sizes[0])
        duv = (sampling.uv_derivatives(uv_lo)
               if isinstance(pool, sampling.NativeTexturePoolGPU) else None)
        rec, tex_needed = compact.sample_pool_compacted(
            pool, rec_lo, uv_lo, level, need_lo, tex_block_capacity,
            filter=texture_filter, duv=duv)
        from . import post
        rec = post.upsample_bilinear_int(rec, s, s)             # (H, W, 9)
    else:
        level = sampling.mip_level_from_uv(uv, pool.level_sizes[0])
        duv = (sampling.uv_derivatives(uv)
               if isinstance(pool, sampling.NativeTexturePoolGPU) else None)
        rec, tex_needed = compact.sample_pool_compacted(
            pool, r.record, uv, level, use_tex & valid, tex_block_capacity,
            filter=texture_filter, duv=duv)                     # (H, W, 9)
    albedo_t = rec[..., 0:3]
    normal_t = rec[..., 4:7]
    rough_t = rec[..., 7]
    metal_t = rec[..., 8]

    nt = normal_t * 2.0 - 1.0
    n_mapped = _safe_normalize(
        nt[..., 0:1] * tangent + nt[..., 1:2] * bitangent + nt[..., 2:3] * n_geom)

    albedo = jnp.where(use_tex[..., None], albedo_t, flat[..., 0:3])
    normal = jnp.where(use_tex[..., None], n_mapped, n_geom)
    rough = jnp.where(use_tex, rough_t, flat[..., 3])
    metal = jnp.where(use_tex, metal_t, flat[..., 4])

    vm = valid[..., None]
    return GBuffer(
        position=jnp.where(vm, world, 0.0),
        normal=jnp.where(vm, normal, 0.0),
        albedo=jnp.where(vm, albedo, 0.0),
        rough_metal_ao=jnp.where(
            vm, jnp.stack([rough, metal, jnp.ones_like(rough)], axis=-1), 0.0),
        depth=depth,
        object_id=object_id,
        mask=valid,
    ), tex_needed


def forward_overlay_tiles(tri_id: jax.Array, bins, table: jax.Array,
                          pool: sampling.TexturePoolGPU,
                          tile_h: int, tile_w: int, capacity: int,
                          texture_filter: str = "dithered", fs: int = 2
                          ) -> tuple[jax.Array, jax.Array, jax.Array,
                                     jax.Array, jax.Array]:
    """Tile-compacted forward-overlay resolve (gizmos / light billboards,
    src/forward_renderer.rs + forward.wgsl).

    Overlays cover a handful of raster tiles, but a dense resolve pays the
    full-screen one-hot select (a (pixels, K) tensor), plane evaluation and
    texture taps — measured ~36 ms of a 131 ms 1080p frame on test.lvl.
    Here everything per-pixel runs only on the ≤``capacity`` tiles that
    actually bin a forward triangle (ops/compact.py top-K selection; 0 or
    >= the tile count processes every tile — same math, so the dense
    setting is bit-exact with the compacted one).

    The mip level is computed tile-locally (one-sided differences at tile
    borders), and sprites sample at 1/``fs`` rate with a per-tile bilinear
    upsample — their alpha edges are soft.

    Returns (f_color (H, W, 3), f_alpha (H, W), object_id (H, W) i32,
    valid (H, W) bool, needed () i32 occupied-tile monitor).
    """
    from . import compact

    H, W = tri_id.shape
    plan, cap, color_c, alpha_c, oid_c, valid_c = _forward_overlay_compact(
        tri_id, bins, table, pool, tile_h, tile_w, capacity,
        texture_filter, fs)

    def scatter(x, ch):
        x = x.reshape(cap, tile_h, tile_w, *((ch,) if ch else ()))
        return compact.from_blocks(
            compact.scatter_blocks(x, plan, fill=jnp.zeros((), x.dtype)),
            H, W)

    f_color = scatter(color_c, 3)
    f_alpha = scatter(alpha_c, 0)
    object_id = scatter(oid_c, 0)
    valid = scatter(valid_c, 0)
    return f_color, f_alpha, object_id, valid, plan.needed


def forward_overlay_compose(hdr: jax.Array, pick: jax.Array,
                            tri_id: jax.Array, bins, table: jax.Array,
                            pool: sampling.TexturePoolGPU,
                            tile_h: int, tile_w: int, capacity: int,
                            texture_filter: str = "dithered", fs: int = 2
                            ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Composite the forward overlay directly into (hdr, pick) in the
    compacted tile domain.

    :func:`forward_overlay_tiles` scatters four full-resolution outputs
    (color/alpha/id/valid) back to image shape — four block-table takes +
    untile transposes + two dense blend passes, ~1.8 ms at 1080p for an
    overlay covering a handful of tiles. Compositing instead walks the
    ≤``capacity`` compacted tiles with dynamic_slice / dynamic_update_slice
    in one lax.scan: per-tile KB-sized strided reads/writes, no full-image
    relayout at all. Outside the occupied tiles hdr/pick pass through
    untouched (the dense blend multiplies by alpha=0 there — same result,
    exactly: tests assert bit-equality against the scatter path).

    Returns (hdr (H, W, 3), pick (H, W) i32, needed () i32 monitor).
    """
    ty, tx, _ = bins.ids.shape
    plan, cap, color_c, alpha_c, oid_c, valid_c = _forward_overlay_compact(
        tri_id, bins, table, pool, tile_h, tile_w, capacity,
        texture_filter, fs)
    th, tw = tile_h, tile_w
    color_t = color_c.reshape(cap, th, tw, 3)
    alpha_t = alpha_c.reshape(cap, th, tw)
    oid_t = oid_c.reshape(cap, th, tw)
    valid_t = valid_c.reshape(cap, th, tw)
    slot = plan.slots                                # (cap,), -1 padded
    oy = (jnp.maximum(slot, 0) // tx) * th
    ox = (jnp.maximum(slot, 0) % tx) * tw

    def body(carry, xs):
        hdr_i, pick_i = carry
        oy_i, ox_i, col, al, oid, val, live = xs
        cur = jax.lax.dynamic_slice(hdr_i, (oy_i, ox_i, 0), (th, tw, 3))
        new = cur * (1.0 - al[..., None]) + col * al[..., None]
        hdr_i = jax.lax.dynamic_update_slice(
            hdr_i, jnp.where(live, new, cur), (oy_i, ox_i, 0))
        curp = jax.lax.dynamic_slice(pick_i, (oy_i, ox_i), (th, tw))
        newp = jnp.where(live & val & (al > 0.5), oid, curp)
        pick_i = jax.lax.dynamic_update_slice(pick_i, newp, (oy_i, ox_i))
        return (hdr_i, pick_i), None

    (hdr, pick), _ = jax.lax.scan(
        body, (hdr, pick),
        (oy, ox, color_t, alpha_t, oid_t, valid_t, slot >= 0))
    return hdr, pick, plan.needed


def _forward_overlay_compact(tri_id: jax.Array, bins, table: jax.Array,
                             pool: sampling.TexturePoolGPU,
                             tile_h: int, tile_w: int, capacity: int,
                             texture_filter: str, fs: int):
    """Shared compacted-tile overlay resolve: returns (plan, cap,
    color (cap, P, 3), alpha (cap, P), object_id (cap, P) i32,
    valid (cap, P) bool) with P = tile_h * tile_w."""
    from . import compact

    ty, tx, K = bins.ids.shape
    T = table.shape[0]
    n_tiles = ty * tx
    P = tile_h * tile_w
    cap = capacity if 0 < capacity < n_tiles else n_tiles

    plan = compact.plan_blocks((bins.counts > 0).reshape(n_tiles), cap)
    # compacted winner ids + bin lists
    tid_c = compact.gather_blocks(
        compact.to_blocks(tri_id, tile_h, tile_w), plan)     # (Kt, th, tw)
    tid_flat = tid_c.reshape(cap, P)
    ids_c = compact.gather_blocks(
        bins.ids.reshape(n_tiles, K), plan)                  # (Kt, K)
    # empty slots gathered id 0 rows; force no-match
    ids_c = jnp.where((plan.slots >= 0)[:, None], ids_c, -1)

    onehot = (tid_flat[..., None] == ids_c[:, None, :]) \
        & (ids_c >= 0)[:, None, :]
    rows_c = jnp.take(table, jnp.clip(ids_c, 0, T - 1), axis=0)
    rows_c = jnp.where((ids_c >= 0)[..., None], rows_c, 0.0)
    sel = jnp.einsum("tpk,tkd->tpd", onehot.astype(jnp.bfloat16), rows_c,
                     preferred_element_type=F32)             # (Kt, P, D)

    # global pixel centers per compacted tile
    slot = jnp.maximum(plan.slots, 0)
    ox = ((slot % tx) * tile_w).astype(F32)                  # (Kt,)
    oy = ((slot // tx) * tile_h).astype(F32)
    lx = (jnp.arange(P, dtype=I32) % tile_w).astype(F32) + 0.5
    ly = (jnp.arange(P, dtype=I32) // tile_w).astype(F32) + 0.5
    px = (ox[:, None] + lx[None, :])[..., None]              # (Kt, P, 1)
    py = (oy[:, None] + ly[None, :])[..., None]
    r = resolve_attrs_from_sel_at(tid_flat, sel, px, py)

    use_tex = r.flat[..., 5] > 0.5
    uv_t = r.uv.reshape(cap, tile_h, tile_w, 2)[:, ::fs, ::fs]
    rec_t = r.record.reshape(cap, tile_h, tile_w)[:, ::fs, ::fs]
    lvl = sampling.mip_level_from_uv(uv_t, pool.level_sizes[0])
    duv_t = (sampling.uv_derivatives(uv_t)
             if isinstance(pool, sampling.NativeTexturePoolGPU) else None)
    tex = sampling.sample_pool_mip(pool, rec_t, uv_t, lvl,
                                   filter=texture_filter,
                                   duv=duv_t)                # (Kt, h, w, C)
    tex = jax.image.resize(tex, (cap, tile_h, tile_w, tex.shape[-1]),
                           method="bilinear").reshape(cap, P, -1)

    valid_c = r.valid
    color_c = jnp.where(use_tex[..., None], tex[..., :3], r.flat[..., 0:3])
    alpha_c = jnp.where(use_tex, tex[..., 3], 1.0) * valid_c.astype(F32)
    oid_c = jnp.where(valid_c, r.object_id, 0)
    return plan, cap, color_c, alpha_c, oid_c, valid_c


def resolve_gbuffer_onehot(tri_id: jax.Array, depth: jax.Array, setup,
                           bin_ids: jax.Array, tri_vidx: jax.Array,
                           tri_instance: jax.Array, attrs: "VertexAttrs",
                           inst_object_id: jax.Array, inst_material: jax.Array,
                           mat_record: jax.Array, mat_flat: jax.Array,
                           pool: sampling.TexturePoolGPU,
                           tile_h: int, tile_w: int,
                           texture_filter: str = "dithered",
                           texture_scale: int = 1,
                           tex_block_capacity: int = 0,
                           use_pallas: bool = False,
                           counts: jax.Array | None = None,
                           bf16: bool = False,
                           sample_textures: bool = True
                           ) -> tuple[GBuffer, jax.Array]:
    """Two-pass gather-free GBuffer resolve (select pass + epilogue)."""
    r = resolve_attrs_onehot(tri_id, setup, bin_ids, tri_vidx, tri_instance,
                             attrs, inst_object_id, inst_material,
                             mat_record, mat_flat, tile_h, tile_w,
                             use_pallas=use_pallas, counts=counts, bf16=bf16)
    return resolve_gbuffer_from_attrs(r, tri_id, depth, pool,
                                      texture_filter, texture_scale,
                                      tex_block_capacity,
                                      sample_textures=sample_textures)


def _safe_normalize(v: jax.Array) -> jax.Array:
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, 1e-12)
