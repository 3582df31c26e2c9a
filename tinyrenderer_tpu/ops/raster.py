"""Tiled visibility-buffer triangle rasterizer.

TPU-native replacement for the wgpu raster pipelines (GBuffer geometry
src/gbuffer_geometry_renderer.rs, shadow src/pipelines/shadow_rp.rs, pick
src/object_picker.rs, forward src/forward_renderer.rs). There is no
hardware rasterizer on a TPU, so rasterization is reformulated as dense
vector math:

1. ``triangle_setup`` (jnp): transform the vertex pool by instance model
   matrices + the view-projection, then build one *setup row* per triangle:
   area-normalized screen-space edge planes (barycentric planes), the
   affine NDC-depth plane, the triangle id and per-corner 1/w. Everything
   is static-shape; invalid triangles (masked, near-plane, backfacing,
   degenerate) get zeroed rows.
2. ``bin_triangles`` (jnp): bucket triangles into screen tiles by bbox
   overlap (a sort-based top-K per tile, capacity-padded).
3. ``rasterize``: a Pallas kernel, grid over (tile_y, tile_x). Each tile
   loops over its binned triangles in chunks, evaluates the barycentric
   planes over the (tile_h, tile_w) pixel block on the VPU, and keeps a
   running reverse-Z max depth + winning triangle id. Output is a
   visibility buffer: per-pixel triangle id (int32, -1 = none) + depth.

Downstream passes (resolve.py) reconstruct attributes from the winning
triangle's setup row, which is how the GBuffer, the pick-id map
(src/shaders/pick.wgsl exact-depth trick made exact by construction) and
shadow maps all fall out of the same kernel.

Depth convention: reverse-Z, depth in (0, 1], larger = closer, cleared to 0
(matches CompareFunction::Greater + clear 0.0, gbuffer_geometry_renderer.rs:239-245).
Winding: front faces are CCW in NDC (wgpu FrontFace::Ccw); in our y-down
screen space that is a negative signed area.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32

SETUP_COLS = 16
# setup row layout
_E0X, _E0Y, _E0C = 0, 1, 2
_E1X, _E1Y, _E1C = 3, 4, 5
_E2X, _E2Y, _E2C = 6, 7, 8
_ZX, _ZY, _ZC = 9, 10, 11
_IDF = 12
_IW0, _IW1, _IW2 = 13, 14, 15

W_EPS = 1e-6

# Raster-kernel plane evaluation engine. The original design stacked the
# 4 affine planes of a chunk into an MXU dot (see _raster_kernel), but
# depth exactness needs precision=HIGHEST, which decomposes each f32
# operand into 3 bf16 passes — on a K=3 contraction with M=chunk(32) of
# 128 MXU rows used, that is mostly wasted array work. The VPU broadcast
# form ((chunk,1)*(1,P) multiply-adds) is native f32 (exact, no operand
# splitting) and matches the jnp reference path's arithmetic. Module
# global so tools/profile_frame.py can A/B both engines in one process.
_PLANES_ON_MXU = False
# The VPU form's (chunk, P) temporaries blow VMEM past this pixel count
# when combined with a large bin block (measured: P=16384 with kb=4096
# crashes the Mosaic compile subprocess; P=8192 at any K and P=16384 at
# K<=128 are fine) — big shadow tiles (128x128) keep the MXU dots.
_VPU_PLANES_MAX_P = 8192


class TriangleSetup(NamedTuple):
    """Per-triangle raster state (all arrays over the triangle capacity T)."""

    rows: jax.Array       # (T, 16) f32 setup rows (zeroed when invalid)
    valid: jax.Array      # (T,) bool
    bbox: jax.Array       # (T, 4) f32: xmin, ymin, xmax, ymax (pixels)
    screen: jax.Array     # (T, 3, 2) f32 screen-space corner positions
    inv_w: jax.Array      # (T, 3) f32 per-corner 1/w
    z_ndc: jax.Array      # (T, 3) f32 per-corner reverse-Z depth


@jax.named_scope("vertex_transform")
def transform_vertices(positions: jax.Array, vert_instance: jax.Array,
                       inst_model: jax.Array, view_proj: jax.Array
                       ) -> tuple[jax.Array, jax.Array]:
    """Object-space positions -> (world (V, 3), clip (V, 4)).

    Per-vertex model matrices are gathered by instance slot as FLAT
    (V, 16) rows and applied as per-column (V,) multiply-adds. The
    original batched-einsum form materialized a (V, 4, 4) tensor whose
    (4, 4) minor dims tile-pad to (8, 128) vector registers — a 32x
    memory bloat that made the 131k-vertex transform ~1 ms instead of
    ~30 us (high-poly trace, round 3). Column math keeps every operand a
    full-lane (V,) vector. Replaces the instance-attribute vertex shaders
    (gbuffer_geometry.wgsl:50-85).
    """
    m = jnp.take(inst_model.reshape(-1, 16), vert_instance, axis=0)  # (V, 16)
    px, py, pz = positions[:, 0], positions[:, 1], positions[:, 2]
    world_cols = [m[:, 4 * i] * px + m[:, 4 * i + 1] * py
                  + m[:, 4 * i + 2] * pz + m[:, 4 * i + 3]
                  for i in range(3)]                                 # 3x (V,)
    wx, wy, wz = world_cols
    vp = view_proj  # clip_i = sum_j vp[i, j] * world_j + vp[i, 3]
    clip_cols = [vp[i, 0] * wx + vp[i, 1] * wy + vp[i, 2] * wz + vp[i, 3]
                 for i in range(4)]
    # axis=0 stacks + transpose: stacking (V,) columns on axis=1 lowers
    # each as a lane-padded (V, 1) tile (see triangle_setup note)
    world = jnp.stack(world_cols, axis=0).T
    clip = jnp.stack(clip_cols, axis=0).T
    return world, clip


def triangle_setup(clip: jax.Array, tri_vidx: jax.Array, tri_mask: jax.Array,
                   width: int, height: int, cull: str = "back") -> TriangleSetup:
    """Build per-triangle raster setup rows from clip-space vertex positions.

    cull: 'back' keeps CCW(NDC) front faces (main passes,
    gbuffer_geometry_renderer.rs:231-237), 'front' keeps back faces (shadow
    passes — the reference's x-flip turns its back-culling into effective
    front-culling, src/pipelines/shadow_rp.rs:81-86), 'none' keeps both.

    Corner data is gathered per corner ((T, 4) rows) and the screen-space
    math runs on full-lane (T,) columns — a single (T, 3, 4) corner
    gather's narrow minor dims tile-pad to vector registers and made this
    setup ~3x its bandwidth cost on 131k-triangle pools (high-poly trace,
    round 3).
    """
    cs = [jnp.take(clip, tri_vidx[:, k], axis=0) for k in range(3)]  # (T,4)x3
    ws = [c[:, 3] for c in cs]             # (T,) x3
    w_ok = (ws[0] > W_EPS) & (ws[1] > W_EPS) & (ws[2] > W_EPS)

    inv_ws = [1.0 / jnp.where(jnp.abs(w) > W_EPS, w, 1.0) for w in ws]
    sxs = [(c[:, 0] * iw * 0.5 + 0.5) * width
           for c, iw in zip(cs, inv_ws)]
    sys_ = [(0.5 - c[:, 1] * iw * 0.5) * height   # y flipped: NDC +y is up
            for c, iw in zip(cs, inv_ws)]
    zs = [c[:, 2] * iw for c, iw in zip(cs, inv_ws)]  # reverse-Z depth

    x0, x1, x2 = sxs
    y0, y1, y2 = sys_
    area2 = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)

    if cull == "back":
        face_ok = area2 < 0.0
    elif cull == "front":
        face_ok = area2 > 0.0
    else:
        face_ok = jnp.abs(area2) > 0.0
    valid = tri_mask & w_ok & face_ok & (jnp.abs(area2) > 1e-12)

    inv_area = 1.0 / jnp.where(jnp.abs(area2) > 1e-12, area2, 1.0)
    # Edge planes (opposite each corner), normalized so E_i == barycentric
    # lambda_i inside the triangle regardless of winding.
    e0x, e0y = (y1 - y2) * inv_area, (x2 - x1) * inv_area
    e0c = (x1 * y2 - x2 * y1) * inv_area
    e1x, e1y = (y2 - y0) * inv_area, (x0 - x2) * inv_area
    e1c = (x2 * y0 - x0 * y2) * inv_area
    e2x, e2y = (y0 - y1) * inv_area, (x1 - x0) * inv_area
    e2c = (x0 * y1 - x1 * y0) * inv_area
    # NDC depth is affine in screen space: z(x, y) = sum_i lambda_i * z_i.
    zx = e0x * zs[0] + e1x * zs[1] + e2x * zs[2]
    zy = e0y * zs[0] + e1y * zs[1] + e2y * zs[2]
    zc = e0c * zs[0] + e1c * zs[1] + e2c * zs[2]

    idf = (jnp.arange(tri_vidx.shape[0], dtype=I32) + 1).astype(F32)
    # Column-major assembly: stacking (T,) columns on axis=1 makes XLA
    # materialize each as a lane-padded (T, 1) tile (128x its logical
    # bytes — ~6.4 ms/frame of the 131k-triangle trace, round 4). A
    # (16, T) stack keeps every operand full-lane; ONE transpose pays the
    # row table's physical write once.
    rows_cf = jnp.stack([e0x, e0y, e0c, e1x, e1y, e1c, e2x, e2y, e2c,
                         zx, zy, zc, idf, inv_ws[0], inv_ws[1], inv_ws[2]],
                        axis=0)                       # (16, T) full-lane
    rows = jnp.where(valid[None, :], rows_cf, 0.0).T  # (T, 16)

    bbox = jnp.stack([
        jnp.minimum(jnp.minimum(x0, x1), x2),
        jnp.minimum(jnp.minimum(y0, y1), y2),
        jnp.maximum(jnp.maximum(x0, x1), x2),
        jnp.maximum(jnp.maximum(y0, y1), y2),
    ], axis=0).T                                      # (T, 4)

    screen = jnp.stack([jnp.stack(sxs, axis=0), jnp.stack(sys_, axis=0)],
                       axis=0).transpose(2, 1, 0)     # (T, 3, 2)
    inv_w = jnp.stack(inv_ws, axis=0).T
    z = jnp.stack(zs, axis=0).T
    return TriangleSetup(rows=rows, valid=valid, bbox=bbox, screen=screen,
                         inv_w=inv_w, z_ndc=z)


def translate_setup_y(setup: TriangleSetup, y0) -> TriangleSetup:
    """Shift a triangle setup down by ``y0`` pixels so that evaluating the
    planes at band-local coordinates (y' = y - y0) gives the same values.

    Used by the spatially sharded frame (parallel/sharded.py): every device
    computes the full-screen setup, translates it into its band's local
    frame, and rasterizes only its rows. Planes are affine, so translation
    only folds ``a_y * y0`` into each constant term.
    """
    y0f = jnp.asarray(y0, F32)
    rows = setup.rows
    rows = rows.at[:, _E0C].add(rows[:, _E0Y] * y0f)
    rows = rows.at[:, _E1C].add(rows[:, _E1Y] * y0f)
    rows = rows.at[:, _E2C].add(rows[:, _E2Y] * y0f)
    rows = rows.at[:, _ZC].add(rows[:, _ZY] * y0f)
    bbox = setup.bbox.at[:, 1].add(-y0f)
    bbox = bbox.at[:, 3].add(-y0f)
    screen = setup.screen.at[:, :, 1].add(-y0f)
    return setup._replace(rows=rows, bbox=bbox, screen=screen)


class Bins(NamedTuple):
    ids: jax.Array       # (tiles_y, tiles_x, K) i32 triangle ids, -1 padded
    rows: jax.Array      # (tiles_y, tiles_x, K, 16) f32 gathered setup rows
    counts: jax.Array    # (tiles_y, tiles_x) i32
    overflow: jax.Array  # () i32: max triangles wanted in any tile (capacity monitor)
    big_overflow: jax.Array  # () i32: triangles spanning >2x2 tiles (the
    #   scatter binning's dense-path list; monitored against
    #   cfg.bin_big_capacity — 0 on the dense binning path)


def _tile_ranges(setup: TriangleSetup, width: int, height: int,
                 tile_h: int, tile_w: int, tiles_y: int, tiles_x: int):
    """Per-triangle covered tile range [tymin..tymax]x[txmin..txmax] + ok."""
    txmin = jnp.clip(jnp.floor(setup.bbox[:, 0] / tile_w), 0, tiles_x - 1).astype(I32)
    tymin = jnp.clip(jnp.floor(setup.bbox[:, 1] / tile_h), 0, tiles_y - 1).astype(I32)
    txmax = jnp.clip(jnp.floor(setup.bbox[:, 2] / tile_w), 0, tiles_x - 1).astype(I32)
    tymax = jnp.clip(jnp.floor(setup.bbox[:, 3] / tile_h), 0, tiles_y - 1).astype(I32)
    onscreen = (setup.bbox[:, 2] >= 0) & (setup.bbox[:, 0] < width) & \
               (setup.bbox[:, 3] >= 0) & (setup.bbox[:, 1] < height)
    ok = setup.valid & onscreen
    return txmin, tymin, txmax, tymax, ok


def bin_triangles_dense(setup: TriangleSetup, width: int, height: int,
                        tile_h: int, tile_w: int, capacity: int) -> Bins:
    """Bucket triangles into tiles by bbox overlap (capacity-padded top-K).

    Builds the dense (tiles, T) hit tensor and sorts per tile — simple and
    fast for small pools, O(tiles * T log T) for big ones (use
    bin_triangles_scatter above ~4k triangles)."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    T = setup.rows.shape[0]

    txmin, tymin, txmax, tymax, ok = _tile_ranges(
        setup, width, height, tile_h, tile_w, tiles_y, tiles_x)

    ty = jnp.arange(tiles_y, dtype=I32)
    tx = jnp.arange(tiles_x, dtype=I32)
    hit = (ok[None, None, :]
           & (ty[:, None, None] >= tymin[None, None, :])
           & (ty[:, None, None] <= tymax[None, None, :])
           & (tx[None, :, None] >= txmin[None, None, :])
           & (tx[None, :, None] <= txmax[None, None, :]))  # (ty, tx, T)

    counts_full = jnp.sum(hit, axis=2, dtype=I32)
    overflow = jnp.max(counts_full)

    order = jnp.where(hit, jnp.arange(T, dtype=I32)[None, None, :], T)
    if T < capacity:  # pad so every tile always has `capacity` slots
        order = jnp.pad(order, ((0, 0), (0, 0), (0, capacity - T)),
                        constant_values=T)
        topk = jnp.sort(order, axis=2)[:, :, :capacity]       # (ty, tx, K)
    else:
        # top_k of -order = the K smallest triangle indices, descending in
        # -order -> ascending ids after negation. O(T log K) per tile vs
        # the full sort's O(T log T).
        topk = -jax.lax.top_k(-order, capacity)[0]
    ids = jnp.where(topk < T, topk, -1)
    rows = jnp.take(setup.rows, jnp.clip(ids, 0, T - 1), axis=0)
    rows = jnp.where((ids >= 0)[..., None], rows, 0.0)
    counts = jnp.minimum(counts_full, capacity)
    return Bins(ids=ids, rows=rows, counts=counts, overflow=overflow,
                big_overflow=jnp.int32(0))


def _split_small_big(setup: TriangleSetup, width: int, height: int,
                     tile_h: int, tile_w: int, big_capacity: int):
    """Shared front half of the scatter and stream binners: classify
    triangles by clipped-bbox tile span and build
    - ekeys/eids (4T,): the <=4 (tile, id) pair expansion of the *small*
      triangles (span <= 2x2 tiles), invalid pairs keyed to the n_tiles
      sentinel;
    - big_ids (Lc,): ascending-id top-K list of *big* triangles (T-padded)
      with hit_b (tiles_y, tiles_x, Lc) their dense tile-coverage tests;
    - big_overflow: () i32 true big count (cfg.bin_big_capacity monitor).
    """
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    n_tiles = tiles_y * tiles_x
    T = setup.rows.shape[0]
    Lc = min(T, big_capacity)

    txmin, tymin, txmax, tymax, ok = _tile_ranges(
        setup, width, height, tile_h, tile_w, tiles_y, tiles_x)
    span_x = txmax - txmin + 1
    span_y = tymax - tymin + 1
    small = ok & (span_x <= 2) & (span_y <= 2)
    big = ok & ~small

    # ---- big list: one global ascending-id top-K over T ----
    tri_ids = jnp.arange(T, dtype=I32)
    order_big = jnp.where(big, tri_ids, T)
    if T < Lc:
        order_big = jnp.pad(order_big, (0, Lc - T), constant_values=T)
    big_ids = jnp.sort(order_big)[:Lc]                      # (Lc,) T-padded
    big_overflow = jnp.sum(big.astype(I32))

    safe_big = jnp.clip(big_ids, 0, T - 1)
    b_xmin = jnp.take(txmin, safe_big)
    b_ymin = jnp.take(tymin, safe_big)
    b_xmax = jnp.take(txmax, safe_big)
    b_ymax = jnp.take(tymax, safe_big)
    ty = jnp.arange(tiles_y, dtype=I32)
    tx = jnp.arange(tiles_x, dtype=I32)
    hit_b = ((big_ids < T)[None, None, :]
             & (ty[:, None, None] >= b_ymin[None, None, :])
             & (ty[:, None, None] <= b_ymax[None, None, :])
             & (tx[None, :, None] >= b_xmin[None, None, :])
             & (tx[None, :, None] <= b_xmax[None, None, :]))  # (ty, tx, Lc)

    # ---- small expansion: <= 4 (tile, id) pairs per triangle ----
    e = jnp.arange(4, dtype=I32)
    ey, ex = e // 2, e % 2                                   # (4,)
    etile_y = tymin[None, :] + ey[:, None]                   # (4, T)
    etile_x = txmin[None, :] + ex[:, None]
    evalid = small[None, :] & (ey[:, None] < span_y[None, :]) \
        & (ex[:, None] < span_x[None, :])
    etile = jnp.where(evalid, etile_y * tiles_x + etile_x, n_tiles)
    ekeys = etile.reshape(-1)                                # (4T,)
    eids = jnp.broadcast_to(tri_ids[None, :], (4, T)).reshape(-1)
    return ekeys, eids, big_ids, hit_b, big_overflow


def bin_triangles_scatter(setup: TriangleSetup, width: int, height: int,
                          tile_h: int, tile_w: int, capacity: int,
                          big_capacity: int = 512) -> Bins:
    """Two-level binning for high-poly pools, O(T log T) total.

    The dense binner pays a per-TILE sort over the whole triangle pool
    (~255 sorts of 100k+ rows at 1080p — the 1.3 Mtris/s wall). Here:

    - *small* triangles (clipped bbox spans <= 2x2 tiles — the overwhelming
      majority of a high-poly mesh) expand to at most 4 (tile, id) pairs;
      ONE global lexicographic sort puts them in tile-major id-minor order,
      and each tile's bin is a contiguous segment located by searchsorted.
    - *big* triangles (floors, walls, near-camera geometry) are selected
      once into a static ``big_capacity`` list and dense-binned against the
      tile grid — cheap because they are few. ``big_overflow`` monitors the
      list (engine grows cfg.bin_big_capacity like the other envelopes).

    Per-tile bins hold the bigs first, then the smalls in ascending id; the
    raster depth race is order-independent, so only overflow truncation
    (which ids are dropped past ``capacity``) differs from the dense path.
    """
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    n_tiles = tiles_y * tiles_x
    T = setup.rows.shape[0]
    K = capacity

    ekeys, eids, big_ids, hit_b, big_overflow = _split_small_big(
        setup, width, height, tile_h, tile_w, big_capacity)
    order_b = jnp.where(hit_b, big_ids[None, None, :], T)
    sorted_b = jnp.sort(order_b, axis=2)                    # bigs first, T-pad
    bc = jnp.sum(hit_b, axis=2, dtype=I32).reshape(n_tiles)  # per-tile bigs
    Lc = big_ids.shape[0]

    st, si = jax.lax.sort((ekeys, eids), num_keys=2)         # tile-major

    starts = jnp.searchsorted(st, jnp.arange(n_tiles + 1, dtype=I32))
    sc = (starts[1:] - starts[:-1]).astype(I32)              # per-tile smalls

    counts_full = bc + sc
    overflow = jnp.max(counts_full)

    # ---- merge: slots [0, bc) <- bigs, [bc, bc+sc) <- smalls ----
    k = jnp.arange(K, dtype=I32)[None, :]                    # (1, K)
    # big section (sorted_b already has valid entries at [0, bc))
    if Lc < K:
        big_sec = jnp.pad(sorted_b.reshape(n_tiles, Lc),
                          ((0, 0), (0, K - Lc)), constant_values=T)
    else:
        big_sec = sorted_b.reshape(n_tiles, Lc)[:, :K]
    # small section: entry index into the sorted stream
    sidx = starts[:-1, None] + (k - bc[:, None])             # (n_tiles, K)
    s_ok = (k >= bc[:, None]) & (k < counts_full[:, None])
    small_sec = jnp.take(si, jnp.clip(sidx, 0, max(4 * T - 1, 0)))
    ids_flat = jnp.where(k < bc[:, None], big_sec,
                         jnp.where(s_ok, small_sec, T))
    ids = jnp.where(ids_flat < T, ids_flat, -1).reshape(tiles_y, tiles_x, K)

    rows = jnp.take(setup.rows, jnp.clip(ids, 0, T - 1), axis=0)
    rows = jnp.where((ids >= 0)[..., None], rows, 0.0)
    counts = jnp.minimum(counts_full, K).reshape(tiles_y, tiles_x)
    return Bins(ids=ids, rows=rows, counts=counts, overflow=overflow,
                big_overflow=big_overflow)


class StreamBins(NamedTuple):
    """CSR bins: one tile-major stream instead of dense (tiles, K) lists.

    The dense layout pays every per-slot cost (the ids->rows gather, the
    kernel DMA) on ``tiles * K`` slots even when mean occupancy is a few
    percent of the grown capacity K — the 1.3 Mtris/s wall of round 2.
    Here the per-tile bins are contiguous segments of ONE sorted
    (tile, id) stream located by ``starts``; every gather and every DMA
    is over actual (tile, triangle) pairs + one capacity pad, so cost
    tracks occupancy, not capacity.
    """

    ids: jax.Array       # (Ls,) i32 triangle ids, tile-major, -1 padded
    rows: jax.Array      # (Ls, 16) f32 gathered setup rows (0 for pad)
    starts: jax.Array    # (n_tiles + 1,) i32 CSR segment offsets
    counts: jax.Array    # (tiles_y, tiles_x) i32 per-tile pair count
    overflow: jax.Array  # () i32 max per-tile count (cfg.bin_capacity
    #   monitor — bounds the kernel's per-tile block walk)
    stream_overflow: jax.Array  # () i32 total pairs wanted
    #   (cfg.stream_capacity monitor)
    big_overflow: jax.Array     # () i32 big-triangle count
    #   (cfg.bin_big_capacity monitor)


def bin_triangles_stream(setup: TriangleSetup, width: int, height: int,
                         tile_h: int, tile_w: int, stream_capacity: int,
                         big_capacity: int = 512) -> StreamBins:
    """Bucket triangles into a CSR (tile, id) stream, O(T log T) total.

    Small triangles (bbox spans <= 2x2 tiles) expand to at most 4 pairs;
    big ones are selected into a ``big_capacity`` list, dense-binned
    against the tile grid (cheap: they are few) and their (tile, id)
    pairs join the same stream. ONE global lexicographic sort puts all
    pairs in tile-major id-minor order; per-tile bins are contiguous
    segments located by searchsorted. If the total pair count exceeds
    ``stream_capacity`` the highest tiles lose triangles (bottom screen
    rows) until the engine grows the envelope — same drop-and-grow
    semantics as the dense path's per-tile capacity K.
    """
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    n_tiles = tiles_y * tiles_x
    T = setup.rows.shape[0]
    Ls = stream_capacity

    ekeys, eids, big_ids, hit_b, big_overflow = _split_small_big(
        setup, width, height, tile_h, tile_w, big_capacity)
    # big pairs: every covered tile of every listed big triangle
    ty = jnp.arange(tiles_y, dtype=I32)
    tx = jnp.arange(tiles_x, dtype=I32)
    tile_idx = (ty[:, None] * tiles_x + tx[None, :])[..., None]
    bkeys = jnp.where(hit_b, tile_idx, n_tiles).reshape(-1)   # (n_tiles*Lc,)
    bvals = jnp.broadcast_to(big_ids[None, None, :], hit_b.shape).reshape(-1)

    allk = jnp.concatenate([ekeys, bkeys])
    allv = jnp.concatenate([eids, bvals])
    # fused single-key sort: key = tile * Tp + id reproduces the
    # (tile, id) lexicographic order with ONE comparator instead of
    # num_keys=2 (ids are in [0, T) and Tp is a power of two >= T, so
    # the decode is a shift/mask). Invalid pairs key to the n_tiles
    # sentinel tile with id 0 — they sort to the end unchanged.
    Tp = 1 << max(T - 1, 1).bit_length()
    if (n_tiles + 1) * Tp < 2**31:
        fused = jnp.where(allk < n_tiles, allk * Tp + allv, n_tiles * Tp)
        fused = jax.lax.sort(fused)                           # tile-major
        st = fused // Tp
        si = fused % Tp
    else:  # fused key would overflow int32: lexicographic fallback
        st, si = jax.lax.sort((allk, allv), num_keys=2)
    stream_overflow = jnp.sum((allk < n_tiles).astype(I32))

    L = st.shape[0]
    if L < Ls:
        st = jnp.pad(st, (0, Ls - L), constant_values=n_tiles)
        si = jnp.pad(si, (0, Ls - L), constant_values=0)
    else:
        st, si = st[:Ls], si[:Ls]

    starts = jnp.searchsorted(st, jnp.arange(n_tiles + 1, dtype=I32)
                              ).astype(I32)
    counts = (starts[1:] - starts[:-1]).reshape(tiles_y, tiles_x)
    overflow = jnp.max(counts)

    ids = jnp.where(st < n_tiles, si, -1)
    rows = jnp.take(setup.rows, jnp.clip(ids, 0, T - 1), axis=0)
    rows = jnp.where((ids >= 0)[:, None], rows, 0.0)
    return StreamBins(ids=ids, rows=rows, starts=starts, counts=counts,
                      overflow=overflow, stream_overflow=stream_overflow,
                      big_overflow=big_overflow)


# dense-vs-scatter crossover: the dense hit tensor + per-tile sort is
# cheap below a few thousand triangles and quadratic-ish above
_SCATTER_MIN_T = 4096


def stream_pays_off(triangle_pool: int) -> bool:
    """Whether the CSR stream raster beats the dense (tiles, K) bins for a
    triangle pool of this (static) size. Interleaved 1080p A/B on test.lvl
    (2048-triangle pool): stream 31.5 ms vs dense 27.4 ms — the per-frame
    stream sort + CSR bookkeeping is pure overhead while the dense hit
    tensor is small. The stream exists to break the tiles*K wall of
    high-poly pools, the same crossover as the dense/scatter binners."""
    return triangle_pool > _SCATTER_MIN_T


def bin_triangles(setup: TriangleSetup, width: int, height: int,
                  tile_h: int, tile_w: int, capacity: int,
                  big_capacity: int = 512) -> Bins:
    """Bucket triangles into screen tiles (capacity-padded per-tile lists).

    Dispatches on the static pool size: small pools use the dense
    (tiles, T) path, large pools the sort-scatter two-level path (the
    high-poly raster-throughput lever; see bin_triangles_scatter)."""
    T = setup.rows.shape[0]
    if T <= _SCATTER_MIN_T:
        return bin_triangles_dense(setup, width, height, tile_h, tile_w,
                                   capacity)
    return bin_triangles_scatter(setup, width, height, tile_h, tile_w,
                                 capacity, big_capacity)


# ---------------------------------------------------------------------------
# Pallas tile kernel
# ---------------------------------------------------------------------------

def _pixel_basis(i, j, tile_h: int, tile_w: int):
    """((1, P) pixel-center xs, ys, (3, P) MXU basis or None) for tile
    (i, j) — the shared prologue of every tile kernel."""
    P = tile_h * tile_w
    ox = (j * tile_w).astype(F32) + 0.5
    oy = (i * tile_h).astype(F32) + 0.5
    xs = jax.lax.broadcasted_iota(I32, (1, P), 1).astype(F32)
    pixx = jnp.remainder(xs, float(tile_w)) + ox
    pixy = jnp.floor_divide(xs, float(tile_w)) + oy
    basis = (jnp.concatenate([pixx, pixy, jnp.ones_like(pixx)], axis=0)
             if (_PLANES_ON_MXU or P > _VPU_PLANES_MAX_P) else None)
    return pixx, pixy, basis


def _eval_planes(s, lo: int, pixx, pixy, basis):
    """Evaluate rows' affine plane [lo:lo+3] at the tile's pixel centers:
    (chunk, 16) setup rows -> (chunk, P). VPU broadcast multiply-adds by
    default; the MXU dot form behind _PLANES_ON_MXU (see flag note)."""
    if basis is not None:
        return jax.lax.dot_general(
            s[:, lo:lo + 3], basis, (((1,), (0,)), ((), ())),
            preferred_element_type=F32,
            precision=jax.lax.Precision.HIGHEST)
    return (s[:, lo:lo + 1] * pixx + s[:, lo + 1:lo + 2] * pixy
            + s[:, lo + 2:lo + 3])


def _raster_kernel(counts_ref, rows_ref, id_out_ref, z_out_ref,
                   *, tile_h: int, tile_w: int, chunk: int, kb: int):
    """Per-tile visibility raster.

    Plane evaluation runs as VPU broadcast multiply-adds (_eval_planes):
    native f32 (no MXU operand splitting), the same arithmetic as the jnp
    reference path. The original MXU-dot formulation survives behind
    _PLANES_ON_MXU for A/B — with precision=HIGHEST it decomposed each
    f32 operand into 3 bf16 passes on a K=3 contraction, which the trace
    showed dominating the kernel. The VPU then does the cover test +
    running max.

    The grid's third dimension walks the tile's bin in blocks of ``kb``
    rows, revisiting the output block with a running depth race — per-
    invocation VMEM stays bounded no matter how far the bin capacity has
    grown (a 108k-triangle mesh can legitimately bin tens of thousands of
    shadow casters into one 128x128 shadow tile; pulling that whole bin
    into VMEM blew the 16 MB scoped limit).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    b = pl.program_id(2)
    count = counts_ref[i, j]
    base = b * kb

    P = tile_h * tile_w
    pixx, pixy, basis = _pixel_basis(i, j, tile_h, tile_w)

    nchunks = pl.cdiv(jnp.clip(count - base, 0, kb), chunk)

    def body(c, carry):
        best_z, best_id = carry
        s = rows_ref[0, 0, pl.ds(c * chunk, chunk), :]  # (chunk, 16)

        l0 = _eval_planes(s, _E0X, pixx, pixy, basis)
        l1 = _eval_planes(s, _E1X, pixx, pixy, basis)
        l2 = _eval_planes(s, _E2X, pixx, pixy, basis)
        z = _eval_planes(s, _ZX, pixx, pixy, basis)
        idf = s[:, _IDF][:, None]

        covered = (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0) & (idf > 0.0)
        cand = jnp.where(covered, z, -1.0)
        chunk_z = jnp.max(cand, axis=0)                # (P,)
        chunk_id = jnp.max(jnp.where(cand >= chunk_z[None], idf, 0.0), axis=0)
        # tie-break on exact z equality by max id — matches the jnp
        # reference's single global max (duplicate/degenerate triangles
        # can evaluate to bit-identical depth planes)
        upd = (chunk_z > best_z) | ((chunk_z == best_z) & (chunk_id > best_id))
        return (jnp.where(upd, chunk_z, best_z),
                jnp.where(upd, chunk_id, best_id))

    init = (jnp.zeros((P,), F32), jnp.zeros((P,), F32))
    best_z, best_id = jax.lax.fori_loop(0, nchunks, body, init)
    blk_id = best_id.reshape(tile_h, tile_w).astype(I32) - 1
    blk_z = best_z.reshape(tile_h, tile_w)

    @pl.when(b == 0)
    def _init():
        id_out_ref[0, 0] = blk_id
        z_out_ref[0, 0] = blk_z

    @pl.when(b > 0)
    def _combine():
        cur_z = z_out_ref[0, 0]
        cur_id = id_out_ref[0, 0]
        upd = (blk_z > cur_z) | ((blk_z == cur_z) & (blk_id > cur_id))
        id_out_ref[0, 0] = jnp.where(upd, blk_id, cur_id)
        z_out_ref[0, 0] = jnp.where(upd, blk_z, cur_z)


def _raster_resolve_kernel(counts_ref, rows_ref, table_ref,
                           id_out_ref, z_out_ref, sel_out_ref,
                           *, tile_h: int, tile_w: int, chunk: int):
    """Fused raster + row selection: alongside the depth race, carry the
    winning triangle's resolve-table row, selected per chunk with a
    one-hot MXU matmul (onehot^T (P, chunk) @ table (chunk, D)) — the
    standalone one-hot select pass and its HBM onehot tensor disappear."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    count = counts_ref[i, j]

    P = tile_h * tile_w
    D = table_ref.shape[-1]          # table block: (1, 1, K, D)
    pixx, pixy, basis = _pixel_basis(i, j, tile_h, tile_w)

    nchunks = pl.cdiv(count, chunk)

    def body(c, carry):
        best_z, best_id, best_sel = carry
        s = rows_ref[0, 0, pl.ds(c * chunk, chunk), :]      # (chunk, 16)
        t = table_ref[0, 0, pl.ds(c * chunk, chunk), :]     # (chunk, D)

        l0 = _eval_planes(s, _E0X, pixx, pixy, basis)
        l1 = _eval_planes(s, _E1X, pixx, pixy, basis)
        l2 = _eval_planes(s, _E2X, pixx, pixy, basis)
        z = _eval_planes(s, _ZX, pixx, pixy, basis)
        idf = s[:, _IDF][:, None]

        covered = (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0) & (idf > 0.0)
        cand = jnp.where(covered, z, -1.0)
        chunk_z = jnp.max(cand, axis=0)
        chunk_id = jnp.max(jnp.where(cand >= chunk_z[None], idf, 0.0), axis=0)
        # exact one-hot: idf values are unique per triangle
        onehot = ((idf == chunk_id[None]) & covered).astype(F32)  # (chunk, P)
        chunk_sel = jax.lax.dot_general(
            t, onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=F32)                      # (D, P) on MXU
        upd = (chunk_z > best_z) | ((chunk_z == best_z) & (chunk_id > best_id))
        # bool minor-dim broadcast is unsupported by Mosaic: use f32 lerp
        updf = upd.astype(F32)[None, :]
        return (jnp.where(upd, chunk_z, best_z),
                jnp.where(upd, chunk_id, best_id),
                chunk_sel * updf + best_sel * (1.0 - updf))

    init = (jnp.zeros((P,), F32), jnp.zeros((P,), F32),
            jnp.zeros((D, P), F32))
    best_z, best_id, best_sel = jax.lax.fori_loop(0, nchunks, body, init)

    id_out_ref[0, 0] = best_id.reshape(tile_h, tile_w).astype(I32) - 1
    z_out_ref[0, 0] = best_z.reshape(tile_h, tile_w)
    sel_out_ref[0, 0] = best_sel


def rasterize_resolve_binned(bins: Bins, table: jax.Array,
                             tile_h: int, tile_w: int, chunk: int = 32
                             ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused visibility raster + per-pixel table-row selection.

    table: (T, D) per-triangle resolve rows (D padded to a lane multiple
    by the caller if needed). Returns (tri_id (H', W'), depth (H', W'),
    sel (H', W', D))."""
    tiles_y, tiles_x, K, _ = bins.rows.shape
    T, D = table.shape
    table_tiles = jnp.take(table, jnp.clip(bins.ids, 0, T - 1), axis=0)
    table_tiles = jnp.where((bins.ids >= 0)[..., None], table_tiles, 0.0)

    chunk = min(chunk, K)
    grid = (tiles_y, tiles_x)
    P = tile_h * tile_w
    kernel = functools.partial(_raster_resolve_kernel, tile_h=tile_h,
                               tile_w=tile_w, chunk=chunk)
    interpret = jax.default_backend() != "tpu"
    id_tiles, z_tiles, sel_tiles = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, K, SETUP_COLS), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K, D), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_h, tile_w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_h, tile_w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D, P), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles_y, tiles_x, tile_h, tile_w), I32),
            jax.ShapeDtypeStruct((tiles_y, tiles_x, tile_h, tile_w), F32),
            jax.ShapeDtypeStruct((tiles_y, tiles_x, D, P), F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(K * P * (16 + 2 * D)) * tiles_y * tiles_x,
            bytes_accessed=table_tiles.size * 4 + bins.rows.size * 4
            + tiles_y * tiles_x * P * (D + 2) * 4,
            transcendentals=0),
    )(bins.counts, bins.rows, table_tiles)

    sel = sel_tiles.reshape(tiles_y, tiles_x, D, tile_h, tile_w)
    sel = sel.transpose(0, 3, 1, 4, 2).reshape(tiles_y * tile_h,
                                               tiles_x * tile_w, D)
    return _untile(id_tiles), _untile(z_tiles), sel


def rasterize_binned(bins: Bins, tile_h: int, tile_w: int,
                     chunk: int = 32, use_pallas: bool = True
                     ) -> tuple[jax.Array, jax.Array]:
    """Visibility raster over pre-binned tiles.

    Returns (tri_id (H', W') int32 with -1 = background, depth (H', W') f32)
    where H' = tiles_y*tile_h, W' = tiles_x*tile_w.
    """
    tiles_y, tiles_x, K, _ = bins.rows.shape
    if not use_pallas:
        return _rasterize_binned_jnp(bins, tile_h, tile_w)

    chunk = min(chunk, K)
    # bin-block size: bound per-invocation VMEM (block = kb*16*4 B) while
    # keeping the revisit overhead nil for ordinary capacities. kb must
    # divide K (out-of-bounds block reads are undefined): capacities are
    # pow2 buckets in practice, so this nearly always lands 4096.
    n_kb = -(-K // 4096)
    kb = -(-K // n_kb)
    if K % kb:
        kb, n_kb = K, 1
    grid = (tiles_y, tiles_x, n_kb)
    kernel = functools.partial(_raster_kernel, tile_h=tile_h, tile_w=tile_w,
                               chunk=chunk, kb=kb)
    flops_per_tile = K * tile_h * tile_w * 16
    interpret = jax.default_backend() != "tpu"
    id_tiles, z_tiles = pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts: full (ty, tx)
            pl.BlockSpec((1, 1, kb, SETUP_COLS), lambda i, j, b: (i, j, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_h, tile_w), lambda i, j, b: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_h, tile_w), lambda i, j, b: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles_y, tiles_x, tile_h, tile_w), I32),
            jax.ShapeDtypeStruct((tiles_y, tiles_x, tile_h, tile_w), F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(flops_per_tile) * tiles_y * tiles_x,
            bytes_accessed=bins.rows.size * 4 + tiles_y * tiles_x * tile_h * tile_w * 8,
            transcendentals=0),
    )(bins.counts, bins.rows)
    return _untile(id_tiles), _untile(z_tiles)


def _untile(tiles: jax.Array) -> jax.Array:
    ty, tx, th, tw = tiles.shape
    return tiles.transpose(0, 2, 1, 3).reshape(ty * th, tx * tw)


# ---------------------------------------------------------------------------
# CSR stream raster: per-tile segments of the sorted stream, located by
# scalar-prefetched offsets. Out-of-segment grid steps map to a repeated
# block index, so Pallas skips their DMA — per-frame bandwidth tracks the
# actual pair count, not tiles * capacity.
# ---------------------------------------------------------------------------

def _stream_block(start, end, b, kb: int, nblocks: int):
    """Block index for step b of a tile whose segment is [start, end).

    Walks the segment's blocks first..last, then clamps to the last
    segment block (repeated index -> no DMA on padding steps). Must be
    computed identically in the index_map and the kernel body."""
    sblk = start // kb
    eblk = jnp.maximum((end - 1) // kb, sblk)   # empty segment -> sblk
    return jnp.minimum(jnp.minimum(sblk + b, eblk), nblocks - 1)


def _raster_stream_kernel(starts_ref, rows_ref, id_out_ref, z_out_ref,
                          *, tile_h: int, tile_w: int, chunk: int,
                          kb: int, nblocks: int, tiles_x: int):
    """Per-tile visibility raster over the CSR stream.

    Identical depth race to _raster_kernel; the bin is the stream
    segment [starts[t], starts[t+1]), walked in ``kb`` blocks by grid
    dim 2. Rows outside the segment (neighbor tiles sharing the block)
    are masked out of the cover test."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    b = pl.program_id(2)
    t = i * tiles_x + j
    start = starts_ref[t]
    end = starts_ref[t + 1]
    blk = _stream_block(start, end, b, kb, nblocks)
    base = blk * kb
    lo = jnp.clip(start - base, 0, kb)
    hi = jnp.clip(end - base, 0, kb)
    # padding steps revisit the segment's last block (repeated index -> no
    # DMA); the depth race is idempotent, but skip their compute anyway
    sblk = start // kb
    eblk = jnp.maximum((end - 1) // kb, sblk)
    fresh = (sblk + b) <= jnp.minimum(eblk, nblocks - 1)
    hi = jnp.where(fresh, hi, lo)

    P = tile_h * tile_w
    pixx, pixy, basis = _pixel_basis(i, j, tile_h, tile_w)

    def body(c, carry):
        best_z, best_id = carry
        s = rows_ref[pl.ds(c * chunk, chunk), :]       # (chunk, 16)
        rowpos = c * chunk + jax.lax.broadcasted_iota(I32, (chunk, 1), 0)
        seg = (rowpos >= lo) & (rowpos < hi)           # (chunk, 1)

        l0 = _eval_planes(s, _E0X, pixx, pixy, basis)
        l1 = _eval_planes(s, _E1X, pixx, pixy, basis)
        l2 = _eval_planes(s, _E2X, pixx, pixy, basis)
        z = _eval_planes(s, _ZX, pixx, pixy, basis)
        idf = s[:, _IDF][:, None]

        covered = ((l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0)
                   & (idf > 0.0) & seg)
        cand = jnp.where(covered, z, -1.0)
        chunk_z = jnp.max(cand, axis=0)
        chunk_id = jnp.max(jnp.where(cand >= chunk_z[None], idf, 0.0), axis=0)
        upd = (chunk_z > best_z) | ((chunk_z == best_z) & (chunk_id > best_id))
        return (jnp.where(upd, chunk_z, best_z),
                jnp.where(upd, chunk_id, best_id))

    init = (jnp.zeros((P,), F32), jnp.zeros((P,), F32))
    best_z, best_id = jax.lax.fori_loop(lo // chunk, pl.cdiv(hi, chunk),
                                        body, init)
    blk_id = best_id.reshape(tile_h, tile_w).astype(I32) - 1
    blk_z = best_z.reshape(tile_h, tile_w)

    @pl.when(b == 0)
    def _init():
        id_out_ref[0, 0] = blk_id
        z_out_ref[0, 0] = blk_z

    @pl.when(b > 0)
    def _combine():
        cur_z = z_out_ref[0, 0]
        cur_id = id_out_ref[0, 0]
        upd = (blk_z > cur_z) | ((blk_z == cur_z) & (blk_id > cur_id))
        id_out_ref[0, 0] = jnp.where(upd, blk_id, cur_id)
        z_out_ref[0, 0] = jnp.where(upd, blk_z, cur_z)


def rasterize_stream(sbins: StreamBins, tiles_y: int, tiles_x: int,
                     tile_h: int, tile_w: int, kmax: int,
                     chunk: int = 32) -> tuple[jax.Array, jax.Array]:
    """Visibility raster over CSR stream bins.

    kmax bounds the per-tile segment length the kernel will walk
    (cfg.bin_capacity — monitored via sbins.overflow); longer segments
    lose their tail until the engine grows the envelope. Returns
    (tri_id, depth) exactly as rasterize_binned.

    chunk stays small: per-tile cost is max(chunk, segment) rows of
    (chunk, P) lane work, and stream segments are short — chunk=256 at
    (8, 128) tiles measured SLOWER (44.5 vs 37.6 ms on the 108k-tri
    scene) because most tiles padded a mostly-empty 256-row chunk."""
    Ls = sbins.rows.shape[0]
    kb = min(2048, Ls)
    assert Ls % kb == 0, "stream capacity must be a multiple of 2048"
    nblocks = Ls // kb
    # a kmax-long segment can straddle cdiv(kmax, kb) + 1 blocks
    nb = min(-(-kmax // kb) + 1, nblocks)
    grid = (tiles_y, tiles_x, nb)

    kernel = functools.partial(_raster_stream_kernel, tile_h=tile_h,
                               tile_w=tile_w, chunk=min(chunk, kb), kb=kb,
                               nblocks=nblocks, tiles_x=tiles_x)

    def rows_map(i, j, b, starts):
        t = i * tiles_x + j
        return (_stream_block(starts[t], starts[t + 1], b, kb, nblocks), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((kb, SETUP_COLS), rows_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_h, tile_w),
                         lambda i, j, b, starts: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_h, tile_w),
                         lambda i, j, b, starts: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    interpret = jax.default_backend() != "tpu"
    id_tiles, z_tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((tiles_y, tiles_x, tile_h, tile_w), I32),
            jax.ShapeDtypeStruct((tiles_y, tiles_x, tile_h, tile_w), F32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(Ls * tile_h * tile_w * 16),
            bytes_accessed=sbins.rows.size * 4
            + tiles_y * tiles_x * tile_h * tile_w * 8,
            transcendentals=0),
    )(sbins.starts, sbins.rows)
    return _untile(id_tiles), _untile(z_tiles)


def _rasterize_binned_jnp(bins: Bins, tile_h: int, tile_w: int
                          ) -> tuple[jax.Array, jax.Array]:
    """Pure-jnp reference implementation of the tile raster (used for tests
    and as a CPU fallback; numerically identical to the kernel)."""
    tiles_y, tiles_x, K, _ = bins.rows.shape

    def tile_fn(rows, ti, tj):
        ox = (tj * tile_w).astype(F32) + 0.5
        oy = (ti * tile_h).astype(F32) + 0.5
        xs = jnp.arange(tile_w, dtype=F32)[None, :] + ox
        ys = jnp.arange(tile_h, dtype=F32)[:, None] + oy

        def plane(ax, ay, ac):
            return (rows[:, ax][:, None, None] * xs[None]
                    + rows[:, ay][:, None, None] * ys[None]
                    + rows[:, ac][:, None, None])

        l0 = plane(_E0X, _E0Y, _E0C)
        l1 = plane(_E1X, _E1Y, _E1C)
        l2 = plane(_E2X, _E2Y, _E2C)
        z = plane(_ZX, _ZY, _ZC)
        idf = rows[:, _IDF][:, None, None]
        covered = (l0 >= 0.0) & (l1 >= 0.0) & (l2 >= 0.0) & (idf > 0.0)
        cand = jnp.where(covered, z, -1.0)
        best_z = jnp.max(cand, axis=0)
        best_id = jnp.max(jnp.where(cand >= best_z[None], idf, 0.0), axis=0)
        # pixels with no coverage (best_z <= 0) are background
        best_id = jnp.where(best_z > 0.0, best_id, 0.0)
        best_z = jnp.maximum(best_z, 0.0)
        return best_id.astype(I32) - 1, best_z

    ti = jnp.arange(tiles_y, dtype=I32)
    tj = jnp.arange(tiles_x, dtype=I32)
    fn = jax.vmap(jax.vmap(tile_fn, in_axes=(0, None, 0)), in_axes=(0, 0, None))
    id_tiles, z_tiles = fn(bins.rows, ti, tj)
    return _untile(id_tiles), _untile(z_tiles)


@jax.named_scope("raster")
def rasterize(clip: jax.Array, tri_vidx: jax.Array, tri_mask: jax.Array,
              width: int, height: int, tile_h: int, tile_w: int,
              bin_capacity: int, cull: str = "back", use_pallas: bool = True,
              big_capacity: int = 512
              ) -> tuple[jax.Array, jax.Array, TriangleSetup, "Bins"]:
    """Full raster: setup -> bin -> tile kernel.

    Returns (tri_id, depth, setup, bins) — bins.overflow is the capacity
    monitor; bins.ids feed the one-hot resolve.
    """
    setup = triangle_setup(clip, tri_vidx, tri_mask, width, height, cull)
    bins = bin_triangles(setup, width, height, tile_h, tile_w, bin_capacity,
                         big_capacity)
    tri_id, depth = rasterize_binned(bins, tile_h, tile_w, use_pallas=use_pallas)
    return tri_id, depth, setup, bins
