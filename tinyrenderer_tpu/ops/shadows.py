"""Shadow mapping: depth-only raster views + comparison lookups.

Replaces src/light_controller.rs:187-245 (per point light x 6 cube faces +
per directional light depth passes into a 1024^2 atlas,
src/light_render_data.rs:12-16) and the lookups of main.wgsl:75-117.

TPU shape: all shadow views are rasterized with the same visibility-buffer
kernel (ops/raster.py) using per-view viewproj matrices; the atlas is one
(V, S, S) reverse-Z depth array, V = 6P + D views in light order. Lookups
project the world position by the *same* viewproj used for the bake, so the
comparison is exactly consistent (no cube-face uv convention or x-flip
needed — see scene/lights.py docstring).

Culling: the bake keeps back faces (cull='front'), the reference's trick to
avoid acne (shadow_rp.rs:81-86); compare passes when the fragment's
reverse-Z depth is Greater than the stored occluder depth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import raster

F32 = jnp.float32
I32 = jnp.int32

# Default gate-refinement block dims (rows, cols) for direct op calls;
# the frame passes cfg.gate_block_h/w. Smaller blocks track the
# shadow-boundary band tighter (fewer refined pixels = fewer PCF gather
# rows) but need proportionally more work-list slots for the same screen
# coverage — A/B via tools/profile_frame.py --set gateblk with
# capacity-fair shadow_block_capacity settings. Measured capacity-fair
# interleaved: sparse boundaries (1080p test.lvl) want full-lane rows
# (8x32 20.2 ms < 8x16 20.5 < 16x16 20.9 < 8x8 22.7); boundary-DENSE
# scenes (1440p 500-cube stress) want minimal block area — row count
# dominates (8x8 70.4 < 8x16 73.5 < 16x16 80.2 < 8x32 82.0).
_GATE_BLOCK_DIMS = (8, 32)


@jax.named_scope("shadow_pass")
def render_shadow_views(clip_per_view: jax.Array, tri_vidx: jax.Array,
                        tri_mask: jax.Array, size: int, tile: int,
                        bin_capacity: int, use_pallas: bool = True,
                        big_capacity: int = 512
                        ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Rasterize V depth-only views -> ((V, S, S) reverse-Z atlas, () i32
    max bin occupancy across views — the shadow capacity monitor, so an
    overfull shadow tile grows shadow_bin_capacity instead of silently
    dropping casters — and () i32 max big-triangle count across views,
    monitoring cfg.bin_big_capacity on the scatter binning path).

    clip_per_view: (V, Vtx, 4) clip positions per view (static V, unrolled
    at trace time like the reference's per-light pass loop).
    """
    views = []
    overflow = jnp.int32(0)
    big_overflow = jnp.int32(0)
    for v in range(clip_per_view.shape[0]):
        _, depth, _, bins = raster.rasterize(
            clip_per_view[v], tri_vidx, tri_mask, size, size, tile, tile,
            bin_capacity, cull="front", use_pallas=use_pallas,
            big_capacity=big_capacity)
        views.append(depth)
        overflow = jnp.maximum(overflow, bins.overflow)
        big_overflow = jnp.maximum(big_overflow, bins.big_overflow)
    return jnp.stack(views, axis=0), overflow, big_overflow


def window_depth_maps(atlas: jax.Array) -> jax.Array:
    """(V, S, S) depth atlas -> (V, S, S, 4) windows [self|+x|+y|+x+y]
    with clamp-at-edge semantics, so a 2x2 PCF costs ONE gather (TPU
    gathers pay per row; see sampling.TexturePoolGPU)."""
    right = jnp.concatenate([atlas[:, :, 1:], atlas[:, :, -1:]], axis=2)
    down = jnp.concatenate([atlas[:, 1:, :], atlas[:, -1:, :]], axis=1)
    diag = jnp.concatenate([down[:, :, 1:], down[:, :, -1:]], axis=2)
    return jnp.stack([atlas, right, down, diag], axis=-1)


def _cube_face(d: jax.Array) -> jax.Array:
    """Cube-face index (0..5, the CUBE_FACE_DIRS/lights.rs order) of the
    light-to-point vector d (..., 3): the dominant-axis test every point
    lookup must share — THE convention-bearing lines (a sign/tie-break
    mismatch between two copies silently shifts shadow seams)."""
    ax = jnp.abs(d)
    is_x = (ax[..., 0] >= ax[..., 1]) & (ax[..., 0] >= ax[..., 2])
    is_y = (ax[..., 1] > ax[..., 0]) & (ax[..., 1] >= ax[..., 2])
    return jnp.where(
        is_x, jnp.where(d[..., 0] >= 0, 0, 1),
        jnp.where(is_y, jnp.where(d[..., 1] >= 0, 2, 3),
                  jnp.where(d[..., 2] >= 0, 4, 5))).astype(I32)


def _cube_uvz_closed(d: jax.Array, near: float = 0.1, far: float = 100.0
                     ) -> tuple[jax.Array, ...]:
    """Closed-form cube-face projection: (face, u, v, z_ndc, m) from the
    light-to-point vector d (..., 3) for the standard point-light frusta
    (perspective fov pi/2, aspect 1, reverse-Z — src/lights.rs:16-18,
    scene/lights.py::point_light_face_viewprojs).

    With fov pi/2 the face camera basis is axis-aligned (CUBE_FACE_DIRS
    table), so projecting through the 4x4 viewproj reduces to signed
    component picks: x_cam/y_cam are +/-components of d, w = m is the
    dominant-axis distance, u = 0.5*x/m + 0.5, v = 0.5 - 0.5*y/m, and
    reverse-Z depth z = (c1*m + c2)/m with c1 = n/(n-f), c2 = -nf/(n-f).
    Replaces the (..., 6, 4) all-faces einsum + one-hot select of the
    matrix path (the refinement-path einsum and its relayout copy cost
    ~1.1 ms/frame at 1080p; equal to the matrix path to f32 rounding —
    tests/test_ops.py closed-form parity)."""
    face = _cube_face(d)
    d0, d1, d2 = d[..., 0], d[..., 1], d[..., 2]
    m = jnp.max(jnp.abs(d), axis=-1)       # owner-face |d[axis]| = w_clip
    x_loc = jnp.where(face == 0, d2,
                      jnp.where(face == 1, -d2,
                                jnp.where(face == 5, d0, -d0)))
    y_loc = jnp.where(face == 2, -d2, jnp.where(face == 3, d2, d1))
    inv_m = 1.0 / jnp.where(m > 1e-9, m, 1.0)   # _ndc_uvz divide guard
    c1 = near / (near - far)
    c2 = -near * far / (near - far)
    u = (x_loc * inv_m) * 0.5 + 0.5
    v = 0.5 - (y_loc * inv_m) * 0.5
    z = (c1 * m + c2) * inv_m
    return face, u, v, z, m


def _ndc_uvz(c: jax.Array) -> tuple[jax.Array, ...]:
    """Clip-space (..., 4) -> (u, v, z, w): guarded perspective divide and
    the shadow-map uv convention (v flipped). Shared by every lookup path
    so the texture-space mapping can't drift between them."""
    w = c[..., 3]
    inv_w = 1.0 / jnp.where(jnp.abs(w) > 1e-9, w, 1.0)
    ndc = c[..., :3] * inv_w[..., None]
    return (ndc[..., 0] * 0.5 + 0.5, 0.5 - ndc[..., 1] * 0.5,
            ndc[..., 2], w)


def _project(world_pos: jax.Array, viewproj: jax.Array) -> tuple[jax.Array, ...]:
    """world (..., 3) -> (u, v, z_ndc, w) under a light viewproj."""
    ph = jnp.concatenate([world_pos, jnp.ones_like(world_pos[..., :1])], axis=-1)
    c = jnp.einsum("...j,ij->...i", ph, viewproj, preferred_element_type=F32)
    return _ndc_uvz(c)


def _compare_pcf(shadow_map: jax.Array, u: jax.Array, v: jax.Array,
                 ref_z: jax.Array, base=0, bias=0.0) -> jax.Array:
    """2x2 PCF 'Greater' comparison sample — the analog of
    textureSampleCompareLevel with a linear comparison sampler
    (light_render_data.rs:49-58). Returns visibility in [0, 1].

    ``shadow_map`` is a windowed multi-layer atlas (..., S, S, 4) from
    :func:`window_depth_maps`; ``base`` is a per-pixel flat offset
    (layer * S * S) selecting the layer. The whole 2x2 PCF footprint
    arrives in ONE gather.

    ``bias`` (NDC units, traced scalar — a live GlobalParams knob, the
    functional realization of the reference's declared-but-unread
    GlobalCPUParams.shadow_bias, src/global_params.rs:26-29): positive
    values bias the compare toward lit (acne removal). Rendering a golden
    at bias=+d and -d also yields the exact set of pixels whose compare
    margin is within d — the numerically-unstable set excluded from the
    strict on-chip verification gate (utils/verify.py).
    """
    S = shadow_map.shape[-2]
    fu = u * S - 0.5
    fv = v * S - 0.5
    x0 = jnp.floor(fu)
    y0 = jnp.floor(fv)
    fx = fu - x0
    fy = fv - y0
    x0 = jnp.clip(x0.astype(I32), 0, S - 1)
    y0 = jnp.clip(y0.astype(I32), 0, S - 1)
    flat = shadow_map.reshape(-1, 4)
    win = jnp.take(flat, base + y0 * S + x0, axis=0)   # (..., 4)
    # atlas may be bf16 (cfg.shadow_bf16) — compare in f32
    lit = (ref_z[..., None] + bias > win.astype(F32)).astype(F32)
    # blend as row-weights + row-sum, NOT per-column lit[..., i] slices:
    # column reads made XLA lay the gather output out column-major inside
    # lax.scan at 1440p ({0,1}: the 3M-row dim MINOR, every 8-byte window
    # row strided across four planes) — the gather ran at 61M rows/s vs
    # the ~140M/s row-major floor (48.9 ms/frame, stress-config trace)
    w = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                   (1 - fx) * fy, fx * fy], axis=-1)
    return jnp.sum(lit * w, axis=-1)


def gate_min_maps(win: jax.Array) -> jax.Array:
    """(V, S, S, 4) windowed atlas -> (V, S, S) per-texel 2x2-window MIN.

    The shading gate consumes ``visibility > 0`` (main.wgsl:228-237 ``if
    shadow > 0.0``), and a bilinear PCF is > 0 iff ANY window texel with
    nonzero weight compares lit — for interior weights, iff ``ref_z + bias
    > min(window)``. Gathering the gate from this 1-channel map quarters
    both the table bytes and the bytes per row: the 25-view BASELINE-
    config-2 atlas gathered its 8 B windowed rows from a 210 MB table at
    only 80 M rows/s (10.7 ms/frame in the round-4 trace — table size is
    the rate killer; the 7-view 59 MB table ran 225 M rows/s). Pixels
    whose bilinear weight is EXACTLY zero (fx or fy == 0) are treated as
    the +epsilon limit, i.e. a sub-ULP uv perturbation."""
    return jnp.min(win, axis=-1)


def _compare_gate(min_map: jax.Array, u: jax.Array, v: jax.Array,
                  ref_z: jax.Array, base=0, bias=0.0) -> jax.Array:
    """Binary shadow gate: ref_z + bias > min(2x2 window), ONE scalar
    gather per pixel against :func:`gate_min_maps`' flat table. Same
    texel addressing as _compare_pcf."""
    S = min_map.shape[-1]
    fu = u * S - 0.5
    fv = v * S - 0.5
    x0 = jnp.clip(jnp.floor(fu).astype(I32), 0, S - 1)
    y0 = jnp.clip(jnp.floor(fv).astype(I32), 0, S - 1)
    m = jnp.take(min_map.reshape(-1), base + y0 * S + x0)
    return ref_z + bias > m.astype(F32)


def gate_refined_visibility(vis_fn, vis_slot, pos: jax.Array, scale: int,
                            block_capacity: int, halo_exchange=None,
                            block_dims: tuple[int, int] | None = None,
                            channel_first: bool = False
                            ) -> tuple[jax.Array, jax.Array]:
    """Binary shadow gate at full resolution from a strided coarse pass +
    exact re-evaluation of boundary blocks.

    The deferred shading *gates* each light on ``shadow > 0`` rather than
    scaling by the PCF fraction (main.wgsl:228-237 ``if shadow > 0.0``), so
    per-pixel visibility is one bit. Evaluating the comparison taps on a
    ``scale``-strided grid gives that bit almost everywhere; only cells
    whose 3x3 neighborhood disagrees can differ from the full-rate gate,
    and those boundary pixels are re-evaluated exactly on block-compacted
    (8, 16) screen blocks (ops/compact.py). Result: boundary-exact hard
    shadows (sharper than the old bilinear-upsample path) at roughly the
    coarse pass's gather cost — TPU gathers pay per issued row, and shadow
    taps were the #1 item of the 1080p frame ledger (~14.5 ms of 35).

    The refinement runs as ONE batched pass over (light, block) work items:
    every selected block carries its light index, so L lights share a
    single ``block_capacity``-slot work list (one gather round) instead of
    paying the static capacity L times — compaction cost is set by the
    capacity, not the observed block count, so per-light plans made each
    extra light cost a full refinement pass.

    vis_fn: world positions (..., 3) -> per-light visibility (..., L) in
    [0, 1] (channel-last so every light shares one coarse pass).
    vis_slot(pos_c, li_c): exact visibility of compacted blocks pos_c
    (K, bh, bw, 3) under each block's OWN light li_c (K,) int32 (points
    first) — see :func:`make_vis_slot`.
    pos: (H, W, 3). ``halo_exchange``: optional callable mapping the
    coarse gate grid lo (hl, wl, L) bool to (above (1, wl, L),
    below (1, wl, L)) — the NEIGHBORING image bands' boundary coarse rows
    (the sharded frame passes a ppermute closure). Without it a band pads
    edge-mode at its boundary, missing cross-band gate disagreements and
    skipping the refinement blocks the single-chip frame refines there.
    Returns ((H, W, L) f32 0/1 gates — or (L, H, W) with ``channel_first``,
    the fused shading kernel's input layout, skipping the final relayout —
    () i32 total (light, block) work items wanted, monitoring
    cfg.shadow_block_capacity).
    """
    from . import compact

    def out_layout(gates_hwl):
        return jnp.moveaxis(gates_hwl, -1, 0) if channel_first else gates_hwl

    H, W = pos.shape[:2]
    if scale <= 1:
        return out_layout((vis_fn(pos) > 0.0).astype(F32)), jnp.int32(0)
    lo = vis_fn(pos[::scale, ::scale]) > 0.0       # (hl, wl, L) bool

    L = lo.shape[-1]
    hl, wl = lo.shape[:2]

    # boundary cells (per light): the gate differs from any 8-neighbor — a
    # shadow edge crossing anywhere between the two samples marks BOTH
    # cells, so the refined band already covers nearest-assignment
    # misalignment; only features smaller than one coarse cell are missed.
    # Diagonals are required: an edge clipping only a cell's CORNER leaves
    # all four 4-neighbors agreeing while the full-rate gate disagrees on
    # the corner pixels (regression: tests/test_ops.py diagonal gate).
    if halo_exchange is not None:
        above, below = halo_exchange(lo)
        rows = jnp.concatenate([above.astype(bool), lo,
                                below.astype(bool)], axis=0)
        padded = jnp.pad(rows, ((0, 0), (1, 1), (0, 0)), mode="edge")
    else:
        padded = jnp.pad(lo, ((1, 1), (1, 1), (0, 0)), mode="edge")
    edge = jnp.zeros(lo.shape, bool)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            edge = edge | (lo != padded[dy:dy + hl, dx:dx + wl])

    def up(img):  # exact-integer nearest upsample: broadcast, not gather
        if hl * scale == H and wl * scale == W:
            return jnp.repeat(jnp.repeat(img, scale, axis=0), scale, axis=1)
        return jax.image.resize(img.astype(F32), (H, W) + img.shape[2:],
                                method="nearest")

    # coarse gate upsampled CHANNEL-FIRST: the final composite works in
    # (L, H, W) (one batched untile for all lights), so upsampling the
    # tiny (L, hl, wl) grid after a coarse-res transpose avoids a full-res
    # (H, W, L) -> (L, H, W) relayout
    lo_cf = jnp.moveaxis(lo, -1, 0).astype(F32)     # (L, hl, wl)
    if hl * scale == H and wl * scale == W:
        coarse_up_cf = jnp.repeat(jnp.repeat(lo_cf, scale, axis=1),
                                  scale, axis=2)
    else:
        coarse_up_cf = jax.image.resize(lo_cf, (L, H, W), method="nearest")

    bh, bw = block_dims or _GATE_BLOCK_DIMS         # fine-grained blocks
    if H % bh or W % bw:
        return out_layout((vis_fn(pos) > 0.0).astype(F32)), jnp.int32(0)
    nby, nbx = H // bh, W // bw
    n_blocks = nby * nbx
    n_flat = L * n_blocks
    cap = block_capacity if 0 < block_capacity < n_flat else n_flat
    pos_blocks = compact.to_blocks(pos, bh, bw)     # (n_blocks, bh, bw, 3)
    if bh % scale == 0 and bw % scale == 0:
        # block (8, 16) covers an integer (bh/s, bw/s) cell rectangle:
        # reduce edge cells to blocks IN COARSE SPACE — the full-res
        # (H, W, L) edge upsample + re-blocking cost ~0.7 ms at 1080p
        # for information that exists on the coarse grid
        cy, cx = bh // scale, bw // scale
        edge_blocks = edge.reshape(nby, cy, nbx, cx, L).any(axis=(1, 3))
    else:                                           # scale > block dims
        hi_edge = up(edge)                          # (H, W, L) bool
        edge_blocks = jnp.any(compact.to_blocks(hi_edge, bh, bw),
                              axis=(1, 2)).reshape(nby, nbx, L)

    # one light-major work list over (light, block) pairs
    plan = compact.plan_blocks(
        jnp.moveaxis(edge_blocks.reshape(n_blocks, L), -1, 0)
        .reshape(n_flat), cap)
    flat = jnp.clip(plan.slots, 0, n_flat - 1)
    bidx = flat % n_blocks
    li_c = flat // n_blocks                         # (K,) light per slot
    # NOTE: this 4D take shows up as a 3.7 ms gather in 1080p traces, but
    # the compact.gather_blocks 2D-flattening fix measured +0.15 ms HERE
    # (interleaved full-frame A/B, r5) — the trace time is overlap-inflated
    # and the flatten forces a relayout the consumer then undoes. Keep 4D.
    pos_c = jnp.where((plan.slots >= 0)[:, None, None, None],
                      jnp.take(pos_blocks, bidx, axis=0), 0.0)
    exact = (vis_slot(pos_c, li_c) > 0.0).astype(F32)    # (K, bh, bw)

    refined = compact.scatter_blocks(exact, plan)   # (n_flat, bh, bw)
    # one batched untile for all L lights: (L, nby, nbx, bh, bw) ->
    # (L, H, W) (the per-light from_blocks loop paid L transposes)
    r_all = refined.reshape(L, nby, nbx, bh, bw)
    r_all = jnp.moveaxis(r_all, 2, 3).reshape(L, H, W)
    sel = (plan.inv >= 0).reshape(L, nby, 1, nbx, 1)
    m_all = jnp.broadcast_to(sel, (L, nby, bh, nbx, bw)).reshape(L, H, W)
    gates = jnp.where(m_all, r_all, coarse_up_cf)
    if channel_first:
        return gates, plan.needed
    return jnp.moveaxis(gates, 0, -1), plan.needed


# Gate compare table selection ("auto" | True | False; profile_frame A/B
# overrides). The 1-channel min map wins only on BIG atlases: its scalar
# rows gather at a lower fixed rate than 8 B windowed rows, but the rate
# of the windowed gather collapses with table size (measured 1080p, same
# row counts: 7-view 59 MB table — min 18.9 vs windowed 17.6 ms; 25-view
# 210 MB — min 25.0 vs windowed 31.3 ms). "auto" switches at this table
# size, a static shape property.
_GATE_VIA_MIN = "auto"
_GATE_MIN_TABLE_BYTES = 128 * 1024 * 1024


def gate_fns(light_positions, point_viewprojs, dir_viewprojs,
             atlas: jax.Array, bias=0.0):
    """(vis_all, vis_slot) pair for :func:`gate_refined_visibility`.

    vis_all(pos (..., 3)) -> (..., L) per-light visibility (channel-last);
    vis_slot(pos_c, li_c) -> (K, bh, bw) — both consumed through ``> 0``
    thresholds only, so on big atlases they compare against the 1-channel
    min-window map (:func:`gate_min_maps`; 1/4 the gather table and row
    bytes of the windowed ``atlas`` — the BASELINE-config-2 lever). One
    shared builder for the single-chip and sharded frames (keep-in-sync
    invariant)."""
    Pn = light_positions.shape[0] if light_positions is not None else 0
    pvp = point_viewprojs if Pn > 0 else None
    lp = light_positions if Pn > 0 else None
    use_min = (_GATE_VIA_MIN if _GATE_VIA_MIN != "auto" else
               atlas.size * atlas.dtype.itemsize >= _GATE_MIN_TABLE_BYTES)
    if use_min:
        table = gate_min_maps(atlas)
        multi, slot = shadow_multi_gate, make_vis_slot_gate
    else:
        table = atlas
        multi, slot = shadow_multi, make_vis_slot

    def vis_all(p):
        return jnp.moveaxis(
            multi(p, lp, pvp, dir_viewprojs, table, bias=bias), 0, -1)

    return vis_all, slot(lp, pvp, dir_viewprojs, table, bias=bias)


def make_vis_slot(light_positions, point_viewprojs, dir_viewprojs,
                  atlas: jax.Array, bias=0.0):
    """Build the per-slot exact-visibility callback for the batched gate
    refinement: vis_slot(pos_c (K, bh, bw, 3), li_c (K,) int32) ->
    (K, bh, bw) visibility, where li_c indexes lights point-first (the
    engine's atlas view order). Each slot projects through ITS light's
    viewprojs (pure ALU) and all slots share ONE PCF gather round."""
    S = atlas.shape[-2]

    taps = _slot_taps(light_positions, point_viewprojs, dir_viewprojs, S)

    def vis_slot(pos_c: jax.Array, li_c: jax.Array) -> jax.Array:
        u, v, z, base, ok = taps(pos_c, li_c)
        vis = _compare_pcf(atlas, u, v, z, base=base, bias=bias)
        return jnp.where(ok, vis, 1.0)

    return vis_slot


def make_vis_slot_gate(light_positions, point_viewprojs, dir_viewprojs,
                       min_map: jax.Array, bias=0.0):
    """make_vis_slot's BINARY variant: min-window compare against
    :func:`gate_min_maps` (one 1-channel gather round). vis_slot_gate(
    pos_c, li_c) -> (K, bh, bw) bool; out-of-frustum slots lit."""
    S = min_map.shape[-1]
    taps = _slot_taps(light_positions, point_viewprojs, dir_viewprojs, S)

    def vis_slot_gate(pos_c: jax.Array, li_c: jax.Array) -> jax.Array:
        u, v, z, base, ok = taps(pos_c, li_c)
        lit = _compare_gate(min_map, u, v, z, base=base, bias=bias)
        return lit | ~ok

    return vis_slot_gate


def _slot_taps(light_positions, point_viewprojs, dir_viewprojs, S: int):
    """Per-(block, light)-slot tap coordinates for the gate refinement:
    taps(pos_c (K, bh, bw, 3), li_c (K,) i32) -> (u, v, z, flat base, ok).
    Each slot projects through ITS light's viewprojs (pure ALU); shared
    by make_vis_slot (PCF) and make_vis_slot_gate (min-window)."""
    Pn = point_viewprojs.shape[0] if point_viewprojs is not None else 0
    D = dir_viewprojs.shape[0] if dir_viewprojs is not None else 0

    def taps(pos_c: jax.Array, li_c: jax.Array):
        ph = jnp.concatenate([pos_c, jnp.ones_like(pos_c[..., :1])], axis=-1)
        u = v = z = base = ok = None
        if Pn:
            pi = jnp.clip(li_c, 0, Pn - 1)
            lp = jnp.take(light_positions, pi, axis=0)       # (K, 3)
            d = pos_c - lp[:, None, None, :]
            face, u, v, z, m = _cube_uvz_closed(d)
            base = (pi[:, None, None] * 6 + face) * (S * S)
            ok = m > 0.0
        if D:
            di = jnp.clip(li_c - Pn, 0, D - 1)
            if D == 1:
                # one directional light (every bundled scene): all slots
                # share the same matrix — a plain (K*P, 4) @ (4, 4) matmul
                # instead of the per-slot matrix gather + K-batched einsum
                # (whose (K, hw, 4) batch output needed a relayout copy)
                c = jnp.einsum("khwj,ij->khwi", ph, dir_viewprojs[0],
                               preferred_element_type=F32)
            else:
                vpd = jnp.take(dir_viewprojs, di, axis=0)    # (K, 4, 4)
                c = jnp.einsum("khwj,kij->khwi", ph, vpd,
                               preferred_element_type=F32)
            ud, vd, zd, w = _ndc_uvz(c)
            based = jnp.broadcast_to(
                ((6 * Pn + di) * (S * S))[:, None, None], ud.shape)
            # outside the ortho box -> lit (directional_shadow semantics)
            okd = (ud >= 0.0) & (ud <= 1.0) & (vd >= 0.0) & (vd <= 1.0) \
                & (w > 0.0)
            if Pn:
                is_dir = (li_c >= Pn)[:, None, None]
                u = jnp.where(is_dir, ud, u)
                v = jnp.where(is_dir, vd, v)
                z = jnp.where(is_dir, zd, z)
                base = jnp.where(is_dir, based, base)
                # dir outside-box and point behind-face both force lit
                ok = jnp.where(is_dir, okd, ok)
            else:
                u, v, z, base, ok = ud, vd, zd, based, okd
        return u, v, z, base, ok

    return taps


def directional_shadow(world_pos: jax.Array, viewproj: jax.Array,
                       shadow_map: jax.Array, bias=0.0) -> jax.Array:
    """main.wgsl:75-96 get_directional_light_shadow_value (sans the x-flip,
    which our consistent bake convention eliminates)."""
    u, v, z, w = _project(world_pos, viewproj)
    vis = _compare_pcf(shadow_map, u, v, z, bias=bias)
    inside = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0) & (w > 0.0)
    return jnp.where(inside, vis, 1.0)


def _point_taps(world_pos: jax.Array, light_positions: jax.Array,
                viewprojs: jax.Array, S: int):
    """Cube-face tap coordinates for all P point lights at once.

    Returns ((P, ...) u, v, z, flat window base, outside-mask pass-lit
    condition) — the pure-ALU half of the point lookup, shared by
    point_shadow_multi and shadow_multi. ``viewprojs`` is unused (kept
    for signature stability): the standard cube frusta admit the
    closed-form projection (:func:`_cube_uvz_closed`)."""
    del viewprojs
    Pn = light_positions.shape[0]
    d = world_pos[None, ...] - light_positions[
        (slice(None),) + (None,) * (world_pos.ndim - 1) + (slice(None),)]
    face, u, v, z, m = _cube_uvz_closed(d)

    light_idx = jnp.arange(Pn, dtype=I32)[
        (slice(None),) + (None,) * (world_pos.ndim - 1)]
    base = (light_idx * 6 + face) * (S * S)
    return u, v, z, base, m > 0.0


def point_shadow_multi(world_pos: jax.Array, light_positions: jax.Array,
                       viewprojs: jax.Array, atlas: jax.Array,
                       bias=0.0) -> jax.Array:
    """All point lights' cube shadow lookups in ONE gather round.

    world_pos: (..., 3); light_positions: (P, 3); viewprojs: (P, 6, 4, 4);
    atlas: (P*6, S, S, 4) windowed (the first 6P views of the engine's
    atlas). Returns (P, ...) visibility. Batching all lights into a single
    `take` (instead of P sequential lookup passes) is the multi-light lever
    for BASELINE config 2: the projections run as one einsum and the PCF
    rows gather with per-pixel (light, face) offsets in one call.
    """
    S = atlas.shape[-2]
    u, v, z, base, inside = _point_taps(world_pos, light_positions,
                                        viewprojs, S)
    vis = _compare_pcf(atlas, u, v, z, base=base, bias=bias)
    return jnp.where(inside, vis, 1.0)


def shadow_multi(world_pos: jax.Array, light_positions: jax.Array,
                 point_viewprojs: jax.Array, dir_viewprojs: jax.Array,
                 atlas: jax.Array, bias=0.0) -> jax.Array:
    """EVERY light's shadow lookup — P point cubes AND D directionals —
    in ONE gather round against the full windowed atlas.

    The per-pixel row count is P+D either way (each light owns its tap),
    but issuing them as one `take` removes the D extra gather dispatches
    and their fusion boundaries that per-light directional_shadow calls
    cost (main.wgsl:225-250 is one loop over one texture for the same
    reason). atlas: (6P+D, S, S, 4) in engine view order (points first).
    Returns (P+D, ...) visibility, point lights first.
    """
    u, v, z, base, inside = _multi_taps(world_pos, light_positions,
                                        point_viewprojs, dir_viewprojs,
                                        atlas.shape[-2])
    vis = _compare_pcf(atlas, u, v, z, base=base, bias=bias)
    return jnp.where(inside, vis, 1.0)


def _multi_taps(world_pos, light_positions, point_viewprojs, dir_viewprojs,
                S: int):
    """All lights' tap coordinates, point-first: ((P+D, ...) u, v, z,
    flat layer base, inside). The pure-ALU half shared by shadow_multi
    (PCF fractions) and shadow_multi_gate (binary min-window gate)."""
    Pn = light_positions.shape[0] if point_viewprojs is not None else 0
    us, vs, zs, bases, insides = [], [], [], [], []
    if Pn:
        u, v, z, base, inside = _point_taps(world_pos, light_positions,
                                            point_viewprojs, S)
        us.append(u); vs.append(v); zs.append(z)
        bases.append(base); insides.append(inside)
    D = dir_viewprojs.shape[0] if dir_viewprojs is not None else 0
    for i in range(D):
        u, v, z, w = _project(world_pos, dir_viewprojs[i])
        inside = (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0) & (w > 0.0)
        us.append(u[None]); vs.append(v[None]); zs.append(z[None])
        bases.append(jnp.full(u.shape, (6 * Pn + i) * S * S, I32)[None])
        insides.append(inside[None])
    return (jnp.concatenate(us), jnp.concatenate(vs), jnp.concatenate(zs),
            jnp.concatenate(bases), jnp.concatenate(insides))


def shadow_multi_gate(world_pos: jax.Array, light_positions: jax.Array,
                      point_viewprojs: jax.Array, dir_viewprojs: jax.Array,
                      min_map: jax.Array, bias=0.0) -> jax.Array:
    """shadow_multi's BINARY gate: same taps, min-window compare against
    :func:`gate_min_maps` — one 1-channel gather round. Returns
    (P+D, ...) bool, point lights first; outside-frustum taps are lit.
    Equals ``shadow_multi(...) > 0`` except on exactly-zero bilinear
    weights (see gate_min_maps)."""
    u, v, z, base, inside = _multi_taps(world_pos, light_positions,
                                        point_viewprojs, dir_viewprojs,
                                        min_map.shape[-1])
    lit = _compare_gate(min_map, u, v, z, base=base, bias=bias)
    return lit | ~inside


def point_shadow(world_pos: jax.Array, light_pos: jax.Array,
                 face_viewprojs: jax.Array, face_maps: jax.Array,
                 bias=0.0) -> jax.Array:
    """Cube shadow lookup (main.wgsl:98-117): select the face by the major
    axis of (fragment - light), then compare through that face's own
    viewproj — bake/lookup exactness by construction.

    face_viewprojs: (6, 4, 4); face_maps: (6, S, S, 4) windowed.
    """
    d = world_pos - light_pos[None, None, :]
    ax = jnp.abs(d)
    is_x = (ax[..., 0] >= ax[..., 1]) & (ax[..., 0] >= ax[..., 2])
    is_y = (ax[..., 1] > ax[..., 0]) & (ax[..., 1] >= ax[..., 2])
    face = jnp.where(is_x, jnp.where(d[..., 0] >= 0, 0, 1),
                     jnp.where(is_y, jnp.where(d[..., 1] >= 0, 2, 3),
                               jnp.where(d[..., 2] >= 0, 4, 5))).astype(I32)

    # Project through every face's viewproj (pure ALU, no memory traffic),
    # select the owning face's (u, v, z, w) by mask, then do ONE 4-tap PCF
    # against the flattened face atlas with a per-pixel layer offset.
    S = face_maps.shape[-2]
    u = v = z = w = None
    for f in range(6):
        uf, vf, zf, wf = _project(world_pos, face_viewprojs[f])
        if u is None:
            u, v, z, w = uf, vf, zf, wf
        else:
            m = face == f
            u = jnp.where(m, uf, u)
            v = jnp.where(m, vf, v)
            z = jnp.where(m, zf, z)
            w = jnp.where(m, wf, w)
    vis = _compare_pcf(face_maps, u, v, z, base=face * (S * S), bias=bias)
    return jnp.where(w > 0.0, vis, 1.0)
