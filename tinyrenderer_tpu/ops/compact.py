"""Block-compacted screen-space work scheduling.

TPU random gathers pay per issued row (~4-13 ms per full-res 1080p tap on a
v5e), so per-pixel texture taps set the frame-time floor. But most screen
blocks need no taps at all — flat-material surfaces and background cover
the bulk of typical frames (the reference's own test.lvl is 43/50 flat
cubes). This module lets a pass run its gathers only on the blocks that
need them:

1. split the (H, W) pixel grid into small VPU-aligned blocks,
2. reduce a per-pixel ``need`` mask to a per-block predicate,
3. select up to ``capacity`` needed blocks into a static work list
   (the same sort-based top-K the raster binning uses),
4. gather those blocks' inputs, run the taps on the (K, bh, bw) compacted
   domain, and scatter the results back (block gathers move whole rows of
   kilobytes, so they are bandwidth-bound, not row-bound — the overhead is
   ~2 extra passes over the data, well under one tap).

The selection is data-dependent but every shape is static; when no block
overflows the capacity the result is bit-exact with the dense computation.
``needed`` (the number of blocks that wanted work) is returned as a
capacity monitor so the engine can grow — and shrink — the envelope, the
same grow-by-reallocating loop the raster bins use.

This is the TPU answer to what a GPU gets from per-quad dynamic branching
in a fragment shader (the reference's flat-material path simply never
issues texture instructions, gbuffer_geometry_flat_parameter.wgsl): XLA has
no divergent control flow, so the "branch" becomes a static-capacity
compaction.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

F32 = jnp.float32
I32 = jnp.int32

# candidate block widths, largest first (all divide any padded frame width:
# padded widths are multiples of 128, strided grids of at least 16)
_BLOCK_H = 8
_BLOCK_WIDTHS = (128, 64, 32, 16)


def block_dims(height: int, width: int) -> Optional[tuple[int, int]]:
    """Pick (bh, bw) VPU-aligned block dims dividing the grid, or None."""
    if height % _BLOCK_H != 0:
        return None
    for bw in _BLOCK_WIDTHS:
        if width % bw == 0:
            return _BLOCK_H, bw
    return None


def to_blocks(img: jax.Array, bh: int, bw: int) -> jax.Array:
    """(H, W, *C) -> (N, bh, bw, *C) row-major blocks."""
    H, W = img.shape[0], img.shape[1]
    rest = img.shape[2:]
    x = img.reshape(H // bh, bh, W // bw, bw, *rest)
    x = jnp.moveaxis(x, 2, 1)                      # (H/bh, W/bw, bh, bw, *C)
    return x.reshape((H // bh) * (W // bw), bh, bw, *rest)


def from_blocks(blocks: jax.Array, height: int, width: int) -> jax.Array:
    """(N, bh, bw, *C) -> (H, W, *C)."""
    _, bh, bw = blocks.shape[:3]
    rest = blocks.shape[3:]
    x = blocks.reshape(height // bh, width // bw, bh, bw, *rest)
    x = jnp.moveaxis(x, 1, 2)
    return x.reshape(height, width, *rest)


class BlockPlan(NamedTuple):
    slots: jax.Array   # (K,) i32 block index per work slot (-1 = empty)
    inv: jax.Array     # (N,) i32 work slot per block (-1 = not selected)
    needed: jax.Array  # () i32 blocks that wanted work (capacity monitor)


def plan_blocks(need: jax.Array, capacity: int) -> BlockPlan:
    """Select up to ``capacity`` of the blocks where ``need`` (N,) is set."""
    N = need.shape[0]
    order = jnp.where(need, jnp.arange(N, dtype=I32), N)
    if N < capacity:
        order = jnp.pad(order, (0, capacity - N), constant_values=N)
    raw = jnp.sort(order)[:capacity]               # (K,) selected, N-padded
    slots = jnp.where(raw < N, raw, -1)
    inv = jnp.full((N + 1,), -1, I32).at[raw].set(
        jnp.arange(capacity, dtype=I32))[:N]
    return BlockPlan(slots=slots, inv=inv,
                     needed=jnp.sum(need.astype(I32)))


def gather_blocks(blocks: jax.Array, plan: BlockPlan) -> jax.Array:
    """(N, bh, bw, *C) -> (K, bh, bw, *C) work-list gather (empty slots 0).

    The gather runs on a 2D (N, bh*bw*C) flattening: XLA assigns >2D
    gather operands layouts with the block dim minor (each block's texels
    strided through memory — the 1080p trace showed a 4.7 MB position
    block gather costing 0.92 ms that way); 2D row tables get row-major
    layouts and move at block-DMA bandwidth."""
    N = blocks.shape[0]
    g = jnp.take(blocks.reshape(N, -1),
                 jnp.clip(plan.slots, 0, N - 1), axis=0)
    g = g.reshape((plan.slots.shape[0],) + blocks.shape[1:])
    mask = (plan.slots >= 0).reshape((-1,) + (1,) * (blocks.ndim - 1))
    return jnp.where(mask, g, 0)


def scatter_blocks(work: jax.Array, plan: BlockPlan, fill=0.0) -> jax.Array:
    """(K, bh, bw, *C) -> (N, bh, bw, *C); unselected blocks get ``fill``.
    2D-flattened gather for the same layout reason as gather_blocks."""
    N = plan.inv.shape[0]
    K = work.shape[0]
    out = jnp.take(work.reshape(K, -1),
                   jnp.clip(plan.inv, 0, K - 1), axis=0)
    out = out.reshape((N,) + work.shape[1:])
    mask = (plan.inv >= 0).reshape((N,) + (1,) * (work.ndim - 1))
    return jnp.where(mask, out, fill)


def sample_pool_compacted(pool, rec: jax.Array, uv: jax.Array,
                          level_f: jax.Array, need: jax.Array,
                          capacity: int, filter: str = "dithered",
                          wrap: bool = True, duv: jax.Array = None,
                          channel_first: bool = False
                          ) -> tuple[jax.Array, jax.Array]:
    """Mip-filtered material sampling, gathering only on needed blocks.

    rec/need: (H, W); uv: (H, W, 2); level_f: (H, W) fractional mip level.
    ``need`` drives block selection only: every pixel of a selected block
    is sampled (bit-exact with the dense sampler there), unselected blocks
    return 0 — callers that later interpolate across pixels (strided
    texture_scale grids) must dilate ``need`` accordingly. Returns
    ((H, W, C) samples, () i32 needed-block count). ``capacity`` <= 0 or
    >= the block count falls back to the dense sampler (no overhead,
    monitor still reported).
    """
    from . import sampling

    H, W = need.shape
    dims = block_dims(H, W)
    n_blocks = 0 if dims is None else (H // dims[0]) * (W // dims[1])
    if dims is None or capacity <= 0 or capacity >= n_blocks:
        # dense fallback: the sampler can emit (C, H, W) natively for the
        # fused shading kernel (skips the full-res channel relayout)
        out = sampling.sample_pool_mip(pool, rec, uv, level_f, wrap=wrap,
                                       filter=filter, duv=duv,
                                       channel_first=channel_first)
        if dims is None:
            needed = jnp.int32(0)
        else:
            bh, bw = dims
            needed = jnp.sum(jnp.any(to_blocks(need, bh, bw),
                                     axis=(1, 2)).astype(I32))
        return out, needed

    bh, bw = dims
    plan = plan_blocks(jnp.any(to_blocks(need, bh, bw), axis=(1, 2)),
                       capacity)
    uv_c = gather_blocks(to_blocks(uv, bh, bw), plan)
    rec_c = gather_blocks(to_blocks(rec, bh, bw), plan)
    lvl_c = gather_blocks(to_blocks(level_f, bh, bw), plan)
    # blocks are origin-aligned multiples of (bh, bw) with 4 | bh, bw, so
    # the Bayer thresholds inside the sampler tile identically to the
    # dense path — compaction stays bit-exact on selected blocks.
    # native pool: the per-record exact level needs the raw uv derivatives
    # at the compacted pixels — 4 extra f32 channels through the block
    # gather (quality path; the pyramid pool compacts only the scalar level)
    duv_c = None if duv is None else gather_blocks(to_blocks(duv, bh, bw),
                                                   plan)
    out_c = sampling.sample_pool_mip(pool, rec_c, uv_c, lvl_c, wrap=wrap,
                                     filter=filter, duv=duv_c)
    out = from_blocks(scatter_blocks(out_c, plan), H, W)
    if channel_first:
        out = jnp.moveaxis(out, -1, 0)
    return out, plan.needed


def dilate_mask(mask: jax.Array) -> jax.Array:
    """(H, W) bool -> 3x3 max-dilated (clamped edges). Used to widen a
    block-selection mask so downstream bilinear interpolation across a
    strided grid never reads an unselected (zeroed) neighbor."""
    m = mask
    m = m | jnp.roll(m, 1, axis=0).at[0, :].set(False) \
          | jnp.roll(m, -1, axis=0).at[-1, :].set(False)
    m = m | jnp.roll(m, 1, axis=1).at[:, 0].set(False) \
          | jnp.roll(m, -1, axis=1).at[:, -1].set(False)
    return m
