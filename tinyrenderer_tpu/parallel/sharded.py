"""Multi-chip frame rendering: shard_map over a (dp, sp) device mesh.

The reference is a single-GPU engine (SURVEY.md §2.4) — there is nothing to
translate here, so this layer is designed TPU-first from scratch:

- **dp (data parallel)**: a *batch of views* is sharded over the ``dp`` mesh
  axis — multi-camera rendering (cubemap bakes, stereo, multi-viewport
  editors) with zero cross-talk.
- **sp (spatial parallel)**: each frame's pixel grid is split into
  horizontal *bands* of raster tiles, one band per device on the ``sp``
  axis. Geometry setup is tiny (≪1 MFLOP) and is replicated; rasterization,
  GBuffer resolve and PBR shading — the HBM- and FLOP-heavy stages — touch
  only the device's own rows. Triangle planes are affine, so a band is just
  a y-translation of the per-triangle setup (raster.translate_setup_y).
- **shadow views** (6·P + D depth maps) are sharded round-robin over the
  *flattened* (dp, sp) grid and combined with one tiled ``all_gather`` over
  ICI — the only collective in the steady-state frame.

SSR crosses band boundaries (the ray march taps arbitrary screen rows), so
the sharded band all_gathers the frame's depth + pre-SSR HDR over ``sp``
as tap buffers — two more tiled ICI collectives, only when cfg.enable_ssr
(the reference ships SSR as an effective pass-through,
src/shaders/screen_space_reflection.wgsl:135).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .. import config
from ..ops import compact, sampling
from ..ops import env as envops
from ..ops import post, raster, resolve, shading, shadows
from ..render import frame as framelib
from ..render.scene_gpu import LightsGPU, SceneGPU

F32 = jnp.float32
I32 = jnp.int32


def make_mesh(n_devices: Optional[int] = None, dp: int = 1) -> Mesh:
    """Build a (dp, sp) mesh from the first ``n_devices`` local devices."""
    devs = jax.devices()
    n = n_devices if n_devices is not None else len(devs)
    if n % dp != 0:
        raise ValueError(f"n_devices={n} not divisible by dp={dp}")
    arr = np.array(devs[:n]).reshape(dp, n // dp)
    return Mesh(arr, ("dp", "sp"))


def sharded_config(cfg: config.RenderConfig, n_sp: int) -> config.RenderConfig:
    """Pad the frame height so the tile rows divide evenly over ``sp``.

    The fused shading kernel runs per band (same kernel the single-chip
    default frame ships — VERDICT r4 #6) whenever the band height can host
    its minimum block (16 sublanes for bf16 attrs, 8 for f32); bands too
    short for it fall back to the unfused chain (identical math)."""
    rows_per_dev = -(-cfg.tiles_y // n_sp)
    band_h = rows_per_dev * cfg.tile_h
    from dataclasses import replace
    min_bh = 16 if cfg.bf16_attrs else 8
    return replace(cfg, height=rows_per_dev * n_sp * cfg.tile_h,
                   fused_shading=cfg.fused_shading and band_h % min_bh == 0)


class ShardedFrameOutput(NamedTuple):
    sdr: jax.Array      # (B, H, W, 3) uint8
    pick_id: jax.Array  # (B, H, W) int32
    depth: jax.Array    # (B, H, W) f32
    hdr: jax.Array      # (B, H, W, 3) f32
    bin_overflow: jax.Array     # () i32 max bin occupancy across bands
    shadow_overflow: jax.Array  # () i32 max shadow bin occupancy across views
    tex_overflow: jax.Array     # (2,) i32 max [main, fwd] textured blocks
    big_overflow: jax.Array     # () i32 max big-triangle count (scatter
    #   binning's cfg.bin_big_capacity monitor)
    shadow_blocks: jax.Array    # () i32 max shadow-boundary blocks wanted
    #   (cfg.shadow_block_capacity monitor)
    stream_overflow: jax.Array  # () i32 max CSR stream pairs wanted across
    #   bands (cfg.stream_capacity monitor; 0 on the dense path)


def _render_band(scene: SceneGPU, pool, lights: LightsGPU, atlas,
                 camera_raw, params, env, y0, cfg: config.RenderConfig,
                 band_h: int, proj_h: Optional[int] = None):
    """Rasterize + shade rows [y0, y0 + band_h) of one camera's frame.

    Mirrors frame.render_frame's pass sequence (which mirrors
    src/world_renderer.rs:194-371) but confined to one horizontal band.

    ``proj_h``: height (pixels) the NDC y range maps onto. Defaults to the
    config's padded height; the render-scale path passes the *single-chip*
    padded height so the band-divisibility padding adds off-screen rows
    below the frame instead of rescaling the projection (keeping sharded
    output pixel-consistent with render_frame at the same render scale).
    """
    cam = framelib._unpack_camera(camera_raw)
    PW, PH = cfg.padded_width, (proj_h or cfg.padded_height)

    world, clip, attrs = framelib.geometry_stage(scene, cam["view_proj"])

    def band_raster(tri_vidx, tri_mask, cull):
        setup = raster.triangle_setup(clip, tri_vidx, tri_mask, PW, PH, cull)
        setup = raster.translate_setup_y(setup, y0)
        bins = raster.bin_triangles(setup, PW, band_h, cfg.tile_h, cfg.tile_w,
                                    cfg.bin_capacity, cfg.bin_big_capacity)
        tri_id, depth = raster.rasterize_binned(bins, cfg.tile_h, cfg.tile_w,
                                                use_pallas=cfg.use_pallas)
        return tri_id, depth, setup, bins

    use_fused = framelib._use_fused_shading(cfg) and atlas is not None
    if use_fused:
        # fused-shading band (keep-in-sync with frame._render_frame_fused):
        # raw channel-first select+eval + block-compacted material sample;
        # the per-pixel shading tail runs as ONE VMEM Pallas pass — the
        # same kernel the single-chip default frame ships (VERDICT r4 #6),
        # band-local by construction (no cross-pixel reads).
        setup = raster.triangle_setup(clip, scene.tri_vidx,
                                      scene.tri_deferred, PW, PH, "back")
        setup = raster.translate_setup_y(setup, y0)
        table = resolve.build_gbuffer_table(
            setup, scene.tri_vidx, attrs, scene.tri_instance,
            scene.inst_object_id, scene.inst_material, scene.mat_record,
            scene.mat_flat)
        if (cfg.stream_raster
                and raster.stream_pays_off(scene.tri_vidx.shape[0])):
            bins = raster.bin_triangles_stream(
                setup, PW, band_h, cfg.tile_h, cfg.tile_w,
                cfg.stream_capacity, cfg.bin_big_capacity)
            ty, tx = bins.counts.shape
            tri_id, depth = raster.rasterize_stream(
                bins, ty, tx, cfg.tile_h, cfg.tile_w, kmax=cfg.bin_capacity)
            outf_c, outh_c = resolve.select_eval_stream(
                tri_id, bins, table, cfg.tile_h, cfg.tile_w,
                kmax=cfg.bin_capacity, bf16=cfg.bf16_attrs, raw=True)
        else:
            bins = raster.bin_triangles(setup, PW, band_h, cfg.tile_h,
                                        cfg.tile_w, cfg.bin_capacity,
                                        cfg.bin_big_capacity)
            tri_id, depth = raster.rasterize_binned(bins, cfg.tile_h,
                                                    cfg.tile_w,
                                                    use_pallas=True)
            outf_c, outh_c = resolve.select_eval_pallas(
                tri_id, bins.ids, table, cfg.tile_h, cfg.tile_w,
                counts=bins.counts, bf16=cfg.bf16_attrs, raw=True)
        g = None
        outf = jnp.moveaxis(outf_c, 0, -1)              # (band_h, PW, 7)
        valid = tri_id >= 0
        g_pos = jnp.where(valid[..., None], outf[..., 0:3], 0.0)
        uv = outf[..., 3:5]
        record = jnp.round(outf[..., 5]).astype(I32)
        pick = jnp.where(valid, jnp.round(outf_c[6]).astype(I32), 0)
        use_tex = outh_c[14].astype(F32) > 0.5
        if cfg.any_textured:
            lvl = sampling.mip_level_from_uv(uv, pool.level_sizes[0])
            duv = (sampling.uv_derivatives(uv)
                   if isinstance(pool, sampling.NativeTexturePoolGPU)
                   else None)
            rec, tex_needed = compact.sample_pool_compacted(
                pool, record, uv, lvl, use_tex & valid,
                cfg.tex_block_capacity, filter=cfg.texture_filter, duv=duv)
            rec_c = jnp.moveaxis(rec, -1, 0)            # (9, band_h, PW)
        else:
            rec_c = None
            tex_needed = jnp.int32(0)
    elif cfg.use_pallas and cfg.fused_resolve:
        # fused raster+resolve kernel, like the single-chip path
        setup = raster.triangle_setup(clip, scene.tri_vidx,
                                      scene.tri_deferred, PW, PH, "back")
        setup = raster.translate_setup_y(setup, y0)
        bins = raster.bin_triangles(setup, PW, band_h, cfg.tile_h, cfg.tile_w,
                                    cfg.bin_capacity, cfg.bin_big_capacity)
        table = resolve.build_gbuffer_table(
            setup, scene.tri_vidx, attrs, scene.tri_instance,
            scene.inst_object_id, scene.inst_material, scene.mat_record,
            scene.mat_flat)
        D = table.shape[1]
        pad = (-D) % 64
        table_p = jnp.pad(table, ((0, 0), (0, pad))) if pad else table
        tri_id, depth, sel = raster.rasterize_resolve_binned(
            bins, table_p, cfg.tile_h, cfg.tile_w)
        r = resolve.resolve_attrs_from_sel(tri_id, sel[..., :D])
        g, tex_needed = resolve.resolve_gbuffer_from_attrs(
            r, tri_id, depth, pool,
            texture_filter=cfg.texture_filter,
            texture_scale=cfg.texture_scale,
            tex_block_capacity=cfg.tex_block_capacity,
            sample_textures=cfg.any_textured)
    elif (cfg.use_pallas and cfg.stream_raster
          and raster.stream_pays_off(scene.tri_vidx.shape[0])):
        # CSR stream path, like frame._raster_resolve (keep-in-sync)
        setup = raster.triangle_setup(clip, scene.tri_vidx,
                                      scene.tri_deferred, PW, PH, "back")
        setup = raster.translate_setup_y(setup, y0)
        bins = raster.bin_triangles_stream(
            setup, PW, band_h, cfg.tile_h, cfg.tile_w, cfg.stream_capacity,
            cfg.bin_big_capacity)
        ty, tx = bins.counts.shape
        tri_id, depth = raster.rasterize_stream(
            bins, ty, tx, cfg.tile_h, cfg.tile_w, kmax=cfg.bin_capacity)
        table = resolve.build_gbuffer_table(
            setup, scene.tri_vidx, attrs, scene.tri_instance,
            scene.inst_object_id, scene.inst_material, scene.mat_record,
            scene.mat_flat)
        r = resolve.resolve_attrs_stream(tri_id, bins, table, cfg.tile_h,
                                         cfg.tile_w, kmax=cfg.bin_capacity,
                                         bf16=cfg.bf16_attrs)
        g, tex_needed = resolve.resolve_gbuffer_from_attrs(
            r, tri_id, depth, pool,
            texture_filter=cfg.texture_filter,
            texture_scale=cfg.texture_scale,
            tex_block_capacity=cfg.tex_block_capacity,
            sample_textures=cfg.any_textured)
    else:
        tri_id, depth, setup, bins = band_raster(scene.tri_vidx,
                                                 scene.tri_deferred, "back")
        g, tex_needed = resolve.resolve_gbuffer_onehot(
            tri_id, depth, setup, bins.ids, scene.tri_vidx,
            scene.tri_instance, attrs, scene.inst_object_id,
            scene.inst_material, scene.mat_record, scene.mat_flat, pool,
            cfg.tile_h, cfg.tile_w,
            texture_filter=cfg.texture_filter,
            texture_scale=cfg.texture_scale,
            tex_block_capacity=cfg.tex_block_capacity,
            use_pallas=cfg.use_pallas, counts=bins.counts,
            bf16=cfg.bf16_attrs, sample_textures=cfg.any_textured)
    bin_overflow = bins.overflow
    big_overflow = bins.big_overflow
    stream_overflow = getattr(bins, "stream_overflow", jnp.int32(0))

    Pn, D = cfg.num_point_lights, cfg.num_directional_lights
    point_shadow_fn = dir_shadow_fn = None
    gates_c = None
    shadow_blocks = jnp.int32(0)
    if cfg.enable_shadows and (Pn + D) > 0 and atlas is not None:
        # same batched-gate path as render_frame (keep-in-sync invariant):
        # one coarse strided pass + boundary-block refinement per band
        vis_all, vis_slot = shadows.gate_fns(
            lights.point_position[:Pn],
            lights.shadow_viewprojs[:6 * Pn].reshape(Pn, 6, 4, 4)
            if Pn > 0 else None,
            lights.dir_viewproj[:D] if D > 0 else None, atlas,
            bias=params[framelib.PARAM_SHADOW_BIAS])

        # coarse-gate halo exchange: a band's boundary coarse cells must
        # see the NEIGHBOR band's gates for edge detection, or blocks the
        # single-chip frame refines at band seams are silently skipped
        # (keep-in-sync invariant; one (1, wl, L) u8 ppermute each way)
        nsp = (proj_h or cfg.padded_height) // band_h

        def halo_exchange(lo):
            u8 = lo.astype(jnp.uint8)
            above = jax.lax.ppermute(
                u8[-1:], "sp", [(k, k + 1) for k in range(nsp - 1)])
            below = jax.lax.ppermute(
                u8[:1], "sp", [(k + 1, k) for k in range(nsp - 1)])
            sp_i = jax.lax.axis_index("sp")
            # frame top/bottom: duplicate own row (the edge-mode pad the
            # single-chip path applies at the frame border)
            above = jnp.where(sp_i == 0, u8[:1], above)
            below = jnp.where(sp_i == nsp - 1, u8[-1:], below)
            return above, below

        gates, shadow_blocks = shadows.gate_refined_visibility(
            vis_all, vis_slot, g_pos if use_fused else g.position,
            cfg.shadow_lookup_scale, cfg.shadow_block_capacity,
            halo_exchange=halo_exchange if nsp > 1 else None,
            block_dims=(cfg.gate_block_h, cfg.gate_block_w),
            channel_first=use_fused)
        if use_fused:
            gates_c = gates
        else:
            def point_shadow_fn(i, pos):  # noqa: E306
                return gates[..., i]

            def dir_shadow_fn(i, pos):
                return gates[..., Pn + i]

    slights = shading.ShadingLights(
        point_position=lights.point_position, point_color=lights.point_color,
        dir_direction=lights.dir_direction, dir_color=lights.dir_color,
        dir_viewproj=lights.dir_viewproj)
    irradiance = env.irradiance_sh if (env is not None and cfg.enable_ibl) else None

    def band_sky():
        if env is None:
            return None
        dims = compact.block_dims(band_h, PW)
        if cfg.sky_block_capacity > 0 and dims is not None:
            # block-compacted EXACT sky, band-local (frame._sky_image):
            # directions are closed-form in (y0-offset) pixel coords, so
            # each band plans its own background blocks with the full
            # frame capacity (always sufficient — a band's background
            # block count is bounded by the frame's settled capacity)
            bh, bw = dims
            nby, nbx = band_h // bh, PW // bw
            valid_band = tri_id >= 0
            need = jnp.any(compact.to_blocks(~valid_band, bh, bw),
                           axis=(1, 2))
            plan = compact.plan_blocks(
                need, min(cfg.sky_block_capacity, nby * nbx))
            cols = envops.skybox_colors_blocks(
                env.env_cube, cam["proj_inv"], cam["view_inv"][:3, :3],
                plan.slots, bh, bw, nbx, PW, band_h, y0=y0,
                full_height=PH,
                rgbe_win=(env.sky_rgbe if cfg.sky_rgbe else None))
            return compact.from_blocks(compact.scatter_blocks(cols, plan),
                                       band_h, PW)
        s = cfg.sky_scale
        if s > 1:
            # render the low-res strip with ``e`` extra coarse rows above
            # and below (pure unprojection — rows outside the band are as
            # computable as inside; e = the upsample kernel's support:
            # bilinear 1, Catmull-Rom 2), emulate the frame-border clamp,
            # and crop the upsample back to the band: bit-identical to
            # the single-chip path's global upsample (a band-local
            # upsample reads clamped phantom rows at band seams otherwise)
            from ..ops import post as postops
            cubic = (cfg.sky_upsample == "cubic"
                     and PH % s == 0 and PW % s == 0)
            e = 2 if cubic else 1
            hl = band_h // s
            nsp = (proj_h or cfg.padded_height) // band_h
            strip = envops.skybox_colors(
                env.env_cube, cam["proj_inv"], cam["view_inv"][:3, :3],
                PW // s, hl + 2 * e, y0=y0 / s - float(e),
                full_height=PH // s,
                rgbe_win=(env.sky_rgbe if cfg.sky_rgbe else None))
            sp_i = jax.lax.axis_index("sp")
            tops = [jnp.where(sp_i == 0, strip[e:e + 1], strip[r:r + 1])
                    for r in range(e)]
            bots = [jnp.where(sp_i == nsp - 1,
                              strip[e + hl - 1:e + hl],
                              strip[e + hl + r:e + hl + r + 1])
                    for r in range(e)]
            strip = jnp.concatenate(tops + [strip[e:e + hl]] + bots,
                                    axis=0)
            if cubic:
                up = postops.upsample_bicubic_int(strip, s, s)[:, :PW]
            else:
                up = framelib._upsample_bilinear(
                    strip, ((hl + 2 * e) * s, PW, 3))
            return up[e * s:e * s + band_h]
        return envops.skybox_colors(env.env_cube, cam["proj_inv"],
                                    cam["view_inv"][:3, :3], PW, band_h,
                                    y0=y0, full_height=PH,
                                    rgbe_win=(env.sky_rgbe if cfg.sky_rgbe
                                              else None))

    if use_fused:
        sky = band_sky()
        sky_c = None if sky is None else jnp.moveaxis(sky, -1, 0)
        hdr_c = shading.shade_deferred_fused(
            tri_id, outf_c, outh_c, rec_c, gates_c, sky_c, cam["position"],
            slights, Pn, D, irradiance)
        hdr = jnp.moveaxis(hdr_c, 0, -1)
    else:
        hdr = shading.shade_deferred(g, cam["position"], slights, Pn, D,
                                     irradiance, point_shadow_fn,
                                     dir_shadow_fn)
        sky = band_sky()
        if sky is not None:
            hdr = jnp.where(g.mask[..., None], hdr, sky)

    # forward pass (gizmos/billboards), band-local, own small triangle
    # pool, tile-compacted resolve like the single-chip path
    if not use_fused:
        pick = g.object_id
    fwd_needed = jnp.int32(0)
    if cfg.has_forward:
        f_id, _, f_setup, f_bins = band_raster(scene.fwd_tri_vidx,
                                               scene.fwd_tri_mask, "none")
        bin_overflow = jnp.maximum(bin_overflow, f_bins.overflow)
        big_overflow = jnp.maximum(big_overflow, f_bins.big_overflow)
        f_table = resolve.build_gbuffer_table(
            f_setup, scene.fwd_tri_vidx, attrs, scene.fwd_tri_instance,
            scene.inst_object_id, scene.inst_material, scene.mat_record,
            scene.mat_flat)
        hdr, pick, fwd_needed = resolve.forward_overlay_compose(
            hdr, pick, f_id, f_bins, f_table, pool, cfg.tile_h, cfg.tile_w,
            cfg.fwd_tile_capacity, texture_filter=cfg.texture_filter,
            fs=max(cfg.texture_scale, 2))

    if cfg.enable_ssr:
        # The SSR march taps arbitrary screen rows, which crosses band
        # boundaries: all_gather the frame's depth + HDR over ``sp`` (one
        # tiled ICI collective each) as the TAP buffers while the per-pixel
        # inputs stay band-local — post.screen_space_reflections' band mode.
        # Gathered rows beyond the projection grid (band-divisibility
        # padding) are cropped so v*rows matches the single-chip tap grid.
        full_depth = jax.lax.all_gather(depth, "sp", axis=0, tiled=True)[:PH]
        full_hdr = jax.lax.all_gather(hdr, "sp", axis=0, tiled=True)[:PH]
        hdr = post.screen_space_reflections(
            hdr, full_depth, g.position, g.normal, cam["view_proj"],
            cam["position"], params[framelib.PARAM_SSR_THICKNESS],
            params[framelib.PARAM_SSR_STRENGTH], mask=g.mask,
            roughness=g.rough_metal_ao[..., 0], tap_hdr=full_hdr,
            y0=y0.astype(I32))

    sdr = post.tone_map(hdr, params[framelib.PARAM_TONE_TYPE],
                        params[framelib.PARAM_EXPOSURE])
    return sdr, pick, depth, hdr, bin_overflow, \
        jnp.stack([tex_needed, fwd_needed]), big_overflow, shadow_blocks, \
        stream_overflow


def _atlas_roundrobin(scene: SceneGPU, lights: LightsGPU,
                      cfg: config.RenderConfig, flat, n_views: int,
                      views_pad: int, views_local: int):
    """Inside shard_map: each device rasterizes its round-robin share of
    the shadow views; one tiled all_gather over ICI replicates the atlas.
    Returns ((V, S, S, 4) windowed atlas, () i32 shadow-bin overflow)."""
    vp = lights.shadow_viewprojs
    vp_pad = jnp.concatenate(
        [vp, jnp.broadcast_to(jnp.eye(4, dtype=F32),
                              (views_pad - vp.shape[0], 4, 4))], axis=0)
    my_vp = jax.lax.dynamic_slice_in_dim(
        vp_pad, flat * views_local, views_local, axis=0)
    world = framelib.world_positions(scene)
    wh = jnp.concatenate([world, jnp.ones_like(world[:, :1])], axis=1)
    clip_views = jnp.einsum("vj,sij->svi", wh, my_vp,
                            preferred_element_type=F32)
    atlas_local, shadow_ovf, big_ovf = shadows.render_shadow_views(
        clip_views, scene.tri_vidx, scene.tri_shadow, cfg.shadow_size,
        cfg.shadow_tile, cfg.shadow_bin_capacity,
        use_pallas=cfg.use_pallas, big_capacity=cfg.bin_big_capacity)
    atlas = jax.lax.all_gather(atlas_local, ("dp", "sp"),
                               axis=0, tiled=True)[:n_views]
    win = shadows.window_depth_maps(atlas)
    if cfg.shadow_bf16:
        win = win.astype(jnp.bfloat16)
    return win, shadow_ovf, big_ovf


def render_shadow_atlas_sharded(scene: SceneGPU, lights: LightsGPU,
                                cfg: config.RenderConfig, mesh: Mesh
                                ) -> tuple[jax.Array, jax.Array]:
    """Render the shadow atlas once over the mesh (round-robin views +
    all_gather) and return it replicated, plus the shadow-bin overflow
    monitor. The multi-chip analog of frame.render_shadow_atlas — cache
    the result across frames and pass it to render_frame_sharded (shadow
    maps are camera-independent, engine caching semantics)."""
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    n_total = dp * sp
    n_views = cfg.num_shadow_views
    views_pad = -(-max(n_views, 1) // n_total) * n_total
    views_local = views_pad // n_total

    def fn(scene, lights):
        flat = jax.lax.axis_index("dp") * sp + jax.lax.axis_index("sp")
        atlas, ovf, big = _atlas_roundrobin(scene, lights, cfg, flat,
                                            n_views, views_pad, views_local)
        return (atlas, jax.lax.pmax(ovf, ("dp", "sp")),
                jax.lax.pmax(big, ("dp", "sp")))

    return shard_map(fn, mesh=mesh, in_specs=(P(), P()),
                     out_specs=(P(), P(), P()), check_vma=False)(scene, lights)


def render_frame_sharded(scene: SceneGPU, pool, lights: LightsGPU,
                         camera_raw_batch: jax.Array, params: jax.Array,
                         env: Optional[framelib.EnvGPU],
                         cfg: config.RenderConfig, mesh: Mesh,
                         atlas: Optional[jax.Array] = None,
                         proj_h: Optional[int] = None
                         ) -> ShardedFrameOutput:
    """Render a batch of views over the mesh. Call under ``jax.jit``.

    ``atlas``: precomputed windowed shadow atlas from
    :func:`render_shadow_atlas_sharded` (or the single-chip
    render_shadow_atlas) — shadow maps depend only on scene + lights, so
    the steady-state frame reuses them across frames like the single-chip
    engine does; None renders them inline (round-robin + all_gather)."""
    dp, sp = mesh.shape["dp"], mesh.shape["sp"]
    n_total = dp * sp
    B = camera_raw_batch.shape[0]
    if B % dp != 0:
        raise ValueError(f"camera batch {B} not divisible by dp={dp}")
    if cfg.render_scale_pct != 100:
        # Reduced internal resolution, same contract as render_frame: the
        # bands render at pct/100 scale, HDR upsamples bilinearly (pick/
        # depth nearest) at the jit level — XLA re-shards the resize.
        from dataclasses import replace
        pct = cfg.render_scale_pct
        lw = max(cfg.tile_w, (cfg.width * pct) // 100)
        lh = max(cfg.tile_h, (cfg.height * pct) // 100)
        # sharded_config may pad lh further for band divisibility; keep the
        # projection mapped onto the *single-chip* padded grid (proj_h) so
        # the extra band rows land below the frame instead of rescaling the
        # FOV, then crop to lh — pixel-consistent with render_frame.
        cfg_lo0 = replace(cfg, render_scale_pct=100, width=lw, height=lh)
        cfg_lo = sharded_config(cfg_lo0, sp)
        out = render_frame_sharded(scene, pool, lights, camera_raw_batch,
                                   params, env, cfg_lo, mesh, atlas,
                                   proj_h=cfg_lo0.padded_height)
        H, W = cfg.height, cfg.width
        # crop the band-divisibility padding back to the true low-res size
        # before upsampling, matching render_frame's crop-to-(lh, lw) —
        # otherwise the sharded frame is vertically rescaled vs single-chip.
        hdr = jax.image.resize(out.hdr[:, :lh, :lw], (B, H, W, 3),
                               method="bilinear")
        sdr = post.tone_map(hdr, params[framelib.PARAM_TONE_TYPE],
                            params[framelib.PARAM_EXPOSURE])
        pick = jax.image.resize(out.pick_id[:, :lh, :lw], (B, H, W),
                                method="nearest")
        depth = jax.image.resize(out.depth[:, :lh, :lw], (B, H, W),
                                 method="nearest")
        return ShardedFrameOutput(sdr=sdr, pick_id=pick, depth=depth,
                                  hdr=hdr, bin_overflow=out.bin_overflow,
                                  shadow_overflow=out.shadow_overflow,
                                  tex_overflow=out.tex_overflow,
                                  big_overflow=out.big_overflow,
                                  shadow_blocks=out.shadow_blocks,
                                  stream_overflow=out.stream_overflow)
    if cfg.tiles_y % sp != 0:
        raise ValueError(
            f"tiles_y={cfg.tiles_y} not divisible by sp={sp}; "
            "use sharded_config() to pad the height")
    band_h = cfg.padded_height // sp

    n_views = cfg.num_shadow_views if cfg.enable_shadows else 0
    views_pad = -(-max(n_views, 1) // n_total) * n_total
    views_local = views_pad // n_total

    def fn(scene, pool, lights, cam_local, params, env, atlas):
        dp_i = jax.lax.axis_index("dp")
        sp_i = jax.lax.axis_index("sp")
        flat = dp_i * sp + sp_i

        shadow_ovf = jnp.int32(0)
        shadow_big = jnp.int32(0)
        if atlas is None and cfg.enable_shadows and n_views > 0:
            atlas, shadow_ovf, shadow_big = _atlas_roundrobin(
                scene, lights, cfg, flat, n_views, views_pad, views_local)

        y0 = (sp_i * band_h).astype(F32)
        band = functools.partial(_render_band, scene, pool, lights, atlas,
                                 params=params, env=env, y0=y0, cfg=cfg,
                                 band_h=band_h, proj_h=proj_h)
        (sdr, pick, depth, hdr, bin_ovf, tex_ovf, big_ovf, shadow_blk,
         stream_ovf) = jax.vmap(lambda c: band(c))(cam_local)
        # capacity monitors reduce over the whole mesh (ADVICE r1: the
        # multi-chip path must not silently drop triangles either)
        bin_ovf = jax.lax.pmax(jnp.max(bin_ovf), ("dp", "sp"))
        shadow_ovf = jax.lax.pmax(shadow_ovf, ("dp", "sp"))
        tex_ovf = jax.lax.pmax(jnp.max(tex_ovf, axis=0), ("dp", "sp"))
        big_ovf = jax.lax.pmax(jnp.maximum(jnp.max(big_ovf), shadow_big),
                               ("dp", "sp"))
        shadow_blk = jax.lax.pmax(jnp.max(shadow_blk), ("dp", "sp"))
        stream_ovf = jax.lax.pmax(jnp.max(stream_ovf), ("dp", "sp"))
        return (sdr, pick, depth, hdr, bin_ovf, shadow_ovf, tex_ovf,
                big_ovf, shadow_blk, stream_ovf)

    spec_rep = P()
    out = shard_map(
        fn, mesh=mesh,
        in_specs=(spec_rep, spec_rep, spec_rep, P("dp"), spec_rep, spec_rep,
                  spec_rep),
        out_specs=(P("dp", "sp"), P("dp", "sp"), P("dp", "sp"), P("dp", "sp"),
                   spec_rep, spec_rep, spec_rep, spec_rep, spec_rep,
                   spec_rep),
        check_vma=False,
    )(scene, pool, lights, camera_raw_batch, params, env, atlas)

    H, W = cfg.height, cfg.width
    (sdr, pick, depth, hdr, bin_ovf, shadow_ovf, tex_ovf, big_ovf, sblk,
     stream_ovf) = out
    return ShardedFrameOutput(sdr=sdr[:, :H, :W], pick_id=pick[:, :H, :W],
                              depth=depth[:, :H, :W], hdr=hdr[:, :H, :W],
                              bin_overflow=bin_ovf, shadow_overflow=shadow_ovf,
                              tex_overflow=tex_ovf, big_overflow=big_ovf,
                              shadow_blocks=sblk,
                              stream_overflow=stream_ovf)


@functools.lru_cache(maxsize=4)
def compiled_sharded_frame(cfg: config.RenderConfig, mesh: Mesh):
    def fn(scene, pool, lights, cams, params, env, atlas=None):
        return render_frame_sharded(scene, pool, lights, cams, params, env,
                                    cfg, mesh, atlas)
    return jax.jit(fn)
