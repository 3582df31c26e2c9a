"""The frame graph: one jitted XLA program per RenderConfig.

The reference records one command encoder per frame (shadow passes ->
GBuffer raster -> pick pass -> deferred-shading compute -> skybox + forward
-> post-process chain -> copy out, src/world_renderer.rs:194-371). Here the
same pass sequence is function composition inside ``render_frame``; XLA
replaces the encoder, fuses the elementwise passes, and schedules the Pallas
raster kernels.

All mutable per-frame state (camera uniform, light arrays, global params)
enters as array arguments so nothing retraces frame-to-frame
(src/camera_controller.rs:69-74 / gpu_buffer.rs write-on-change semantics).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import config
from ..ops import env as envops
from ..ops import compact, post, raster, resolve, shading, shadows, sampling
from .scene_gpu import LightsGPU, SceneGPU

F32 = jnp.float32
I32 = jnp.int32

# GlobalParams device vector layout (GlobalGPUParams, src/global_params.rs:6-13
# plus the SSR blend the reference hardcodes to pass-through)
PARAM_EXPOSURE = 0        # "random_param"
PARAM_TONE_TYPE = 1       # 0..3
PARAM_SSR_THICKNESS = 2
PARAM_SSR_STRENGTH = 3
PARAM_SHADOW_BIAS = 4     # NDC units; + biases the compare toward lit
NUM_PARAMS = 5

# Channel-first dense material sample in the fused path (bit-exact with
# the channel-last blend + moveaxis; tools/ab_frame.py toggle). MEASURED
# SLOWER r5 interleaved 1080p: CF-jnp +0.23 ms, CF+Pallas blend +0.85 ms —
# XLA's (H, W, 9) -> (9, H, W) relayout is cheaper than forcing the blend
# into planar/flat domains (consistent with the wblend findings). OFF.
_CF_SAMPLE = False


def default_params() -> jnp.ndarray:
    return jnp.array([1.0, 1.0, 0.25, 0.0, 0.0], F32)


class EnvGPU(NamedTuple):
    env_cube: jax.Array      # (6, E, E, 3) environment cubemap
    irradiance: jax.Array    # (6, I, I, 3) diffuse irradiance (bake/cache)
    irradiance_sh: jax.Array  # (9, 3) SH projection used by shading
    sky_rgbe: Optional[jax.Array] = None  # (6, E, E, 16) u8 windowed RGBE
    #   display cube (one-gather bilinear sky taps); None = sample env_cube


class FrameOutput(NamedTuple):
    sdr: jax.Array           # (H, W, 3) uint8 tone-mapped
    pick_id: jax.Array       # (H, W) int32 object id map (0 = none)
    depth: jax.Array         # (H, W) f32 reverse-Z
    hdr: jax.Array           # (H, W, 3) f32 pre-tonemap (post-SSR)
    bin_overflow: jax.Array  # () i32 max bin occupancy (main+forward rasters)
    shadow_overflow: jax.Array  # () i32 max shadow-view bin occupancy
    #   (0 when the atlas was precomputed — the engine monitors that path
    #   at atlas render time instead)
    tex_overflow: jax.Array  # (2,) i32 [main, forward] textured-block counts
    #   (compaction capacity monitors, ops/compact.py)
    big_overflow: jax.Array  # () i32 max big-triangle count across rasters
    #   (cfg.bin_big_capacity monitor; 0 on the dense binning path)
    shadow_blocks: jax.Array  # () i32 shadow-boundary blocks wanted
    #   (cfg.shadow_block_capacity monitor; 0 when shadows are off)
    stream_overflow: jax.Array  # () i32 total (tile, triangle) pairs the
    #   CSR stream raster wanted (cfg.stream_capacity monitor; 0 on the
    #   dense binning path)
    sky_blocks: jax.Array = jnp.int32(0)  # () i32 background blocks wanted
    #   (cfg.sky_block_capacity monitor; 0 on the scaled-sky path)


def _sovf(bins) -> jax.Array:
    """stream-capacity monitor value for either bins flavor."""
    return getattr(bins, "stream_overflow", jnp.int32(0))


def _upsample_bilinear(img: jax.Array, shape: tuple) -> jax.Array:
    H, W = img.shape[0], img.shape[1]
    if shape[0] % H == 0 and shape[1] % W == 0:
        # integer factors lower as phase-wise shifted adds (pure VPU)
        # instead of the resize's dense (out, in) matmul pair
        return post.upsample_bilinear_int(img, shape[0] // H, shape[1] // W)
    return jax.image.resize(img, shape, method="bilinear")


def geometry_stage(scene: SceneGPU, view_proj: jax.Array,
                   need_tbn: bool = True):
    """Expand the instance-shared vertex pool and transform to world/clip.

    One gather widens the (Uc, 14) unique rows to the flattened
    per-instance layout (scene_gpu.SceneGPU.vert_data/vert_src), then the
    instance model/normal matrices apply per flattened vertex (MXU batched
    einsums — the instance-attribute vertex shader,
    gbuffer_geometry.wgsl:50-85). Returns (world (V, 3), clip (V, 4),
    resolve.VertexAttrs)."""
    data = jnp.take(scene.vert_data, scene.vert_src, axis=0)   # (Vc, 14)
    world, clip = raster.transform_vertices(
        data[:, 0:3], scene.vert_instance, scene.inst_model, view_proj)
    # normal matrices gathered as FLAT (V, 9) rows + full-lane column
    # multiply-adds: the batched-einsum form gathers a (V, 3, 3) tensor
    # whose (3, 3) minor dims tile-pad to (8, 128) vector registers
    # (~100x memory bloat; same fix as transform_vertices)
    nm = jnp.take(scene.inst_normal_mat.reshape(-1, 9),
                  scene.vert_instance, axis=0)                 # (V, 9)

    def _nm_apply(vec):                                        # (V, 3)
        vx, vy, vz = vec[:, 0], vec[:, 1], vec[:, 2]
        return jnp.stack([nm[:, 3 * i] * vx + nm[:, 3 * i + 1] * vy
                          + nm[:, 3 * i + 2] * vz
                          for i in range(3)], axis=0).T

    n_w = _nm_apply(data[:, 5:8])
    if need_tbn:
        t_w = _nm_apply(data[:, 8:11])
        b_w = _nm_apply(data[:, 11:14])
    else:
        t_w = b_w = n_w
    attrs = resolve.VertexAttrs(world=world, uv=data[:, 3:5], normal=n_w,
                                tangent=t_w, bitangent=b_w)
    return world, clip, attrs


def world_positions(scene: SceneGPU) -> jax.Array:
    """(V, 3) world-space flattened vertex positions (shadow bake input)."""
    data = jnp.take(scene.vert_data, scene.vert_src, axis=0)
    world, _ = raster.transform_vertices(
        data[:, 0:3], scene.vert_instance, scene.inst_model,
        jnp.eye(4, dtype=F32))
    return world


def _sky_image(cfg: config.RenderConfig, env: "EnvGPU", cam: dict,
               valid: jax.Array, PW: int, PH: int):
    """(PH, PW, 3) sky colors + () i32 needed-block count.

    cfg.sky_block_capacity > 0: block-compacted EXACT sky — full-rate
    cube samples only on blocks containing background pixels (valid is
    the main raster's hit mask). Otherwise: the sky_scale coarse pass +
    bilinear upsample."""
    from ..ops import compact

    rgbe = env.sky_rgbe if cfg.sky_rgbe else None
    dims = compact.block_dims(PH, PW)
    cap = cfg.sky_block_capacity
    if cap > 0 and dims is not None:
        bh, bw = dims
        nby, nbx = PH // bh, PW // bw
        need = jnp.any(compact.to_blocks(~valid, bh, bw), axis=(1, 2))
        plan = compact.plan_blocks(need, min(cap, nby * nbx))
        cols = envops.skybox_colors_blocks(
            env.env_cube, cam["proj_inv"], cam["view_inv"][:3, :3],
            plan.slots, bh, bw, nbx, PW, PH, rgbe_win=rgbe)
        sky = compact.from_blocks(compact.scatter_blocks(cols, plan),
                                  PH, PW)
        return sky, plan.needed
    s = cfg.sky_scale
    sky = envops.skybox_colors(env.env_cube, cam["proj_inv"],
                               cam["view_inv"][:3, :3], PW // s, PH // s,
                               rgbe_win=rgbe)
    if s > 1:
        if cfg.sky_upsample == "cubic" and PH % s == 0 and PW % s == 0:
            sky = post.upsample_bicubic_int(sky, s, s)
        else:
            sky = _upsample_bilinear(sky, (PH, PW, 3))
    return sky, jnp.int32(0)


def _raster_resolve(clip, tri_vidx, tri_mask, tri_instance, vattrs, scene,
                    cfg: config.RenderConfig, cull: str):
    """Raster + per-pixel resolve-row selection.

    Pallas path: the fused kernel selects the winner's table row during the
    depth race (raster.rasterize_resolve_binned). Fallback: two-pass
    (visibility buffer, then a per-tile one-hot select).
    Returns (tri_id, depth, ResolvedAttrs, overflow)."""
    PW, PH = cfg.padded_width, cfg.padded_height
    # slim flat-only table on the Pallas select paths (the tiled jnp
    # fallback and the fused-resolve raster keep the full layout)
    slim = not cfg.any_textured and cfg.use_pallas and not cfg.fused_resolve
    setup = raster.triangle_setup(clip, tri_vidx, tri_mask, PW, PH, cull)
    if (cfg.use_pallas and cfg.stream_raster and not cfg.fused_resolve
            and raster.stream_pays_off(tri_vidx.shape[0])):
        # CSR stream path: gathers + kernel DMA scale with actual
        # (tile, triangle) pairs, not tiles * bin_capacity
        sbins = raster.bin_triangles_stream(
            setup, PW, PH, cfg.tile_h, cfg.tile_w, cfg.stream_capacity,
            cfg.bin_big_capacity)
        table = resolve.build_gbuffer_table(
            setup, tri_vidx, vattrs, tri_instance, scene.inst_object_id,
            scene.inst_material, scene.mat_record, scene.mat_flat,
            slim=slim)
        ty, tx = sbins.counts.shape
        tri_id, depth = raster.rasterize_stream(
            sbins, ty, tx, cfg.tile_h, cfg.tile_w, kmax=cfg.bin_capacity)
        r = resolve.resolve_attrs_stream(tri_id, sbins, table, cfg.tile_h,
                                         cfg.tile_w, kmax=cfg.bin_capacity,
                                         bf16=cfg.bf16_attrs, slim=slim)
        return tri_id, depth, r, sbins
    bins = raster.bin_triangles(setup, PW, PH, cfg.tile_h, cfg.tile_w,
                                cfg.bin_capacity, cfg.bin_big_capacity)
    table = resolve.build_gbuffer_table(
        setup, tri_vidx, vattrs, tri_instance, scene.inst_object_id,
        scene.inst_material, scene.mat_record, scene.mat_flat,
        slim=slim)
    if cfg.use_pallas and cfg.fused_resolve:
        D = table.shape[1]
        pad = (-D) % 64
        table_p = jnp.pad(table, ((0, 0), (0, pad))) if pad else table
        tri_id, depth, sel = raster.rasterize_resolve_binned(
            bins, table_p, cfg.tile_h, cfg.tile_w)
        r = resolve.resolve_attrs_from_sel(tri_id, sel[..., :D])
    else:
        tri_id, depth = raster.rasterize_binned(bins, cfg.tile_h, cfg.tile_w,
                                                use_pallas=cfg.use_pallas)
        if cfg.use_pallas:
            # VMEM select+eval kernel: no HBM one-hot tensor, writes only
            # the evaluated channels
            r = resolve.resolve_attrs_pallas(tri_id, bins.ids, table,
                                             cfg.tile_h, cfg.tile_w,
                                             counts=bins.counts,
                                             bf16=cfg.bf16_attrs,
                                             slim=slim)
        else:
            # tiled-domain select + plane eval (untiles only the evaluated
            # ~22 channels instead of the 53-channel sel tensor)
            r = resolve.resolve_attrs_tiled(tri_id, bins.ids, table,
                                            cfg.tile_h, cfg.tile_w)
    return tri_id, depth, r, bins


def _unpack_camera(camera_raw: jax.Array) -> dict:
    return dict(
        view_proj=camera_raw[0:16].reshape(4, 4),
        view=camera_raw[16:32].reshape(4, 4),
        view_inv=camera_raw[32:48].reshape(4, 4),
        proj=camera_raw[48:64].reshape(4, 4),
        proj_inv=camera_raw[64:80].reshape(4, 4),
        position=camera_raw[80:83],
    )


def render_frame_forward(scene: SceneGPU, pool: sampling.TexturePoolGPU,
                         lights: LightsGPU, camera_raw: jax.Array,
                         params: jax.Array, env: Optional[EnvGPU],
                         cfg: config.RenderConfig) -> FrameOutput:
    """Forward-only pipeline (BASELINE config 1): one visibility raster over
    every triangle, flat/textured albedo with Lambert N-dot-L directional
    lighting, tone map. No GBuffer resolve, shadows, IBL or SSR."""
    cam = _unpack_camera(camera_raw)
    W, H = cfg.width, cfg.height
    PW, PH = cfg.padded_width, cfg.padded_height

    world, clip, vattrs = geometry_stage(scene, cam["view_proj"],
                                         need_tbn=False)
    tri_id, depth, r, bins = _raster_resolve(
        clip, scene.tri_vidx, scene.tri_deferred, scene.tri_instance,
        vattrs, scene, cfg, "back")
    overflow = bins.overflow
    valid = r.valid
    uv, normal, flat = r.uv, r.normal, r.flat
    use_tex = flat[..., 5] > 0.5
    lvl = sampling.mip_level_from_uv(uv, pool.level_sizes[0])
    duv = (sampling.uv_derivatives(uv)
           if isinstance(pool, sampling.NativeTexturePoolGPU) else None)
    tex, tex_needed = compact.sample_pool_compacted(
        pool, r.record, uv, lvl, use_tex & valid, cfg.tex_block_capacity,
        filter=cfg.texture_filter, duv=duv)
    albedo = jnp.where(use_tex[..., None], tex[..., :3], flat[..., 0:3])

    shade = jnp.full(normal.shape[:2], 0.1, F32)[..., None]  # ambient floor
    for i in range(cfg.num_directional_lights):
        ndotl = jnp.maximum(
            -jnp.sum(normal * lights.dir_direction[i][None, None, :], axis=-1),
            0.0)
        shade = shade + ndotl[..., None] * lights.dir_color[i][None, None, :]
    hdr = albedo * shade * valid[..., None].astype(F32)

    if env is not None:
        s = cfg.sky_scale
        sky = envops.skybox_colors(env.env_cube, cam["proj_inv"],
                                   cam["view_inv"][:3, :3], PW // s, PH // s,
                                   rgbe_win=(env.sky_rgbe if cfg.sky_rgbe
                                             else None))
        if s > 1:
            sky = _upsample_bilinear(sky, (PH, PW, 3))
        hdr = jnp.where(valid[..., None], hdr, sky)

    sdr = post.tone_map(hdr, params[PARAM_TONE_TYPE], params[PARAM_EXPOSURE])
    return FrameOutput(sdr=sdr[:H, :W], pick_id=r.object_id[:H, :W],
                       depth=depth[:H, :W], hdr=hdr[:H, :W],
                       bin_overflow=overflow,
                       shadow_overflow=jnp.int32(0),
                       tex_overflow=jnp.stack([tex_needed, jnp.int32(0)]),
                       big_overflow=bins.big_overflow,
                       shadow_blocks=jnp.int32(0),
                       stream_overflow=_sovf(bins))


def render_shadow_atlas(scene: SceneGPU, lights: LightsGPU,
                        cfg: config.RenderConfig
                        ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Windowed shadow atlas (6P+D, S, S, 4) + () i32 shadow-bin overflow
    monitor + () i32 big-triangle overflow monitor. Depends only on scene +
    lights — the engine caches it across frames and re-renders only on
    scene/light edits (shadow maps are camera-independent, so a fly-around
    over a static scene never re-renders them; the reference re-records its
    shadow passes every frame, src/light_controller.rs:187)."""
    world = world_positions(scene)
    wh = jnp.concatenate([world, jnp.ones_like(world[:, :1])], axis=1)
    clip_views = jnp.einsum("vj,sij->svi", wh, lights.shadow_viewprojs,
                            preferred_element_type=F32)
    atlas, overflow, big_ovf = shadows.render_shadow_views(
        clip_views, scene.tri_vidx, scene.tri_shadow, cfg.shadow_size,
        cfg.shadow_tile, cfg.shadow_bin_capacity, use_pallas=cfg.use_pallas,
        big_capacity=cfg.bin_big_capacity)
    win = shadows.window_depth_maps(atlas)
    if cfg.shadow_bf16:
        win = win.astype(jnp.bfloat16)
    return win, overflow, big_ovf


@functools.lru_cache(maxsize=8)
def compiled_shadow_atlas(cfg: config.RenderConfig):
    def fn(scene, lights):
        return render_shadow_atlas(scene, lights, cfg)
    return jax.jit(fn)


def _use_fused_shading(cfg: config.RenderConfig) -> bool:
    """Static dispatch for the fused shading kernel: the Pallas two-pass
    resolve paths at full texture rate, with shadows on and SSR off (SSR
    reads image-domain GBuffer planes the fused path never materializes)."""
    P, D = cfg.num_point_lights, cfg.num_directional_lights
    return (cfg.fused_shading and cfg.use_pallas and not cfg.fused_resolve
            and not cfg.enable_ssr and cfg.texture_scale == 1
            and cfg.enable_shadows and (P + D) > 0)


def _render_frame_fused(scene: SceneGPU, pool: sampling.TexturePoolGPU,
                        lights: LightsGPU, camera_raw: jax.Array,
                        params: jax.Array, env: Optional[EnvGPU],
                        cfg: config.RenderConfig,
                        atlas: Optional[jax.Array]) -> FrameOutput:
    """Deferred frame via the fused shading kernel (same pass sequence and
    math as :func:`render_frame`'s unfused chain; see
    shading.shade_deferred_fused). The gather stages (raster bins, texture
    compaction, shadow gates) are shared ops — only the elementwise tail
    between them fuses into one VMEM pass."""
    cam = _unpack_camera(camera_raw)
    W, H = cfg.width, cfg.height
    PW, PH = cfg.padded_width, cfg.padded_height
    P, D = cfg.num_point_lights, cfg.num_directional_lights

    world, clip, attrs = geometry_stage(scene, cam["view_proj"])

    # ---- main visibility raster + raw channel-first select+eval ----
    # statically flat-only scenes use the SLIM 28-channel table (half the
    # select/eval MXU work and table DMA; uv/tbn/record never read)
    slim = not cfg.any_textured
    setup = raster.triangle_setup(clip, scene.tri_vidx, scene.tri_deferred,
                                  PW, PH, "back")
    table = resolve.build_gbuffer_table(
        setup, scene.tri_vidx, attrs, scene.tri_instance,
        scene.inst_object_id, scene.inst_material, scene.mat_record,
        scene.mat_flat, slim=slim)
    if cfg.stream_raster and raster.stream_pays_off(scene.tri_vidx.shape[0]):
        m_bins = raster.bin_triangles_stream(
            setup, PW, PH, cfg.tile_h, cfg.tile_w, cfg.stream_capacity,
            cfg.bin_big_capacity)
        ty, tx = m_bins.counts.shape
        tri_id, depth = raster.rasterize_stream(
            m_bins, ty, tx, cfg.tile_h, cfg.tile_w, kmax=cfg.bin_capacity)
        outf_c, outh_c = resolve.select_eval_stream(
            tri_id, m_bins, table, cfg.tile_h, cfg.tile_w,
            kmax=cfg.bin_capacity, bf16=cfg.bf16_attrs, raw=True,
            slim=slim)
    else:
        m_bins = raster.bin_triangles(setup, PW, PH, cfg.tile_h, cfg.tile_w,
                                      cfg.bin_capacity, cfg.bin_big_capacity)
        tri_id, depth = raster.rasterize_binned(m_bins, cfg.tile_h,
                                                cfg.tile_w, use_pallas=True)
        outf_c, outh_c = resolve.select_eval_pallas(
            tri_id, m_bins.ids, table, cfg.tile_h, cfg.tile_w,
            counts=m_bins.counts, bf16=cfg.bf16_attrs, raw=True, slim=slim)
    overflow = m_bins.overflow
    big_overflow = m_bins.big_overflow

    # image-domain planes the gather stages need: world (shadow gates),
    # uv/record (texture compaction) — one relayout; the attribute
    # channels stay channel-first for the kernel
    outf = jnp.moveaxis(outf_c, 0, -1)            # (H, W, 7) / slim (.., 4)
    valid = tri_id >= 0
    g_pos = jnp.where(valid[..., None], outf[..., 0:3], 0.0)
    oid_plane = outf_c[3] if slim else outf_c[6]
    pick = jnp.where(valid, jnp.round(oid_plane).astype(I32), 0)
    if not slim:
        uv = outf[..., 3:5]
        record = jnp.round(outf[..., 5]).astype(I32)
        use_tex = outh_c[14].astype(F32) > 0.5    # (H, W) — flat[5]

    # ---- material sample (block-compacted, same op as the unfused path) ----
    if cfg.any_textured:
        lvl = sampling.mip_level_from_uv(uv, pool.level_sizes[0])
        duv = (sampling.uv_derivatives(uv)
               if isinstance(pool, sampling.NativeTexturePoolGPU) else None)
        if _CF_SAMPLE:
            rec_c, tex_needed = compact.sample_pool_compacted(
                pool, record, uv, lvl, use_tex & valid,
                cfg.tex_block_capacity, filter=cfg.texture_filter, duv=duv,
                channel_first=True)                     # (9, H, W)
        else:
            rec, tex_needed = compact.sample_pool_compacted(
                pool, record, uv, lvl, use_tex & valid,
                cfg.tex_block_capacity, filter=cfg.texture_filter,
                duv=duv)                                # (H, W, 9)
            rec_c = jnp.moveaxis(rec, -1, 0)            # (9, H, W)
    else:
        # statically flat-only scene: the kernel shades from geometric
        # normals + flat params; no material plane is materialized
        rec_c = None
        tex_needed = jnp.int32(0)

    # ---- shadow atlas + channel-first gates ----
    shadow_overflow = jnp.int32(0)
    if atlas is None:
        atlas, shadow_overflow, s_big = render_shadow_atlas(scene, lights,
                                                            cfg)
        big_overflow = jnp.maximum(big_overflow, s_big)
    # gates compare against the 1-channel min-window map: 1/4 the gather
    # table and row bytes of the windowed PCF atlas (shadows.gate_min_maps)
    vis_all, vis_slot = shadows.gate_fns(
        lights.point_position[:P],
        lights.shadow_viewprojs[:6 * P].reshape(P, 6, 4, 4)
        if P > 0 else None,
        lights.dir_viewproj[:D] if D > 0 else None, atlas,
        bias=params[PARAM_SHADOW_BIAS])
    gates_c, shadow_blocks = shadows.gate_refined_visibility(
        vis_all, vis_slot, g_pos, cfg.shadow_lookup_scale,
        cfg.shadow_block_capacity,
        block_dims=(cfg.gate_block_h, cfg.gate_block_w), channel_first=True)

    # ---- channel-first sky ----
    sky_c = None
    sky_blocks = jnp.int32(0)
    if env is not None:
        from ..ops import compact as compactlib
        dims = compactlib.block_dims(PH, PW)
        if cfg.sky_block_capacity > 0 and dims is not None:
            # block-compacted exact sky (see _sky_image); full-res HWC ->
            # CF relayout is the price of the kernel's input layout
            sky, sky_blocks = _sky_image(cfg, env, cam, valid, PW, PH)
            sky_c = jnp.moveaxis(sky, -1, 0)
        else:
            s = cfg.sky_scale
            sky = envops.skybox_colors(
                env.env_cube, cam["proj_inv"], cam["view_inv"][:3, :3],
                PW // s, PH // s,
                rgbe_win=(env.sky_rgbe if cfg.sky_rgbe else None))
            sky_c = jnp.moveaxis(sky, -1, 0)            # cheap at sky res
            if s > 1:
                if PH % s == 0 and PW % s == 0:
                    up = (post.upsample_bicubic_int_cf
                          if cfg.sky_upsample == "cubic"
                          else post.upsample_bilinear_int_cf)
                    sky_c = up(sky_c, s, s)
                else:
                    sky_c = jax.image.resize(sky_c, (3, PH, PW),
                                             method="bilinear")

    # ---- fused shading: one VMEM pass over the resolved planes ----
    slights = shading.ShadingLights(
        point_position=lights.point_position, point_color=lights.point_color,
        dir_direction=lights.dir_direction, dir_color=lights.dir_color,
        dir_viewproj=lights.dir_viewproj)
    irradiance = (env.irradiance_sh
                  if (env is not None and cfg.enable_ibl) else None)
    hdr_c = shading.shade_deferred_fused(
        tri_id, outf_c, outh_c, rec_c, gates_c, sky_c, cam["position"],
        slights, P, D, irradiance)
    hdr = jnp.moveaxis(hdr_c, 0, -1)                    # (H, W, 3)

    # ---- forward pass (identical to render_frame) ----
    fwd_needed = jnp.int32(0)
    if cfg.has_forward:
        f_setup = raster.triangle_setup(clip, scene.fwd_tri_vidx,
                                        scene.fwd_tri_mask, PW, PH, "none")
        f_bins = raster.bin_triangles(f_setup, PW, PH, cfg.tile_h, cfg.tile_w,
                                      cfg.bin_capacity, cfg.bin_big_capacity)
        f_id, _ = raster.rasterize_binned(f_bins, cfg.tile_h, cfg.tile_w,
                                          use_pallas=cfg.use_pallas)
        f_table = resolve.build_gbuffer_table(
            f_setup, scene.fwd_tri_vidx, attrs, scene.fwd_tri_instance,
            scene.inst_object_id, scene.inst_material, scene.mat_record,
            scene.mat_flat)
        overflow = jnp.maximum(overflow, f_bins.overflow)
        big_overflow = jnp.maximum(big_overflow, f_bins.big_overflow)
        hdr, pick, fwd_needed = resolve.forward_overlay_compose(
            hdr, pick, f_id, f_bins, f_table, pool, cfg.tile_h, cfg.tile_w,
            cfg.fwd_tile_capacity, texture_filter=cfg.texture_filter,
            fs=max(cfg.texture_scale, 2))

    sdr = post.tone_map(hdr, params[PARAM_TONE_TYPE], params[PARAM_EXPOSURE])
    return FrameOutput(sdr=sdr[:H, :W], pick_id=pick[:H, :W],
                       depth=depth[:H, :W], hdr=hdr[:H, :W],
                       bin_overflow=overflow, shadow_overflow=shadow_overflow,
                       tex_overflow=jnp.stack([tex_needed, fwd_needed]),
                       big_overflow=big_overflow,
                       shadow_blocks=shadow_blocks,
                       stream_overflow=_sovf(m_bins),
                       sky_blocks=sky_blocks)


def render_frame(scene: SceneGPU, pool: sampling.TexturePoolGPU,
                 lights: LightsGPU, camera_raw: jax.Array,
                 params: jax.Array, env: Optional[EnvGPU],
                 cfg: config.RenderConfig,
                 atlas: Optional[jax.Array] = None) -> FrameOutput:
    """One camera frame. ``atlas``: precomputed shadow atlas from
    :func:`render_shadow_atlas`; None renders it inline (self-contained
    jit, used by the sharded dryrun and tests)."""
    if cfg.forward_only:
        return render_frame_forward(scene, pool, lights, camera_raw, params,
                                    env, cfg)
    if cfg.render_scale_pct == 100 and _use_fused_shading(cfg):
        return _render_frame_fused(scene, pool, lights, camera_raw, params,
                                   env, cfg, atlas)
    if cfg.render_scale_pct != 100:
        # Reduced internal resolution (cfg.render_scale_pct): run the whole
        # deferred pipeline on a proportionally smaller grid (aspect — and
        # therefore the camera projection — is unchanged), then bilinearly
        # upsample HDR and re-tone-map at full resolution; pick/depth
        # upsample nearest so ids stay exact.
        import dataclasses
        pct = cfg.render_scale_pct
        lw = max(cfg.tile_w, (cfg.width * pct) // 100)
        lh = max(cfg.tile_h, (cfg.height * pct) // 100)
        cfg_lo = dataclasses.replace(cfg, render_scale_pct=100,
                                     width=lw, height=lh)
        out = render_frame(scene, pool, lights, camera_raw, params, env,
                           cfg_lo, atlas)
        H, W = cfg.height, cfg.width
        hdr = _upsample_bilinear(out.hdr, (H, W, 3))
        sdr = post.tone_map(hdr, params[PARAM_TONE_TYPE],
                            params[PARAM_EXPOSURE])
        pick = jax.image.resize(out.pick_id, (H, W), method="nearest")
        depth = jax.image.resize(out.depth, (H, W), method="nearest")
        return FrameOutput(sdr=sdr, pick_id=pick, depth=depth, hdr=hdr,
                           bin_overflow=out.bin_overflow,
                           shadow_overflow=out.shadow_overflow,
                           tex_overflow=out.tex_overflow,
                           big_overflow=out.big_overflow,
                           sky_blocks=out.sky_blocks,
                           shadow_blocks=out.shadow_blocks,
                           stream_overflow=out.stream_overflow)
    cam = _unpack_camera(camera_raw)
    W, H = cfg.width, cfg.height
    PW, PH = cfg.padded_width, cfg.padded_height

    # ---- geometry stage: world/clip transforms for the whole vertex pool ----
    world, clip, attrs = geometry_stage(scene, cam["view_proj"])

    # ---- main visibility raster (GBuffer geometry pass) ----
    tri_id, depth, r_main, m_bins = _raster_resolve(
        clip, scene.tri_vidx, scene.tri_deferred, scene.tri_instance,
        attrs, scene, cfg, "back")
    g, tex_needed = resolve.resolve_gbuffer_from_attrs(
        r_main, tri_id, depth, pool,
        texture_filter=cfg.texture_filter, texture_scale=cfg.texture_scale,
        tex_block_capacity=cfg.tex_block_capacity,
        sample_textures=cfg.any_textured)

    # ---- shadow atlas (cached across frames when precomputed) ----
    overflow = m_bins.overflow
    big_overflow = m_bins.big_overflow
    shadow_overflow = jnp.int32(0)
    shadow_blocks = jnp.int32(0)
    P, D = cfg.num_point_lights, cfg.num_directional_lights
    point_shadow_fn = dir_shadow_fn = None
    if cfg.enable_shadows and (P + D) > 0:
        if atlas is None:
            atlas, shadow_overflow, s_big = render_shadow_atlas(
                scene, lights, cfg)
            big_overflow = jnp.maximum(big_overflow, s_big)

        # All lights' binary gates in one coarse pass + one boundary-block
        # refinement (shadows.gate_refined_visibility); all lights batch
        # their lookups into a single gather round against the 1-channel
        # min-window map (shadows.gate_min_maps — 1/4 the gather table
        # and row bytes; the BASELINE-config-2 lever).
        vis_all, vis_slot = shadows.gate_fns(
            lights.point_position[:P],
            lights.shadow_viewprojs[:6 * P].reshape(P, 6, 4, 4)
            if P > 0 else None,
            lights.dir_viewproj[:D] if D > 0 else None, atlas,
            bias=params[PARAM_SHADOW_BIAS])

        gates, shadow_blocks = shadows.gate_refined_visibility(
            vis_all, vis_slot, g.position, cfg.shadow_lookup_scale,
            cfg.shadow_block_capacity,
            block_dims=(cfg.gate_block_h, cfg.gate_block_w))

        def point_shadow_fn(i, pos):  # noqa: E306
            return gates[..., i]

        def dir_shadow_fn(i, pos):
            return gates[..., P + i]

    # ---- deferred shading ----
    slights = shading.ShadingLights(
        point_position=lights.point_position, point_color=lights.point_color,
        dir_direction=lights.dir_direction, dir_color=lights.dir_color,
        dir_viewproj=lights.dir_viewproj)
    irradiance = env.irradiance_sh if (env is not None and cfg.enable_ibl) else None
    hdr = shading.shade_deferred(g, cam["position"], slights, P, D, irradiance,
                                 point_shadow_fn, dir_shadow_fn)

    # ---- skybox (background pixels, depth GreaterEqual at far plane) ----
    sky_blocks = jnp.int32(0)
    if env is not None:
        sky, sky_blocks = _sky_image(cfg, env, cam, g.mask, PW, PH)
        hdr = jnp.where(g.mask[..., None], hdr, sky)

    # ---- forward pass (gizmos/billboards: depth Always, drawn on top) ----
    # Forward triangles live in their own small pack-time pool, so this
    # raster bins Fc triangles (hundreds), not the whole scene pool; the
    # resolve + texture taps run tile-compacted (overlays cover few tiles).
    pick = g.object_id
    fwd_needed = jnp.int32(0)
    if cfg.has_forward:
        f_setup = raster.triangle_setup(clip, scene.fwd_tri_vidx,
                                        scene.fwd_tri_mask, PW, PH, "none")
        f_bins = raster.bin_triangles(f_setup, PW, PH, cfg.tile_h, cfg.tile_w,
                                      cfg.bin_capacity, cfg.bin_big_capacity)
        f_id, _ = raster.rasterize_binned(f_bins, cfg.tile_h, cfg.tile_w,
                                          use_pallas=cfg.use_pallas)
        f_table = resolve.build_gbuffer_table(
            f_setup, scene.fwd_tri_vidx, attrs, scene.fwd_tri_instance,
            scene.inst_object_id, scene.inst_material, scene.mat_record,
            scene.mat_flat)
        overflow = jnp.maximum(overflow, f_bins.overflow)
        big_overflow = jnp.maximum(big_overflow, f_bins.big_overflow)
        # compose in the compacted tile domain (no full-image untiles);
        # pick override for forward objects matches the second
        # object-picker pipeline (src/pipelines/object_picker_rp.rs:151-178)
        hdr, pick, fwd_needed = resolve.forward_overlay_compose(
            hdr, pick, f_id, f_bins, f_table, pool, cfg.tile_h, cfg.tile_w,
            cfg.fwd_tile_capacity, texture_filter=cfg.texture_filter,
            fs=max(cfg.texture_scale, 2))

    # ---- SSR (reference ships an effective pass-through; strength=0) ----
    if cfg.enable_ssr:
        hdr = post.screen_space_reflections(
            hdr, depth, g.position, g.normal, cam["view_proj"], cam["position"],
            params[PARAM_SSR_THICKNESS], params[PARAM_SSR_STRENGTH],
            mask=g.mask, roughness=g.rough_metal_ao[..., 0])

    # ---- tone map + crop to the true resolution ----
    sdr = post.tone_map(hdr, params[PARAM_TONE_TYPE], params[PARAM_EXPOSURE])
    return FrameOutput(sdr=sdr[:H, :W], pick_id=pick[:H, :W],
                       depth=depth[:H, :W], hdr=hdr[:H, :W],
                       bin_overflow=overflow, shadow_overflow=shadow_overflow,
                       tex_overflow=jnp.stack([tex_needed, fwd_needed]),
                       big_overflow=big_overflow,
                       shadow_blocks=shadow_blocks,
                       stream_overflow=_sovf(m_bins),
                       sky_blocks=sky_blocks)


@functools.lru_cache(maxsize=8)
def compiled_frame(cfg: config.RenderConfig):
    """Jitted render_frame for a given static config (cached per config,
    the analog of the reference's pipeline cache). ``atlas`` may be None
    (inline shadow render) or a cached atlas array."""

    def fn(scene, pool, lights, camera_raw, params, env, atlas=None):
        return render_frame(scene, pool, lights, camera_raw, params, env,
                            cfg, atlas)

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# One-shot environment precomputes (RenderingAction analogs, src/actions.rs)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("size", "gamma_decode"))
def bake_env_cubemap(equirect: jax.Array, size: int, gamma_decode: bool = True):
    return envops.equirect_to_cubemap(equirect, size, gamma_decode)


@functools.partial(jax.jit, static_argnames=("size",))
def bake_irradiance(env_cube: jax.Array, size: int):
    return envops.bake_irradiance(env_cube, size)


@jax.jit
def project_irradiance_sh(irradiance_cube: jax.Array) -> jax.Array:
    """SH-9 projection of the baked irradiance cubemap (shading evaluates
    the polynomial instead of gathering from the map)."""
    return envops.sh_project_cubemap(irradiance_cube)
