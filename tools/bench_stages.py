"""Cumulative stage timing of the deferred frame on the real chip.

Times nested prefixes of the pipeline (geometry -> raster -> select/eval ->
material -> shading+sky+post) with the honest scan methodology, interleaved
round-robin. Differences between consecutive rows give per-stage costs
without trace-attribution overlap errors.

    python tools/bench_stages.py [--rounds 5]
"""

from __future__ import annotations

import argparse
import collections
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--frames", type=int, default=10)
    args = ap.parse_args()

    from tinyrenderer_tpu.ops import compact, raster, resolve, sampling
    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render import frame as framelib
    from tinyrenderer_tpu.render.engine import Engine

    eng = Engine(cfg=RenderConfig(width=1920, height=1080),
                 level_path="/root/reference/levels/test.lvl")
    eng.update(0.0)
    eng._drain_actions()
    for _ in range(3):
        out = eng.run_frame(0.0)
        np.asarray(out.tex_overflow)
    print(f"settled: tex cap {eng.cfg.tex_block_capacity}", flush=True)
    env = eng._ensure_env()
    cfg = eng.cfg
    scene = eng._pack.scene
    pool = eng._packer.pool_for(cfg)
    lights = eng._pack.lights
    cam0 = jnp.asarray(eng.camera.to_raw())
    params = eng.params
    atlas = jax.block_until_ready(
        framelib.compiled_shadow_atlas(cfg)(scene, lights)[0])
    N = args.frames

    def stage_null(cam):
        # scan-step floor: measures the per-frame cost of the timing
        # harness itself (carry chain + scan machinery + host fetch),
        # which every other row also contains
        return cam.sum(), cam

    def stage_geometry(cam):
        c = framelib._unpack_camera(cam)
        world, clip, attrs = framelib.geometry_stage(scene, c["view_proj"])
        return clip.sum(), clip

    def upto(stage):
        def fn(cam):
            c = framelib._unpack_camera(cam)
            world, clip, attrs = framelib.geometry_stage(scene, c["view_proj"])
            PW, PH = cfg.padded_width, cfg.padded_height
            setup = raster.triangle_setup(clip, scene.tri_vidx,
                                          scene.tri_deferred, PW, PH, "back")
            if stage == "setup":
                return setup.rows.sum()
            bins = raster.bin_triangles(setup, PW, PH, cfg.tile_h, cfg.tile_w,
                                        cfg.bin_capacity,
                                        cfg.bin_big_capacity)
            if stage == "bin":
                return bins.rows.sum()
            tri_id, depth = raster.rasterize_binned(
                bins, cfg.tile_h, cfg.tile_w, use_pallas=True)
            if stage == "raster":
                return depth.sum()
            table = resolve.build_gbuffer_table(
                setup, scene.tri_vidx, attrs, scene.tri_instance,
                scene.inst_object_id, scene.inst_material, scene.mat_record,
                scene.mat_flat)
            r = resolve.resolve_attrs_pallas(tri_id, bins.ids, table,
                                             cfg.tile_h, cfg.tile_w,
                                             counts=bins.counts)
            if stage == "select":
                return r.world.sum() + r.flat.sum()
            g, tex_needed = resolve.resolve_gbuffer_from_attrs(
                r, tri_id, depth, pool,
                texture_filter=cfg.texture_filter,
                texture_scale=cfg.texture_scale,
                tex_block_capacity=cfg.tex_block_capacity)
            if stage == "material":
                return g.albedo.sum() + g.normal.sum()
            out = framelib.render_frame(scene, pool, lights, cam, params,
                                        env, cfg, atlas)
            return out.sdr[0, 0, 0].astype(jnp.float32) + out.depth.sum()
        return fn

    stages = ["null", "geometry", "setup", "bin", "raster", "select",
              "material", "full"]

    loops = {}
    for s in stages:
        body = {"null": stage_null,
                "geometry": stage_geometry}.get(s) or upto(s)

        def make(body):
            @jax.jit
            def loop(cam):
                def step(c, _):
                    v = body(c)
                    v = v[0] if isinstance(v, tuple) else v
                    return c + 1e-30 * v, v
                _, outs = jax.lax.scan(step, cam, None, length=N)
                return outs.sum()
            return loop
        loops[s] = make(body)
        print(f"compiling {s}...", flush=True)
        float(loops[s](cam0))

    samples = collections.defaultdict(list)
    for _ in range(args.rounds):
        for s, loop in loops.items():
            t0 = time.perf_counter()
            float(loop(cam0))
            samples[s].append((time.perf_counter() - t0) * 1e3 / N)

    print(f"\n{'stage':10s} {'median':>9s} {'delta':>9s}   (ms/frame)")
    prev = 0.0
    for s in stages:
        m = statistics.median(samples[s])
        print(f"{s:10s} {m:9.2f} {m - prev:+9.2f}")
        prev = m


if __name__ == "__main__":
    main()
