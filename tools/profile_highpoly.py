"""Prefix-timing stage ledger for the high-poly (108k-tri) deferred frame.

Times cumulative pipeline prefixes (geometry -> setup -> binning -> raster
-> table -> resolve -> full frame) interleaved round-robin in one process,
each as N scan-chained iterations with a non-foldable cross-iteration
dependency (bench.py's honest methodology). Stage cost = successive
prefix deltas; tenancy drift cancels in the interleave.

Usage: python tools/profile_highpoly.py [--rounds R] [--frames N]
"""

from __future__ import annotations

import argparse
import collections
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from tinyrenderer_tpu.ops import raster, resolve
    from tinyrenderer_tpu.render import frame as framelib

    eng = bench.build_engine(highpoly=True)
    eng.run_frame(0.0)  # settle capacities synchronously
    cfg = eng.cfg
    scene = eng._pack.scene
    cam0 = jnp.asarray(eng.camera.to_raw())
    PW, PH = cfg.padded_width, cfg.padded_height
    n = args.frames
    print(f"tris={int(eng._pack.counts['triangles'])} cfg tile=({cfg.tile_h},"
          f"{cfg.tile_w}) bin_capacity={cfg.bin_capacity} "
          f"stream_capacity={cfg.stream_capacity} "
          f"fused_shading={cfg.fused_shading}", flush=True)

    def stage_chain(depth_k: int):
        """Jitted scan over n iterations of the pipeline truncated at
        depth_k; returns a scalar touching every live output."""

        def one(cam):
            camd = framelib._unpack_camera(cam)
            world, clip, attrs = framelib.geometry_stage(scene,
                                                         camd["view_proj"])
            acc = clip.sum() + world.sum()
            if depth_k >= 1:
                setup = raster.triangle_setup(clip, scene.tri_vidx,
                                              scene.tri_deferred, PW, PH,
                                              "back")
                acc = acc + setup.rows.sum()
            if depth_k >= 2:
                sbins = raster.bin_triangles_stream(
                    setup, PW, PH, cfg.tile_h, cfg.tile_w,
                    cfg.stream_capacity, cfg.bin_big_capacity)
                acc = acc + sbins.ids.sum() + sbins.starts.sum()
            if depth_k >= 3:
                ty, tx = sbins.counts.shape
                tri_id, depth = raster.rasterize_stream(
                    sbins, ty, tx, cfg.tile_h, cfg.tile_w,
                    kmax=cfg.bin_capacity)
                acc = acc + depth.sum() + tri_id.sum()
            slim = not cfg.any_textured
            if depth_k >= 4:
                table = resolve.build_gbuffer_table(
                    setup, scene.tri_vidx, attrs, scene.tri_instance,
                    scene.inst_object_id, scene.inst_material,
                    scene.mat_record, scene.mat_flat, slim=slim)
                acc = acc + table.sum()
            if depth_k >= 5:
                r = resolve.resolve_attrs_stream(
                    tri_id, sbins, table, cfg.tile_h, cfg.tile_w,
                    kmax=cfg.bin_capacity, bf16=cfg.bf16_attrs, slim=slim)
                acc = (acc + r.world.sum() + r.normal.sum()
                       + r.flat.sum() + r.record.sum())
            return acc.astype(jnp.float32)

        @jax.jit
        def chain(cam):
            def step(c, _):
                a = one(c)
                return c + 1e-30 * a, a
            _, outs = jax.lax.scan(step, cam, None, length=n)
            return outs.sum()

        return chain

    variants = {}
    names = ["geometry", "+setup", "+stream_bin", "+raster", "+table",
             "+resolve"]
    for k, name in enumerate(names):
        variants[name] = stage_chain(k)

    # full engine frame (steady state, atlas cached) via the engine's own
    # compiled frame — timed with the same scan methodology
    atlas = eng._atlas
    frame_fn = framelib.compiled_frame(cfg)
    pack = eng._pack
    pool = eng._packer.pool_for(cfg)
    params = eng.params
    env = eng._ensure_env()

    @jax.jit
    def full_chain(cam):
        def step(c, _):
            out = frame_fn(pack.scene, pool, pack.lights, c, params,
                           env, atlas)
            return c + 1e-30 * out.sdr[0, 0, 0].astype(jnp.float32), \
                out.sdr[0, 0, 0].astype(jnp.int32)
        _, outs = jax.lax.scan(step, cam, None, length=n)
        return outs.sum()

    variants["full_frame"] = full_chain

    # warm up all
    for name, fn in variants.items():
        t0 = time.perf_counter()
        jax.block_until_ready(fn(cam0))
        float(fn(cam0))
        print(f"warm {name}: compile+2 runs {time.perf_counter()-t0:.1f}s",
              flush=True)

    times = collections.defaultdict(list)
    for r in range(args.rounds):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            float(fn(cam0))
            dt = (time.perf_counter() - t0) * 1e3 / n
            times[name].append(dt)
        print(f"round {r}: " + "  ".join(
            f"{nm}={times[nm][-1]:.2f}" for nm in variants), flush=True)

    print("\n=== per-frame medians (ms) and stage deltas ===")
    prev = 0.0
    for name in variants:
        med = statistics.median(times[name])
        delta = med - prev
        print(f"{name:14s} {med:8.3f}   (+{delta:6.3f})")
        prev = med


if __name__ == "__main__":
    main()
