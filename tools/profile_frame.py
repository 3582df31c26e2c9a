"""Interleaved frame profiler: measures config variants round-robin in one
process so shared-TPU tenancy drift cancels out of the comparison.

Timing matches bench.py's honest methodology: N frames chained inside one
jitted lax.scan with a non-foldable 1e-30*depth cross-frame dependency, the
shadow atlas precomputed once and passed in (steady-state frame, engine
caching semantics).

Usage: python tools/profile_frame.py [--width W --height H] [--rounds R]
                                     [--set all|filters|rates|passes|layout]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--set", default="all",
                    choices=["all", "filters", "rates", "passes", "layout",
                             "shadow", "r3", "stream", "next", "rkernel",
                             "wblend", "gateblk", "fshade", "gatemin"])
    ap.add_argument("--multilight", action="store_true",
                    help="add point lights up to 4P+1D (BASELINE config 2) "
                         "before packing, so variants measure the "
                         "multi-light shadow ledger")
    ap.add_argument("--scene", default="test",
                    choices=["test", "stress", "highpoly"],
                    help="stress = bench.py's BASELINE config 5 (1440p, "
                         "500 draws, 2K atlas); highpoly = the 110k-tri "
                         "raster-throughput scene")
    args = ap.parse_args()

    from dataclasses import replace

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.ops import sampling
    from tinyrenderer_tpu.render import frame as framelib
    from tinyrenderer_tpu.render.engine import Engine

    import numpy as np

    if args.scene != "test":
        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import bench
        eng = bench.build_engine(stress=(args.scene == "stress"),
                                 highpoly=(args.scene == "highpoly"))
    else:
        eng = Engine(cfg=RenderConfig(width=args.width, height=args.height),
                     level_path="/root/reference/levels/test.lvl")
    if args.multilight:
        from tinyrenderer_tpu.scene import components as comp
        from tinyrenderer_tpu.scene.world import WorldObject
        n_point = sum(
            1 for _oid, o in eng.world.world_objects()
            if any(isinstance(c, comp.LightObjectComponent)
                   for c in o.components))
        rng = np.random.default_rng(7)
        for i in range(max(0, 4 - n_point)):
            eng.world.add_world_object(WorldObject(
                components=[comp.LightObjectComponent(
                    light=comp.PointLight(color=np.array(
                        [20.0, 18.0, 16.0], np.float32)))],
                transform=comp.TransformComponent(position=np.array(
                    [rng.uniform(-8, 8), 5.0 + i, rng.uniform(-8, 8)],
                    np.float32))))
    eng.update(0.0)
    eng._drain_actions()
    # settle the capacity monitors (force-fetch the async queue) so every
    # variant measures the steady-state envelope, not a pre-growth config
    # that silently skips work (under-textured frames look fast)
    for _ in range(3):
        out = eng.run_frame(0.0)
        np.asarray(out.tex_overflow)  # sync -> monitors ready next check
    print(f"settled: tex cap {eng.cfg.tex_block_capacity}, "
          f"shadow blocks cap {eng.cfg.shadow_block_capacity}", flush=True)
    env = eng._ensure_env()
    base = eng.cfg
    scene = eng._pack.scene
    lights = eng._pack.lights
    cam0 = jnp.asarray(eng.camera.to_raw())
    params = eng.params
    N = args.frames

    # a variant value may be (cfg, setup_fn): setup_fn() runs before that
    # variant COMPILES (module-global engine flags are read at trace time)
    from tinyrenderer_tpu.ops import raster as rasterlib

    def _mxu_planes(on):
        def setup():
            rasterlib._PLANES_ON_MXU = on
        return setup

    def _flat_blend(on):
        def setup():
            sampling._FLAT_WINDOW_BLEND = on
        return setup

    def _pallas_blend(on):
        def setup():
            sampling._WINDOWED_BLEND_PALLAS = on
            sampling._FLAT_WINDOW_BLEND = False
        return setup

    from tinyrenderer_tpu.ops import shadows as shadowslib

    def _gate_min(on):
        def setup():
            shadowslib._GATE_VIA_MIN = on
        return setup

    groups = {
        "gatemin": {
            # shadow-gate compare table (round 4): 1-channel min-window map
            # vs the 4-channel windowed PCF atlas (thresholded either way)
            "min-map": (base, _gate_min(True)),
            "pcf-win": (base, _gate_min(False)),
        },
        "fshade": {
            # fused deferred-shading kernel (round 4): the select+eval raw
            # channel-first outputs + material sample + gates + sky shade
            # in ONE VMEM pass vs the unfused jnp chain
            "fused": replace(base, fused_shading=True),
            "unfused": replace(base, fused_shading=False),
        },
        "gateblk": {
            # gate-refinement block dims (now cfg fields). Capacity-fair:
            # slots scale inversely with block area for the same boundary
            # coverage (oversizing is pessimistic-fair)
            "blk8x16": replace(base, gate_block_h=8, gate_block_w=16,
                               shadow_block_capacity=2560),
            "blk8x8": replace(base, gate_block_h=8, gate_block_w=8,
                              shadow_block_capacity=5632),
            "blk8x32": replace(base, gate_block_h=8, gate_block_w=32),
            "blk16x16": replace(base, gate_block_h=16, gate_block_w=16,
                                shadow_block_capacity=1536),
        },
        "wblend": {
            # windowed-blend engine: Pallas VMEM blend vs the XLA
            # image-domain blend vs flat (N, 4C) rows
            "pallas": (base, _pallas_blend(True)),
            "image3d": (base, _pallas_blend(False)),
            "flat": (base, _flat_blend(True)),
        },
        "rkernel": {
            # raster-kernel plane-eval engine (VPU broadcasts vs the
            # legacy precision-HIGHEST MXU dots)
            "planes-vpu": (base, _mxu_planes(False)),
            "planes-mxu": (base, _mxu_planes(True)),
        },
        "next": {
            # candidate next-default combos (round 3, post dense+bf16).
            # shadow8's wider coarse cells mark a wider refinement band:
            # its settled shadow_block_capacity is 3072 (measured via an
            # engine settle), not base's 2560 — undersizing would silently
            # drop refinement blocks and look fast.
            "full": base,
            "shadow8": replace(base, shadow_lookup_scale=8,
                               shadow_block_capacity=3072),
            "shadow8-sky8": replace(base, shadow_lookup_scale=8,
                                    shadow_block_capacity=3072, sky_scale=8),
            "texscale-2": replace(base, texture_scale=2),
            "shadow8-tex2": replace(base, shadow_lookup_scale=8,
                                    shadow_block_capacity=3072,
                                    texture_scale=2),
            "shadow8-sky8-stoch": replace(base, shadow_lookup_scale=8,
                                          shadow_block_capacity=3072,
                                          sky_scale=8,
                                          texture_filter="stochastic",
                                          windowed_pool=False),
            # dense material sampling (no block compaction): pays ~33%
            # more gather rows on test.lvl but skips the to_blocks/
            # from_blocks relayout round-trip (~3.6 ms in the trace)
            "densetex": replace(base, tex_block_capacity=0),
        },
        "r3": {
            # round-3 levers: gate-refined shadows, RGBE one-gather sky
            "full": base,                      # scale-4 gates + rgbe sky
            "shadowscale-2": replace(base, shadow_lookup_scale=2),
            "shadowscale-8": replace(base, shadow_lookup_scale=8),
            "no-shadows": replace(base, enable_shadows=False),
            "f32-sky": replace(base, sky_rgbe=False),
            "sky-full": replace(base, sky_scale=1),
            "no-ibl": replace(base, enable_ibl=False),
            "preset": base.performance_preset(),
            "stoch-only": replace(base, texture_filter="stochastic",
                                  windowed_pool=False),
        },
        "stream": {
            # CSR stream raster (round-3): gathers/DMA track pair counts
            "stream": base,                    # stream_raster=True default
            "dense": replace(base, stream_raster=False),
            "stream-fused": replace(base, fused_resolve=True),  # dense fused
            "bf16-attrs": replace(base, bf16_attrs=True),
            # capacity right-sizing (exact for test.lvl: measured needs are
            # 840 stream pairs / 29 big tris at the default camera — an
            # UNDERSIZED capacity silently drops work and looks fast, so
            # only sizes >= the measured need are valid A/Bs here)
            "streamcap-8k": replace(base, stream_capacity=8192),
            "streamcap-4k": replace(base, stream_capacity=4096),
            "bigcap-32": replace(base, bin_big_capacity=32),
            "lean": replace(base, stream_capacity=4096,
                            bin_big_capacity=32, bf16_attrs=True),
        },
        "passes": {
            "full": base,
            "no-shadows": replace(base, enable_shadows=False),
            "no-ibl": replace(base, enable_ibl=False),
            "no-forward": replace(base, has_forward=False),
            "forward-only": replace(base, forward_only=True),
            "fused-resolve": replace(base, fused_resolve=True),
            "jnp-raster": replace(base, use_pallas=False),
        },
        "shadow": {
            "full": base,
            "bf16-atlas": replace(base, shadow_bf16=True),
            "shadowscale-4": replace(base, shadow_lookup_scale=4),
            "bf16+scale4": replace(base, shadow_bf16=True,
                                   shadow_lookup_scale=4),
            "no-shadows": replace(base, enable_shadows=False),
        },
        "layout": {
            "full": base,
            "morton": replace(base, morton_pool=True),
            "scale-75": replace(base, render_scale_pct=75),
            "scale-50": replace(base, render_scale_pct=50),
            "preset": base.performance_preset(),
            "preset-morton": replace(base.performance_preset(),
                                     morton_pool=True),
            "preset-75": replace(base.performance_preset(),
                                 render_scale_pct=75),
        },
        "filters": {
            "full": base,                               # windowed dithered
            "trilinear": replace(base, texture_filter="trilinear"),
            "bilinear": replace(base, texture_filter="bilinear"),
            "stochastic": replace(base, texture_filter="stochastic",
                                  windowed_pool=False),
            "narrow-dithered": replace(base, windowed_pool=False),
            "win-stochastic": replace(base, texture_filter="stochastic"),
        },
        "rates": {
            "full": base,
            "texscale-2": replace(base, texture_scale=2),
            "texscale-8": replace(base, texture_scale=8),
            "shadowscale-4": replace(base, shadow_lookup_scale=4),
            "shadowscale-8": replace(base, shadow_lookup_scale=8),
            "sky-16": replace(base, sky_scale=16),
            "preset": base.performance_preset(),
        },
    }
    if args.set == "all":
        variants = {}
        for g in groups.values():
            variants.update(g)
    else:
        variants = groups[args.set]
    if args.set == "stream":
        # the stream path only engages past the dense/scatter crossover
        # (raster.stream_pays_off); force it so small-scene A/Bs measure
        # the stream machinery rather than silently running dense
        from tinyrenderer_tpu.ops import raster as rasterlib
        rasterlib.stream_pays_off = lambda _t: True
        framelib.compiled_frame.cache_clear()

    loops = {}
    for name, entry in variants.items():
        cfg, setup = entry if isinstance(entry, tuple) else (entry, None)
        if setup is not None:
            setup()
            framelib.compiled_frame.cache_clear()
        vpool = eng._packer.pool_for(cfg)
        # steady-state shadow atlas, rendered once per variant config
        # (engine caching semantics; honors shadow_bf16 row width)
        vatlas = None if cfg.forward_only else jax.block_until_ready(
            framelib.compiled_shadow_atlas(cfg)(scene, lights)[0])

        def make(cfg):
            # pool/atlas ride as ARGUMENTS: closure constants over ~100 MB
            # blow the remote-compile request (HTTP 413, CLAUDE.md) — the
            # 25-view multilight atlas is 420 MB
            @jax.jit
            def loop(cam, scene, lights, params, env, vpool, vatlas):
                def step(c, _):
                    out = framelib.render_frame(scene, vpool, lights, c,
                                                params, env, cfg, vatlas)
                    # non-foldable cross-frame dependency (see bench.py)
                    return c + 1e-30 * out.depth[0, 0], out.sdr[0, 0, 0]
                _, outs = jax.lax.scan(step, cam, None, length=N)
                return outs.sum()
            return loop
        loops[name] = (make(cfg), vpool, vatlas)
        print(f"compiling {name}...", flush=True)
        fn, vpool, vatlas = loops[name]
        float(fn(cam0, scene, lights, params, env, vpool, vatlas))

    samples = collections.defaultdict(list)
    for r in range(args.rounds):
        for name, (loop, vpool, vatlas) in loops.items():
            t0 = time.perf_counter()
            float(loop(cam0, scene, lights, params, env, vpool, vatlas))
            samples[name].append((time.perf_counter() - t0) * 1e3 / N)

    print(f"\n{'variant':22s} {'median':>9s} {'min':>9s}   (ms/frame, "
          f"{args.rounds} interleaved rounds)")
    for name, xs in samples.items():
        label = "+".join(name) if isinstance(name, tuple) else name
        print(f"{label:22s} {statistics.median(xs):9.2f} {min(xs):9.2f}")


if __name__ == "__main__":
    main()
