"""Interleaved frame profiler: measures config variants round-robin in one
process so shared-TPU tenancy drift cancels out of the comparison.

Usage: python tools/profile_frame.py [--width W --height H] [--rounds R]
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
    args = ap.parse_args()

    from dataclasses import replace

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render import frame as framelib
    from tinyrenderer_tpu.render.engine import Engine

    eng = Engine(cfg=RenderConfig(width=args.width, height=args.height),
                 level_path="/root/reference/levels/test.lvl")
    eng.update(0.0)
    eng._drain_actions()
    env = eng._ensure_env()
    base = eng.cfg
    scene = eng._pack.scene
    pool = eng._packer.texture_pool_gpu()
    lights = eng._pack.lights
    cam0 = jnp.asarray(eng.camera.to_raw())
    params = eng.params
    N = args.frames

    variants = {
        "full": base,
        "no-shadows": replace(base, enable_shadows=False),
        "no-ibl": replace(base, enable_ibl=False),
        "forward-only": replace(base, forward_only=True),
        "trilinear": replace(base, texture_filter="trilinear"),
        "bilinear": replace(base, texture_filter="bilinear"),
        "shadow-scale-4": replace(base, shadow_lookup_scale=4),
        "jnp-raster": replace(base, use_pallas=False),
    }

    loops = {}
    for name, cfg in variants.items():
        def make(cfg):
            @jax.jit
            def loop(cam, scene, pool, lights, params, env):
                def step(c, _):
                    out = framelib.render_frame(scene, pool, lights, c,
                                                params, env, cfg)
                    return cam0 + 0.0 * out.depth[0, 0], out.sdr[0, 0, 0]
                _, outs = jax.lax.scan(step, cam, None, length=N)
                return outs.sum()
            return loop
        loops[name] = make(cfg)
        print(f"compiling {name}...", flush=True)
        float(loops[name](cam0, scene, pool, lights, params, env))

    samples = collections.defaultdict(list)
    for r in range(args.rounds):
        for name, loop in loops.items():
            t0 = time.perf_counter()
            float(loop(cam0, scene, pool, lights, params, env))
            samples[name].append((time.perf_counter() - t0) * 1e3 / N)

    print(f"\n{'variant':18s} {'median':>9s} {'min':>9s}   (ms/frame, "
          f"{args.rounds} interleaved rounds)")
    for name, xs in samples.items():
        print(f"{name:18s} {statistics.median(xs):9.2f} {min(xs):9.2f}")


if __name__ == "__main__":
    main()
