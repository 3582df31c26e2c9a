"""Headline benchmark: full deferred frame (PBR + shadows + IBL + post) at
1080p on the bundled test scene, p50 ms/frame on one chip.

Prints exactly one JSON line:
  {"metric": ..., "value": p50_ms, "unit": "ms/frame", "vs_baseline": ...}

vs_baseline is measured against the BASELINE.json target of 16 ms/frame
(<16 ms @1080p full deferred pipeline, single v5e chip); >1.0 means faster
than the target.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_MS = 16.0
WARMUP = 3
ITERS = 30


def build_engine():
    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render.engine import Engine
    from tinyrenderer_tpu.scene import demo

    cfg = RenderConfig(width=1920, height=1080)
    ref_level = "/root/reference/levels/test.lvl"
    if os.path.exists(ref_level):
        return Engine(cfg=cfg, level_path=ref_level)
    return Engine.from_world(demo.build_demo_world(n_cubes=50), cfg=cfg)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tinyrenderer_tpu.render import frame as framelib

    eng = build_engine()
    eng.update(0.0)
    eng._drain_actions()
    env = eng._ensure_env()
    cfg = eng.cfg

    fn = framelib.compiled_frame(cfg)
    scene = eng._pack.scene
    pool = eng._packer.texture_pool_gpu()
    lights = eng._pack.lights
    cam = jnp.asarray(eng.camera.to_raw())
    params = eng.params

    for _ in range(WARMUP):
        out = fn(scene, pool, lights, cam, params, env)
    jax.block_until_ready(out)

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        out = fn(scene, pool, lights, cam, params, env)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    p50 = times[len(times) // 2]

    print(json.dumps({
        "metric": "ms/frame p50, 1080p deferred PBR+shadows+IBL (test.lvl)",
        "value": round(p50, 3),
        "unit": "ms/frame",
        "vs_baseline": round(BASELINE_MS / p50, 3),
        "extra": {
            "backend": jax.default_backend(),
            "p10_ms": round(times[len(times) // 10], 3),
            "p90_ms": round(times[(len(times) * 9) // 10], 3),
            "triangles": int(eng._pack.counts["triangles"]),
            "shadow_views": int(cfg.num_shadow_views),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
