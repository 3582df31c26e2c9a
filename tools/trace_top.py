"""Rank XLA ops by device self-time from a jax.profiler trace.

Captures one traced render of the given config (or parses an existing
trace dir) and prints the top fusions/ops on the TPU track. Trace-
attributed times do NOT subtract DMA/compute overlap (CLAUDE.md) — use
this to find WHAT is big, then interleaved A/B (profile_frame) to verify
any change.

    python tools/trace_top.py [--dir /tmp/trace] [--top 40] [--shadow8]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def capture(trace_dir: str, shadow8: bool = False, scene: str = "test",
            multilight: bool = False) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dataclasses import replace

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render import frame as framelib
    from tinyrenderer_tpu.render.engine import Engine

    if scene != "test":
        import bench
        eng = bench.build_engine(stress=(scene == "stress"),
                                 highpoly=(scene == "highpoly"),
                                 multilight=multilight)
    else:
        cfg = RenderConfig(width=1920, height=1080)
        if shadow8:
            cfg = replace(cfg, shadow_lookup_scale=8,
                          shadow_block_capacity=3072)
        if multilight:
            import bench
            eng = bench.build_engine(multilight=True)
        else:
            eng = Engine(cfg=cfg,
                         level_path="/root/reference/levels/test.lvl")
    eng.update(0.0)
    eng._drain_actions()
    for _ in range(4):
        out = eng.run_frame(0.0)
        np.asarray(out.tex_overflow)
    env = eng._ensure_env()
    cfg = eng.cfg
    scene = eng._pack.scene
    pool = eng._packer.pool_for(cfg)
    lights = eng._pack.lights
    cam0 = jnp.asarray(eng.camera.to_raw())
    atlas = jax.block_until_ready(
        framelib.compiled_shadow_atlas(cfg)(scene, lights)[0])
    fn = framelib.compiled_frame(cfg)
    args = (scene, pool, lights, cam0, eng.params, env, atlas)
    np.asarray(fn(*args).sdr)  # warm
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            np.asarray(fn(*args).sdr)  # fetch forces completion in-trace


def parse(trace_dir: str, top: int) -> None:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-track pids (names like "/device:TPU:0" or "TPU:0")
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n.upper() or "device" in n.lower()}
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            tot[name] += e.get("dur", 0)
            cnt[name] += 1
    grand = sum(tot.values())
    print(f"# {path}")
    print(f"# total device-track time: {grand / 1e3:.2f} ms "
          f"(2 frames; includes overlap double-count)")
    print(f"{'us':>10s} {'n':>4s}  op")
    for name, us in tot.most_common(top):
        print(f"{us:10.0f} {cnt[name]:4d}  {name[:110]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/trace_top")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--shadow8", action="store_true")
    ap.add_argument("--multilight", action="store_true")
    ap.add_argument("--scene", default="test",
                    choices=["test", "stress", "highpoly"])
    args = ap.parse_args()
    if not args.parse_only:
        capture(args.dir, shadow8=args.shadow8, scene=args.scene,
                multilight=args.multilight)
    parse(args.dir, args.top)


if __name__ == "__main__":
    main()
