"""Interleaved A/B of a code or config variant on the FULL headline frame.

--flag: traces the frame twice — once with the named module attribute
False, once True — into two independently jitted callables (bypassing the
compiled_frame lru-cache). --cfg: builds a SECOND engine with the given
RenderConfig overrides (settled independently) and interleaves the two.
Either way the variants are timed round-robin with bench.py's scan
methodology, so tenancy drift cancels.

    python tools/ab_frame.py --flag tinyrenderer_tpu.ops.shadows:_GATE_GATHER_2D
    python tools/ab_frame.py --cfg sky_block_capacity=2048 --rounds 6
    python tools/ab_frame.py --flag ...:FLAG --scene highpoly --rounds 6
"""

from __future__ import annotations

import argparse
import importlib
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flag", default="",
                    help="module.path:ATTR to flip between traces")
    ap.add_argument("--cfg", default="",
                    help="comma-separated RenderConfig overrides "
                         "(key=value) for the B variant")
    ap.add_argument("--scene", default="test",
                    choices=["test", "stress", "highpoly", "multilight"])
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()
    assert bool(args.flag) != bool(args.cfg), "pass exactly one of " \
        "--flag / --cfg"

    mod = attr = None
    if args.flag:
        modname, attr = args.flag.split(":")
        mod = importlib.import_module(modname)
        assert hasattr(mod, attr), f"{modname} has no {attr}"

    import jax
    import jax.numpy as jnp

    import bench
    from tinyrenderer_tpu.render import frame as framelib

    n = args.frames

    def settle(eng):
        eng.update(0.0)
        eng._drain_actions()
        for _ in range(10):
            eng.run_frame(0.0)
        if eng._overflow_inflight:
            eng.drain_monitors()
            for _ in range(2):
                eng.run_frame(0.0)
        return eng

    def build():
        return settle(bench.build_engine(
            stress=(args.scene == "stress"),
            highpoly=(args.scene == "highpoly"),
            multilight=(args.scene == "multilight")))

    def make_loop(eng):
        """Fresh jit of the engine's frame scan (traces NOW, capturing
        the current module-flag values as Python constants). Scene/pool/
        atlas flow as ARGUMENTS — closure constants >~100 MB (the stress
        scene's 2K shadow atlas) blow the remote-compile request
        (CLAUDE.md, HTTP 413)."""
        env = eng._ensure_env()
        cfg = eng.cfg
        args = (eng._pack.scene, eng._packer.pool_for(cfg),
                eng._pack.lights, eng.params, env, eng._atlas)

        @jax.jit
        def loop(cam, scene, pool, lights, params, env_, atlas):
            def step(c, _):
                out = framelib.render_frame(scene, pool, lights, c, params,
                                            env_, cfg, atlas)
                return (c + 1e-30 * out.sdr[0, 0, 0].astype(jnp.float32),
                        out.sdr[0, 0, 0].astype(jnp.int32))
            _, outs = jax.lax.scan(step, cam, None, length=n)
            return outs.sum()

        jax.block_until_ready(loop(cam0, *args))
        return lambda cam: loop(cam, *args)

    eng = build()
    cam0 = jnp.asarray(eng.camera.to_raw())

    variants = {}
    if args.flag:
        for val in (False, True):
            setattr(mod, attr, val)
            t0 = time.perf_counter()
            variants[f"{attr}={val}"] = make_loop(eng)
            float(variants[f"{attr}={val}"](cam0))
            print(f"traced {attr}={val} in {time.perf_counter()-t0:.1f}s",
                  flush=True)
        setattr(mod, attr, True)
    else:
        from dataclasses import replace
        overrides = {}
        for kv in args.cfg.split(","):
            k, v = kv.split("=")
            cur = getattr(eng.cfg, k)
            overrides[k] = (type(cur)(v) if not isinstance(cur, bool)
                            else v.lower() in ("1", "true"))
        t0 = time.perf_counter()
        variants["base"] = make_loop(eng)
        float(variants["base"](cam0))
        print(f"traced base in {time.perf_counter()-t0:.1f}s", flush=True)
        eng_b = settle(bench.build_engine(
            stress=(args.scene == "stress"),
            highpoly=(args.scene == "highpoly"),
            multilight=(args.scene == "multilight"),
            cfg_overrides=overrides))
        t0 = time.perf_counter()
        variants[args.cfg] = make_loop(eng_b)
        float(variants[args.cfg](cam0))
        print(f"traced {args.cfg} in {time.perf_counter()-t0:.1f}s",
              flush=True)

    times = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            float(fn(cam0))
            times[name].append((time.perf_counter() - t0) * 1e3 / n)
        print(f"round {r}: " + "  ".join(
            f"{k}={times[k][-1]:.2f}" for k in variants), flush=True)

    meds = {k: statistics.median(v) for k, v in times.items()}
    print("\n=== medians (ms/frame) ===")
    for k, v in meds.items():
        print(f"{k:30s} {v:8.3f}")
    ks = list(meds)
    print(f"delta (True - False): {meds[ks[1]] - meds[ks[0]]:+.3f} ms")


if __name__ == "__main__":
    main()
