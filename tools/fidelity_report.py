"""Fidelity report: measure image deltas between the reference_parity()
preset (trilinear, full-rate lookups, 1024^2 pool — the reference's exact
sampling) and the default / performance configs, on the reference's
test.lvl at 1080p.

Prints a markdown table (PSNR over tone-mapped sRGB output, % pixels with
any channel differing by more than 1 and 4 LSB) for PARITY.md.

    python tools/fidelity_report.py [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def psnr(a, b) -> float:
    import numpy as np
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return float("inf") if mse == 0 else 10.0 * np.log10(255.0 ** 2 / mse)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (slow, deterministic)")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--save-dir", default="",
                    help="also dump the rendered PNGs here")
    ap.add_argument("--time", type=int, default=0, metavar="ROUNDS",
                    help="also measure ms/frame per config, interleaved "
                         "round-robin (honest scan timing) — the full "
                         "fidelity/speed decision table in one process")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--only", default="",
                    help="comma-separated config-name filter")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render.engine import Engine

    from dataclasses import replace

    base = RenderConfig(width=args.width, height=args.height)
    configs = {
        "reference_parity": base.reference_parity(),
        "default": base,   # dense raster + bf16_attrs as of round 3
        "default_f32_attrs": replace(base, bf16_attrs=False),
        "default_shadow8": replace(base, shadow_lookup_scale=8),
        "default_shadow8_sky8": replace(base, shadow_lookup_scale=8,
                                        sky_scale=8),
        "default_texscale2": replace(base, texture_scale=2),
        # error-source isolation for the fidelity/speed closure (VERDICT
        # r4 #3): which lever pays for the default's >1 LSB pixels?
        "default_trilinear": replace(base, texture_filter="trilinear"),
        "default_sky1": replace(base, sky_scale=1),
        "default_sky4": replace(base, sky_scale=4),
        "default_shadow4": replace(base, shadow_lookup_scale=4),
        "default_f32_atlas": replace(base, shadow_bf16=False),
        "default_trilinear_sky4": replace(base, texture_filter="trilinear",
                                          sky_scale=4),
        "default_skybilinear": replace(base, sky_upsample="bilinear"),
        "default_sky4_cubic": replace(base, sky_scale=4),
        "default_skyblk": replace(base, sky_block_capacity=2048),
        "default_skyblk_trilinear": replace(base, sky_block_capacity=2048,
                                            texture_filter="trilinear"),
        "default_75pct": replace(base, render_scale_pct=75),
        "fidelity_preset": base.fidelity_preset(),
        "performance_preset": base.performance_preset(),
        "preset_75pct": replace(base.performance_preset(),
                                render_scale_pct=75),
    }

    if args.only:
        keep = set(args.only.split(","))
        keep.add("reference_parity")   # the comparison baseline
        configs = {k: v for k, v in configs.items() if k in keep}

    frames = {}
    engines = {}
    for name, cfg in configs.items():
        eng = Engine(cfg=cfg, level_path="/root/reference/levels/test.lvl")
        for _ in range(4):  # let capacity monitors settle
            out = eng.run_frame(0.0)
        engines[name] = eng
        frames[name] = np.asarray(out.sdr)
        if args.save_dir:
            from tinyrenderer_tpu.utils import image_io
            os.makedirs(args.save_dir, exist_ok=True)
            image_io.save_png(os.path.join(args.save_dir, f"{name}.png"),
                              frames[name])
        print(f"# rendered {name}", file=sys.stderr)

    times = {}
    if args.time > 0:
        import statistics
        import time as timelib

        import jax
        import jax.numpy as jnp

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench

        loops = {}
        for name, eng in engines.items():
            eng.update(0.0)
            eng._drain_actions()
            env = eng._ensure_env()
            loop = bench._frame_loop(eng, args.frames)
            a = (jnp.asarray(eng.camera.to_raw()), eng._pack.scene,
                 eng._packer.pool_for(eng.cfg), eng._pack.lights,
                 eng.params, env, eng._atlas)
            t0 = timelib.perf_counter()
            float(loop(*a))
            float(loop(*a))
            print(f"# warmed {name} loop in "
                  f"{timelib.perf_counter()-t0:.0f}s", file=sys.stderr)
            loops[name] = (loop, a)
        raw = {k: [] for k in loops}
        for r in range(args.time):
            for name, (loop, a) in loops.items():
                t0 = timelib.perf_counter()
                float(loop(*a))
                raw[name].append(
                    (timelib.perf_counter() - t0) * 1e3 / args.frames)
            print(f"# round {r}: " + "  ".join(
                f"{k}={raw[k][-1]:.1f}" for k in loops), file=sys.stderr)
        times = {k: statistics.median(v) for k, v in raw.items()}

    ref = frames["reference_parity"]
    tcol = " ms/frame |" if times else ""
    print(f"| config | PSNR (dB) | % pixels >1 LSB | % pixels >4 LSB |"
          + tcol)
    print("|---|---|---|---|" + ("---|" if times else ""))
    for name, img in frames.items():
        d = np.abs(img.astype(np.int16) - ref.astype(np.int16)).max(axis=-1)
        p = psnr(img, ref)
        trow = f" {times[name]:.2f} |" if times else ""
        print(f"| {name} | {'exact' if p == float('inf') else f'{p:.1f}'} | "
              f"{100.0 * (d > 1).mean():.2f}% | "
              f"{100.0 * (d > 4).mean():.2f}% |" + trow)


if __name__ == "__main__":
    main()
