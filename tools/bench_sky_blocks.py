"""Op-level study of the block-compacted exact sky's gather cost.

The full-frame A/B measured sky_block_capacity=2048 at +16.7 ms while
DENSE full-rate sky (2M rows) costs ~+15 ms — per-row costs differing 4x
with shape/locality. This times the compacted-sky op alone (honest scan
timing, real cross-iteration dependence via a camera nudge) across:
capacity, RGBE-windowed vs f32 cube, and (K, bh, bw) block shapes vs
(M, 128) full-lane reshapes.

    python tools/bench_sky_blocks.py [--rounds 4]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    from tinyrenderer_tpu.ops import env as envops
    from tinyrenderer_tpu.ops import sampling
    from tinyrenderer_tpu.scene.camera import Camera

    S = 256
    rng = np.random.default_rng(3)
    cube = jnp.asarray(rng.uniform(0, 4, (6, S, S, 3)).astype(np.float32))
    rgbe = jax.jit(sampling.encode_rgbe_windowed)(cube)
    cam = Camera.new_default(1920, 1080)
    raw = jnp.asarray(cam.to_raw())
    proj_inv = raw[64:80].reshape(4, 4)
    view_rot = raw[32:48].reshape(4, 4)[:3, :3]

    PH, PW = 1088, 1920
    bh, bw = 8, 32
    nbx = PW // bw
    n_blocks = (PH // bh) * nbx

    def make(K, use_rgbe, flat):
        # contiguous sky-like block set (top of frame), cross-iteration
        # dependence: slots roll by the carry so the gather can't hoist
        base_slots = jnp.arange(K, dtype=jnp.int32)

        @jax.jit
        def loop(c0):
            def step(c, _):
                slots = (base_slots + c.astype(jnp.int32)) % n_blocks
                cols = envops.skybox_colors_blocks(
                    cube, proj_inv, view_rot, slots, bh, bw, nbx, PW, PH,
                    rgbe_win=(rgbe if use_rgbe else None))
                s = cols.sum()
                return c + 1e-30 * s, s
            _, outs = jax.lax.scan(step, c0, None, length=args.frames)
            return outs.sum()

        jax.block_until_ready(loop(jnp.float32(0)))
        return loop

    # flat variant: same pixel set, (M, 128) lane-shaped
    def make_flat(K, use_rgbe):
        M = K * bh * bw // 128
        base = jnp.arange(M * 128, dtype=jnp.int32).reshape(M, 128)

        @jax.jit
        def loop(c0):
            def step(c, _):
                pix = (base + c.astype(jnp.int32) * 256) % (n_blocks * 256)
                b = pix // (bh * bw)
                r = pix % (bh * bw)
                py = ((b // nbx) * bh + r // bw).astype(jnp.float32) + 0.5
                px = ((b % nbx) * bw + r % bw).astype(jnp.float32) + 0.5
                x = (px / PW) * 2.0 - 1.0
                y = -((py / PH) * 2.0 - 1.0)
                ndc = jnp.stack([x, y, jnp.zeros_like(x),
                                 jnp.ones_like(x)], axis=-1)
                un = jnp.einsum("mwj,ij->mwi", ndc, proj_inv,
                                preferred_element_type=jnp.float32)
                d = jnp.einsum("mwj,ij->mwi", un[..., :3], view_rot,
                               preferred_element_type=jnp.float32)
                if use_rgbe:
                    cols = sampling.sample_cubemap_rgbe_windowed(rgbe, d)
                else:
                    cols = sampling.sample_cubemap(cube, d)
                s = cols.sum()
                return c + 1e-30 * s, s
            _, outs = jax.lax.scan(step, c0, None, length=args.frames)
            return outs.sum()

        jax.block_until_ready(loop(jnp.float32(0)))
        return loop

    variants = {}
    for K in (512, 2048):
        variants[f"blk_rgbe_K{K}"] = make(K, True, False)
        variants[f"blk_f32_K{K}"] = make(K, False, False)
        variants[f"flat_rgbe_K{K}"] = make_flat(K, True)
    variants["flat_f32_K2048"] = make_flat(2048, False)
    print("warmed all", flush=True)

    times = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            float(fn(jnp.float32(0)))
            times[name].append(
                (time.perf_counter() - t0) * 1e3 / args.frames)
        print(f"round {r}: " + "  ".join(
            f"{k}={times[k][-1]:.2f}" for k in variants), flush=True)
    print("\n=== medians (ms per eval) ===")
    for k, v in times.items():
        rows = int(k.split("K")[1]) * bh * bw
        med = statistics.median(v)
        print(f"{k:18s} {med:7.3f} ms   {rows/med/1e3:8.0f}K rows/ms")


def full_pipeline() -> None:
    """Time frame._sky_image end-to-end (plan + blocks op + scatter +
    untile) against the bare blocks op, from a synthetic valid mask."""
    import argparse

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render import frame as framelib
    from tinyrenderer_tpu.ops import env as envops
    from tinyrenderer_tpu.ops import sampling
    from tinyrenderer_tpu.scene.camera import Camera

    frames = 8
    S = 256
    rng = np.random.default_rng(3)
    cube = jnp.asarray(rng.uniform(0, 4, (6, S, S, 3)).astype(np.float32))
    rgbe = jax.jit(sampling.encode_rgbe_windowed)(cube)
    env = framelib.EnvGPU(env_cube=cube, irradiance=None,
                          irradiance_sh=None, sky_rgbe=rgbe)
    cam = Camera.new_default(1920, 1080)
    raw = jnp.asarray(cam.to_raw())
    camd = framelib._unpack_camera(raw)
    PH, PW = 1088, 1920
    cfg = RenderConfig(width=1920, height=1080, sky_block_capacity=2048)
    # synthetic mask: top quarter is sky (like the test.lvl view)
    valid_np = np.ones((PH, PW), bool)
    valid_np[: PH // 4] = False
    valid0 = jnp.asarray(valid_np)

    @jax.jit
    def loop(c0):
        def step(c, _):
            # roll the mask so the plan can't be hoisted
            v = jnp.roll(valid0, c.astype(jnp.int32) % 8, axis=0)
            sky, needed = framelib._sky_image(cfg, env, camd, v, PW, PH)
            s = sky.sum() + needed.astype(jnp.float32)
            return c + 1e-30 * s, s
        _, outs = jax.lax.scan(step, c0, None, length=frames)
        return outs.sum()

    @jax.jit
    def loop_scaled(c0):
        cfg2 = RenderConfig(width=1920, height=1080)  # sky_scale=8 path
        def step(c, _):
            v = jnp.roll(valid0, c.astype(jnp.int32) % 8, axis=0)
            sky, needed = framelib._sky_image(cfg2, env, camd, v, PW, PH)
            s = sky.sum() + needed.astype(jnp.float32) + v.sum()
            return c + 1e-30 * s, s
        _, outs = jax.lax.scan(step, c0, None, length=frames)
        return outs.sum()

    import statistics
    import time as timelib
    for name, fn in (("sky_image_compact", loop),
                     ("sky_image_scale8", loop_scaled)):
        jax.block_until_ready(fn(jnp.float32(0)))
        ts = []
        for _ in range(4):
            t0 = timelib.perf_counter()
            float(fn(jnp.float32(0)))
            ts.append((timelib.perf_counter() - t0) * 1e3 / frames)
        print(f"{name:20s} {statistics.median(ts):7.3f} ms", flush=True)


if __name__ == "__main__":
    if "--pipeline" in sys.argv:
        sys.argv.remove("--pipeline")
        full_pipeline()
    else:
        main()
