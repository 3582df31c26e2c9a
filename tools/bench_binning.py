"""Isolated A/B of the two binning paths on the real chip.

Times bin_triangles_dense vs bin_triangles_scatter on the test.lvl-sized
pool (T=2048 padded, 1080p tile grid) and the high-poly pool (T=131072),
using the honest scan methodology (chained iterations + host fetch).

    python tools/bench_binning.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, *args, n=30, reps=3):
    @jax.jit
    def loop(seed, *a):
        def step(c, _):
            bins = fn(*a, carry=c)
            return c + 1e-30 * bins.rows[0, 0, 0, 0], bins.ids[0, 0, 0]
        _, outs = jax.lax.scan(step, seed, None, length=n)
        return outs.sum()

    float(loop(jnp.float32(0), *args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(jnp.float32(0), *args))
        ts.append((time.perf_counter() - t0) * 1e3 / n)
    return min(ts)


def main():
    from tinyrenderer_tpu.ops import raster

    rng = np.random.default_rng(3)
    for label, T, n_real, W, H, th, tw, K in (
            ("test.lvl-ish", 2048, 600, 1920, 1088, 64, 128, 256),
            ("high-poly", 131072, 108000, 1920, 1088, 64, 128, 1024)):
        ndc = rng.uniform(-1.05, 1.05, size=(n_real, 3, 3)).astype(np.float32)
        # mostly small triangles: shrink each around its centroid
        c = ndc.mean(axis=1, keepdims=True)
        ndc = c + (ndc - c) * (0.06 if T > 4096 else 0.25)
        ndc[..., 2] = rng.uniform(0.05, 0.95, size=(n_real, 3))
        verts = ndc.reshape(-1, 3)
        clip = jnp.asarray(np.concatenate(
            [verts, np.ones((verts.shape[0], 1), np.float32)], axis=1))
        tri = np.arange(n_real * 3, dtype=np.int32).reshape(-1, 3)
        tri = np.pad(tri, ((0, T - n_real), (0, 0)))
        mask = np.zeros(T, bool)
        mask[:n_real] = True
        setup = raster.triangle_setup(clip, jnp.asarray(tri),
                                      jnp.asarray(mask), W, H, "none")

        def dense(setup, carry):
            s = setup._replace(rows=setup.rows + carry * 1e-30)
            return raster.bin_triangles_dense(s, W, H, th, tw, K)

        def scatter(setup, carry):
            s = setup._replace(rows=setup.rows + carry * 1e-30)
            return raster.bin_triangles_scatter(s, W, H, th, tw, K)

        td = time_fn(lambda s, carry: dense(s, carry), setup)
        ts = time_fn(lambda s, carry: scatter(s, carry), setup)
        print(f"{label:14s} T={T:7d} dense {td:7.3f} ms   "
              f"scatter {ts:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
