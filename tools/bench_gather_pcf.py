"""A/B the shadow-refinement PCF gather forms on the real chip.

The 1080p trace attributed 2.4 ms/frame to the refinement's windowed-PCF
gather (393k rows of f32[4] from the 7.34M-row windowed atlas) — 165M
rows/s, vs 310M rows/s for the sky's u8[16] gathers from a same-sized
table. Hypothesis: gathering the same 16 bytes as u8[16] (bitcast, exact)
is faster than f32[4]. Indices ride the scan carry so nothing hoists
(CLAUDE.md microbench trap); forms are interleaved in one process.

    python tools/bench_gather_pcf.py [--rounds 5]
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
    ap.add_argument("--rows", type=int, default=393216)
    ap.add_argument("--table", type=int, default=7 * 1024 * 1024)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((args.table, 4)), jnp.float32)
    table_u8 = jax.lax.bitcast_convert_type(table, jnp.uint8).reshape(-1, 16)
    # refinement-like index stream: blocks of 128 locally-coherent taps at
    # scattered block bases (the (light, block) work-list pattern)
    nblk = args.rows // 128
    bases = rng.integers(0, args.table - 4096, nblk)[:, None]
    local = rng.integers(0, 4096, (nblk, 128))
    idx0 = jnp.asarray((bases + local).reshape(-1), jnp.int32)
    N = args.frames

    def make(kind):
        @jax.jit
        def loop(carry):
            def step(c, _):
                idx = (idx0 + c) % (args.table - 1)
                if kind == "f32x4":
                    w = jnp.take(table, idx, axis=0)
                    s = w.sum()
                elif kind == "u8x16":
                    raw = jnp.take(table_u8, idx, axis=0)
                    w = jax.lax.bitcast_convert_type(
                        raw.reshape(-1, 4, 4), jnp.float32)
                    s = w.sum()
                else:  # 4 separate narrow 4B taps (the pre-window form)
                    col = table[:, 0]
                    s = sum(jnp.take(col, (idx + k) % args.table).sum()
                            for k in range(4))
                return c + (s * 1e-30).astype(jnp.int32) + 1, s
            _, outs = jax.lax.scan(step, carry, None, length=N)
            return outs.sum()
        return loop

    loops = {k: make(k) for k in ("f32x4", "u8x16", "4taps")}
    for k, fn in loops.items():
        print(f"compiling {k}...", flush=True)
        float(fn(jnp.int32(0)))
    samples = collections.defaultdict(list)
    for _ in range(args.rounds):
        for k, fn in loops.items():
            t0 = time.perf_counter()
            float(fn(jnp.int32(0)))
            samples[k].append((time.perf_counter() - t0) * 1e3 / N)
    print(f"\n{'form':8s} {'median':>9s} {'min':>9s}  (ms per "
          f"{args.rows} rows)")
    for k, xs in samples.items():
        print(f"{k:8s} {statistics.median(xs):9.3f} {min(xs):9.3f}")


if __name__ == "__main__":
    main()
