"""Headline benchmark: full deferred frame (PBR + shadows + IBL + post) at
1080p on the bundled test scene, p50 ms/frame on one chip.

Prints exactly one JSON line:
  {"metric": ..., "value": p50_ms, "unit": "ms/frame", "vs_baseline": ...}

vs_baseline is measured against the BASELINE.json target of 16 ms/frame
(<16 ms @1080p full deferred pipeline, single v5e chip); >1.0 means faster
than the target.

Un-loseable structure (VERDICT r4 item #1 — round 4 recorded NOTHING
because the battery outgrew the driver timeout): the headline is measured
FIRST and recorded into a module-global result; every secondary metric
runs under a global wall-clock budget (BENCH_BUDGET_S, default 900 s) and
is skipped with {"skipped": "budget"} when the remaining time is smaller
than its cost estimate; a daemon watchdog thread emits the best-so-far
JSON line and exits the process shortly before the budget expires even if
the main thread is wedged in a device fetch (the axon tunnel can hang
without raising); SIGTERM (what `timeout` sends) emits the same line.
The result is mutated under a lock as each secondary lands, so whatever
has completed by emission time is in the line.

Fault model: the chip is time-shared behind a tunnel and individual device
fetches can fail with transient ABORTED/UNAVAILABLE errors. Every device
measurement retries (backoff capped by the remaining budget), every
secondary metric is failure-isolated (error field on failure), and the
JSON line is emitted even on partial failure.

Timing methodology (see CLAUDE.md): block_until_ready does not block over
the tunnel, so N frames are chained inside one jitted lax.scan, each step's
camera carrying a non-foldable 1e-30 * depth dependency on the previous
frame, finished by a host fetch. The scan is timed over several repetitions
(real p10/p50/p90), and a scan-length-doubling check guards the whole
methodology against constant folding.

The CPU software-raster comparison point (~20 min of CPU compile+execute)
is read from tools/cpu_raster_cache.json (committed; regenerate with
--recache-cpu) instead of re-measuring every driver run.

Modes:
  (default)   1080p deferred headline + the BASELINE.json battery
              (configs 1-5 under extra.configs), parity frame time,
              fidelity, raster throughput, TPU golden verification —
              every secondary budget-gated and failure-isolated
  --forward / --stress / --fast: single-config variants
  --verify-only: just the on-chip golden verification
  --budget-s N: override the wall-clock budget
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

BASELINE_MS = 16.0
WARMUP = 2
# frames per scan: the timed unit is one scan + ONE host fetch, so the
# tunnel round-trip (~35 ms) amortizes as RTT/ITERS per frame — a
# measured 3.5 ms/frame at N=10 for an EMPTY scan body
# (tools/bench_stages.py 'null' row). 32 frames/scan keeps that
# measurement tax ~1 ms; the scan-doubling check still guards against
# constant folding.
ITERS = 32
REPS = 4            # timed scan repetitions (percentiles over these)
RETRIES = 5
# tunnel outages last minutes, not seconds — but a round-end bench must
# fit the driver timeout, so backoff escalates only while budget remains
# (_retry stops early when the next sleep would cross the deadline).
_BACKOFF_S = (2.0, 10.0, 30.0, 90.0, 180.0)
_BACKOFF_FAST_S = (2.0, 5.0, 10.0)   # secondaries: fail fast, stay in budget

_TRANSIENT = ("ABORTED", "UNAVAILABLE", "DEADLINE", "INTERNAL",
              "RESOURCE_EXHAUSTED", "Socket closed", "Connection reset")

CPU_CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "cpu_raster_cache.json")

# ---------------------------------------------------------------------------
# Global result state: the watchdog/SIGTERM path and the normal path both
# emit from here; whoever emits first wins (exactly one JSON line).

_LOCK = threading.Lock()
_RESULT: dict = {"metric": "ms/frame p50, 1080p deferred PBR+shadows+IBL "
                           "(test.lvl)",
                 "unit": "ms/frame", "value": None,
                 "error": "headline did not complete before emission"}
_EMITTED = False
_DEADLINE = None  # set in main()


def _remaining() -> float:
    return float("inf") if _DEADLINE is None else _DEADLINE - time.time()


def _emit(exit_now: bool = False):
    """Print the one JSON line (first caller wins) and optionally exit."""
    global _EMITTED
    with _LOCK:
        if not _EMITTED:
            print(json.dumps(_RESULT), flush=True)
            _EMITTED = True
    if exit_now:
        # os._exit: the main thread may be wedged inside a device fetch
        # that never returns; a normal exit would join it forever.
        os._exit(0 if _RESULT.get("value") is not None else 1)


def _extra_update(key, value):
    with _LOCK:
        _RESULT.setdefault("extra", {})[key] = value


def _start_watchdog(deadline: float):
    """Emit the best-so-far line shortly before the budget expires, even if
    the main thread is stuck in a hung tunnel call (signal handlers don't
    run while the main thread is blocked in C — a thread does)."""
    def run():
        while True:
            dt = deadline - time.time()
            if dt <= 0:
                print("# watchdog: budget exhausted, emitting partial result",
                      file=sys.stderr)
                _emit(exit_now=True)
            time.sleep(min(dt, 5.0))
    t = threading.Thread(target=run, daemon=True, name="bench-watchdog")
    t.start()


def _install_sigterm():
    import signal

    def handler(signum, frame):  # noqa: ARG001
        print(f"# signal {signum}: emitting partial result", file=sys.stderr)
        _emit(exit_now=True)
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, handler)
        except (ValueError, OSError):
            pass


def _retry(fn, attempts: int = RETRIES, label: str = "", fast: bool = False):
    """Run a device computation, retrying on transient tunnel/tenancy errors.

    Backoff never sleeps past the global deadline minus a 20 s emission
    margin — better to record a partial battery than to sleep through the
    driver timeout."""
    last = None
    ladder = _BACKOFF_FAST_S if fast else _BACKOFF_S
    attempts = min(attempts, len(ladder) + 1) if fast else attempts
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — jax raises various subclasses
            last = e
            msg = str(e)
            if not any(t in msg for t in _TRANSIENT):
                raise
            wait = ladder[min(a, len(ladder) - 1)]
            if wait > _remaining() - 20.0:
                print(f"# transient error on {label or 'op'}: backoff would "
                      f"cross the budget deadline; giving up", file=sys.stderr)
                raise
            print(f"# transient TPU error on {label or 'op'} "
                  f"(attempt {a + 1}/{attempts}): {msg.splitlines()[0][:120]}",
                  file=sys.stderr)
            time.sleep(wait)
    raise last


def build_engine(stress: bool = False, forward: bool = False,
                 highpoly: bool = False, envpass: bool = False,
                 multilight: bool = False, parity: bool = False,
                 cfg_overrides: dict | None = None):
    from dataclasses import replace as _replace

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render.engine import Engine
    from tinyrenderer_tpu.scene import demo

    if cfg_overrides:
        # apply RenderConfig field overrides to whichever scene config the
        # flags below produce (tools/ab_frame.py --cfg variants)
        _orig_init = Engine.__init__

        def _patched(self, cfg=None, **kw):
            _orig_init(self, cfg=_replace(cfg or RenderConfig(),
                                          **cfg_overrides), **kw)

        Engine.__init__ = _patched
        try:
            return build_engine(stress=stress, forward=forward,
                                highpoly=highpoly, envpass=envpass,
                                multilight=multilight, parity=parity)
        finally:
            Engine.__init__ = _orig_init

    ref_level = "/root/reference/levels/test.lvl"
    if forward:
        # BASELINE config 1: forward pass, one directional light, 800x600
        cfg = RenderConfig(width=800, height=600, forward_only=True,
                           enable_shadows=False, enable_ibl=False,
                           enable_ssr=False)
        if os.path.exists(ref_level):
            return Engine(cfg=cfg, level_path=ref_level)
        return Engine.from_world(
            demo.build_demo_world(n_cubes=50, with_point_light=False),
            camera=demo.build_demo_camera(cfg.width, cfg.height), cfg=cfg)
    if stress:
        # BASELINE config 5: 500+ draws, 2K shadow atlas, 1440p
        # gate_block (8, 8): this scene's shadow edges tile the whole
        # floor, so refined ROW COUNT dominates the gather cost — the
        # smallest full-sublane block wins (70.4 vs 82.0 ms at (8, 32),
        # capacity-fair interleaved)
        cfg = RenderConfig(width=2560, height=1440, shadow_size=2048,
                           max_instances=1024, max_vertices=16384,
                           max_triangles=8192, max_materials=1024,
                           bin_capacity=512, gate_block_h=8, gate_block_w=8)
        eng = Engine.from_world(
            demo.build_stress_world(500),
            camera=demo.build_demo_camera(cfg.width, cfg.height), cfg=cfg)
        # Scene-appropriate shadow bias (the live GlobalParams knob,
        # src/global_params.rs:26-29): this scene's 150-unit directional
        # ortho box at 2048 texels self-shadows every lit face at bias 0
        # (acne), which also floods the gate refinement with fake
        # boundary blocks (13.5k -> 9.6k at 2e-3, measured)
        from tinyrenderer_tpu.render import frame as framelib
        eng.set_param(framelib.PARAM_SHADOW_BIAS, 2e-3)
        return eng
    if highpoly:
        # raster-throughput scene: 9 high-poly spheres (~110k triangles).
        # (8, 128) tiles: high-poly triangles are a few pixels, so the
        # CSR stream kernels' per-pair plane evaluation wastes 8x fewer
        # tile pixels than the default (64, 128) — raster stage measured
        # 8.3 vs 15.9 ms at 108k triangles.
        cfg = RenderConfig(width=1920, height=1080, max_instances=64,
                           max_vertices=131072, max_triangles=131072,
                           bin_capacity=1024, tile_h=8)
        return Engine.from_world(
            demo.build_highpoly_world(9),
            camera=demo.build_demo_camera(cfg.width, cfg.height), cfg=cfg)
    if multilight:
        # BASELINE config 2: the deferred scene with 4 point + 1 directional
        # light (25 shadow views)
        import numpy as np
        from tinyrenderer_tpu.scene import components as comp
        from tinyrenderer_tpu.scene.world import WorldObject
        cfg = RenderConfig(width=1920, height=1080)
        eng = (Engine(cfg=cfg, level_path=ref_level)
               if os.path.exists(ref_level) else
               Engine.from_world(demo.build_demo_world(n_cubes=50),
                                 camera=demo.build_demo_camera(cfg.width,
                                                               cfg.height),
                                 cfg=cfg))
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
        return eng
    cfg = RenderConfig(width=1920, height=1080)
    if parity:
        # The reference's exact sampling contract (src/texture.rs:264-266:
        # trilinear, native-size per-texture pyramids, full-rate lookups).
        cfg = cfg.reference_parity()
    if envpass:
        # BASELINE config 3 differs from the default only in exercising the
        # env precompute chain explicitly (equirect->cubemap->irradiance->SH);
        # its per-frame pipeline is the same full deferred frame.
        pass
    if os.path.exists(ref_level):
        return Engine(cfg=cfg, level_path=ref_level)
    return Engine.from_world(
        demo.build_demo_world(n_cubes=50),
        camera=demo.build_demo_camera(cfg.width, cfg.height), cfg=cfg)


def _frame_loop(eng, n: int):
    """Jitted scan of n chained frames for the engine's current config."""
    import jax

    from tinyrenderer_tpu.render import frame as framelib

    cfgc = eng.cfg

    @jax.jit
    def loop(cam, scene, pool, lights, params, env, atlas):
        def step(c, _):
            out = framelib.render_frame(scene, pool, lights, c, params, env,
                                        cfgc, atlas)
            # non-foldable cross-frame dependency: 1e-30 * depth is far below
            # f32 epsilon of any camera entry (numerically a no-op) but its
            # value is unknown at compile time, so XLA cannot hoist the frame
            # out of the scan (0.0 * x could be folded; this cannot).
            return c + 1e-30 * out.depth[0, 0], out.sdr[0, 0, 0]
        _, outs = jax.lax.scan(step, cam, None, length=n)
        return outs.sum()

    return loop


def time_engine(eng, trace_dir: str = "", reps: int = REPS,
                iters: int = ITERS, scale_check: bool = False,
                fast_retry: bool = False):
    """Measure ms/frame for the engine's current config.

    Returns (times_ms: list over reps, atlas_ms, scale_ok)."""
    import jax
    import jax.numpy as jnp

    from tinyrenderer_tpu.render import frame as framelib

    eng.update(0.0)
    eng._drain_actions()
    # Let the capacity monitors settle (raster-bin / textured-block growth
    # fetches real counts from the chip) so the scan measures the
    # steady-state config, not a pre-growth envelope. 10 frames guarantees
    # at least one forced monitor fetch (engine throttles to every 8th
    # frame) plus a post-growth re-report.
    for _ in range(10):
        _retry(lambda: eng.run_frame(0.0), label="settle", fast=fast_retry)
    if eng._overflow_inflight:  # drain: growth must land before timing
        eng.drain_monitors()
        for _ in range(2):
            _retry(lambda: eng.run_frame(0.0), label="settle2",
                   fast=fast_retry)
    env = eng._ensure_env()
    cfgc = eng.cfg

    scene = eng._pack.scene
    pool = eng._packer.pool_for(eng.cfg)
    lights = eng._pack.lights
    cam0 = jnp.asarray(eng.camera.to_raw())
    params = eng.params

    # shadow atlas: rendered once per scene edit (engine caching); the
    # steady-state frame consumes the cached atlas (camera-only motion).
    atlas = None
    atlas_ms = None
    if cfgc.enable_shadows and cfgc.num_shadow_views > 0 and not cfgc.forward_only:
        afn = framelib.compiled_shadow_atlas(cfgc)
        atlas = _retry(lambda: jax.block_until_ready(afn(scene, lights)[0]),
                       label="shadow atlas", fast=fast_retry)
        try:
            n_atlas = 8

            @jax.jit
            def aloop(scene, lights):
                def step(c, _):
                    a, _ovf, _big = framelib.render_shadow_atlas(scene,
                                                                 lights, cfgc)
                    return c + 1e-30 * a[0, 0, 0, 0], a[0, 0, 0, 0]
                _, outs = jax.lax.scan(step, jnp.float32(0), None,
                                       length=n_atlas)
                return outs.sum()

            _retry(lambda: float(aloop(scene, lights)), label="atlas warm",
                   fast=fast_retry)
            t0 = time.perf_counter()
            _retry(lambda: float(aloop(scene, lights)), label="atlas timed",
                   fast=fast_retry)
            atlas_ms = (time.perf_counter() - t0) * 1e3 / n_atlas
        except Exception as e:  # noqa: BLE001 — secondary metric, never fatal
            print(f"# atlas timing failed: {e}", file=sys.stderr)
            atlas_ms = None

    args = (cam0, scene, pool, lights, params, env, atlas)
    loop = _frame_loop(eng, iters)

    for _ in range(WARMUP):
        _retry(lambda: float(loop(*args)), label="warmup", fast=fast_retry)

    if trace_dir:  # jax.profiler trace (the RenderDoc-capture analog)
        fn = framelib.compiled_frame(cfgc)
        with jax.profiler.trace(trace_dir):
            jax.block_until_ready(fn(scene, pool, lights, cam0, params, env,
                                     atlas))

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _retry(lambda: float(loop(*args)), label="timed scan",
               fast=fast_retry)
        times.append((time.perf_counter() - t0) * 1e3 / iters)

    scale_ok = None
    if scale_check:
        # Guard the methodology: a scan of 2N frames must take ~2x a scan of
        # N frames. If XLA folded the chain (fake-fast numbers), it won't.
        try:
            loop2 = _frame_loop(eng, 2 * iters)
            _retry(lambda: float(loop2(*args)), label="scale warm",
                   fast=fast_retry)
            t0 = time.perf_counter()
            _retry(lambda: float(loop2(*args)), label="scale timed",
                   fast=fast_retry)
            t2 = (time.perf_counter() - t0) * 1e3 / iters  # per-N-frames x2
            ratio = t2 / max(min(times), 1e-9)
            scale_ok = bool(1.4 <= ratio <= 3.0)
            if not scale_ok:
                print(f"# WARNING: scan-doubling ratio {ratio:.2f} outside "
                      f"[1.4, 3.0] — timing chain may be folded",
                      file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# scale check failed: {e}", file=sys.stderr)

    return times, atlas_ms, scale_ok


def percentiles(times: list) -> dict:
    xs = sorted(times)
    n = len(xs)
    return {
        "p10_ms": round(xs[max(0, int(0.10 * (n - 1)))], 3),
        "p50_ms": round(xs[n // 2], 3),
        "p90_ms": round(xs[min(n - 1, int(round(0.90 * (n - 1))))], 3),
        "min_ms": round(xs[0], 3),
        "reps": n,
    }


def verify_tpu_goldens(budget_cases=None) -> dict:
    """Render ALL golden scenes on the live backend with the Pallas kernels
    and compare against the CPU-rendered goldens (tests/goldens/*.png) with
    an edge-aware gate (utils/verify.py): off triangle-silhouette and
    hard-gradient edges the on-chip image must match within 2 LSB with no
    clustered errors — a Mosaic regression confined to texturing, shading
    or shadows fails even when the blanket pixel fraction would pass
    (VERDICT r2 weak #3). Scenes: untextured demo (geometry + shading +
    shadows), textured demo (block-compacted sampling), and the
    reference's test.lvl (full asset path, textured squares + both light
    kinds); plus the fused-resolve kernel variant on the demo scene."""
    from dataclasses import replace

    import numpy as np
    from PIL import Image

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render.engine import Engine
    from tinyrenderer_tpu.scene import demo
    from tinyrenderer_tpu.utils.verify import edge_aware_compare

    golden_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tests", "goldens")
    base = RenderConfig(
        width=256, height=128, tile_h=16, tile_w=128, bin_capacity=160,
        shadow_size=128, shadow_tile=128, shadow_bin_capacity=128,
        env_size=32, irradiance_size=8, texture_size=64, mip_levels=4,
        max_vertices=8192, max_triangles=4096, max_instances=64,
        use_pallas=True, enable_ssr=False,
        # goldens are CPU-rendered through the f32 jnp path: compare the
        # kernels at full precision; the intentional bf16 trade gets its
        # own variant case below. Lookup rates + atlas precision pinned at
        # the values the goldens were rendered with (1080p defaults moved
        # to 8 / bf16).
        bf16_attrs=False, shadow_lookup_scale=4, sky_scale=4,
        shadow_bf16=False)

    # the SHIPPING default config (VERDICT r3 missing #2): sampling /
    # precision knobs left at RenderConfig defaults (scale-8 lookups, bf16
    # atlas + attrs) — the CPU golden is rendered with the same knobs
    # (tests/test_golden.py DEFAULT_CFG), so the bound below only covers
    # CPU-vs-TPU arithmetic, not the bf16-vs-f32 trade
    default_cfg = RenderConfig(
        width=256, height=128, tile_h=16, tile_w=128, bin_capacity=160,
        shadow_size=128, shadow_tile=128, shadow_bin_capacity=128,
        env_size=32, irradiance_size=8, texture_size=64, mip_levels=4,
        max_vertices=8192, max_triangles=4096, max_instances=64,
        use_pallas=True, enable_ssr=False)

    def build(scene, cfg):
        if scene in ("test_lvl", "default"):
            return Engine(cfg=cfg, level_path="/root/reference/levels/test.lvl")
        return Engine.from_world(
            demo.build_demo_world(
                n_cubes=9, textured_every=2 if scene == "demo_textured" else 0),
            camera=demo.build_demo_camera(cfg.width, cfg.height), cfg=cfg)

    # per-case compare kwargs: the bf16 variant intentionally rounds the
    # normal/TBN/flat resolve channels to 8 mantissa bits, which shifts
    # smooth shading by up to ~3 LSB against the f32 CPU golden — compare
    # with the wider bound (still edge-aware and cluster-gated at it)
    cases = [("demo", "demo", base, {}),
             ("demo_textured", "demo_textured", base, {}),
             ("test_lvl", "test_lvl", base, {}),
             ("demo_fused", "demo", replace(base, fused_resolve=True), {}),
             ("demo_bf16", "demo", replace(base, bf16_attrs=True),
              {"lsb": 4, "max_offedge_frac": 5e-3}),
             # bf16 kernels on both sides; widen slightly for bf16 MXU-vs-
             # CPU rounding divergence in smooth shading
             ("default", "default", default_cfg,
              {"lsb": 4, "max_offedge_frac": 5e-3})]
    results = {}
    for label, scene, cfg, cmp_kw in cases:
        if budget_cases is not None and _remaining() < budget_cases:
            results[label] = {"status": "skipped", "skipped": "budget"}
            continue
        path = os.path.join(golden_dir, f"{scene}.png")
        if not os.path.exists(path):
            results[label] = {"status": "no-golden"}
            continue
        if scene in ("test_lvl", "default") and not os.path.exists(
                "/root/reference/levels/test.lvl"):
            results[label] = {"status": "no-level"}
            continue
        try:
            eng = build(scene, cfg)
            out = _retry(lambda: eng.run_frame(0.0), label=f"golden {label}",
                         fast=True)
            img = np.asarray(out.sdr)
            pick = np.asarray(out.pick_id)
            golden = np.asarray(Image.open(path))
            unstable = None
            upath = os.path.join(golden_dir, f"{scene}_unstable.npz")
            if os.path.exists(upath):
                unstable = np.load(upath)["unstable"]
            results[label] = edge_aware_compare(img, golden, pick,
                                                unstable=unstable, **cmp_kw)
        except Exception as e:  # noqa: BLE001
            results[label] = {"status": "error",
                              "error": str(e).splitlines()[0][:200]}
    return results


def measure_raster_throughput() -> dict:
    """BASELINE's "Mtris/sec raster" on the ~110k-triangle high-poly
    scene. The headline number times the RASTER STAGE (vertex transform +
    triangle setup + binning + visibility raster) the way GPU triangle
    rates are quoted — shading/texturing are per-pixel costs that don't
    scale with triangle count; the full deferred frame is reported
    alongside."""
    import jax
    import jax.numpy as jnp

    from tinyrenderer_tpu.ops import raster
    from tinyrenderer_tpu.render import frame as framelib

    eng = build_engine(highpoly=True)
    times, atlas_ms, _ = time_engine(eng, reps=2, iters=8, fast_retry=True)
    p50_frame = sorted(times)[len(times) // 2]
    tris = int(eng._pack.counts["triangles"])

    scene = eng._pack.scene
    cfgc = eng.cfg
    cam0 = jnp.asarray(eng.camera.to_raw())
    PW, PH = cfgc.padded_width, cfgc.padded_height
    n = 10

    @jax.jit
    def raster_loop(cam):
        def step(c, _):
            camd = framelib._unpack_camera(c)
            world, clip, attrs = framelib.geometry_stage(scene,
                                                         camd["view_proj"])
            setup = raster.triangle_setup(clip, scene.tri_vidx,
                                          scene.tri_deferred, PW, PH, "back")
            sbins = raster.bin_triangles_stream(
                setup, PW, PH, cfgc.tile_h, cfgc.tile_w,
                cfgc.stream_capacity, cfgc.bin_big_capacity)
            ty, tx = sbins.counts.shape
            _tid, depth = raster.rasterize_stream(
                sbins, ty, tx, cfgc.tile_h, cfgc.tile_w,
                kmax=cfgc.bin_capacity)
            return c + 1e-30 * depth[0, 0], depth[0, 0]
        _, outs = jax.lax.scan(step, cam, None, length=n)
        return outs.sum()

    _retry(lambda: float(raster_loop(cam0)), label="raster-stage warm",
           fast=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        _retry(lambda: float(raster_loop(cam0)), label="raster-stage timed",
               fast=True)
        dt = (time.perf_counter() - t0) * 1e3 / n
        best = dt if best is None else min(best, dt)
    return {
        "triangles": tris,
        "raster_stage_ms": round(best, 3),
        "mtris_per_s": round(tris / (best * 1e-3) / 1e6, 2),
        "ms_per_frame_full_deferred": round(p50_frame, 3),
        "mtris_per_s_full_frame": round(tris / (p50_frame * 1e-3) / 1e6, 2),
    }


def measure_editor_roundtrip() -> dict:
    """BASELINE config 4: 50 runtime add/deletes + object pick + gizmo drag,
    measuring the host repack/dispatch cost per edited frame (wall clock,
    includes any capacity retraces)."""
    from tinyrenderer_tpu.editor import events as ev
    from tinyrenderer_tpu.editor.session import EditorApp
    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render.engine import Engine
    from tinyrenderer_tpu.scene import demo

    cfg = RenderConfig(width=800, height=600)
    app = EditorApp(Engine.from_world(
        demo.build_demo_world(n_cubes=16),
        camera=demo.build_demo_camera(cfg.width, cfg.height), cfg=cfg))
    app.run_frame(0.0)  # compile

    added = []
    t0 = time.perf_counter()
    for i in range(50):
        if i % 2 == 0 or not added:
            w = demo.build_demo_world(n_cubes=1)
            oid = app.engine.world.add_world_object(
                next(o for _oid, o in w.world_objects()))
            added.append(oid)
        else:
            app.engine.world.remove_world_object(added.pop())
        app.run_frame(0.016)
    edit_ms = (time.perf_counter() - t0) * 1e3 / 50

    # pick + gizmo drag round-trip (select an object, drag along an axis)
    cx, cy = cfg.width // 2, cfg.height // 2
    t0 = time.perf_counter()
    app.handle_event(ev.CursorMoved(x=cx, y=cy))
    for _ in range(4):  # pick readback is N frames latent
        app.run_frame(0.016)
    app.handle_event(ev.MouseInput(button=ev.MouseButton.Left, pressed=True,
                                   x=cx, y=cy))
    for _ in range(4):
        app.handle_event(ev.CursorMoved(x=cx + 10, y=cy))
        app.run_frame(0.016)
    app.handle_event(ev.MouseInput(button=ev.MouseButton.Left, pressed=False,
                                   x=cx + 10, y=cy))
    app.run_frame(0.016)
    pick_ms = (time.perf_counter() - t0) * 1e3 / 10

    lvl_path = "/tmp/bench_roundtrip.lvl"
    app.engine.save_level(lvl_path)
    ok = os.path.exists(lvl_path)
    return {"edit_ms_per_frame": round(edit_ms, 2),
            "pick_gizmo_ms_per_frame": round(pick_ms, 2),
            "lvl_roundtrip": ok}


def measure_fidelity() -> dict:
    """PSNR of the default config against reference_parity() (the
    reference's exact sampling: trilinear, full-rate lookups, native-size
    texture pool) at 1080p on test.lvl — the quality side of the headline
    number (BASELINE asks the speed at default quality; the fidelity
    table in PARITY.md tracks the full config grid)."""
    import numpy as np

    from tinyrenderer_tpu.config import RenderConfig

    from tinyrenderer_tpu.render.engine import Engine

    frames = {}
    base = RenderConfig(width=1920, height=1080)
    for name, cfg in (("parity", base.reference_parity()), ("default", base)):
        eng = Engine(cfg=cfg, level_path="/root/reference/levels/test.lvl")
        for _ in range(4):  # settle capacity monitors
            out = _retry(lambda: eng.run_frame(0.0), label=f"fidelity {name}",
                         fast=True)
        frames[name] = np.asarray(out.sdr)
    a = frames["parity"].astype(np.float64)
    b = frames["default"].astype(np.float64)
    mse = ((a - b) ** 2).mean()
    d = np.abs(a - b).max(axis=-1)
    return {
        "psnr_db_vs_parity": round(10.0 * np.log10(255.0 ** 2 / mse), 1),
        "frac_gt_1lsb": round(float((d > 1).mean()), 4),
        "frac_gt_4lsb": round(float((d > 4).mean()), 4),
    }


def measure_cpu_raster_ratio(tpu_ms: float, allow_measure: bool) -> dict:
    """BASELINE '>=5x vs CPU software raster': the same 1080p deferred frame
    with use_pallas=False executed on the CPU backend.

    The CPU side costs ~20 min (multi-minute 1080p compile + ~18 s/frame),
    so it is measured once and cached in tools/cpu_raster_cache.json
    (committed); driver runs just divide."""
    cached = None
    if os.path.exists(CPU_CACHE_PATH):
        try:
            with open(CPU_CACHE_PATH) as f:
                cached = json.load(f)
        except Exception:  # noqa: BLE001
            cached = None
    if cached and "cpu_softraster_ms" in cached:
        cpu_ms = cached["cpu_softraster_ms"]
        return {"cpu_softraster_ms": cpu_ms,
                "cpu_ms_cached": True,
                "cpu_measured_at": cached.get("measured_at"),
                "speedup_vs_cpu": round(cpu_ms / tpu_ms, 2)}
    if not allow_measure:
        return {"error": "no CPU cache and measuring (~20 min) exceeds "
                         "budget; run bench.py --recache-cpu"}

    from dataclasses import replace

    import jax
    import jax.numpy as jnp

    from tinyrenderer_tpu.render import frame as framelib

    eng = build_engine()
    eng.cfg = replace(eng.cfg, use_pallas=False)
    eng.update(0.0)
    eng._drain_actions()
    env = eng._ensure_env()
    cfgc = eng.cfg
    cpu = jax.devices("cpu")[0]

    scene = jax.device_put(eng._pack.scene, cpu)
    pool = jax.device_put(
        eng._packer.pool_for(eng.cfg), cpu)
    lights = jax.device_put(eng._pack.lights, cpu)
    cam0 = jax.device_put(jnp.asarray(eng.camera.to_raw()), cpu)
    params = jax.device_put(eng.params, cpu)
    envc = jax.device_put(env, cpu)

    with jax.default_device(cpu):
        fn = jax.jit(lambda *a: framelib.render_frame(*a, cfgc, None))
        out = fn(scene, pool, lights, cam0, params, envc)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(2):
            jax.block_until_ready(fn(scene, pool, lights, cam0, params, envc))
        cpu_ms = (time.perf_counter() - t0) * 1e3 / 2
    try:
        os.makedirs(os.path.dirname(CPU_CACHE_PATH), exist_ok=True)
        with open(CPU_CACHE_PATH, "w") as f:
            json.dump({"cpu_softraster_ms": round(cpu_ms, 1),
                       "measured_at": time.strftime("%Y-%m-%d"),
                       "note": "1080p deferred test.lvl, use_pallas=False, "
                               "CPU backend, mean of 2 frames"}, f)
    except Exception as e:  # noqa: BLE001
        print(f"# could not write CPU cache: {e}", file=sys.stderr)
    return {"cpu_softraster_ms": round(cpu_ms, 1), "cpu_ms_cached": False,
            "speedup_vs_cpu": round(cpu_ms / tpu_ms, 2)}


def run_config(label: str, metric: str, reps=REPS, iters=ITERS,
               scale_check=False, trace_dir="", fast=False,
               fast_retry=False, preset=False, **build_kw):
    """Measure one config; always returns a result dict (error field on
    failure)."""
    import jax

    res = {"metric": metric, "unit": "ms/frame", "value": None}
    try:
        eng = build_engine(**build_kw)
        if fast or preset:
            eng.cfg = eng.cfg.performance_preset()
        times, atlas_ms, scale_ok = time_engine(
            eng, trace_dir=trace_dir, reps=reps, iters=iters,
            scale_check=scale_check, fast_retry=fast_retry)
        pct = percentiles(times)
        res["value"] = pct["p50_ms"]
        res["vs_baseline"] = round(BASELINE_MS / pct["p50_ms"], 3)
        res["extra"] = {
            "backend": jax.default_backend(),
            **pct,
            "triangles": int(eng._pack.counts["triangles"]),
            "shadow_views": int(eng.cfg.num_shadow_views),
            "shadow_atlas_ms": (round(atlas_ms, 3)
                                if atlas_ms is not None else None),
        }
        if scale_check:
            res["extra"]["scan_scaling_ok"] = scale_ok
    except Exception as e:  # noqa: BLE001
        res["error"] = str(e).splitlines()[0][:300]
    return res


def _run_battery(args):
    """Default driver mode: headline first (recorded immediately), then
    budget-gated secondaries in certification-priority order."""
    res = run_config("default", "ms/frame p50, 1080p deferred "
                     "PBR+shadows+IBL (test.lvl)", scale_check=True,
                     fast=args.fast, trace_dir=args.trace_dir)
    with _LOCK:
        _RESULT.clear()
        _RESULT.update(res)
    if res.get("value") is None or args.fast:
        return

    # Secondaries: (key-path, estimate_s, thunk). Ordered by certification
    # value (VERDICT r4 #2/#5/#4/#3 first). Estimates assume a warm
    # persistent compile cache (the builder's round warms it); each item is
    # skipped when the remaining budget can't cover its estimate.
    headline_ms = res["value"]
    configs: dict = {}
    configs["config3_deferred_1080p"] = {
        "metric": res["metric"], "unit": "ms/frame",
        "value": res["value"], "vs_baseline": res["vs_baseline"]}
    _extra_update("configs", configs)

    def cfg_item(key, **kw):
        def thunk():
            configs[key] = run_config(key, kw.pop("metric"), fast_retry=True,
                                      **kw)
            _extra_update("configs", configs)
        return thunk

    def editor_item():
        ed = measure_editor_roundtrip()
        ed["vs_baseline"] = round(BASELINE_MS / ed["edit_ms_per_frame"], 3)
        configs["config4_editor"] = {
            "metric": "editor round-trip: ms/edited frame (50 add/deletes), "
                      "pick+gizmo drag, .lvl save",
            "unit": "ms/frame", "value": ed["edit_ms_per_frame"], **ed}
        _extra_update("configs", configs)

    def cpu_item():
        ratio = measure_cpu_raster_ratio(
            headline_ms, allow_measure=_remaining() > 1500)
        entry = {"metric": "speedup vs CPU software raster (target >=5x)",
                 "unit": "x", **ratio}
        if "speedup_vs_cpu" in ratio:
            entry["value"] = ratio["speedup_vs_cpu"]
            entry["vs_baseline"] = round(ratio["speedup_vs_cpu"] / 5.0, 2)
        configs["cpu_raster_ratio"] = entry
        _extra_update("configs", configs)

    def parity_item():
        pr = run_config("parity", "ms/frame p50, 1080p deferred, "
                        "reference-parity sampling (trilinear native-size "
                        "textures, full-rate lookups)", reps=2,
                        fast_retry=True, parity=True)
        _extra_update("parity", pr)

    def preset_item():
        pres = run_config("preset", "ms/frame p50, 1080p performance preset",
                          reps=2, fast_retry=True, preset=True)
        _extra_update("performance_preset_ms", pres.get("value"))

    def goldens_item():
        _extra_update("tpu_golden", verify_tpu_goldens(budget_cases=25))

    items = [
        ("configs.config2_multilight", 120, cfg_item(
            "config2_multilight", metric="ms/frame p50, 1080p deferred, "
            "4 point + 1 directional light, 25 shadow views (test.lvl)",
            reps=2, multilight=True)),
        ("configs.config5_stress", 150, cfg_item(
            "config5_stress", metric="ms/frame p50, 1440p 500-draw stress, "
            "2K shadows", reps=2, iters=8, stress=True)),
        ("configs.config1_forward", 80, cfg_item(
            "config1_forward",
            metric="ms/frame p50, 800x600 forward-only (test.lvl)",
            reps=2, forward=True)),
        ("raster_throughput", 150,
         lambda: _extra_update("raster_throughput",
                               measure_raster_throughput())),
        ("parity", 140, parity_item),
        ("fidelity", 100,
         lambda: _extra_update("fidelity", measure_fidelity())),
        ("configs.config4_editor", 90, editor_item),
        ("configs.cpu_raster_ratio", 10, cpu_item),
        ("performance_preset_ms", 80, preset_item),
        ("tpu_golden", 160, goldens_item),
    ]
    for key, est, thunk in items:
        if _remaining() < est + 30:
            print(f"# skipping {key}: {est}s estimate > "
                  f"{_remaining():.0f}s remaining", file=sys.stderr)
            _mark_skipped(key, configs)
            continue
        t0 = time.perf_counter()
        try:
            thunk()
        except Exception as e:  # noqa: BLE001
            _mark_error(key, configs, str(e).splitlines()[0][:300])
        print(f"# {key}: {time.perf_counter() - t0:.0f}s "
              f"({_remaining():.0f}s left)", file=sys.stderr)


def _mark_skipped(key, configs):
    if key.startswith("configs."):
        configs[key.split(".", 1)[1]] = {"skipped": "budget"}
        _extra_update("configs", configs)
    else:
        _extra_update(key, {"skipped": "budget"})


def _mark_error(key, configs, msg):
    if key.startswith("configs."):
        configs[key.split(".", 1)[1]] = {"error": msg}
        _extra_update("configs", configs)
    else:
        _extra_update(key, {"error": msg})


def main() -> int:
    global _DEADLINE
    ap = argparse.ArgumentParser()
    ap.add_argument("--stress", action="store_true",
                    help="500-draw 1440p 2K-shadow stress config")
    ap.add_argument("--forward", action="store_true",
                    help="forward-only 800x600 config (BASELINE config 1)")
    ap.add_argument("--fast", action="store_true",
                    help="apply the gather-minimizing performance preset")
    ap.add_argument("--parity", action="store_true",
                    help="reference-parity sampling config")
    ap.add_argument("--no-verify", action="store_true",
                    help="skip the TPU golden-image verification")
    ap.add_argument("--verify-only", action="store_true",
                    help="run just the on-chip golden verification "
                         "(fast Pallas-regression gate) and exit")
    ap.add_argument("--recache-cpu", action="store_true",
                    help="re-measure the CPU software-raster reference "
                         "point and write tools/cpu_raster_cache.json")
    ap.add_argument("--trace-dir", default="",
                    help="write a jax.profiler trace of one frame")
    ap.add_argument("--budget-s", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", "900")),
                    help="global wall-clock budget (default 900 s)")
    args = ap.parse_args()

    _DEADLINE = time.time() + args.budget_s
    _install_sigterm()
    _start_watchdog(_DEADLINE - 15.0)  # emit margin before the hard budget

    if args.recache_cpu:
        try:
            os.remove(CPU_CACHE_PATH)
        except FileNotFoundError:
            pass
        out = measure_cpu_raster_ratio(1.0, allow_measure=True)
        with _LOCK:
            _RESULT.clear()
            _RESULT.update({"metric": "CPU software-raster cache",
                            "value": out.get("cpu_softraster_ms"),
                            "unit": "ms/frame", **out})
        _emit()
        return 0

    if args.verify_only:
        with _LOCK:
            _RESULT.clear()
            _RESULT.update({"metric": "TPU golden verification",
                            "value": None})
        goldens = verify_tpu_goldens()
        ok = all(v.get("status") == "pass" for v in goldens.values())
        with _LOCK:
            _RESULT.update({"tpu_golden": goldens, "value": 1 if ok else 0})
        _emit()
        return 0 if ok else 1

    if args.stress:
        res = run_config("stress", "ms/frame p50, 1440p 500-draw stress, "
                         "2K shadows", reps=2, iters=8, stress=True,
                         fast=args.fast, trace_dir=args.trace_dir)
    elif args.forward:
        res = run_config("forward", "ms/frame p50, 800x600 forward-only "
                         "(test.lvl)", forward=True, fast=args.fast,
                         trace_dir=args.trace_dir)
    elif args.parity:
        res = run_config("parity", "ms/frame p50, 1080p deferred, "
                         "reference-parity sampling (test.lvl)", parity=True,
                         trace_dir=args.trace_dir)
    else:
        _run_battery(args)
        _emit()
        return 0 if _RESULT.get("value") is not None else 1

    with _LOCK:
        _RESULT.clear()
        _RESULT.update(res)
    _emit()
    return 0 if res.get("value") is not None else 1


if __name__ == "__main__":
    sys.exit(main())
