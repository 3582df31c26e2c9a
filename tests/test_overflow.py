"""Raster bin-capacity monitor: overflow grows the envelope, no silent
triangle drops persist."""

import numpy as np

from tinyrenderer_tpu.config import RenderConfig
from tinyrenderer_tpu.render.engine import Engine
from tinyrenderer_tpu.scene import demo

SMALL_BINS = RenderConfig(
    width=128, height=64, tile_h=16, tile_w=128, bin_capacity=8,
    shadow_size=64, shadow_tile=64, shadow_bin_capacity=256,
    env_size=16, irradiance_size=8, texture_size=32, mip_levels=3,
    max_vertices=8192, max_triangles=4096, max_instances=128,
    use_pallas=False, enable_ssr=False, enable_shadows=False,
)


SMALL_SHADOW_BINS = RenderConfig(
    width=128, height=64, tile_h=16, tile_w=128, bin_capacity=256,
    shadow_size=64, shadow_tile=64, shadow_bin_capacity=8,
    env_size=16, irradiance_size=8, texture_size=32, mip_levels=3,
    max_vertices=8192, max_triangles=4096, max_instances=128,
    use_pallas=False, enable_ssr=False, enable_shadows=True,
)


def test_shadow_bin_overflow_grows_capacity():
    # 40 shadow-casting cubes over a 64px single-tile shadow view with
    # shadow_bin_capacity=8 must overflow and grow (ADVICE r1: shadow
    # casters must not be silently dropped)
    eng = Engine.from_world(demo.build_demo_world(n_cubes=40),
                            camera=demo.build_demo_camera(128, 64),
                            cfg=SMALL_SHADOW_BINS)
    assert eng.cfg.shadow_bin_capacity == 8
    toast_seen = False
    for _ in range(4):
        eng.run_frame(0.0)
        toast_seen = toast_seen or any(
            "Shadow bin overflow" in t.message
            for t in eng.notifier.history())
    assert eng.cfg.shadow_bin_capacity > 8
    assert toast_seen
    # the grown capacity triggers an atlas re-render; settle and verify
    for _ in range(4):
        out = eng.run_frame(0.0)
    assert int(out.shadow_overflow) <= eng.cfg.shadow_bin_capacity


def test_bin_overflow_grows_capacity():
    # 40 overlapping cubes in a 128px frame with bin_capacity=8 must overflow
    eng = Engine.from_world(demo.build_demo_world(n_cubes=40),
                            camera=demo.build_demo_camera(128, 64),
                            cfg=SMALL_BINS)
    assert eng.cfg.bin_capacity == 8
    toast_seen = False
    for _ in range(4):  # async monitor may take a frame to land
        eng.run_frame(0.0)
        toast_seen = toast_seen or any(
            "overflow" in t.message for t in eng.notifier.history())
    assert eng.cfg.bin_capacity > 8
    assert toast_seen
    # after growth, a settled frame reports no overflow beyond capacity
    out = eng.run_frame(0.0)
    assert int(out.bin_overflow) <= eng.cfg.bin_capacity


def test_cached_atlas_does_not_feed_shadow_shrink():
    """ADVICE r2: with a precomputed atlas, out.shadow_overflow is a 0
    sentinel; feeding it to the shrink hysteresis would oscillate any grown
    shadow_bin_capacity (shrink -> undersized atlas -> regrow, forever).
    The per-frame monitor queue must omit 'shadow' on the cached path."""
    from dataclasses import replace

    eng = Engine.from_world(demo.build_demo_world(n_cubes=4),
                            camera=demo.build_demo_camera(128, 64),
                            cfg=replace(SMALL_SHADOW_BINS,
                                        shadow_bin_capacity=512))
    eng.SHRINK_AFTER = 3
    for _ in range(8):  # > SHRINK_AFTER cached-atlas frames
        eng.run_frame(0.0)
    # the capacity was grown above the floor and must stay there: the only
    # real occupancy reports come from atlas-render time (one per repack)
    assert eng.cfg.shadow_bin_capacity == 512


def test_repack_rebuilds_pool_on_config_change():
    """ADVICE r2: a runtime texture_size/mip_levels change (the viewer's
    parity preset) must rebuild the packer's texture pool, not silently
    keep sampling the old pyramid."""
    from dataclasses import replace

    eng = Engine.from_world(demo.build_demo_world(n_cubes=2),
                            camera=demo.build_demo_camera(128, 64),
                            cfg=SMALL_BINS)
    eng.run_frame(0.0)
    assert eng._packer.pool.size == SMALL_BINS.texture_size
    eng.cfg = replace(eng.cfg, texture_size=64, mip_levels=4)
    eng._needs_pack = True
    eng.run_frame(0.0)
    assert eng._packer.pool.size == 64
    assert eng._packer.pool.levels == 4


def test_first_frame_settles_synchronously():
    """A fresh Engine's very first frame must already be correct: render()
    force-fetches the occupancy monitors and re-renders until nothing
    grows. Previously the async monitors needed ~8-30 frames to settle,
    so a one-shot render (the headless CLI at 1080p) shipped black
    compacted blocks wherever the guessed tex_block_capacity fell short."""
    from dataclasses import replace

    cfg = replace(SMALL_BINS, bin_capacity=256, tex_block_capacity=2)
    eng = Engine.from_world(demo.build_demo_world(n_cubes=9,
                                                  textured_every=2),
                            camera=demo.build_demo_camera(128, 64), cfg=cfg)
    first = np.asarray(eng.run_frame(0.0).sdr)
    assert eng.cfg.tex_block_capacity > 2  # grew BEFORE the frame returned
    for _ in range(12):
        out = eng.run_frame(0.0)
    # the settled steady state renders exactly the same image
    assert np.array_equal(first, np.asarray(out.sdr))


def test_multi_field_overflow_grows_in_one_config_change():
    """All values in one monitor stack describe the same envelope, so two
    overflowed fields must grow in ONE config change (one retrace) — not
    one per frame, which made a fresh under-capacity scene pay a compile
    per overflowed field."""
    import jax.numpy as jnp

    from tinyrenderer_tpu.render.engine import Engine

    eng = Engine(cfg=RenderConfig(tex_block_capacity=2, fwd_tile_capacity=2))
    configs_seen = {id(eng.cfg)}
    eng._queue_overflow(("tex", "fwdtex"), jnp.asarray([300, 40], jnp.int32))
    eng._check_overflow(wait=True)
    configs_seen.add(id(eng.cfg))
    assert eng.cfg.tex_block_capacity >= 300
    assert eng.cfg.fwd_tile_capacity >= 40
    assert len(configs_seen) == 2  # exactly one replace() applied both


def test_capacity_shrinks_after_sustained_underuse():
    """A transient big scene must not degrade compacted-pass cost forever:
    after SHRINK_AFTER consecutive frames under 40% occupancy the envelope
    re-buckets down (never below the config-default floor), mirroring the
    grow-by-reallocating loop in the other direction."""
    from dataclasses import replace

    import jax.numpy as jnp

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render.engine import Engine

    eng = Engine(cfg=RenderConfig(tex_block_capacity=2048))
    eng.SHRINK_AFTER = 5
    for _ in range(4):
        eng._queue_overflow(("tex",), jnp.asarray([10], jnp.int32))
        eng._check_overflow(wait=True)
    assert eng.cfg.tex_block_capacity == 2048  # hysteresis holds
    eng._queue_overflow(("tex",), jnp.asarray([10], jnp.int32))
    eng._check_overflow(wait=True)
    assert eng.cfg.tex_block_capacity == RenderConfig().tex_block_capacity

    # a spike resets the streak
    eng.cfg = replace(eng.cfg, tex_block_capacity=2048)
    for _ in range(4):
        eng._queue_overflow(("tex",), jnp.asarray([10], jnp.int32))
        eng._check_overflow(wait=True)
    eng._queue_overflow(("tex",), jnp.asarray([1500], jnp.int32))
    eng._check_overflow(wait=True)
    eng._queue_overflow(("tex",), jnp.asarray([10], jnp.int32))
    eng._check_overflow(wait=True)
    assert eng.cfg.tex_block_capacity == 2048


def test_shadow_big_need_floors_binsbig_shrink():
    """bin_big_capacity grown for the SHADOW pass must not be shrunk by
    per-frame camera-raster under-occupancy. Regression: the shrink
    hysteresis saw 120 low camera frames, shrank the capacity, the next
    atlas render truncated its big list (dropped shadow casters for a
    frame), reported the real need, regrew and retraced — a permanent
    shrink/regrow cycle on every scene edit."""
    from dataclasses import replace

    import jax.numpy as jnp

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render.engine import Engine

    eng = Engine(cfg=RenderConfig())
    eng.SHRINK_AFTER = 3
    # atlas-time stack ('shadow' present): shadow pass needs 200 big tris
    eng._queue_overflow(("shadow", "binsbig"),
                        jnp.asarray([10, 200], jnp.int32))
    eng._check_overflow(wait=True)
    assert eng.cfg.bin_big_capacity == 256        # grown past the need
    assert eng._atlas is None                     # atlas-time overflow

    # camera raster uses only 5 big tris for many frames: no shrink below
    # the shadow pass's recorded need
    for _ in range(10):
        eng._queue_overflow(("binsbig",), jnp.asarray([5], jnp.int32))
        eng._check_overflow(wait=True)
    assert eng.cfg.bin_big_capacity == 256

    # if the shadow need itself drops, the floor follows and shrink works
    eng._queue_overflow(("shadow", "binsbig"),
                        jnp.asarray([10, 20], jnp.int32))
    eng._check_overflow(wait=True)
    for _ in range(10):
        eng._queue_overflow(("binsbig",), jnp.asarray([5], jnp.int32))
        eng._check_overflow(wait=True)
    assert eng.cfg.bin_big_capacity == RenderConfig().bin_big_capacity


def test_camera_binsbig_growth_keeps_cached_atlas():
    """A big-triangle overflow from the CAMERA raster grows the capacity
    but must not invalidate the (complete) cached shadow atlas; only an
    atlas-time overflow re-renders it."""
    import jax.numpy as jnp

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render.engine import Engine

    eng = Engine(cfg=RenderConfig())
    sentinel = object()
    eng._atlas = sentinel
    eng._queue_overflow(("binsbig",),
                        jnp.asarray([eng.cfg.bin_big_capacity + 1],
                                    jnp.int32))
    eng._check_overflow(wait=True)
    assert eng.cfg.bin_big_capacity > RenderConfig().bin_big_capacity
    assert eng._atlas is sentinel
