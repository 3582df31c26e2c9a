"""Fused shading kernel (shading.shade_deferred_fused) vs the unfused
deferred chain: identical pass sequence, same per-pixel math, so outputs
must agree to float-reassociation noise (the kernel divides/multiplies in a
slightly different association than XLA's fusion of the jnp chain).

Runs the Pallas paths in interpreter mode on the CPU backend (tiny sizes).
"""

import dataclasses

import numpy as np
import pytest

from tinyrenderer_tpu.config import RenderConfig
from tinyrenderer_tpu.render import frame as framelib
from tinyrenderer_tpu.render.engine import Engine

CFG = RenderConfig(
    width=160, height=96, tile_h=16, tile_w=128, bin_capacity=128,
    shadow_size=128, shadow_tile=128, shadow_bin_capacity=128,
    env_size=32, irradiance_size=8, texture_size=64, mip_levels=4,
    max_vertices=4096, max_triangles=2048, max_instances=64,
    use_pallas=True, fused_shading=True,
)


def _render_pair(cfg, level_path):
    """(fused FrameOutput, unfused FrameOutput) for one engine state."""
    eng = Engine(cfg=cfg, level_path=level_path)
    assert framelib._use_fused_shading(eng.cfg), "fused gate must engage"
    fused = eng.run_frame(0.0)

    eng2 = Engine(cfg=dataclasses.replace(cfg, fused_shading=False),
                  level_path=level_path)
    unfused = eng2.run_frame(0.0)
    return fused, unfused


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["default", "bf16_off", "no_ibl"])
def test_fused_matches_unfused(reference_level_path, variant):
    cfg = CFG
    if variant == "bf16_off":
        cfg = dataclasses.replace(cfg, bf16_attrs=False)
    if variant == "no_ibl":
        cfg = dataclasses.replace(cfg, enable_ibl=False)
    fused, unfused = _render_pair(cfg, reference_level_path)

    # exact-integer outputs must match exactly
    np.testing.assert_array_equal(np.asarray(fused.pick_id),
                                  np.asarray(unfused.pick_id))
    np.testing.assert_array_equal(np.asarray(fused.depth),
                                  np.asarray(unfused.depth))
    # HDR: same math, different fp association -> tight tolerance
    a = np.asarray(fused.hdr)
    b = np.asarray(unfused.hdr)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
    # tone-mapped u8 within 1 LSB everywhere
    d = np.abs(np.asarray(fused.sdr).astype(np.int16)
               - np.asarray(unfused.sdr).astype(np.int16))
    assert d.max() <= 1, f"sdr differs by {d.max()} LSB"


def test_fused_gate_conditions():
    """The static dispatch engages exactly when the fused kernel supports
    the configuration."""
    assert framelib._use_fused_shading(CFG)
    off = [dict(fused_shading=False), dict(use_pallas=False),
           dict(fused_resolve=True), dict(enable_ssr=True),
           dict(texture_scale=2), dict(enable_shadows=False)]
    for kw in off:
        assert not framelib._use_fused_shading(
            dataclasses.replace(CFG, **kw)), kw


@pytest.mark.slow
def test_flat_only_fused_matches_unfused():
    """has_rec=False branch (rec_c=None — statically flat-only scene,
    cfg.any_textured off): fused vs unfused on the untextured demo world
    (ADVICE r4 #1 — this branch previously shipped without CI coverage)."""
    from tinyrenderer_tpu.scene import demo

    def build(cfg):
        eng = Engine.from_world(
            demo.build_demo_world(n_cubes=9),
            camera=demo.build_demo_camera(cfg.width, cfg.height), cfg=cfg)
        eng.update(0.0)
        eng._drain_actions()
        return eng

    eng = build(CFG)
    assert not eng.cfg.any_textured, "demo world must be statically flat"
    assert framelib._use_fused_shading(eng.cfg)
    fused = eng.run_frame(0.0)
    eng2 = build(dataclasses.replace(CFG, fused_shading=False))
    unfused = eng2.run_frame(0.0)

    np.testing.assert_array_equal(np.asarray(fused.pick_id),
                                  np.asarray(unfused.pick_id))
    np.testing.assert_allclose(np.asarray(fused.hdr),
                               np.asarray(unfused.hdr),
                               rtol=2e-4, atol=2e-4)
    d = np.abs(np.asarray(fused.sdr).astype(np.int16)
               - np.asarray(unfused.sdr).astype(np.int16))
    assert d.max() <= 1, f"sdr differs by {d.max()} LSB"


def test_sharded_config_keeps_fused_when_bands_fit():
    from tinyrenderer_tpu import parallel
    cfg_s = parallel.sharded_config(CFG, 4)
    # tile_h=16 bands host the 16-sublane bf16 block: fused stays on
    assert cfg_s.fused_shading
    # an 8-row band with bf16 attrs cannot host the kernel block
    cfg8 = dataclasses.replace(CFG, tile_h=8, height=64)
    assert not parallel.sharded_config(cfg8, 8).fused_shading


def test_flat_only_slim_matches_full_tiled():
    """The slim 28-channel flat-only table (resolve slim=True, active on
    every Pallas select path when cfg.any_textured is False) must render
    identically to the full 53-channel jnp tiled path (use_pallas=False),
    which never slims — pins the slim layout against the reference
    math, not just against itself."""
    from tinyrenderer_tpu.scene import demo

    def build(cfg):
        eng = Engine.from_world(
            demo.build_demo_world(n_cubes=9),
            camera=demo.build_demo_camera(cfg.width, cfg.height), cfg=cfg)
        eng.update(0.0)
        eng._drain_actions()
        return eng

    eng = build(CFG)
    assert not eng.cfg.any_textured
    slim_out = eng.run_frame(0.0)
    eng2 = build(dataclasses.replace(CFG, use_pallas=False,
                                     fused_shading=False))
    full_out = eng2.run_frame(0.0)

    np.testing.assert_array_equal(np.asarray(slim_out.pick_id),
                                  np.asarray(full_out.pick_id))
    d = np.abs(np.asarray(slim_out.sdr).astype(np.int16)
               - np.asarray(full_out.sdr).astype(np.int16))
    assert d.max() <= 1, f"sdr differs by {d.max()} LSB"
