"""End-to-end frame tests on the CPU backend at tiny resolutions."""

import numpy as np
import pytest

from tinyrenderer_tpu.config import RenderConfig
from tinyrenderer_tpu.render.engine import Engine, RenderingAction

TINY = RenderConfig(
    width=160, height=96, tile_h=16, tile_w=128, bin_capacity=128,
    shadow_size=128, shadow_tile=128, shadow_bin_capacity=128,
    env_size=32, irradiance_size=8, texture_size=64, mip_levels=4,
    max_vertices=4096, max_triangles=2048, max_instances=64,
    use_pallas=False,
)


@pytest.fixture(scope="module")
def engine(reference_level_path):
    eng = Engine(cfg=TINY, level_path=reference_level_path)
    return eng


def test_full_frame_renders(engine):
    out = engine.run_frame(0.016)
    sdr = np.asarray(out.sdr)
    assert sdr.shape == (96, 160, 3)
    assert sdr.dtype == np.uint8
    # scene covers part of the view; some geometry and some sky
    pick = np.asarray(out.pick_id)
    assert (pick > 0).any(), "no geometry picked"
    assert int(out.bin_overflow) <= TINY.bin_capacity
    # image is not a constant field
    assert sdr.std() > 1.0
    # depth: geometry pixels have reverse-Z depth > 0
    depth = np.asarray(out.depth)
    assert (depth[pick > 0] > 0).all()


def test_pick_ids_match_world_objects(engine):
    out = engine.run_frame(0.0)
    pick = np.asarray(out.pick_id)
    ids = set(np.unique(pick).tolist()) - {0}
    assert ids, "nothing visible"
    for oid in ids:
        assert engine.world.get_world_object(int(oid)) is not None


def test_frame_deterministic(engine):
    a = np.asarray(engine.run_frame(0.0).sdr)
    b = np.asarray(engine.run_frame(0.0).sdr)
    np.testing.assert_array_equal(a, b)


def test_object_edit_changes_image(engine):
    out0 = np.asarray(engine.run_frame(0.0).sdr).copy()
    pick = np.asarray(engine.last_output.pick_id)
    visible = [int(i) for i in np.unique(pick) if i > 0]
    oid = visible[0]
    obj = engine.world.get_world_object_mut(oid)
    obj.transform.position[1] += 100.0  # move far away
    out1 = np.asarray(engine.run_frame(0.0).sdr)
    assert (out0 != out1).any()


def test_remove_object(engine):
    pick = np.asarray(engine.run_frame(0.0).pick_id)
    visible = [int(i) for i in np.unique(pick) if i > 0]
    oid = visible[-1]
    engine.world.remove_world_object(oid)
    pick2 = np.asarray(engine.run_frame(0.0).pick_id)
    assert oid not in np.unique(pick2)


def test_tone_mapping_modes_differ(engine):
    from tinyrenderer_tpu.render import frame as framelib
    engine.set_param(framelib.PARAM_TONE_TYPE, 0)
    a = np.asarray(engine.run_frame(0.0).sdr).astype(int)
    engine.set_param(framelib.PARAM_TONE_TYPE, 2)
    b = np.asarray(engine.run_frame(0.0).sdr).astype(int)
    assert np.abs(a - b).max() > 0
    engine.set_param(framelib.PARAM_TONE_TYPE, 1)


def test_ibl_dump_roundtrip(engine, tmp_path):
    p = str(tmp_path / "ibl.data")
    engine.render()
    engine.write_ibl_to_file(p)
    raw = np.fromfile(p, np.float16)
    s = engine.cfg.irradiance_size
    assert raw.size == 6 * s * s * 4
    assert np.isfinite(raw.astype(np.float32)).all()
    assert raw.astype(np.float32).max() > 0


def test_forward_only_pipeline(reference_level_path):
    """BASELINE config 1: forward pass, directional N-dot-L, no shadows."""
    from dataclasses import replace
    cfg = replace(TINY, forward_only=True, enable_shadows=False,
                  enable_ibl=False, enable_ssr=False)
    eng = Engine(cfg=cfg, level_path=reference_level_path)
    out = eng.run_frame(0.0)
    sdr = np.asarray(out.sdr)
    assert sdr.shape == (TINY.height, TINY.width, 3)
    assert sdr.std() > 1.0
    pick = np.asarray(out.pick_id)
    assert (pick > 0).any()


def test_render_scale_pipeline(reference_level_path):
    """cfg.render_scale_pct: the deferred pipeline runs at reduced internal
    resolution and upsamples; outputs keep full-res shapes, picking stays
    usable, and the image approximates the native render."""
    from dataclasses import replace
    eng_lo = Engine(cfg=replace(TINY, render_scale_pct=50),
                    level_path=reference_level_path)
    out = eng_lo.run_frame(0.0)
    sdr = np.asarray(out.sdr)
    assert sdr.shape == (TINY.height, TINY.width, 3)
    pick = np.asarray(out.pick_id)
    assert (pick > 0).any()
    depth = np.asarray(out.depth)
    assert depth.shape == (TINY.height, TINY.width)
    assert (depth[pick > 0] > 0).all()

    eng_hi = Engine(cfg=TINY, level_path=reference_level_path)
    ref = np.asarray(eng_hi.run_frame(0.0).sdr).astype(np.float32)
    # same scene, same exposure: the mean image level must agree closely
    assert abs(sdr.astype(np.float32).mean() - ref.mean()) < 8.0
    # every object with non-trivial full-res coverage stays pickable
    # (sub-pixel objects may come or go with the sample grid)
    ref_pick = np.asarray(eng_hi.run_frame(0.0).pick_id)
    ids, counts = np.unique(ref_pick, return_counts=True)
    major = set(ids[counts >= 16]) - {0}
    assert major <= set(np.unique(pick))


@pytest.mark.slow
def test_morton_pool_frame_bit_exact(reference_level_path):
    """cfg.morton_pool is a pure layout change: the rendered frame must be
    bit-identical to the linear-layout default."""
    from dataclasses import replace
    a = np.asarray(Engine(cfg=TINY, level_path=reference_level_path)
                   .run_frame(0.0).sdr)
    b = np.asarray(Engine(cfg=replace(TINY, morton_pool=True),
                          level_path=reference_level_path).run_frame(0.0).sdr)
    assert np.array_equal(a, b)


def test_ssr_strength_zero_is_passthrough(reference_level_path):
    """enable_ssr with strength 0 reproduces the reference's shipped
    behavior (screen_space_reflection.wgsl:135 stores the source color):
    the image must be bit-identical to the SSR-disabled frame."""
    from dataclasses import replace
    from tinyrenderer_tpu.render import frame as framelib
    eng_off = Engine(cfg=TINY, level_path=reference_level_path)
    eng_on = Engine(cfg=replace(TINY, enable_ssr=True),
                    level_path=reference_level_path)
    a = np.asarray(eng_off.run_frame(0.0).sdr)
    b = np.asarray(eng_on.run_frame(0.0).sdr)
    assert np.array_equal(a, b)


def test_ssr_blend_active():
    """With a positive strength the coarse+refine march must find hits and
    blend reflections into the frame (finite, changed pixels). Uses the
    demo world — its materials span roughness 0.1-0.9, and SSR is gated
    by (1-roughness)^2 (test.lvl is all roughness-1 surfaces, which
    correctly reflect nothing)."""
    from dataclasses import replace
    from tinyrenderer_tpu.render import frame as framelib
    from tinyrenderer_tpu.scene import demo
    cfg = replace(TINY, enable_ssr=True)
    eng = Engine.from_world(
        demo.build_demo_world(n_cubes=16),
        camera=demo.build_demo_camera(cfg.width, cfg.height), cfg=cfg)
    base = np.asarray(eng.run_frame(0.0).sdr)
    eng.set_param(framelib.PARAM_SSR_STRENGTH, 0.9)
    out = eng.run_frame(0.0)
    sdr = np.asarray(out.sdr)
    assert np.isfinite(np.asarray(out.hdr)).all()
    changed = (np.abs(sdr.astype(int) - base.astype(int)).max(axis=-1) > 1)
    assert changed.any(), "SSR found no reflections in the demo scene"
    # reflections only appear on geometry, never on the sky
    pick = np.asarray(out.pick_id)
    assert not changed[pick == 0].any()


def test_bf16_attrs_frame_close(reference_level_path):
    """cfg.bf16_attrs writes the normal/TBN/flat resolve channels as bf16
    (≥8 mantissa bits on normalized-downstream or 8-bit-color data): the
    frame must stay visually identical — a few ±1-LSB shading shifts at
    most, no structural change."""
    from dataclasses import replace
    a = np.asarray(Engine(cfg=TINY, level_path=reference_level_path)
                   .run_frame(0.0).sdr)
    out = Engine(cfg=replace(TINY, bf16_attrs=True),
                 level_path=reference_level_path).run_frame(0.0)
    b = np.asarray(out.sdr)
    # pick ids ride the exact f32 output — identical by construction
    d = np.abs(a.astype(np.int16) - b.astype(np.int16)).max(axis=-1)
    assert (d > 2).mean() < 0.01, f"{(d > 2).sum()} pixels differ"


def test_shadow_bf16_atlas_close(reference_level_path):
    """cfg.shadow_bf16 (the round-3 default) halves the windowed PCF row;
    the quantized compare must not visibly change the frame vs the f32
    atlas (back-face bake bias dominates the 0.4% relative depth
    noise)."""
    from dataclasses import replace
    a = np.asarray(Engine(cfg=replace(TINY, shadow_bf16=False),
                          level_path=reference_level_path)
                   .run_frame(0.0).sdr)
    b = np.asarray(Engine(cfg=replace(TINY, shadow_bf16=True),
                          level_path=reference_level_path).run_frame(0.0).sdr)
    d = np.abs(a.astype(np.int16) - b.astype(np.int16)).max(axis=-1)
    assert (d > 2).mean() < 0.01, f"{(d > 2).sum()} pixels differ"


@pytest.mark.slow
def test_sky_block_compaction_exact():
    """cfg.sky_block_capacity > 0 (block-compacted full-rate sky on
    background blocks) must be pixel-identical to sky_scale=1 (dense
    full-rate sky): compaction changes WHERE sky is evaluated, never the
    values, and sky is masked to background pixels in the composite."""
    import dataclasses

    from tinyrenderer_tpu.render.engine import Engine

    base = RenderConfig(
        width=160, height=96, tile_h=16, tile_w=128, bin_capacity=128,
        shadow_size=128, shadow_tile=128, shadow_bin_capacity=128,
        env_size=32, irradiance_size=8, texture_size=64, mip_levels=4,
        max_vertices=4096, max_triangles=2048, max_instances=64,
        use_pallas=True)
    lvl = "/root/reference/levels/test.lvl"

    def render(cfg):
        eng = Engine(cfg=cfg, level_path=lvl)
        out = eng.run_frame(0.0)
        return eng, out

    eng_d, dense = render(dataclasses.replace(base, sky_scale=1))
    eng_c, compacted = render(dataclasses.replace(base, sky_scale=8,
                                                  sky_block_capacity=4096))
    assert np.asarray(dense.pick_id).min() >= 0
    # some sky must actually be visible or the test is vacuous
    n_sky = int((np.asarray(dense.pick_id) == 0).sum())
    assert n_sky > 50, f"camera sees only {n_sky} background pixels"
    assert int(compacted.sky_blocks) > 0
    np.testing.assert_array_equal(np.asarray(dense.sdr),
                                  np.asarray(compacted.sdr))

    # unfused path too
    eng_d2, dense2 = render(dataclasses.replace(base, sky_scale=1,
                                                fused_shading=False))
    eng_c2, comp2 = render(dataclasses.replace(base, sky_scale=8,
                                               sky_block_capacity=4096,
                                               fused_shading=False))
    np.testing.assert_array_equal(np.asarray(dense2.sdr),
                                  np.asarray(comp2.sdr))
