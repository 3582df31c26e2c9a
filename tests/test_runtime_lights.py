"""Runtime light add/update/remove through the engine (the
light_controller dirty-consumption contract, src/light_controller.rs:166-185
— including removal, which is a TODO in the reference)."""

import numpy as np

from tinyrenderer_tpu.config import RenderConfig
from tinyrenderer_tpu.render.engine import Engine
from tinyrenderer_tpu.scene import components as comp, demo
from tinyrenderer_tpu.scene.world import WorldObject

TINY = RenderConfig(
    width=128, height=64, tile_h=16, tile_w=128, bin_capacity=128,
    shadow_size=64, shadow_tile=64, shadow_bin_capacity=128,
    env_size=16, irradiance_size=8, texture_size=32, mip_levels=3,
    max_vertices=4096, max_triangles=2048, max_instances=64,
    use_pallas=False, enable_ssr=False, enable_ibl=False,
)


def _engine():
    return Engine.from_world(
        demo.build_demo_world(n_cubes=4, with_point_light=False,
                              with_directional_light=False),
        camera=demo.build_demo_camera(128, 64), cfg=TINY)


def _point_light(pos, color=(20.0, 20.0, 20.0)):
    return WorldObject(
        components=[comp.LightObjectComponent(
            light=comp.PointLight(color=np.asarray(color, np.float32)))],
        transform=comp.TransformComponent(position=np.asarray(pos, np.float32)))


def test_add_move_remove_point_light():
    eng = _engine()
    dark = np.asarray(eng.run_frame(0.0).sdr).astype(np.int16)
    assert eng.cfg.num_point_lights == 0

    # add: scene gets brighter, light count (and shadow views) retrace
    lid = eng.world.add_world_object(_point_light([0.0, 4.0, 0.0]))
    lit = np.asarray(eng.run_frame(0.0).sdr).astype(np.int16)
    assert eng.cfg.num_point_lights == 1
    assert lit.mean() > dark.mean() + 2

    # update: moving the light changes the image without a light-count change
    obj = eng.world.get_world_object_mut(lid)
    obj.transform.position = np.array([6.0, 4.0, 6.0], np.float32)
    moved = np.asarray(eng.run_frame(0.0).sdr).astype(np.int16)
    assert eng.cfg.num_point_lights == 1
    assert np.abs(moved - lit).max() > 3

    # update color through the light component
    obj = eng.world.get_world_object_mut(lid)
    obj.get_light().light.color = np.array([60.0, 5.0, 5.0], np.float32)
    red = np.asarray(eng.run_frame(0.0).sdr).astype(np.float32)
    assert (red[..., 0].mean() - red[..., 2].mean()) > (
        moved[..., 0].mean() - moved[..., 2].mean())

    # remove: back to the unlit image (reference's removal is TODO,
    # src/light_controller.rs:142-144)
    eng.world.remove_world_object(lid)
    out = np.asarray(eng.run_frame(0.0).sdr).astype(np.int16)
    assert eng.cfg.num_point_lights == 0
    np.testing.assert_array_equal(out, dark)


def test_directional_light_runtime_add():
    from tinyrenderer_tpu.scene.world import OmnipresentObject
    eng = _engine()
    dark = np.asarray(eng.run_frame(0.0).sdr).astype(np.int16)
    eng.world.add_omnipresent_object(OmnipresentObject(components=[
        comp.DirectionalLight(direction=np.array([0.0, -1.0, 0.0], np.float32),
                              color=np.array([3.0, 3.0, 3.0], np.float32))]))
    lit = np.asarray(eng.run_frame(0.0).sdr).astype(np.int16)
    assert eng.cfg.num_directional_lights == 1
    assert lit.mean() > dark.mean() + 2
