import json

import numpy as np

from tinyrenderer_tpu.scene import components as comp
from tinyrenderer_tpu.scene import level_io
from tinyrenderer_tpu.scene.camera import Camera
from tinyrenderer_tpu.scene.world import DirtyKind, OmnipresentObject, World, WorldObject


def test_load_reference_level(reference_level_path):
    level = level_io.load_level(reference_level_path)
    objs = list(level.world.world_objects())
    omni = list(level.world.omnipresent_objects())
    assert len(objs) == 51
    assert len(omni) == 1
    renderables = [o for _, o in objs
                   if o.get_renderable() is not None and o.get_light() is None]
    lights = [o for _, o in objs if o.get_light() is not None]
    assert len(renderables) == 50
    # the point light auto-gains a transient billboard renderable
    assert lights[0].get_renderable() is not None and lights[0].get_renderable().is_transient
    assert len(lights) == 1
    assert omni[0][1].get_directional_light() is not None
    # load populates the dirty list through the normal world API
    added = [d for d in level.world.dirty_objects if d.kind == DirtyKind.Added]
    assert len(added) == 52
    # camera fields survive
    assert level.camera.zfar == 300.0
    assert abs(level.camera.aspect - 1.5) < 1e-6


def test_level_json_roundtrip_is_stable(reference_level_path, tmp_path):
    level = level_io.load_level(reference_level_path)
    out = tmp_path / "roundtrip.lvl"
    level_io.save_level(str(out), level.world, level.camera)
    original = json.load(open(reference_level_path))
    saved = json.load(open(out))
    # Camera: reference serializes runtime speed fields too? No — skip_serializing.
    assert saved["camera"] == original["camera"]
    assert saved["omnipresent_objects"] == original["omnipresent_objects"]
    assert len(saved["world_objects"]) == len(original["world_objects"])
    for a, b in zip(saved["world_objects"], original["world_objects"]):
        assert a == b


def test_transient_components_filtered_on_save(tmp_path):
    world = World()
    obj = WorldObject(components=[comp.RenderableComponent(is_transient=True)])
    world.add_world_object(obj)
    world.add_world_object(WorldObject(components=[comp.RenderableComponent()]))
    cam = Camera.new_default(800, 600)
    path = tmp_path / "t.lvl"
    level_io.save_level(str(path), world, cam)
    data = json.load(open(path))
    assert len(data["world_objects"]) == 1


def test_point_light_gets_debug_billboard():
    world = World()
    oid = world.add_world_object(WorldObject(components=[comp.LightObjectComponent()]))
    obj = world.get_world_object(oid)
    r = obj.get_renderable()
    assert r is not None and r.is_transient
    assert r.rendering_options.pass_ == comp.RenderingPass.ForceForwardAfterDeferred


def test_world_dirty_semantics():
    world = World()
    oid = world.add_world_object(WorldObject(components=[comp.RenderableComponent()]))
    assert oid == 1  # ids start at 1; 0 = no object
    world.on_end_frame()
    assert world.dirty_objects == []
    world.get_world_object_mut(oid).transform.position[0] = 5.0
    assert world.dirty_objects[0].kind == DirtyKind.Modified
    world.remove_world_object(oid)
    assert world.dirty_objects[-1].kind == DirtyKind.Removed
    assert world.get_world_object(oid) is None


def test_camera_matrices_shapes_and_forward():
    cam = Camera.new_default(1200, 800)
    raw = cam.to_raw()
    assert raw.shape == (84,)
    f = cam.get_forward()
    # The reference's Camera::new euler decomposition drops the pitch
    # (src/camera.rs:55 "TODO: calculate orientation properly"); the default
    # camera's forward ends up yaw-only. We reproduce that behavior.
    expected = np.array([0.76822126, 0.0, 0.6401844])
    np.testing.assert_allclose(f, expected, atol=1e-3)
    # the horizontal direction still points towards the origin's azimuth
    to_origin = np.array([12.0, 0.0, 0.0]) / 12.0
    assert np.dot(f, to_origin) > 0.7


def test_save_semantically_equals_reference_file(reference_level_path, tmp_path):
    """Loading the reference's own .lvl and saving produces a semantically
    identical document (same keys/values up to float formatting) — the
    byte-compatibility contract with src/world_loader.rs."""
    import json

    from tinyrenderer_tpu.scene import level_io

    lvl = level_io.load_level(reference_level_path)
    out = tmp_path / "resave.lvl"
    level_io.save_level(str(out), lvl.world, lvl.camera)

    def canon(x):
        if isinstance(x, dict):
            return {k: canon(v) for k, v in sorted(x.items())}
        if isinstance(x, list):
            return [canon(v) for v in x]
        if isinstance(x, float):
            return round(x, 5)
        return x

    a = json.load(open(reference_level_path))
    b = json.load(open(out))
    assert canon(a) == canon(b)


def test_instance_shared_geometry_packs_unique_meshes():
    """500 instances of shared primitives must pack O(unique) vertex rows
    (the reference's cached Primitive, src/resource_loader.rs:75-85):
    vert_data holds each mesh once, vert_src expands per instance."""
    import jax
    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render.scene_gpu import ScenePacker
    from tinyrenderer_tpu.scene import demo

    world = demo.build_stress_world(200)
    cfg = RenderConfig(max_instances=512, max_vertices=16384,
                       max_triangles=8192, max_materials=512)
    pack = ScenePacker(cfg).pack(world)
    c = pack.counts
    assert c["instances"] >= 200
    # unique rows bounded by the distinct primitive meshes, not instances
    assert c["unique_vertices"] < 200
    assert c["vertices"] > 10 * c["unique_vertices"]
    # expansion reproduces per-instance rows exactly
    import numpy as np
    data = np.asarray(pack.scene.vert_data)
    src = np.asarray(pack.scene.vert_src)
    expanded = data[src[:c["vertices"]]]
    assert expanded.shape == (c["vertices"], 14)
    assert np.isfinite(expanded).all()
