"""Editor-loop tests: pick -> select -> gizmo drag against real rendered
frames (the src/gizmo_handler.rs interaction loop, SURVEY.md §3.4)."""

import numpy as np
import pytest

from tinyrenderer_tpu.config import RenderConfig
from tinyrenderer_tpu.editor import EditorApp, events
from tinyrenderer_tpu.editor.events import (CursorMoved, KeyInput, MouseButton,
                                            MouseInput, FileDropped)
from tinyrenderer_tpu.render.engine import Engine
from tinyrenderer_tpu.scene import demo

TINY = RenderConfig(
    width=320, height=192, tile_h=16, tile_w=128, bin_capacity=160,
    shadow_size=128, shadow_tile=128, shadow_bin_capacity=128,
    env_size=32, irradiance_size=8, texture_size=64, mip_levels=4,
    max_vertices=8192, max_triangles=4096, max_instances=64,
    use_pallas=False, enable_ssr=False,
)


@pytest.fixture()
def app():
    eng = Engine.from_world(demo.build_demo_world(n_cubes=9),
                            camera=demo.build_demo_camera(TINY.width, TINY.height),
                            cfg=TINY)
    a = EditorApp(eng)
    a.run_frame()
    a.picker.flush()  # deterministic readback for tests
    return a


def _find_pixel_of(app, oid):
    pick = app.picker.latest
    ys, xs = np.nonzero(pick == oid)
    assert len(ys), f"object {oid} not visible"
    i = len(ys) // 2
    return float(xs[i]), float(ys[i])


def _visible_object(app):
    pick = app.picker.latest
    ids = [int(i) for i in np.unique(pick) if i > 1]  # skip ground slab
    assert ids
    # pick the object with the most coverage
    return max(ids, key=lambda i: (pick == i).sum())


def test_click_selects_and_spawns_gizmo(app):
    oid = _visible_object(app)
    x, y = _find_pixel_of(app, oid)
    app.handle_event(MouseInput(MouseButton.Left, True, x, y))
    app.handle_event(MouseInput(MouseButton.Left, False, x, y))
    assert app.selected_object_id == oid
    gizmo = app.controller.gizmo_handler.gizmo
    assert len(gizmo.part_axis) == 3  # three arrows spawned
    # arrows are transient: they must not serialize
    for part_id in gizmo.part_axis:
        obj = app.engine.world.get_world_object(part_id)
        assert obj.is_fully_transient()


def test_gizmo_drag_moves_object_along_axis(app):
    oid = _visible_object(app)
    x, y = _find_pixel_of(app, oid)
    app.handle_event(MouseInput(MouseButton.Left, True, x, y))
    app.handle_event(MouseInput(MouseButton.Left, False, x, y))
    world = app.engine.world
    start = np.array(world.get_world_object(oid).transform.position)

    # render so the arrows appear in the pick map, then grab one
    app.run_frame()
    app.picker.flush()
    gizmo = app.controller.gizmo_handler.gizmo
    pick = app.picker.latest
    arrow_ids = [pid for pid in gizmo.part_axis
                 if (pick == pid).sum() > 0]
    assert arrow_ids, "no gizmo arrow visible in pick map"
    pid = arrow_ids[0]
    axis = gizmo.part_axis[pid]
    ax_, ay_ = _find_pixel_of(app, pid)

    app.handle_event(MouseInput(MouseButton.Left, True, ax_, ay_))
    app.handle_event(CursorMoved(ax_ + 30, ay_))        # beyond 25px² threshold
    app.handle_event(MouseInput(MouseButton.Left, False, ax_ + 30, ay_))

    end = np.array(world.get_world_object(oid).transform.position)
    delta = end - start
    # movement is constrained to the grabbed axis
    for k in range(3):
        if k != axis:
            assert abs(delta[k]) < 1e-4, (axis, delta)
    assert abs(delta[axis]) > 1e-3, (axis, delta)


def test_escape_deselects_and_despawns(app):
    oid = _visible_object(app)
    x, y = _find_pixel_of(app, oid)
    app.handle_event(MouseInput(MouseButton.Left, True, x, y))
    app.handle_event(MouseInput(MouseButton.Left, False, x, y))
    assert app.selected_object_id == oid
    n_before = len(app.engine.world)
    app.handle_event(KeyInput("Escape", True))
    assert app.selected_object_id is None
    assert len(app.engine.world) == n_before - 3  # arrows despawned


def test_delete_removes_selected(app):
    oid = _visible_object(app)
    x, y = _find_pixel_of(app, oid)
    app.handle_event(MouseInput(MouseButton.Left, True, x, y))
    app.handle_event(MouseInput(MouseButton.Left, False, x, y))
    app.handle_event(KeyInput("Delete", True))
    assert app.engine.world.get_world_object(oid) is None
    # frame still renders after deletion
    out = app.run_frame()
    assert out.sdr.shape[0] == TINY.height


def test_hover_highlights_arrow(app):
    oid = _visible_object(app)
    x, y = _find_pixel_of(app, oid)
    app.handle_event(MouseInput(MouseButton.Left, True, x, y))
    app.handle_event(MouseInput(MouseButton.Left, False, x, y))
    app.run_frame()
    app.picker.flush()
    gizmo = app.controller.gizmo_handler.gizmo
    pick = app.picker.latest
    arrow_ids = [pid for pid in gizmo.part_axis if (pick == pid).sum() > 0]
    assert arrow_ids
    ax_, ay_ = _find_pixel_of(app, arrow_ids[0])
    app.handle_event(CursorMoved(ax_, ay_))
    assert gizmo.hovered_part_id == arrow_ids[0]
    # hover off restores
    app.handle_event(CursorMoved(1.0, 1.0))
    assert gizmo.hovered_part_id != arrow_ids[0] or gizmo.hovered_part_id is None


def test_camera_fly_mode(app):
    cam = app.engine.camera
    start = cam.position.copy()
    # movement keys ignored without RMB
    app.handle_event(KeyInput("w", True))
    app.engine.camera.update(0.1)
    np.testing.assert_array_equal(cam.position, start)
    # RMB enables fly mode
    app.handle_event(MouseInput(MouseButton.Right, True, 0, 0))
    app.handle_event(KeyInput("w", True))
    cam.update(0.1)
    assert np.linalg.norm(cam.position - start) > 0.01
    app.handle_event(MouseInput(MouseButton.Right, False, 0, 0))
    moved = cam.position.copy()
    cam.update(0.1)  # released: movement stops
    np.testing.assert_array_equal(cam.position, moved)


def test_file_drop_spawns_object(app, tmp_path):
    n = len(app.engine.world)
    obj_path = tmp_path / "tri.obj"
    obj_path.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\nvt 1 0\nvt 0 1\n"
        "vn 0 0 1\nvn 0 0 1\nvn 0 0 1\nf 1/1/1 2/2/2 3/3/3\n")
    app.handle_event(FileDropped(str(obj_path)))
    assert len(app.engine.world) == n + 1
    out = app.run_frame()
    assert out.sdr.dtype.name == "uint8"


def test_kernel_reload_noop(app):
    res = app.engine.recompile_kernels()
    assert res.ok and not res.changed
    assert any("up to date" in t.message for t in app.engine.notifier.active())
