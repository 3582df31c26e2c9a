"""Light view/projection math tests — the shadow-correctness core.

Validates what the reference only ever verified visually: cube-face view
selection, the analytic reverse-Z depth reconstruction used for point-light
shadow compares (main.wgsl:98-117), and directional ortho projection."""

import math

import numpy as np
import pytest

from tinyrenderer_tpu.scene import lights as L

F32 = np.float32


def _project(vp, p):
    h = vp @ np.array([*p, 1.0], F32)
    return h[:3] / h[3]


def test_cube_faces_project_axis_points_to_center():
    pos = np.array([1.0, 2.0, 3.0], F32)
    vps = L.point_light_face_viewprojs(pos)
    axes = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    for i, a in enumerate(axes):
        ndc = _project(vps[i], pos + 10.0 * np.asarray(a, F32))
        # the face's own axis direction lands at NDC center
        assert abs(ndc[0]) < 1e-4 and abs(ndc[1]) < 1e-4, (i, ndc)
        assert 0.0 < ndc[2] <= 1.0  # valid reverse-Z depth


def test_point_shadow_depth_reconstruction_matches_projection():
    """The shading pass reconstructs the stored shadow depth from the
    max-component distance (vector_to_depth_value_reverse_z); it must equal
    the depth the shadow raster wrote, i.e. the projected NDC z."""
    pos = np.zeros(3, F32)
    vps = L.point_light_face_viewprojs(pos)
    rng = np.random.default_rng(5)
    for _ in range(50):
        p = rng.uniform(-40, 40, 3).astype(F32)
        local = p - pos
        face = np.argmax([local[0], -local[0], local[1], -local[1],
                          local[2], -local[2]])
        dist = np.abs(local).max()
        if dist < 0.2:
            continue
        ndc = _project(vps[face], p)
        analytic = L.vector_to_depth_value_reverse_z(dist)
        assert ndc[2] == pytest.approx(float(analytic), abs=1e-4), (p, face)


def test_directional_viewproj_maps_origin_inside():
    vp = L.directional_light_viewproj(np.array([-0.5, -1.0, -0.3], F32))
    ndc = _project(vp, np.zeros(3, F32))
    assert np.abs(ndc[:2]).max() < 1.0
    assert 0.0 < ndc[2] <= 1.0
    # points closer to the light have LARGER reverse-Z depth
    d = np.asarray([-0.5, -1.0, -0.3], F32) / np.linalg.norm([-0.5, -1.0, -0.3])
    nearer = _project(vp, (-5.0 * d).astype(F32))
    farther = _project(vp, (5.0 * d).astype(F32))
    assert nearer[2] > farther[2]


def test_pack_lights_ordering_contract():
    p1 = (np.array([1, 2, 3], F32), np.ones(3, F32))
    p2 = (np.array([4, 5, 6], F32), np.ones(3, F32))
    d1 = (np.array([0, -1, 0], F32), np.ones(3, F32))
    packed = L.pack_lights([p1, p2], [d1])
    assert packed.num_point == 2 and packed.num_directional == 1
    # shadow view order: P0 faces 0..5, P1 faces 0..5, then D0
    assert packed.shadow_viewprojs.shape == (13, 4, 4)
    np.testing.assert_allclose(
        packed.shadow_viewprojs[:6], L.point_light_face_viewprojs(p1[0]), atol=1e-6)
    np.testing.assert_allclose(
        packed.shadow_viewprojs[12], L.directional_light_viewproj(d1[0]), atol=1e-6)
    np.testing.assert_allclose(packed.dir_viewproj[0],
                               packed.shadow_viewprojs[12], atol=1e-6)
