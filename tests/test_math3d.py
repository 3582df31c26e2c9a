import math

import numpy as np
import pytest

from tinyrenderer_tpu.utils import math3d


def test_line_closest_points_matches_reference_values():
    # Hand values from crates/math_helpers/src/line.rs:44-80.
    l1 = math3d.Line(np.array([2.0, 6.0, -9.0]), math3d.normalize([3.0, 4.0, -4.0]))
    l2 = math3d.Line(np.array([-1.0, -2.0, 3.0]), math3d.normalize([2.0, -6.0, 1.0]))
    p1, p2 = l1.closest_points(l2)
    np.testing.assert_allclose(p1, [-4.167919799498746, -2.223893065998329, -0.7761069340016708], atol=1e-5)
    np.testing.assert_allclose(p2, [-1.427736006683375, -0.7167919799498746, 2.786131996658312], atol=1e-5)


def test_reverse_z_flips_depth_range():
    rz = math3d.reverse_z_matrix()
    near = rz @ np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    far = rz @ np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    assert near[2] == 1.0 and far[2] == 0.0


def test_perspective_rh_depth_zero_to_one():
    p = math3d.perspective_rh(math.radians(60), 1.5, 0.1, 100.0)
    # point on near plane (view z = -near) -> ndc z = 0
    v = p @ np.array([0.0, 0.0, -0.1, 1.0], np.float32)
    assert abs(v[2] / v[3]) < 1e-6
    v = p @ np.array([0.0, 0.0, -100.0, 1.0], np.float32)
    assert abs(v[2] / v[3] - 1.0) < 1e-5


def test_look_at_rh_maps_eye_to_origin_and_forward_to_minus_z():
    eye = np.array([1.0, 2.0, 3.0], np.float32)
    center = np.array([4.0, 5.0, 6.0], np.float32)
    m = math3d.look_at_rh(eye, center, [0.0, 1.0, 0.0])
    o = m @ np.array([*eye, 1.0], np.float32)
    np.testing.assert_allclose(o[:3], 0.0, atol=1e-6)
    f = m @ np.array([*center, 1.0], np.float32)
    assert f[2] < 0  # forward maps to -Z
    np.testing.assert_allclose(f[:2], 0.0, atol=1e-5)


def test_orthographic_rh():
    m = math3d.orthographic_rh(-50.0, 100.0, -50.0, 100.0, 0.1, 250.0)
    v = m @ np.array([25.0, 25.0, -0.1, 1.0], np.float32)
    np.testing.assert_allclose(v[2], 0.0, atol=1e-6)
    v = m @ np.array([100.0, 100.0, -250.0, 1.0], np.float32)
    np.testing.assert_allclose(v[:3], [1.0, 1.0, 1.0], atol=1e-5)


def test_quat_roundtrip_rotation():
    q = math3d.quat_from_axis_angle([0.0, 1.0, 0.0], math.pi / 2.0)
    v = math3d.quat_rotate(q, np.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [0.0, 0.0, -1.0], atol=1e-6)
    m = math3d.quat_to_mat3(q)
    np.testing.assert_allclose(m @ np.array([1.0, 0.0, 0.0], np.float32), v, atol=1e-6)


def test_quat_mul_matches_sequential_rotation():
    qa = math3d.quat_from_rotation_y(0.7)
    qb = math3d.quat_from_rotation_z(-0.3)
    v = np.array([0.3, -1.2, 2.0], np.float32)
    v1 = math3d.quat_rotate(math3d.quat_mul(qa, qb), v)
    v2 = math3d.quat_rotate(qa, math3d.quat_rotate(qb, v))
    np.testing.assert_allclose(v1, v2, atol=1e-5)


def test_compose_trs_order():
    # scale then rotate then translate
    q = math3d.quat_from_rotation_y(math.pi / 2.0)
    m = math3d.compose_trs([1.0, 2.0, 3.0], q, [2.0, 2.0, 2.0])
    v = m @ np.array([1.0, 0.0, 0.0, 1.0], np.float32)
    np.testing.assert_allclose(v[:3], [1.0, 2.0, 1.0], atol=1e-5)


def test_normal_matrix_is_inverse_transpose():
    q = math3d.quat_from_axis_angle([0.3, 0.5, 0.8], 1.1)
    m = math3d.compose_trs([0, 0, 0], q, [1.0, 2.0, 3.0])
    n = math3d.normal_matrix(m)
    # normals transformed by n stay perpendicular to tangents transformed by m
    normal = math3d.normalize([0.0, 1.0, 0.0])
    tangent = np.array([1.0, 0.0, 0.0], np.float32)
    nt = n @ normal
    tt = m[:3, :3] @ tangent
    assert abs(np.dot(nt, tt)) < 1e-5


def test_normalize_to_interval():
    assert math3d.normalize_to_interval(370.0, 0.0, 360.0) == pytest.approx(10.0)
    assert math3d.normalize_to_interval(-30.0, 0.0, 360.0) == pytest.approx(330.0)
    # 3*pi wraps to the low end of [-pi, pi)
    assert math3d.normalize_to_interval(math.pi * 3, -math.pi, math.pi) == pytest.approx(-math.pi, abs=1e-6)
