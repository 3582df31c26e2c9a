"""Native C++ asset pipeline vs the pure-Python fallback: exact parity."""

import numpy as np
import pytest

from tinyrenderer_tpu.assets import mesh as meshlib
from tinyrenderer_tpu.assets import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

OBJ_SAMPLE = """
# sample with quads, negative indices, missing uv/normal combos
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
f 1/1/1 2/2/1 3/3/1 4/4/1
f 1/1 2/2 5
f -1 -2 -3
"""


def _tri_geometry(m):
    """Order-independent signature: sorted per-triangle corner data."""
    tri = m.indices.reshape(-1, 3)
    corners = np.concatenate(
        [m.positions[tri], m.tex_coords[tri], m.normals[tri]], axis=-1)
    # sort corners within each triangle, then sort triangles
    corners = np.sort(corners.round(5), axis=1)
    order = np.lexsort(corners.reshape(len(corners), -1).T[::-1])
    return corners[order]


def test_obj_parse_parity():
    py = meshlib.parse_obj_text(OBJ_SAMPLE)
    nat = native.parse_obj_text(OBJ_SAMPLE)
    assert nat is not None
    positions, tex_coords, normals, indices = nat
    nat_mesh = meshlib.build_mesh(positions, tex_coords, normals, indices)
    assert nat_mesh.indices.size == py.indices.size
    np.testing.assert_allclose(_tri_geometry(nat_mesh), _tri_geometry(py),
                               atol=1e-6)


def test_obj_parse_reference_cube():
    import os
    path = "/root/reference/assets/models/cube/cube.obj"
    if not os.path.exists(path):
        pytest.skip("reference assets unavailable")
    text = open(path).read()
    py = meshlib.parse_obj_text(text)
    nat = native.parse_obj_text(text)
    positions, tex_coords, normals, indices = nat
    nat_mesh = meshlib.build_mesh(positions, tex_coords, normals, indices)
    assert nat_mesh.num_vertices == py.num_vertices
    np.testing.assert_allclose(_tri_geometry(nat_mesh), _tri_geometry(py),
                               atol=1e-6)


def test_tangent_parity_random(rng):
    nv, nt = 200, 400
    positions = rng.standard_normal((nv, 3)).astype(np.float32)
    tex_coords = rng.random((nv, 2)).astype(np.float32)
    indices = rng.integers(0, nv, size=nt * 3).astype(np.int32)
    t_py, b_py = meshlib.compute_tangents(positions, tex_coords, indices)
    nat = native.compute_tangents(positions, tex_coords, indices)
    assert nat is not None
    t_c, b_c = nat
    np.testing.assert_allclose(t_c, t_py, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(b_c, b_py, rtol=1e-5, atol=1e-5)


def test_box_downsample_parity(rng):
    img = rng.random((16, 32, 4)).astype(np.float32)
    out = native.box_downsample(img)
    assert out is not None
    ref = img.reshape(8, 2, 16, 2, 4).mean(axis=(1, 3))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


def test_malformed_obj_falls_back_cleanly():
    # out-of-range face index -> native returns None (error), python parser
    # raises; load path must survive via its substitution warnings
    bad = "v 0 0 0\nf 1 2 3\n"
    assert native.parse_obj_text(bad) is None
