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


def test_native_png_roundtrip():
    """tr_encode_png output must decode (PIL) to the exact input pixels —
    RGB and RGBA, including a real rendered-frame-like gradient."""
    from tinyrenderer_tpu.assets import native
    if not native.available():
        pytest.skip("native library unavailable")
    import io

    from PIL import Image
    rng = np.random.default_rng(3)
    images = [
        rng.integers(0, 255, (64, 48, 3)).astype(np.uint8),
        rng.integers(0, 255, (33, 31, 4)).astype(np.uint8),  # odd dims, RGBA
        np.tile(np.linspace(0, 255, 128, dtype=np.uint8)[None, :, None],
                (96, 1, 3)),
    ]
    for img in images:
        data = native.encode_png(img)
        assert data is not None and data[:8] == b"\x89PNG\r\n\x1a\n"
        back = np.asarray(Image.open(io.BytesIO(data)))
        np.testing.assert_array_equal(back, img)


def test_encode_png_uses_native_or_falls_back():
    """image_io.encode_png returns a valid PNG either way."""
    from tinyrenderer_tpu.utils import image_io
    img = np.zeros((16, 16, 3), np.uint8)
    img[4:12, 4:12] = (200, 30, 90)
    data = image_io.encode_png(img)
    import io

    from PIL import Image
    back = np.asarray(Image.open(io.BytesIO(data)))
    np.testing.assert_array_equal(back, img)


def test_obj_fuzz_differential(rng):
    """Seeded fuzz: random well-formed OBJ documents must parse to the
    same geometry through the native parser and the Python parser
    (positions/uv/normals/indices all equal)."""
    from tinyrenderer_tpu.assets import mesh as meshlib
    if not native.available():
        pytest.skip("native library unavailable")

    for trial in range(20):
        nv = int(rng.integers(3, 30))
        nt = int(rng.integers(1, 12))
        nn = int(rng.integers(1, 10))
        lines = []
        for _ in range(nv):
            x, y, z = rng.normal(size=3)
            lines.append(f"v {x:.6g} {y:.6g} {z:.6g}")
        for _ in range(nt):
            u, v = rng.random(2)
            lines.append(f"vt {u:.6g} {v:.6g}")
        for _ in range(nn):
            x, y, z = rng.normal(size=3)
            lines.append(f"vn {x:.6g} {y:.6g} {z:.6g}")
        for _ in range(int(rng.integers(1, 15))):
            # face arity 3..5, token style varies per face; negative
            # indices exercised on some trials
            arity = int(rng.integers(3, 6))
            style = int(rng.integers(0, 4))
            toks = []
            for _ in range(arity):
                pi = int(rng.integers(1, nv + 1))
                if trial % 3 == 0:
                    pi = pi - nv - 1  # negative (relative) index
                ti = int(rng.integers(1, nt + 1))
                ni = int(rng.integers(1, nn + 1))
                toks.append([f"{pi}", f"{pi}/{ti}", f"{pi}//{ni}",
                             f"{pi}/{ti}/{ni}"][style])
            lines.append("f " + " ".join(toks))
        text = "\n".join(lines) + "\n"

        got = native.parse_obj_text(text)
        assert got is not None, f"native parse failed on trial {trial}"
        p, t, n, idx = got
        ref = meshlib.parse_obj_text(text)
        np.testing.assert_allclose(p, ref.positions, atol=1e-6)
        np.testing.assert_allclose(t, ref.tex_coords, atol=1e-6)
        np.testing.assert_allclose(n, ref.normals, atol=1e-6)
        np.testing.assert_array_equal(idx, ref.indices.reshape(-1))


def _fuzz_hdr_image(rng, h, w):
    """Mix of flat regions (RLE runs), noise (literals) and HDR range."""
    img = rng.random((h, w, 3)).astype(np.float32) * 4.0
    # constant bands -> long runs in every channel
    for _ in range(3):
        y0 = int(rng.integers(0, h))
        img[y0] = rng.random(3).astype(np.float32)
    # a bright HDR region exercising big exponents
    img[: h // 2, : w // 2] *= 100.0
    return img


def test_hdr_decode_fuzz_differential(rng):
    """Seeded fuzz: flat and adaptive-RLE Radiance files must decode to
    bit-identical float images through the native scanline decoder
    (tr_decode_hdr) and the pure-Python reference (_decode_hdr_py)."""
    from tinyrenderer_tpu.assets import hdr

    for trial in range(12):
        h = int(rng.integers(1, 24))
        # cover the flat-forced (<8) and RLE-eligible widths
        w = int(rng.integers(1, 8)) if trial % 3 == 0 else int(
            rng.integers(8, 80))
        img = _fuzz_hdr_image(rng, h, w)
        for rle in (False, True):
            data = hdr.encode_hdr(img, rle=rle)
            ref = hdr._decode_hdr_py(data)
            rgbe = native.decode_hdr_rgbe(data)
            assert rgbe is not None, (
                f"native decode failed (trial {trial}, rle={rle})")
            np.testing.assert_array_equal(hdr.rgbe_to_float(rgbe), ref)
            # the public entry point (native-first) agrees too
            np.testing.assert_array_equal(hdr.decode_hdr(data), ref)


def test_hdr_decode_malformed_falls_back():
    """Truncated/corrupt files: the native decoder returns None (no
    crash/OOB) and the public path surfaces the Python decoder's error."""
    from tinyrenderer_tpu.assets import hdr

    img = np.ones((4, 16, 3), np.float32)
    good = hdr.encode_hdr(img, rle=True)
    for bad in (b"", b"#?", good[:40], good[:-3],
                good.replace(b"-Y", b"+Q", 1)):
        assert native.decode_hdr_rgbe(bad) is None
        with np.testing.assert_raises(Exception):
            hdr.decode_hdr(bad)
