"""glTF 2.0 loader tests: GLB and JSON containers, accessors (packed,
strided, normalized), node transforms, strip triangulation, and the
engine's end-to-end mesh path (the reference stubs all of this,
src/resource_loader.rs:254-283)."""

import base64
import json
import os
import struct

import numpy as np
import pytest

from tinyrenderer_tpu.assets import gltf as gltflib

F32 = np.float32


def _quad_arrays():
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], F32)
    nrm = np.tile(np.array([[0, 0, 1]], F32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], F32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    return pos, nrm, uv, idx


def _make_glb(tmp_path, node_extra=None, mode=4, with_normals=True):
    pos, nrm, uv, idx = _quad_arrays()
    if mode == 5:  # strip: 0-1-3-2 produces the same two CCW triangles
        idx = np.array([1, 2, 0, 3], np.uint16)
    bin_parts = [pos.tobytes(), nrm.tobytes(), uv.tobytes(), idx.tobytes()]
    offs, off = [], 0
    for b in bin_parts:
        offs.append(off)
        off += len(b) + ((-len(b)) % 4)
    blob = b"".join(b + b"\0" * ((-len(b)) % 4) for b in bin_parts)

    attrs = {"POSITION": 0, "TEXCOORD_0": 2}
    if with_normals:
        attrs["NORMAL"] = 1
    node = {"mesh": 0}
    if node_extra:
        node.update(node_extra)
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [node],
        "meshes": [{"primitives": [
            {"attributes": attrs, "indices": 3, "mode": mode}]}],
        "buffers": [{"byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offs[0], "byteLength": len(bin_parts[0])},
            {"buffer": 0, "byteOffset": offs[1], "byteLength": len(bin_parts[1])},
            {"buffer": 0, "byteOffset": offs[2], "byteLength": len(bin_parts[2])},
            {"buffer": 0, "byteOffset": offs[3], "byteLength": len(bin_parts[3])},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123,
             "count": len(idx), "type": "SCALAR"},
        ],
    }
    j = json.dumps(gltf).encode()
    j += b" " * ((-len(j)) % 4)
    glb = (b"glTF" + struct.pack("<II", 2, 12 + 8 + len(j) + 8 + len(blob))
           + struct.pack("<II", len(j), 0x4E4F534A) + j
           + struct.pack("<II", len(blob), 0x004E4942) + blob)
    p = os.path.join(tmp_path, "quad.glb")
    with open(p, "wb") as f:
        f.write(glb)
    return p


def test_glb_quad_round_trip(tmp_path):
    m = gltflib.load_gltf(_make_glb(str(tmp_path)))
    pos, nrm, uv, idx = _quad_arrays()
    assert m.num_vertices == 4 and m.num_triangles == 2
    np.testing.assert_allclose(m.positions, pos)
    np.testing.assert_allclose(m.normals, nrm)
    np.testing.assert_allclose(m.tex_coords, uv)
    np.testing.assert_array_equal(m.indices, idx.astype(np.int32))
    # tangent frames were generated
    assert np.abs(m.tangents).sum() > 0


def test_glb_node_transform_baked(tmp_path):
    p = _make_glb(str(tmp_path), node_extra={
        "translation": [1.0, 2.0, 3.0], "scale": [2.0, 2.0, 2.0]})
    m = gltflib.load_gltf(p)
    pos, _, _, _ = _quad_arrays()
    np.testing.assert_allclose(m.positions, pos * 2.0 + [1, 2, 3], atol=1e-6)
    # pure translate+uniform-scale leaves normals unchanged (renormalized)
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4, atol=1e-6)


def test_glb_triangle_strip(tmp_path):
    m = gltflib.load_gltf(_make_glb(str(tmp_path), mode=5))
    assert m.num_triangles == 2
    # both triangles wind the same way as the indexed version (+z normal)
    tri = m.indices.reshape(-1, 3)
    for t in tri:
        a, b, c = m.positions[t]
        assert np.cross(b - a, c - a)[2] > 0


def test_glb_missing_normals_generates_flat(tmp_path):
    m = gltflib.load_gltf(_make_glb(str(tmp_path), with_normals=False))
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4, atol=1e-6)


def test_gltf_json_data_uri_and_stride(tmp_path):
    """.gltf container, base64 data-URI buffer, interleaved POSITION/uv."""
    pos, _, uv, idx = _quad_arrays()
    inter = np.concatenate([pos, uv], axis=1).astype(F32)  # (4, 5) stride 20
    blob = inter.tobytes() + idx.tobytes()
    gltf = {
        "asset": {"version": "2.0"},
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1}, "indices": 2}]}],
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode()}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 80, "byteStride": 20},
            {"buffer": 0, "byteOffset": 80, "byteLength": len(idx) * 2},
        ],
        "accessors": [
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
             "count": 4, "type": "VEC3"},
            {"bufferView": 0, "byteOffset": 12, "componentType": 5126,
             "count": 4, "type": "VEC2"},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
    }
    p = os.path.join(str(tmp_path), "quad.gltf")
    with open(p, "w") as f:
        json.dump(gltf, f)
    m = gltflib.load_gltf(p)
    np.testing.assert_allclose(m.positions, pos)
    np.testing.assert_allclose(m.tex_coords, uv)
    # no NORMAL attribute -> flat +z generated from winding
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4, atol=1e-6)


def test_gltf_truncated_strided_buffer_rejected(tmp_path):
    """ADVICE r2: a strided accessor whose extent exceeds the buffer must
    raise ValueError (as_strided would silently read out-of-bounds memory),
    so the cube-substitution fallback in scene_gpu can engage."""
    pos, _, uv, idx = _quad_arrays()
    inter = np.concatenate([pos, uv], axis=1).astype(F32)
    blob = (inter.tobytes() + idx.tobytes())[:40]  # truncated mid-vertex
    gltf = {
        "asset": {"version": "2.0"},
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0}, "indices": 1}]}],
        "buffers": [{
            "byteLength": len(blob),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(blob).decode()}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 80, "byteStride": 20},
            {"buffer": 0, "byteOffset": 80, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "byteOffset": 0, "componentType": 5126,
             "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
    }
    p = os.path.join(str(tmp_path), "trunc.gltf")
    with open(p, "w") as f:
        json.dump(gltf, f)
    with pytest.raises(ValueError, match="truncated or malformed"):
        gltflib.load_gltf(p)


def test_engine_renders_gltf(tmp_path):
    """End-to-end: a .glb in a world renders and is pickable."""
    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render.engine import Engine
    from tinyrenderer_tpu.scene import components as comp
    from tinyrenderer_tpu.scene.world import World, WorldObject

    p = _make_glb(str(tmp_path), node_extra={"scale": [4.0, 4.0, 4.0]})
    world = World()
    world.add_world_object(WorldObject(
        components=[comp.RenderableComponent(
            model_descriptor=comp.ModelDescriptor(
                mesh_descriptor=comp.MeshDescriptor("FromFile", p),
                material_descriptor=comp.PbrMaterialDescriptor.from_color(
                    (0.9, 0.2, 0.2))))],
        transform=comp.TransformComponent(position=np.zeros(3, F32))))
    cfg = RenderConfig(
        width=128, height=64, tile_h=16, tile_w=128, bin_capacity=64,
        shadow_size=64, shadow_tile=64, shadow_bin_capacity=64,
        env_size=16, irradiance_size=8, texture_size=32, mip_levels=3,
        use_pallas=False, enable_shadows=False, enable_ssr=False)
    from tinyrenderer_tpu.scene.camera import Camera
    cam = Camera.new_default(cfg.width, cfg.height)
    cam.position = np.array([2.0, 2.0, 8.0], F32)  # face the +z quad
    cam.look_at(np.array([2.0, 2.0, 0.0], F32))
    eng = Engine.from_world(world, camera=cam, cfg=cfg)
    out = eng.run_frame(0.0)
    assert (np.asarray(out.pick_id) > 0).any()