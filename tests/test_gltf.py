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


def _make_material_glb(tmp_path):
    """Two-primitive GLB: prim 0 uses a material with an embedded PNG
    baseColorTexture + metallicRoughnessTexture, prim 1 a texture-less
    factor-only material."""
    import io

    from PIL import Image

    pos, nrm, uv, idx = _quad_arrays()

    # 8x8 solid-green albedo; metallicRoughness with G=64 (roughness),
    # B=192 (metalness)
    img0 = np.zeros((8, 8, 3), np.uint8)
    img0[..., 1] = 255
    img1 = np.zeros((8, 8, 3), np.uint8)
    img1[..., 1] = 64
    img1[..., 2] = 192
    pngs = []
    for im in (img0, img1):
        buf = io.BytesIO()
        Image.fromarray(im, "RGB").save(buf, format="PNG")
        pngs.append(buf.getvalue())

    bin_parts = [pos.tobytes(), nrm.tobytes(), uv.tobytes(), idx.tobytes(),
                 pngs[0], pngs[1]]
    offs, off = [], 0
    for b in bin_parts:
        offs.append(off)
        off += len(b) + ((-len(b)) % 4)
    blob = b"".join(b + b"\0" * ((-len(b)) % 4) for b in bin_parts)

    attrs = {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2}
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [
            {"attributes": attrs, "indices": 3, "material": 0},
            {"attributes": attrs, "indices": 3, "material": 1}]}],
        "materials": [
            {"pbrMetallicRoughness": {
                "baseColorTexture": {"index": 0},
                "metallicRoughnessTexture": {"index": 1}}},
            {"pbrMetallicRoughness": {
                "baseColorFactor": [0.2, 0.4, 0.8, 1.0],
                "roughnessFactor": 0.3, "metallicFactor": 0.7}},
        ],
        "textures": [{"source": 0}, {"source": 1}],
        "images": [{"bufferView": 4, "mimeType": "image/png"},
                   {"bufferView": 5, "mimeType": "image/png"}],
        "buffers": [{"byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": offs[0], "byteLength": len(bin_parts[0])},
            {"buffer": 0, "byteOffset": offs[1], "byteLength": len(bin_parts[1])},
            {"buffer": 0, "byteOffset": offs[2], "byteLength": len(bin_parts[2])},
            {"buffer": 0, "byteOffset": offs[3], "byteLength": len(bin_parts[3])},
            {"buffer": 0, "byteOffset": offs[4], "byteLength": len(bin_parts[4])},
            {"buffer": 0, "byteOffset": offs[5], "byteLength": len(bin_parts[5])},
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
    p = os.path.join(tmp_path, "material_quad.glb")
    with open(p, "wb") as f:
        f.write(glb)
    return p


def test_gltf_material_parts(tmp_path):
    """Embedded-texture materials map to PbrMaterialDescriptor slots
    (VERDICT r3 item 9; the reference stubs all glTF,
    src/resource_loader.rs:254-283)."""
    from PIL import Image

    from tinyrenderer_tpu.scene import components as comp

    p = _make_material_glb(str(tmp_path))
    parts = gltflib.load_gltf_parts(p)
    assert len(parts) == 2
    assert all(pt.mesh.num_triangles == 2 for pt in parts)

    # part 0: textured — Albedo + Roughness(G) + Metalness(B) slots
    tex = parts[0].material
    assert not tex.is_flat
    by_usage = {t.usage: t for t in tex.textures}
    assert comp.TextureUsage.Albedo in by_usage
    alb = np.asarray(Image.open(by_usage[comp.TextureUsage.Albedo].path))
    assert alb[..., 1].min() == 255 and alb[..., 0].max() == 0  # green
    rough = np.asarray(Image.open(by_usage[comp.TextureUsage.Roughness].path))
    assert rough[..., 0].max() == 64     # G channel extracted to R
    metal = np.asarray(Image.open(by_usage[comp.TextureUsage.Metalness].path))
    assert metal[..., 0].min() == 192    # B channel extracted to R

    # part 1: factor-only -> Flat
    flat = parts[1].material
    assert flat.is_flat
    np.testing.assert_allclose(flat.flat.albedo, [0.2, 0.4, 0.8], atol=1e-6)
    assert abs(flat.flat.roughness - 0.3) < 1e-6
    assert abs(flat.flat.metalness - 0.7) < 1e-6


def test_gltf_part_fragment_addressing(tmp_path):
    """'asset.glb#part<k>' selects one material group; out-of-range raises."""
    p = _make_material_glb(str(tmp_path))
    whole = gltflib.load_gltf(p)
    part0 = gltflib.load_gltf(p + "#part0")
    assert whole.num_triangles == 4 and part0.num_triangles == 2
    with pytest.raises(ValueError, match="out of range"):
        gltflib.load_gltf(p + "#part7")
    assert gltflib.split_part_fragment(p + "#part1") == (p, 1)
    assert gltflib.split_part_fragment(p) == (p, None)


def test_drop_gltf_spawns_textured_parts(tmp_path):
    """FileDropped with a .glb spawns one renderable per material group,
    carrying the asset's own materials, and the engine renders it."""
    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.editor import controller as ctl
    from tinyrenderer_tpu.editor import events
    from tinyrenderer_tpu.render.engine import Engine
    from tinyrenderer_tpu.scene import components as comp
    from tinyrenderer_tpu.scene.camera import Camera
    from tinyrenderer_tpu.scene.world import World

    p = _make_material_glb(str(tmp_path))
    world = World()
    cam = Camera.new_default(128, 64)
    c = ctl.PlayerController(cam, 128, 64, lambda x, y: 0)
    c.handle_event(events.FileDropped(path=p), world)

    objs = [o for _id, o in world.world_objects()
            if any(isinstance(cc, comp.RenderableComponent)
                   for cc in o.components)]
    assert len(objs) == 1
    rends = [cc for cc in objs[0].components
             if isinstance(cc, comp.RenderableComponent)]
    assert len(rends) == 2
    assert rends[0].model_descriptor.mesh_descriptor.value.endswith("#part0")
    assert not rends[0].model_descriptor.material_descriptor.is_flat
    assert rends[1].model_descriptor.material_descriptor.is_flat

    cfg = RenderConfig(
        width=128, height=64, tile_h=16, tile_w=128, bin_capacity=64,
        shadow_size=64, shadow_tile=64, shadow_bin_capacity=64,
        env_size=16, irradiance_size=8, texture_size=32, mip_levels=3,
        use_pallas=False, enable_shadows=False, enable_ssr=False)
    cam = Camera.new_default(cfg.width, cfg.height)
    cam.position = np.array([0.5, 0.5, 4.0], F32)
    cam.look_at(np.array([0.5, 0.5, 0.0], F32))
    eng = Engine.from_world(world, camera=cam, cfg=cfg)
    out = eng.run_frame(0.0)
    sdr = np.asarray(out.sdr)
    assert (np.asarray(out.pick_id) > 0).any()
    assert np.isfinite(sdr).all()


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