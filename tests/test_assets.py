"""Asset pipeline tests: HDR codec, texture defaults, light capacity."""

import numpy as np
import pytest

from tinyrenderer_tpu.assets import hdr as hdrlib
from tinyrenderer_tpu.assets import textures as texlib


def test_hdr_roundtrip(rng):
    img = (rng.random((16, 24, 3)).astype(np.float32) * 8.0 + 0.01)
    data = hdrlib.encode_hdr(img)
    out = hdrlib.decode_hdr(data)
    assert out.shape == img.shape
    # RGBE shares one exponent per pixel: error bound is ~max_channel/256
    bound = img.max(axis=-1, keepdims=True) / 256.0 + 1e-4
    assert (np.abs(out - img) <= bound).all()


def test_hdr_rle_decode(rng):
    """Hand-build an adaptive-RLE scanline file and decode it."""
    w, h = 16, 2
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., 0] = 100           # constant red mantissa
    rgbe[0, :, 1] = np.arange(w)  # varying green
    rgbe[..., 3] = 128            # exponent for ~[0,1) range

    def rle_scanline(row):
        out = bytearray([2, 2, w >> 8, w & 0xFF])
        for ch in range(4):
            vals = row[:, ch]
            if (vals == vals[0]).all():      # one run
                out += bytes([128 + w, int(vals[0])])
            else:                            # one literal block
                out += bytes([w]) + vals.tobytes()
        return bytes(out)

    payload = b"".join(rle_scanline(rgbe[y]) for y in range(h))
    data = (b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
            + f"-Y {h} +X {w}\n".encode() + payload)
    out = hdrlib.decode_hdr(data)
    expected = hdrlib.rgbe_to_float(rgbe)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_hdr_rejects_non_hdr():
    with pytest.raises(ValueError):
        hdrlib.decode_hdr(b"PNG not really")


def test_procedural_sky_is_plausible():
    sky = hdrlib.procedural_sky(32, 64)
    assert sky.shape == (32, 64, 3)
    assert sky.min() >= 0.0
    # sky top (v=0) should be bluer than ground bottom
    assert sky[0, :, 2].mean() > sky[-1, :, 2].mean()


def test_default_textures():
    alb = texlib.default_albedo(16)
    nrm = texlib.default_normal(16)
    assert alb.shape == (16, 16, 4)
    # flat normal map encodes +Z: (0.5, 0.5, 1.0)
    np.testing.assert_allclose(nrm[..., 2], 1.0, atol=0.01)
    np.testing.assert_allclose(nrm[..., 0], 0.5, atol=0.01)


def test_max_lights_clamped(caplog):
    from tinyrenderer_tpu.config import MAX_LIGHTS, RenderConfig
    from tinyrenderer_tpu.render.scene_gpu import ScenePacker
    from tinyrenderer_tpu.scene import components as comp
    from tinyrenderer_tpu.scene.world import World, WorldObject

    world = World()
    for i in range(MAX_LIGHTS + 3):
        world.add_world_object(WorldObject(
            components=[comp.LightObjectComponent()],
            transform=comp.TransformComponent(
                position=np.array([i, 5.0, 0.0], np.float32))))
    cfg = RenderConfig(max_instances=64, texture_size=32, mip_levels=3)
    pack = ScenePacker(cfg, (".",)).pack(world)
    assert pack.counts["point_lights"] == MAX_LIGHTS


@pytest.mark.slow
def test_engine_set_skybox_changes_environment(tmp_path):
    import jax.numpy as jnp
    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render.engine import Engine
    from tinyrenderer_tpu.scene import demo

    cfg = RenderConfig(
        width=128, height=64, tile_h=16, tile_w=128, bin_capacity=128,
        shadow_size=64, shadow_tile=64, shadow_bin_capacity=128,
        env_size=16, irradiance_size=8, texture_size=32, mip_levels=3,
        enable_shadows=False, enable_ssr=False, use_pallas=False)
    eng = Engine.from_world(demo.build_demo_world(n_cubes=2),
                            camera=demo.build_demo_camera(128, 64), cfg=cfg)
    before = np.asarray(eng.run_frame().sdr).astype(np.int16)

    # red-tinted environment
    red = np.zeros((8, 16, 3), np.float32)
    red[..., 0] = 4.0
    p = tmp_path / "red.hdr"
    p.write_bytes(hdrlib.encode_hdr(red))
    eng.set_skybox(str(p))
    after = np.asarray(eng.run_frame().sdr).astype(np.int16)
    # sky pixels turn red-dominant
    assert (after[..., 0].mean() - after[..., 2].mean()) > \
           (before[..., 0].mean() - before[..., 2].mean()) + 10


def test_native_pool_preserves_oversized_textures(tmp_path):
    """cfg.native_texture_pool keeps each record at its own size: an asset
    LARGER than the fixed pyramid samples losslessly (the fixed pool
    downsamples it). Reference: per-texture storage, src/texture.rs:98-252."""
    import os

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.ops import sampling
    from tinyrenderer_tpu.render.scene_gpu import ScenePacker

    # a 128^2 checkerboard in a 32^2 fixed pool: 4px checker survives only
    # at native size
    rng = np.random.default_rng(3)
    img = np.zeros((128, 128, 4), np.uint8)
    img[..., 3] = 255
    cells = (np.add.outer(np.arange(128) // 4, np.arange(128) // 4) % 2)
    img[..., 0] = np.where(cells, 230, 30)
    img[..., 1] = rng.integers(0, 255, (128, 128))
    img[..., 2] = 128
    p = os.path.join(str(tmp_path), "checker.png")
    Image.fromarray(img, "RGBA").save(p)

    cfg = RenderConfig(texture_size=32, mip_levels=4)
    packer = ScenePacker(cfg, asset_search_paths=(str(tmp_path),))
    slot = packer.pool.get_or_load(p, "Albedo")
    rec = packer.pool.get_or_make_record(
        (slot, 1, 2, 3))  # albedo=checker, defaults for the rest

    native = packer.native_pool_gpu(windowed=True)
    fixed = packer.texture_pool_gpu(windowed=True)

    n = 64
    u = (np.arange(n, dtype=np.float32) + 0.5) / n * 0.5  # magnified region
    uv = jnp.asarray(np.stack(np.meshgrid(u, u, indexing="xy"), axis=-1))
    recs = jnp.full((n, n), rec, jnp.int32)
    lvl = jnp.zeros((n, n), jnp.float32)

    out_n = np.asarray(sampling.sample_pool_mip(native, recs, uv, lvl,
                                                filter="trilinear"))
    out_f = np.asarray(sampling.sample_pool_mip(fixed, recs, uv, lvl,
                                                filter="trilinear"))
    # ground truth: bilinear sample of the original 128^2 image
    gt = img[..., 0].astype(np.float32) / 255.0
    px = np.clip(np.asarray(uv)[..., 0] * 128 - 0.5, 0, 127)
    py = np.clip(np.asarray(uv)[..., 1] * 128 - 0.5, 0, 127)
    x0, y0 = np.floor(px).astype(int), np.floor(py).astype(int)
    x1, y1 = np.minimum(x0 + 1, 127), np.minimum(y0 + 1, 127)
    fx, fy = px - x0, py - y0
    ref = ((gt[y0, x0] * (1 - fx) + gt[y0, x1] * fx) * (1 - fy)
           + (gt[y1, x0] * (1 - fx) + gt[y1, x1] * fx) * fy)

    err_native = np.abs(out_n[..., 0] - ref).mean()
    err_fixed = np.abs(out_f[..., 0] - ref).mean()
    assert err_native < 0.01, err_native      # u8 quantization only
    assert err_fixed > 5 * err_native          # the pyramid blurred it away


@pytest.mark.slow
def test_native_pool_engine_renders(tmp_path):
    """reference_parity (native_texture_pool=True) renders end-to-end."""
    import numpy as np

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.render.engine import Engine
    from tinyrenderer_tpu.scene import demo

    cfg = RenderConfig(width=128, height=64, tile_h=16, tile_w=128,
                       env_size=16, irradiance_size=8, texture_size=32,
                       mip_levels=3, use_pallas=False).reference_parity()
    # keep the tiny test envelope (reference_parity resets pool fields)
    from dataclasses import replace
    cfg = replace(cfg, texture_size=32, mip_levels=3)
    eng = Engine.from_world(
        demo.build_demo_world(n_cubes=4, textured_every=1),
        camera=demo.build_demo_camera(128, 64), cfg=cfg)
    out = eng.run_frame(0.0)
    img = np.asarray(out.sdr)
    assert np.isfinite(img.astype(np.float32)).all()
    assert img.max() > 30  # not a black frame


def test_native_pool_nonsquare_mip_selection(tmp_path):
    """Non-square native textures must pick the mip level from the record's
    own (w0, h0) per uv axis. Regression: the scalar width-only rebias
    selected log2(h0/w0) levels too sharp when the v-derivative dominated
    (a 32x128 texture minified 2x vertically sampled level 0, aliasing)."""
    import os

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from tinyrenderer_tpu.config import RenderConfig
    from tinyrenderer_tpu.ops import sampling
    from tinyrenderer_tpu.render.scene_gpu import ScenePacker

    # 32 wide x 128 tall, rows alternating dark/bright: level 0 stripes,
    # level >= 1 a uniform box average
    img = np.zeros((128, 32, 4), np.uint8)
    img[..., 3] = 255
    img[0::2, :, :3] = 30
    img[1::2, :, :3] = 230
    p = os.path.join(str(tmp_path), "stripes.png")
    Image.fromarray(img, "RGBA").save(p)

    cfg = RenderConfig(texture_size=32, mip_levels=4)
    packer = ScenePacker(cfg, asset_search_paths=(str(tmp_path),))
    slot = packer.pool.get_or_load(p, "Albedo")
    rec = packer.pool.get_or_make_record((slot, 1, 2, 3))
    native = packer.native_pool_gpu(windowed=True)

    # screen grid minified 2x along v only: dv = 2 texels/pixel -> the
    # correct level is 1 (uniform 130/255); du = 0
    n = 16
    v = (np.arange(n, dtype=np.float32) * 2.0 + 0.5) / 128.0
    u = np.full(n, 0.5, np.float32)
    uv = jnp.asarray(np.stack(np.meshgrid(u, v, indexing="xy"), axis=-1))
    recs = jnp.full((n, n), rec, jnp.int32)
    lvl = sampling.mip_level_from_uv(uv, native.level_sizes[0])
    duv = sampling.uv_derivatives(uv)

    out = np.asarray(sampling.sample_pool_mip(
        native, recs, uv, lvl, filter="bilinear", duv=duv))[..., 0]
    # interior pixels (edge rows use one-sided derivatives): level >= 1
    # averages the stripes; level 0 would return ~30/255 or ~230/255
    inner = out[2:-2, 2:-2]
    assert np.all(np.abs(inner - 130.0 / 255.0) < 0.06), (
        inner.min(), inner.max())
