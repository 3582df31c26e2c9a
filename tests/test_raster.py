import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinyrenderer_tpu.ops import raster
from tinyrenderer_tpu.utils import math3d
from tinyrenderer_tpu.assets import mesh as meshlib


def _clip_from_ndc(ndc_verts):
    """Build clip positions with w=1 from NDC coords."""
    v = np.asarray(ndc_verts, np.float32)
    return jnp.asarray(np.concatenate([v, np.ones((v.shape[0], 1), np.float32)], axis=1))


def _full_raster(clip, tri, width, height, cull="back", use_pallas=True, cap=16):
    tri_vidx = jnp.asarray(np.asarray(tri, np.int32))
    mask = jnp.ones((tri_vidx.shape[0],), bool)
    return raster.rasterize(clip, tri_vidx, mask, width, height,
                            tile_h=8, tile_w=128, bin_capacity=cap,
                            cull=cull, use_pallas=use_pallas)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_single_triangle_coverage(use_pallas):
    # CCW triangle in NDC covering the lower-left half of the screen
    clip = _clip_from_ndc([[-1, -1, 0.5], [1, -1, 0.5], [-1, 1, 0.5]])
    tri = [[0, 1, 2]]
    tri_id, depth, setup, bins = _full_raster(clip, tri, 128, 64, use_pallas=use_pallas)
    tri_id = np.asarray(tri_id)
    depth = np.asarray(depth)
    assert int(bins.overflow) == 1
    # pixel inside triangle (near lower-left in screen coords = bottom of image)
    assert tri_id[60, 5] == 0
    assert np.isclose(depth[60, 5], 0.5, atol=1e-4)
    # pixel clearly outside (top-right)
    assert tri_id[2, 120] == -1
    assert depth[2, 120] == 0.0
    # roughly half the pixels covered
    frac = (tri_id >= 0).mean()
    assert 0.45 < frac < 0.55


@pytest.mark.parametrize("use_pallas", [False, True])
def test_depth_test_picks_nearer_triangle(use_pallas):
    # two full-screen-ish tris; reverse-Z: larger depth = closer
    clip = _clip_from_ndc([
        [-1, -1, 0.3], [1, -1, 0.3], [-1, 1, 0.3],   # far
        [-1, -1, 0.7], [1, -1, 0.7], [-1, 1, 0.7],   # near
    ])
    tri = [[0, 1, 2], [3, 4, 5]]
    tri_id, depth, *_ = _full_raster(clip, tri, 128, 64, use_pallas=use_pallas)
    assert np.asarray(tri_id)[60, 5] == 1
    assert np.isclose(np.asarray(depth)[60, 5], 0.7, atol=1e-4)


def test_backface_culling():
    # CW triangle (swapped verts) should be culled with cull='back',
    # kept with cull='front'
    clip = _clip_from_ndc([[-1, -1, 0.5], [-1, 1, 0.5], [1, -1, 0.5]])
    tri = [[0, 1, 2]]
    tri_id, *_ = _full_raster(clip, tri, 128, 64, cull="back", use_pallas=False)
    assert (np.asarray(tri_id) == -1).all()
    tri_id, *_ = _full_raster(clip, tri, 128, 64, cull="front", use_pallas=False)
    assert (np.asarray(tri_id) >= 0).any()


def test_pallas_matches_jnp_reference(rng):
    # random triangle soup, both paths must agree exactly
    V, T = 60, 40
    ndc = rng.uniform(-1.2, 1.2, size=(V, 3)).astype(np.float32)
    ndc[:, 2] = rng.uniform(0.05, 0.95, size=V)
    clip = _clip_from_ndc(ndc)
    tri = rng.integers(0, V, size=(T, 3)).astype(np.int32)
    a, da, *_ = _full_raster(clip, tri, 256, 64, cull="none", use_pallas=False, cap=64)
    b, db, *_ = _full_raster(clip, tri, 256, 64, cull="none", use_pallas=True, cap=64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # depth: MXU plane dot vs jnp broadcast chain round differently on
    # ill-conditioned random slivers (order-of-summation)
    np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-4)


def test_perspective_camera_cube_visibility():
    # a cube seen by a perspective camera: front face wins, depth sane
    m = meshlib.cube()
    view = math3d.look_at_rh([0.0, 0.0, 5.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    proj = math3d.reverse_z_matrix() @ math3d.perspective_rh(1.0, 2.0, 0.1, 100.0)
    vp = (proj @ view).astype(np.float32)
    wh = np.concatenate([m.positions, np.ones((m.num_vertices, 1), np.float32)], axis=1)
    clip = jnp.asarray(wh @ vp.T)
    tri = m.indices.reshape(-1, 3)
    tri_id, depth, setup, bins = _full_raster(clip, tri, 256, 128, use_pallas=False)
    tri_id = np.asarray(tri_id)
    center = tri_id[64, 128]
    assert center >= 0
    # winning triangle must belong to the +Z face (vertices all have z=+1)
    vids = tri[center]
    assert (m.positions[vids][:, 2] > 0.99).all()
    # background stays empty
    assert tri_id[0, 0] == -1
    # depth on the face: z_view=4 -> check via analytic ndc
    w = 4.0
    r = 100.0 / (0.1 - 100.0)
    expected_ndc = -(r * -4.0 + r * 0.1) / w + 1.0
    assert np.isclose(np.asarray(depth)[64, 128], expected_ndc, atol=1e-3)


def test_fused_resolve_kernel_matches_two_pass():
    """rasterize_resolve_binned (fused Pallas kernel, interpret mode on CPU)
    must match rasterize_binned + select_rows_onehot exactly."""
    import jax.numpy as jnp

    from tinyrenderer_tpu.ops import resolve

    rng = np.random.default_rng(11)
    V, T = 48, 24
    clip = jnp.asarray(np.concatenate(
        [rng.uniform(-1, 1, (V, 2)), rng.uniform(0.2, 0.9, (V, 1)),
         np.ones((V, 1))], axis=1).astype(np.float32))
    tri = jnp.asarray(rng.integers(0, V, (T, 3)).astype(np.int32))
    mask = jnp.ones((T,), bool)
    setup = raster.triangle_setup(clip, tri, mask, 256, 64, "none")
    bins = raster.bin_triangles(setup, 256, 64, 8, 128, 16)
    table = jnp.asarray(rng.random((T, 64)).astype(np.float32))
    table = jnp.where(setup.valid[:, None], table, 0.0)

    tid2, z2 = raster.rasterize_binned(bins, 8, 128, use_pallas=False)
    sel2 = resolve.select_rows_onehot(tid2, bins.ids, table, 8, 128)
    tid1, z1, sel1 = raster.rasterize_resolve_binned(bins, table, 8, 128)
    np.testing.assert_array_equal(np.asarray(tid1), np.asarray(tid2))
    # random slivers produce ill-conditioned planes; MXU dot vs mul-add
    # reassociation differs there, so compare with a relative tolerance
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sel1), np.asarray(sel2),
                               rtol=1e-3, atol=1e-4)


def _random_setup(rng, V, T, width, height):
    ndc = rng.uniform(-1.3, 1.3, size=(V, 3)).astype(np.float32)
    ndc[:, 2] = rng.uniform(0.05, 0.95, size=V)
    clip = _clip_from_ndc(ndc)
    tri = jnp.asarray(rng.integers(0, V, size=(T, 3)).astype(np.int32))
    mask = jnp.ones((T,), bool)
    return raster.triangle_setup(clip, tri, mask, width, height, "none")


@pytest.mark.slow
def test_scatter_binning_matches_dense(rng):
    """bin_triangles_scatter must bin exactly the same triangle sets per
    tile as the dense path (order may differ: bigs first), with identical
    counts and overflow, whenever nothing overflows."""
    V, T = 200, 900
    W, H, th, tw, K = 512, 128, 16, 128, 1024
    setup = _random_setup(rng, V, T, W, H)
    a = raster.bin_triangles_dense(setup, W, H, th, tw, K)
    b = raster.bin_triangles_scatter(setup, W, H, th, tw, K,
                                     big_capacity=1024)
    np.testing.assert_array_equal(np.asarray(a.counts), np.asarray(b.counts))
    assert int(a.overflow) == int(b.overflow)
    assert int(a.overflow) < K, "test scene must not overflow"
    # per-tile id sets equal (scatter orders bigs first, dense ascending)
    ia = np.sort(np.asarray(a.ids), axis=-1)
    ib = np.sort(np.asarray(b.ids), axis=-1)
    np.testing.assert_array_equal(ia, ib)


@pytest.mark.slow
def test_scatter_binning_raster_equivalence(rng):
    """End to end: rasterizing scatter-binned tiles gives the same
    visibility buffer as dense-binned tiles (the depth race is bin-order
    independent)."""
    V, T = 150, 600
    W, H, th, tw, K = 256, 64, 8, 128, 1024
    setup = _random_setup(rng, V, T, W, H)
    a = raster.bin_triangles_dense(setup, W, H, th, tw, K)
    b = raster.bin_triangles_scatter(setup, W, H, th, tw, K, big_capacity=T)
    ta, za = raster.rasterize_binned(a, th, tw, use_pallas=False)
    tb, zb = raster.rasterize_binned(b, th, tw, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
    np.testing.assert_allclose(np.asarray(za), np.asarray(zb), atol=1e-6)


def test_scatter_binning_big_overflow_monitor(rng):
    """More big (>2x2-tile) triangles than big_capacity must be reported
    through big_overflow so the engine can grow cfg.bin_big_capacity."""
    # all-big soup: huge NDC triangles spanning many tiles
    V, T = 30, 64
    ndc = rng.uniform(-1.0, 1.0, size=(V, 3)).astype(np.float32)
    ndc[:, :2] *= 3.0  # giant triangles
    ndc[:, 2] = rng.uniform(0.05, 0.95, size=V)
    clip = _clip_from_ndc(ndc)
    tri = jnp.asarray(rng.integers(0, V, size=(T, 3)).astype(np.int32))
    mask = jnp.ones((T,), bool)
    setup = raster.triangle_setup(clip, tri, mask, 512, 128, "none")
    bins = raster.bin_triangles_scatter(setup, 512, 128, 16, 128, 128,
                                        big_capacity=4)
    assert int(bins.big_overflow) > 4
    # with enough capacity the monitor reports the same count and no
    # triangle set changes vs dense
    ok = raster.bin_triangles_scatter(setup, 512, 128, 16, 128, 128,
                                      big_capacity=T)
    dense = raster.bin_triangles_dense(setup, 512, 128, 16, 128, 128)
    np.testing.assert_array_equal(
        np.sort(np.asarray(ok.ids), axis=-1),
        np.sort(np.asarray(dense.ids), axis=-1))


def test_select_eval_kernel_matches_tiled(rng):
    """resolve.select_eval_pallas (VMEM one-hot select + plane eval) must
    match resolve_attrs_tiled exactly — one-hot selection copies table rows
    bit-for-bit at any matmul precision, and the plane evaluation is the
    same elementwise math."""
    from tinyrenderer_tpu.ops import resolve

    V, T = 60, 40
    ndc = rng.uniform(-1.1, 1.1, size=(V, 3)).astype(np.float32)
    ndc[:, 2] = rng.uniform(0.05, 0.95, size=V)
    clip = _clip_from_ndc(ndc)
    tri = jnp.asarray(rng.integers(0, V, size=(T, 3)).astype(np.int32))
    mask = jnp.ones((T,), bool)
    setup = raster.triangle_setup(clip, tri, mask, 256, 64, "none")
    bins = raster.bin_triangles(setup, 256, 64, 8, 128, 64)
    tri_id, _ = raster.rasterize_binned(bins, 8, 128, use_pallas=False)

    table = np.zeros((T, resolve.ROW_D), np.float32)
    table[:, :] = rng.random((T, resolve.ROW_D))
    table = jnp.where(setup.valid[:, None], jnp.asarray(table), 0.0)

    a = resolve.resolve_attrs_tiled(tri_id, bins.ids, table, 8, 128)
    b = resolve.resolve_attrs_pallas(tri_id, bins.ids, table, 8, 128,
                                     counts=bins.counts)
    for f in a._fields:
        np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                   np.asarray(getattr(b, f)),
                                   rtol=1e-5, atol=1e-6, err_msg=f)


def test_select_eval_kernel_streams_large_bins(rng):
    """Grown bin capacities (K > 2048, e.g. 8192 for high-poly scenes)
    stream K through the kernel's innermost grid dimension with a scratch
    accumulator — whole-K VMEM blocks blew the 16 MB scoped-vmem limit on
    hardware. Padding bins to K=4096 (nk=2 slices) must not change the
    result vs the K-as-binned reference path."""
    from tinyrenderer_tpu.ops import resolve

    V, T = 60, 40
    ndc = rng.uniform(-1.1, 1.1, size=(V, 3)).astype(np.float32)
    ndc[:, 2] = rng.uniform(0.05, 0.95, size=V)
    clip = _clip_from_ndc(ndc)
    tri = jnp.asarray(rng.integers(0, V, size=(T, 3)).astype(np.int32))
    mask = jnp.ones((T,), bool)
    setup = raster.triangle_setup(clip, tri, mask, 256, 64, "none")
    bins = raster.bin_triangles(setup, 256, 64, 8, 128, 64)
    tri_id, _ = raster.rasterize_binned(bins, 8, 128, use_pallas=False)

    table = jnp.where(setup.valid[:, None],
                      jnp.asarray(rng.random((T, resolve.ROW_D)),
                                  jnp.float32), 0.0)
    K = 4096
    ids_big = jnp.pad(bins.ids, ((0, 0), (0, 0), (0, K - bins.ids.shape[2])),
                      constant_values=-1)
    a = resolve.resolve_attrs_pallas(tri_id, bins.ids, table, 8, 128,
                                     counts=bins.counts)
    b = resolve.resolve_attrs_pallas(tri_id, ids_big, table, 8, 128,
                                     counts=bins.counts)
    for f in a._fields:
        np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                   np.asarray(getattr(b, f)),
                                   rtol=1e-6, atol=1e-7, err_msg=f)


@pytest.mark.slow
def test_pallas_multiblock_bins_match(rng):
    """bin_capacity > 4096 exercises the kernel's bin-block revisit path
    (grid dim 2 + running depth race over output blocks) — must agree
    exactly with the jnp reference. Guards the VMEM-bounded design that
    lets shadow bins grow to tens of thousands of casters."""
    V, T = 120, 500
    ndc = rng.uniform(-1.2, 1.2, size=(V, 3)).astype(np.float32)
    ndc[:, 2] = rng.uniform(0.05, 0.95, size=V)
    clip = _clip_from_ndc(ndc)
    tri = rng.integers(0, V, size=(T, 3)).astype(np.int32)
    a, da, *_ = _full_raster(clip, tri, 256, 64, cull="none",
                             use_pallas=False, cap=8192)
    b, db, *_ = _full_raster(clip, tri, 256, 64, cull="none",
                             use_pallas=True, cap=8192)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # depth: the kernel's MXU plane dot and the jnp broadcast chain round
    # differently on ill-conditioned slivers (order-of-summation)
    np.testing.assert_allclose(np.asarray(da), np.asarray(db), atol=1e-4)


def _random_scene(rng, V=120, T=300):
    ndc = rng.uniform(-1.2, 1.2, size=(V, 3)).astype(np.float32)
    ndc[:, 2] = rng.uniform(0.05, 0.95, size=V)
    w = rng.uniform(0.5, 2.0, size=(V, 1)).astype(np.float32)
    clip = jnp.asarray(np.concatenate([ndc * w, w], axis=1).astype(np.float32))
    tri = jnp.asarray(rng.integers(0, V, size=(T, 3)).astype(np.int32))
    return clip, tri


@pytest.mark.parametrize("th,tw,kmax", [(8, 128, 256), (16, 128, 512),
                                        (64, 128, 128)])
def test_stream_raster_matches_dense(rng, th, tw, kmax):
    """CSR stream binning + raster must reproduce the dense path exactly
    whenever nothing overflows (same pair sets, same depth race)."""
    clip, tri = _random_scene(rng)
    mask = jnp.ones((tri.shape[0],), bool)
    setup = raster.triangle_setup(clip, tri, mask, 256, 128, "none")
    bins = raster.bin_triangles_dense(setup, 256, 128, th, tw, 1024)
    id_d, z_d = raster.rasterize_binned(bins, th, tw, use_pallas=True)

    sb = raster.bin_triangles_stream(setup, 256, 128, th, tw,
                                     stream_capacity=8192)
    assert int(sb.stream_overflow) <= 8192
    ty, tx = sb.counts.shape
    id_s, z_s = raster.rasterize_stream(sb, ty, tx, th, tw, kmax=kmax)
    if int(sb.overflow) <= kmax:
        np.testing.assert_array_equal(np.asarray(id_d), np.asarray(id_s))
        np.testing.assert_array_equal(np.asarray(z_d), np.asarray(z_s))

    # per-tile segment sets == dense bin sets
    ids_dense = np.asarray(bins.ids)
    starts = np.asarray(sb.starts)
    sid = np.asarray(sb.ids)
    for t in range(ty * tx):
        i, j = divmod(t, tx)
        seg = sorted(sid[starts[t]:starts[t + 1]].tolist())
        dn = sorted(x for x in ids_dense[i, j].tolist() if x >= 0)
        assert seg == dn, f"tile {t}"


def test_stream_select_eval_matches_dense(rng):
    """resolve_attrs_stream == resolve_attrs_pallas on the same bins;
    in particular padding grid steps must not re-accumulate the segment's
    last block (the select is a sum, not an idempotent max)."""
    from tinyrenderer_tpu.ops import resolve

    clip, tri = _random_scene(rng)
    mask = jnp.ones((tri.shape[0],), bool)
    setup = raster.triangle_setup(clip, tri, mask, 256, 128, "none")
    th, tw = 8, 128
    bins = raster.bin_triangles_dense(setup, 256, 128, th, tw, 1024)
    tri_id, _ = raster.rasterize_binned(bins, th, tw, use_pallas=True)
    sb = raster.bin_triangles_stream(setup, 256, 128, th, tw,
                                     stream_capacity=8192)
    ty, tx = sb.counts.shape
    table = jnp.where(setup.valid[:, None],
                      jnp.asarray(rng.random((tri.shape[0], resolve.ROW_D)),
                                  jnp.float32), 0.0)
    a = resolve.resolve_attrs_pallas(tri_id, bins.ids, table, th, tw,
                                     counts=bins.counts)
    # kmax=256 forces nb > 1 padding steps for most tiles (counts ~tens)
    b = resolve.resolve_attrs_stream(tri_id, sb, table, th, tw, kmax=256)
    for f in a._fields:
        np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                   np.asarray(getattr(b, f)),
                                   rtol=1e-6, atol=1e-7, err_msg=f)


def test_select_eval_bf16_split_outputs(rng):
    """cfg.bf16_attrs splits the select+eval output: world/uv/record/oid
    stay f32 (bit-identical to the f32 path — same accumulator, same
    plane math), normals/TBN/flat ride a bf16 output (within bf16
    rounding of the f32 path). Covers the dense and stream kernels."""
    from tinyrenderer_tpu.ops import resolve

    clip, tri = _random_scene(rng)
    mask = jnp.ones((tri.shape[0],), bool)
    setup = raster.triangle_setup(clip, tri, mask, 256, 128, "none")
    th, tw = 8, 128
    bins = raster.bin_triangles_dense(setup, 256, 128, th, tw, 1024)
    tri_id, _ = raster.rasterize_binned(bins, th, tw, use_pallas=True)
    sb = raster.bin_triangles_stream(setup, 256, 128, th, tw,
                                     stream_capacity=8192)
    table = jnp.where(setup.valid[:, None],
                      jnp.asarray(rng.random((tri.shape[0], resolve.ROW_D)),
                                  jnp.float32), 0.0)
    pairs = [
        (resolve.resolve_attrs_pallas(tri_id, bins.ids, table, th, tw,
                                      counts=bins.counts),
         resolve.resolve_attrs_pallas(tri_id, bins.ids, table, th, tw,
                                      counts=bins.counts, bf16=True)),
        (resolve.resolve_attrs_stream(tri_id, sb, table, th, tw, kmax=256),
         resolve.resolve_attrs_stream(tri_id, sb, table, th, tw, kmax=256,
                                      bf16=True)),
    ]
    for a, b in pairs:  # same kernel, same accumulation order
        for f in ("world", "uv", "record", "object_id", "valid"):
            np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                          np.asarray(getattr(b, f)),
                                          err_msg=f)
        for f in ("normal", "tangent", "bitangent", "flat"):
            np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                       np.asarray(getattr(b, f)),
                                       atol=2e-2, err_msg=f)


def test_stream_truncation_monitors(rng):
    """Overflowing the stream drops the highest-tile pairs and reports the
    wanted total through stream_overflow (engine growth semantics)."""
    clip, tri = _random_scene(rng)
    mask = jnp.ones((tri.shape[0],), bool)
    setup = raster.triangle_setup(clip, tri, mask, 256, 128, "none")
    sb_full = raster.bin_triangles_stream(setup, 256, 128, 8, 128,
                                          stream_capacity=8192)
    total = int(sb_full.stream_overflow)
    assert total > 2048
    sb = raster.bin_triangles_stream(setup, 256, 128, 8, 128,
                                     stream_capacity=2048)
    assert int(sb.stream_overflow) == total  # wanted, not clipped
    starts = np.asarray(sb.starts)
    assert starts[-1] <= 2048
    # the retained prefix matches the untruncated stream
    np.testing.assert_array_equal(np.asarray(sb.ids),
                                  np.asarray(sb_full.ids[:2048]))
