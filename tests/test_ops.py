"""Per-kernel numerical tests: BRDF terms, tone mapping, environment maps.

The reference has no such tests (SURVEY.md §4); these check our kernels
against analytic values — the WGSL formulas evaluated by hand."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tinyrenderer_tpu.ops import env as envops
from tinyrenderer_tpu.ops import post, sampling, shading

F32 = np.float32


# -- Cook-Torrance terms (main.wgsl:124-200) ---------------------------------

def test_fresnel_schlick_limits():
    f0 = jnp.array(0.04)
    # normal incidence -> F0; grazing -> 1
    assert float(shading.fresnel_schlick(jnp.array(1.0), f0)) == pytest.approx(0.04)
    assert float(shading.fresnel_schlick(jnp.array(0.0), f0)) == pytest.approx(1.0)
    # cos=0.5 -> f0 + (1-f0)*0.5^5
    assert float(shading.fresnel_schlick(jnp.array(0.5), f0)) == pytest.approx(
        0.04 + 0.96 * 0.5 ** 5, rel=1e-6)


def test_ggx_ndf_analytic():
    # D(n==h) = a^4 / (pi * a^4^... ) with nh=1: denom = a4, D = 1/(pi*a4)...
    # D = r4 / (pi * (nh2*(r4-1)+1)^2); nh=1 -> r4/(pi*r4^2) = 1/(pi*r4)
    r = 0.5
    got = float(shading.distribution_ggx(jnp.array(1.0), jnp.array(r)))
    assert got == pytest.approx(1.0 / (math.pi * r ** 4), rel=1e-5)


def test_geometry_smith_range():
    g = float(shading.geometry_smith(jnp.array(1.0), jnp.array(1.0), jnp.array(0.0)))
    assert 0.0 < g <= 1.0 + 1e-6
    # rougher surfaces shadow more
    g_rough = float(shading.geometry_smith(jnp.array(0.5), jnp.array(0.5), jnp.array(1.0)))
    g_smooth = float(shading.geometry_smith(jnp.array(0.5), jnp.array(0.5), jnp.array(0.1)))
    assert g_rough < g_smooth


def test_light_contribution_lambertian_limit():
    """Fully rough, non-metal, head-on light: spec ~ small, diffuse ~
    kD * albedo/pi * NdotL * color."""
    shape = (1, 1)
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], F32), (*shape, 3))
    v = n
    l = n
    albedo = jnp.full((*shape, 3), 0.5, F32)
    color = jnp.ones(3, F32)[None, None]
    contrib = shading.light_contribution(
        l, color, 1.0, v, n, albedo, jnp.zeros((*shape, 1), F32),
        jnp.ones((*shape, 1), F32))
    got = np.asarray(contrib)[0, 0]
    # F at normal incidence = 0.04 -> kD = 0.96
    expected_diffuse = 0.96 * 0.5 / math.pi
    assert got[0] == pytest.approx(expected_diffuse, rel=0.2)  # + small spec


# -- tone mapping (tone_mapping.wgsl:30-41) -----------------------------------

def test_tone_map_modes():
    hdr = jnp.full((2, 2, 3), 1.0, F32)
    # type 0: identity + gamma -> clip(1)^(1/2.2) = 1 -> 255
    out0 = np.asarray(post.tone_map(hdr, jnp.array(0.0), jnp.array(1.0)))
    assert (out0 == 255).all()
    # type 1: exposure 1-exp(-c*k)
    out1 = np.asarray(post.tone_map(hdr, jnp.array(1.0), jnp.array(2.0)))
    expect = round(((1.0 - math.exp(-2.0)) ** (1 / 2.2)) * 255 + 0.5)
    assert abs(int(out1[0, 0, 0]) - expect) <= 1
    # type 2: Reinhard c/(c+1) = 0.5
    out2 = np.asarray(post.tone_map(hdr, jnp.array(2.0), jnp.array(1.0)))
    expect2 = round((0.5 ** (1 / 2.2)) * 255 + 0.5)
    assert abs(int(out2[0, 0, 0]) - expect2) <= 1
    # monotonic in exposure
    dim = np.asarray(post.tone_map(hdr * 0.1, jnp.array(1.0), jnp.array(1.0)))
    assert dim[0, 0, 0] < out1[0, 0, 0]


# -- cubemap sampling (main.wgsl cube lookups, skybox.wgsl) -------------------

def test_cubemap_face_selection():
    # constant-colored faces: sampling along each axis returns that face
    cube = np.zeros((6, 4, 4, 3), F32)
    for f in range(6):
        cube[f, :, :, 0] = f
    cube = jnp.asarray(cube)
    # wgpu face order: +X, -X, +Y, -Y, +Z, -Z
    axes = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    for f, d in enumerate(axes):
        c = sampling.sample_cubemap(cube, jnp.array([[d]], F32))
        assert int(np.asarray(c)[0, 0, 0]) == f, (f, d)


def test_face_texel_dirs_unit_and_cover():
    dirs = np.asarray(sampling.face_texel_dirs(8))
    norms = np.linalg.norm(dirs, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # all 6 principal directions are approximately covered
    flat = dirs.reshape(-1, 3)
    for axis in range(3):
        assert flat[:, axis].max() > 0.9
        assert flat[:, axis].min() < -0.9


# -- equirect mapping (equirectangular_to_cubemap.wgsl:48-56) -----------------

def test_equirect_sampling_poles_and_seam():
    H, W = 16, 32
    img = np.zeros((H, W, 3), F32)
    img[:, :, 0] = np.linspace(0, 1, H)[:, None]   # red ramp with latitude
    img = jnp.asarray(img)
    up = envops.sample_equirect(img, jnp.array([[[0.0, 1.0, 0.0]]], F32))
    down = envops.sample_equirect(img, jnp.array([[[0.0, -1.0, 0.0]]], F32))
    # reference flips v (y up -> top of image): up should be darker (row 0)
    assert float(np.asarray(up)[0, 0, 0]) < float(np.asarray(down)[0, 0, 0])


# -- irradiance bake (diffuse_irradiance_bake.wgsl:49-78) ---------------------

def test_irradiance_constant_env():
    """For a constant environment L, the bake computes
    pi * L * mean(cos*sin) ... with the reference's Riemann sum the analytic
    value is L * pi * (sum cos sin / N) = L * pi * avg. Verify against the
    discrete sum itself and sanity-bound by the analytic pi*L*(1/2)*(2pi/N_phi...)."""
    L = 0.75
    cube = jnp.full((6, 8, 8, 3), L, F32)
    irr = np.asarray(envops.bake_irradiance(cube, 4))
    dirs, w, total = envops.irradiance_sample_dirs()
    expected = math.pi * L * w.sum() / total
    np.testing.assert_allclose(irr, expected, rtol=1e-4)
    # and that discrete sum approximates the analytic pi*L/ (integral
    # normalization): integral of cos*sin over hemisphere/N steps ~ 1/2 avg
    assert 0.5 * L < irr.mean() < 1.5 * L


def test_irradiance_directional_env():
    """Environment lit only from +Y: texels with normal +Y receive the most
    irradiance, normal -Y the least."""
    cube = np.zeros((6, 8, 8, 3), F32)
    cube[2] = 1.0  # +Y face
    irr = np.asarray(envops.bake_irradiance(jnp.asarray(cube), 4))
    assert irr[2].mean() > irr[3].mean() * 3  # +Y face >> -Y face


# -- mip pyramid (mipmap_generator.wgsl) --------------------------------------

def test_texture_pool_mip_levels():
    from tinyrenderer_tpu.assets import textures as texlib
    base = np.zeros((64, 64, 4), F32)
    base[:32] = 1.0  # top half white
    chain = texlib.build_mip_chain(base, 4)       # [(s,s,4) per level]
    pool = sampling.pack_texture_pool([m[None] for m in chain])
    # level sizes halve
    sizes = list(np.asarray(pool.level_sizes))
    assert sizes[0] == 64 and sizes[1] == 32
    # sampling at a coarse level mixes the halves near the boundary
    uv = jnp.array([[[0.5, 0.5]]], F32)
    fine = sampling.sample_pool_bilinear_level(pool, jnp.array([[0]]), uv, 0)
    np.testing.assert_allclose(np.asarray(fine)[0, 0, :3], 0.5, atol=0.5)


def test_mip_level_from_uv_monotonic():
    # a uv grid spanning more texels -> higher mip level
    uv_fine = jnp.broadcast_to(jnp.linspace(0, 0.01, 8)[None, :, None], (8, 8, 2))
    uv_coarse = jnp.broadcast_to(jnp.linspace(0, 1.0, 8)[None, :, None], (8, 8, 2))
    l_fine = float(np.asarray(sampling.mip_level_from_uv(uv_fine, 256)).mean())
    l_coarse = float(np.asarray(sampling.mip_level_from_uv(uv_coarse, 256)).mean())
    assert l_coarse > l_fine


def test_texture_filter_modes_agree():
    """Dithered/trilinear/bilinear agree exactly when the mip level is
    integral, and dithered stays between the two adjacent level samples."""
    from tinyrenderer_tpu.assets import textures as texlib
    base = np.zeros((64, 64, 4), F32)
    base[::2] = 1.0
    chain = texlib.build_mip_chain(base, 4)
    pool = sampling.pack_texture_pool([m[None] for m in chain])
    uv = jnp.stack(jnp.meshgrid(jnp.linspace(0.1, 0.9, 16),
                                jnp.linspace(0.1, 0.9, 16), indexing="xy"),
                   axis=-1)
    tex = jnp.zeros((16, 16), jnp.int32)
    lvl_int = jnp.full((16, 16), 1.0)
    a = sampling.sample_pool_mip(pool, tex, uv, lvl_int, filter="trilinear")
    b = sampling.sample_pool_mip(pool, tex, uv, lvl_int, filter="dithered")
    c = sampling.sample_pool_mip(pool, tex, uv, lvl_int, filter="bilinear")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)
    # fractional level: dithered picks one of the two adjacent-level samples
    lvl = jnp.full((16, 16), 1.4)
    lo = sampling.sample_pool_mip(pool, tex, uv, jnp.full((16, 16), 1.0),
                                  filter="bilinear")
    hi = sampling.sample_pool_mip(pool, tex, uv, jnp.full((16, 16), 2.0),
                                  filter="bilinear")
    d = np.asarray(sampling.sample_pool_mip(pool, tex, uv, lvl, filter="dithered"))
    eq_lo = np.isclose(d, np.asarray(lo), atol=1e-6).all(axis=-1)
    eq_hi = np.isclose(d, np.asarray(hi), atol=1e-6).all(axis=-1)
    assert (eq_lo | eq_hi).all()
    assert eq_lo.any() and eq_hi.any()  # the dither actually mixes levels


def test_stochastic_filter_statistics():
    """The 1-gather stochastic-bilinear filter must be exact on constant
    images, pick only actual texel values, and average to the bilinear
    result over the Bayer neighborhood."""
    from tinyrenderer_tpu.assets import textures as texlib
    # constant image: any corner choice returns the constant
    const = np.full((16, 16, 4), 0.625, F32)
    chain = texlib.build_mip_chain(const, 2)
    pool = sampling.pack_texture_pool([m[None] for m in chain])
    rng = np.random.default_rng(3)
    uv = jnp.asarray(rng.random((8, 8, 2)).astype(F32))
    tex = jnp.zeros((8, 8), jnp.int32)
    s = sampling.sample_pool_mip(pool, tex, uv, jnp.zeros((8, 8)),
                                 filter="stochastic")
    np.testing.assert_allclose(np.asarray(s), 0.625, atol=1e-6)

    # random image: every stochastic sample is one of the 4 bilinear corners
    base = rng.random((16, 16, 4)).astype(F32)
    chain = texlib.build_mip_chain(base, 2)
    pool = sampling.pack_texture_pool([m[None] for m in chain])
    texels = set(np.round(base.reshape(-1, 4)[:, 0], 5).tolist())
    s = np.asarray(sampling.sample_pool_mip(pool, tex, uv, jnp.zeros((8, 8)),
                                            filter="stochastic"))
    for v in np.round(s[..., 0].reshape(-1), 5).tolist():
        assert v in texels

    # smooth ramp, identical uv everywhere: the Bayer neighborhood average
    # approaches the bilinear value (ordered dither averages the blend)
    ramp = np.broadcast_to(np.linspace(0, 1, 16, dtype=F32)[None, :, None],
                           (16, 16, 4)).copy()
    chain = texlib.build_mip_chain(ramp, 1)
    pool = sampling.pack_texture_pool([m[None] for m in chain])
    uv_c = jnp.broadcast_to(jnp.asarray([0.53, 0.47], F32), (8, 8, 2))
    bil = sampling.sample_pool_mip(pool, tex, uv_c, jnp.zeros((8, 8)),
                                   filter="bilinear")
    sto = sampling.sample_pool_mip(pool, tex, uv_c, jnp.zeros((8, 8)),
                                   filter="stochastic")
    np.testing.assert_allclose(np.asarray(sto).mean(axis=(0, 1)),
                               np.asarray(bil).mean(axis=(0, 1)), atol=0.02)


def test_windowed_pool_matches_linear():
    """Windowed (1-gather) bilinear must equal the 4-gather linear path."""
    from tinyrenderer_tpu.assets import textures as texlib
    rng = np.random.default_rng(7)
    base = rng.random((32, 32, 9)).astype(F32)
    chain = texlib.build_mip_chain(base, 3)
    lin = sampling.pack_texture_pool([m[None] for m in chain], windowed=False)
    win = sampling.pack_texture_pool([m[None] for m in chain], windowed=True)
    uv = jnp.asarray(rng.random((8, 8, 2)).astype(F32))
    tex = jnp.zeros((8, 8), jnp.int32)
    for lvl in (0.0, 0.7, 1.3):
        lf = jnp.full((8, 8), lvl)
        a = sampling.sample_pool_mip(lin, tex, uv, lf, filter="trilinear")
        b = sampling.sample_pool_mip(win, tex, uv, lf, filter="trilinear")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_morton_pool_matches_linear():
    """Z-curve texel layout must be sampling-transparent (same values as
    row-major) for every filter mode."""
    from tinyrenderer_tpu.assets import textures as texlib
    rng = np.random.default_rng(9)
    base = rng.random((32, 32, 9)).astype(F32)
    chain = texlib.build_mip_chain(base, 3)
    lin = sampling.pack_texture_pool([m[None] for m in chain], u8=True)
    mor = sampling.pack_texture_pool([m[None] for m in chain], u8=True,
                                     morton=True)
    uv = jnp.asarray(rng.random((8, 8, 2)).astype(F32))
    tex = jnp.zeros((8, 8), jnp.int32)
    for filt in ("trilinear", "dithered", "stochastic", "bilinear"):
        lf = jnp.asarray((rng.random((8, 8)) * 2).astype(F32))
        a = sampling.sample_pool_mip(lin, tex, uv, lf, filter=filt)
        b = sampling.sample_pool_mip(mor, tex, uv, lf, filter=filt)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_window_rows_layout():
    img = np.arange(16, dtype=F32).reshape(4, 4, 1)
    w = sampling.window_rows(img, wrap=True)
    assert w.shape == (4, 4, 4)
    # window at (y=1, x=2): self=6, +x=7, +y=10, diag=11
    np.testing.assert_array_equal(w[1, 2], [6, 7, 10, 11])
    # wrap at the right edge: +x of (0,3) is (0,0)
    np.testing.assert_array_equal(w[0, 3], [3, 0, 7, 4])
    wc = sampling.window_rows(img, wrap=False)
    # clamp at the right edge: +x of (0,3) is itself
    np.testing.assert_array_equal(wc[0, 3], [3, 3, 7, 7])


def test_shadow_window_pcf_matches_manual():
    from tinyrenderer_tpu.ops import shadows as sh
    rng = np.random.default_rng(9)
    atlas = jnp.asarray(rng.random((2, 8, 8)).astype(F32))
    win = sh.window_depth_maps(atlas)
    assert win.shape == (2, 8, 8, 4)
    # compare against a manual 4-tap PCF
    u = jnp.asarray(rng.random((4, 4)).astype(F32))
    v = jnp.asarray(rng.random((4, 4)).astype(F32))
    z = jnp.full((4, 4), 0.5, F32)
    got = sh._compare_pcf(win[0], u, v, z)
    S = 8
    fu, fv = u * S - 0.5, v * S - 0.5
    x0 = np.clip(np.floor(np.asarray(fu)).astype(int), 0, S - 1)
    y0 = np.clip(np.floor(np.asarray(fv)).astype(int), 0, S - 1)
    fx, fy = np.asarray(fu) - np.floor(np.asarray(fu)), np.asarray(fv) - np.floor(np.asarray(fv))
    a = np.asarray(atlas[0])
    x1, y1 = np.minimum(x0 + 1, S - 1), np.minimum(y0 + 1, S - 1)
    lit = lambda xi, yi: (0.5 > a[yi, xi]).astype(np.float32)
    want = ((lit(x0, y0) * (1 - fx) + lit(x1, y0) * fx) * (1 - fy)
            + (lit(x0, y1) * (1 - fx) + lit(x1, y1) * fx) * fy)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_cube_closed_form_matches_matrix_projection():
    """_cube_uvz_closed must reproduce projecting through the per-face
    viewproj matrices (point_light_face_viewprojs) — the closed form
    replaces the all-faces einsum + one-hot select in every point-light
    lookup path, so any drift here shifts shadow seams."""
    from tinyrenderer_tpu.ops import shadows as sh
    from tinyrenderer_tpu.scene import lights as lt

    rng = np.random.default_rng(11)
    light = rng.standard_normal(3).astype(F32) * 5.0
    pos = (light + rng.standard_normal((257, 3)).astype(F32) * 20.0)
    vps = jnp.asarray(lt.point_light_face_viewprojs(light))

    d = jnp.asarray(pos) - jnp.asarray(light)
    face_c, u_c, v_c, z_c, m_c = sh._cube_uvz_closed(d)

    # matrix path: project through every face, pick the owner
    face_m = np.asarray(sh._cube_face(d))
    u_m = np.zeros(len(pos), np.float32)
    v_m = np.zeros(len(pos), np.float32)
    z_m = np.zeros(len(pos), np.float32)
    w_m = np.zeros(len(pos), np.float32)
    for f in range(6):
        uf, vf, zf, wf = sh._project(jnp.asarray(pos), vps[f])
        pick = face_m == f
        u_m[pick] = np.asarray(uf)[pick]
        v_m[pick] = np.asarray(vf)[pick]
        z_m[pick] = np.asarray(zf)[pick]
        w_m[pick] = np.asarray(wf)[pick]

    np.testing.assert_array_equal(np.asarray(face_c), face_m)
    np.testing.assert_allclose(np.asarray(u_c), u_m, atol=2e-5)
    np.testing.assert_allclose(np.asarray(v_c), v_m, atol=2e-5)
    np.testing.assert_allclose(np.asarray(z_c), z_m, atol=2e-6)
    np.testing.assert_allclose(np.asarray(m_c), w_m, rtol=1e-6)


@pytest.mark.slow
def test_upsample_bilinear_int_matches_resize():
    """post.upsample_bilinear_int (phase-wise shifted adds) must equal
    jax.image.resize's bilinear for integer factors — it replaces the
    resize on the sky/texture-scale upsample paths purely for speed
    (the resize lowers as a dense (out, in) matmul pair)."""
    import jax

    rng = np.random.default_rng(3)
    for (h, w, sy, sx) in [(8, 16, 2, 2), (6, 10, 4, 4), (4, 8, 8, 8),
                           (17, 3, 2, 2), (5, 7, 2, 4)]:
        x = jnp.asarray(rng.standard_normal((h, w, 3)), jnp.float32)
        a = post.upsample_bilinear_int(x, sy, sx)
        b = jax.image.resize(x, (h * sy, w * sx, 3), method="bilinear")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=0)
    x2 = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(post.upsample_bilinear_int(x2, 2, 2)),
        np.asarray(jax.image.resize(x2, (16, 16), method="bilinear")),
        atol=1e-5, rtol=0)


def test_remip_pool_device_matches_host():
    """Device-side re-mip (the runtime mipmap_generator analog,
    src/mipmap_generator.rs:108) must reproduce the host-packed pool from
    level-0 texels alone — f32 pools exactly (same 2x2 means), u8 pools
    within 1 LSB (quantize -> requantize round trip)."""
    import jax

    from tinyrenderer_tpu.assets import textures as texlib
    rng = np.random.default_rng(11)
    base = np.stack([rng.random((16, 16, 9)).astype(F32) for _ in range(3)])
    chain = [base]
    for _ in range(2):
        chain.append(np.stack([texlib.box_filter_mip(t) for t in chain[-1]]))
    for windowed in (False, True):
        for u8 in (False, True):
            pool = sampling.pack_texture_pool(chain, windowed=windowed,
                                              u8=u8)
            redone = jax.jit(sampling.remip_pool_device)(pool)
            a = np.asarray(pool.texels)
            b = np.asarray(redone.texels)
            if u8:
                assert np.max(np.abs(a.astype(np.int32)
                                     - b.astype(np.int32))) <= 1
            else:
                np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
            assert redone.level_sizes == pool.level_sizes
            assert redone.level_offsets == pool.level_offsets


def test_remip_pool_device_propagates_edit():
    """Editing level-0 texels and re-mipping on device must update every
    mip level (the GPU-resident-texture re-mip use case)."""
    import jax
    import jax.numpy as jnp2

    from tinyrenderer_tpu.assets import textures as texlib
    base = np.zeros((1, 8, 8, 9), F32)
    chain = [base, np.zeros((1, 4, 4, 9), F32), np.zeros((1, 2, 2, 9), F32)]
    pool = sampling.pack_texture_pool(chain, windowed=False, u8=False)
    # paint level 0 solid 0.5 on device
    tpt = pool.texels_per_tex
    painted = pool.texels.at[0:64].set(jnp2.full((64, 9), 0.5))
    pool2 = sampling.TexturePoolGPU(painted, pool.level_offsets,
                                    pool.level_sizes, tpt,
                                    pool.windowed, pool.base_channels,
                                    pool.u8, pool.morton)
    redone = jax.jit(sampling.remip_pool_device)(pool2)
    t = np.asarray(redone.texels)
    assert np.allclose(t[64:64 + 16], 0.5)   # level 1
    assert np.allclose(t[80:80 + 4], 0.5)    # level 2


def _cr_ref(img: np.ndarray, s: int) -> np.ndarray:
    """Brute-force separable Catmull-Rom (a=-0.5) integer upsample,
    half-pixel centers, clamp-at-edge — the spec for post.upsample_bicubic."""
    def axis_up(a, axis):
        a = np.moveaxis(a, axis, 0)
        n = a.shape[0]
        out = np.empty((n * s,) + a.shape[1:], np.float32)
        for j in range(n * s):
            c = (j + 0.5) / s - 0.5
            m = int(np.floor(c))
            p = c - m
            w = (-0.5*p**3 + p**2 - 0.5*p, 1.5*p**3 - 2.5*p**2 + 1,
                 -1.5*p**3 + 2*p**2 + 0.5*p, 0.5*p**3 - 0.5*p**2)
            acc = 0.0
            for k, wk in zip(range(m - 1, m + 3), w):
                acc = acc + wk * a[min(max(k, 0), n - 1)]
            out[j] = acc
        return np.moveaxis(out, 0, axis)
    return axis_up(axis_up(img.astype(np.float32), 0), 1)


def test_upsample_bicubic_matches_reference():
    rng = np.random.default_rng(5)
    img = rng.random((6, 8, 3)).astype(F32)
    for s in (2, 4, 8):
        got = np.asarray(post.upsample_bicubic_int(jnp.asarray(img), s, s))
        ref = _cr_ref(img, s)
        np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6)
    # channel-first variant agrees
    cf = np.asarray(post.upsample_bicubic_int_cf(
        jnp.asarray(np.moveaxis(img, -1, 0)), 4, 4))
    np.testing.assert_allclose(np.moveaxis(cf, 0, -1), _cr_ref(img, 4),
                               rtol=2e-6, atol=2e-6)


def test_upsample_bicubic_beats_bilinear_on_smooth():
    """On a smooth signal (the sky's regime) Catmull-Rom must cut the
    coarse-grid reconstruction error by ~an order of magnitude."""
    s = 8
    H = W = 16
    ys, xs = np.mgrid[0:H * s, 0:W * s].astype(np.float64)
    truth = np.sin(ys / 37.0) * np.cos(xs / 53.0) + 0.1 * np.sin(xs / 29.0)
    # coarse sample i sits at fine coordinate i*s + (s-1)/2 under the
    # half-pixel-center convention — evaluate there analytically
    cy = (np.arange(H) * s + (s - 1) / 2.0)[:, None]
    cx = (np.arange(W) * s + (s - 1) / 2.0)[None, :]
    coarse = np.sin(cy / 37.0) * np.cos(cx / 53.0) + 0.1 * np.sin(cx / 29.0)
    ref = jnp.asarray(coarse[..., None].astype(np.float32))
    bi = np.asarray(post.upsample_bilinear_int(ref, s, s))[..., 0]
    cu = np.asarray(post.upsample_bicubic_int(ref, s, s))[..., 0]
    interior = (slice(2 * s, -2 * s), slice(2 * s, -2 * s))
    e_bi = np.abs(bi - truth)[interior].max()
    e_cu = np.abs(cu - truth)[interior].max()
    assert e_cu < e_bi / 5, (e_bi, e_cu)
