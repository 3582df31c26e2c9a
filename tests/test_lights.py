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


def test_shadow_multi_matches_per_light_lookups():
    """shadows.shadow_multi (one gather round for P cubes + D directionals)
    must reproduce point_shadow_multi + directional_shadow exactly — same
    taps, same compares, just one batched `take`."""
    import jax.numpy as jnp

    from tinyrenderer_tpu.ops import shadows as S

    rng = np.random.default_rng(11)
    Pn, D, size = 2, 2, 32
    pts = [(rng.uniform(-4, 4, 3).astype(F32), np.ones(3, F32))
           for _ in range(Pn)]
    dirs = [(rng.uniform(-1, -0.2, 3).astype(F32), np.ones(3, F32))
            for _ in range(D)]
    packed = L.pack_lights(pts, dirs)
    atlas = S.window_depth_maps(
        jnp.asarray(rng.uniform(0, 1, (6 * Pn + D, size, size)), jnp.float32))
    pos = jnp.asarray(rng.uniform(-30, 30, (8, 16, 3)), jnp.float32)
    vps = jnp.asarray(packed.shadow_viewprojs)

    multi = S.shadow_multi(pos, jnp.asarray(packed.point_position[:Pn]),
                           vps[:6 * Pn].reshape(Pn, 6, 4, 4),
                           jnp.asarray(packed.dir_viewproj[:D]), atlas,
                           bias=1e-4)
    pm = S.point_shadow_multi(pos, jnp.asarray(packed.point_position[:Pn]),
                              vps[:6 * Pn].reshape(Pn, 6, 4, 4),
                              atlas[:6 * Pn], bias=1e-4)
    np.testing.assert_array_equal(np.asarray(multi[:Pn]), np.asarray(pm))
    for i in range(D):
        dv = S.directional_shadow(pos, vps[6 * Pn + i], atlas[6 * Pn + i],
                                  bias=1e-4)
        np.testing.assert_array_equal(np.asarray(multi[Pn + i]),
                                      np.asarray(dv))


def test_vis_slot_matches_per_light_reference():
    """make_vis_slot (the batched gate-refinement callback: each compacted
    block evaluated under its OWN light) must agree exactly with the
    per-light point_shadow / directional_shadow lookups."""
    import jax.numpy as jnp

    from tinyrenderer_tpu.ops import shadows as S

    rng = np.random.default_rng(3)
    Pn, D, size, K = 2, 2, 32, 12
    pts = [(rng.uniform(-4, 4, 3).astype(F32), np.ones(3, F32))
           for _ in range(Pn)]
    dirs = [(rng.uniform(-1, -0.2, 3).astype(F32), np.ones(3, F32))
            for _ in range(D)]
    packed = L.pack_lights(pts, dirs)
    atlas = S.window_depth_maps(
        jnp.asarray(rng.uniform(0, 1, (6 * Pn + D, size, size)), jnp.float32))
    vps = jnp.asarray(packed.shadow_viewprojs)
    pos_c = jnp.asarray(rng.uniform(-30, 30, (K, 8, 16, 3)), jnp.float32)
    li_c = jnp.asarray(rng.integers(0, Pn + D, K), jnp.int32)

    vis_slot = S.make_vis_slot(jnp.asarray(packed.point_position[:Pn]),
                               vps[:6 * Pn].reshape(Pn, 6, 4, 4),
                               jnp.asarray(packed.dir_viewproj[:D]), atlas,
                               bias=1e-4)
    got = np.asarray(vis_slot(pos_c, li_c))
    for k in range(K):
        li = int(li_c[k])
        if li < Pn:
            want = S.point_shadow(pos_c[k],
                                  jnp.asarray(packed.point_position[li]),
                                  vps[6 * li:6 * li + 6],
                                  atlas[6 * li:6 * li + 6], bias=1e-4)
        else:
            want = S.directional_shadow(pos_c[k], vps[6 * Pn + li - Pn],
                                        atlas[6 * Pn + li - Pn], bias=1e-4)
        np.testing.assert_array_equal(got[k], np.asarray(want),
                                      err_msg=f"slot {k} light {li}")


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


def test_gate_refinement_exact_on_diagonal_edges():
    """gate_refined_visibility must equal the full-rate gate on a DIAGONAL
    shadow boundary. Regression: the 4-neighbor edge test missed coarse
    cells whose only disagreement is a diagonal neighbor (an edge clipping
    the cell's corner), leaving isolated wrongly-gated pixels."""
    import jax.numpy as jnp

    from tinyrenderer_tpu.ops import shadows as S

    H, W = 64, 64
    ys, xs = np.meshgrid(np.arange(H, dtype=F32), np.arange(W, dtype=F32),
                         indexing="ij")
    pos = jnp.asarray(np.stack([xs, ys, np.zeros_like(xs)], axis=-1))

    def vis_fn(p):
        # diagonal hard edge: lit where x + y < 46 (one light channel);
        # offset so the edge clips coarse-cell corners at scale 8
        return (p[..., 0] + p[..., 1] < 46.0).astype(F32)[..., None]

    def vis_slot(pos_c, li_c):
        return (pos_c[..., 0] + pos_c[..., 1] < 46.0).astype(F32)

    want = np.asarray(vis_fn(pos) > 0.0).astype(np.float32)
    for scale in (4, 8):
        got, needed = S.gate_refined_visibility(vis_fn, vis_slot, pos,
                                                scale, block_capacity=0)
        np.testing.assert_array_equal(
            np.asarray(got), want, err_msg=f"scale {scale}")
        assert int(needed) > 0


def test_gate_variants_match_thresholded_pcf():
    """shadow_multi_gate / make_vis_slot_gate (1-channel min-window
    compares, shadows.gate_min_maps) must equal the thresholded PCF
    lookups everywhere except exactly-zero bilinear weights (measure-zero
    under random uv — none in this seed)."""
    import jax.numpy as jnp

    from tinyrenderer_tpu.ops import shadows as S

    rng = np.random.default_rng(17)
    Pn, D, size = 2, 2, 32
    pts = [(rng.uniform(-4, 4, 3).astype(F32), np.ones(3, F32))
           for _ in range(Pn)]
    dirs = [(rng.uniform(-1, -0.2, 3).astype(F32), np.ones(3, F32))
            for _ in range(D)]
    packed = L.pack_lights(pts, dirs)
    atlas = S.window_depth_maps(
        jnp.asarray(rng.uniform(0, 1, (6 * Pn + D, size, size)), jnp.float32))
    min_map = S.gate_min_maps(atlas)
    assert min_map.shape == (6 * Pn + D, size, size)
    vps = jnp.asarray(packed.shadow_viewprojs)
    lp = jnp.asarray(packed.point_position[:Pn])
    pvp = vps[:6 * Pn].reshape(Pn, 6, 4, 4)
    dvp = jnp.asarray(packed.dir_viewproj[:D])

    pos = jnp.asarray(rng.uniform(-30, 30, (8, 16, 3)), jnp.float32)
    pcf = S.shadow_multi(pos, lp, pvp, dvp, atlas, bias=1e-4)
    gate = S.shadow_multi_gate(pos, lp, pvp, dvp, min_map, bias=1e-4)
    np.testing.assert_array_equal(np.asarray(gate),
                                  np.asarray(pcf) > 0.0)

    K = 12
    pos_c = jnp.asarray(rng.uniform(-30, 30, (K, 8, 16, 3)), jnp.float32)
    li_c = jnp.asarray(rng.integers(0, Pn + D, K), jnp.int32)
    slot_pcf = S.make_vis_slot(lp, pvp, dvp, atlas, bias=1e-4)
    slot_gate = S.make_vis_slot_gate(lp, pvp, dvp, min_map, bias=1e-4)
    np.testing.assert_array_equal(np.asarray(slot_gate(pos_c, li_c)),
                                  np.asarray(slot_pcf(pos_c, li_c)) > 0.0)
