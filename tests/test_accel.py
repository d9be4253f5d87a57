"""Acceleration-structure tests: exact agreement with brute force
(SURVEY.md §4 tier 2: "Pallas/BVH traversal vs brute-force ... exact same
hits"; LBVH validity invariants)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer.accel.build import build_accel, morton_codes, morton_order
from tpu_pathtracer.accel.lbvh import build_lbvh
from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.ops.intersect import intersect_brute
from tpu_pathtracer.scene.procedural import three_spheres_scene


@pytest.fixture(scope="module")
def scene():
    return three_spheres_scene(stacks=8, slices=16)


def random_rays(n, seed=0, spread=4.0):
    rs = np.random.RandomState(seed)
    o = jnp.asarray((rs.randn(n, 3) * spread).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    return o, d


def test_morton_codes_locality():
    pts = np.asarray([[0, 0, 0], [1e-3, 0, 0], [1, 1, 1]], np.float32)
    c = morton_codes(pts)
    assert c[0] <= c[1] <= c[2]


def test_morton_order_is_permutation(scene):
    perm = morton_order(np.asarray(scene.vertices))
    assert sorted(perm.tolist()) == list(range(scene.num_triangles))


@pytest.mark.parametrize("kind", ["cluster", "bvh"])
def test_accel_matches_brute(scene, kind):
    cfg = RenderConfig(intersector=kind)
    sc = build_accel(scene, kind=kind)
    o, d = random_rays(1024)
    hb = intersect_brute(sc.vertices, o, d, 0.01, 1e16)
    ha = sc.accel.intersect(sc.vertices, o, d, 0.01, 1e16, cfg)
    np.testing.assert_array_equal(np.asarray(ha.prim), np.asarray(hb.prim))
    np.testing.assert_allclose(np.asarray(ha.t), np.asarray(hb.t), rtol=1e-5)
    assert np.asarray(hb.hit).sum() > 100  # test is meaningful


@pytest.mark.parametrize("kind", ["cluster", "bvh"])
def test_accel_rays_from_inside(scene, kind):
    # Rays originating inside the scene AABB (secondary-bounce regime).
    cfg = RenderConfig(intersector=kind)
    sc = build_accel(scene, kind=kind)
    o, d = random_rays(512, seed=3, spread=1.0)
    hb = intersect_brute(sc.vertices, o, d, 0.01, 1e16)
    ha = sc.accel.intersect(sc.vertices, o, d, 0.01, 1e16, cfg)
    np.testing.assert_array_equal(np.asarray(ha.prim), np.asarray(hb.prim))


def test_lbvh_invariants(scene):
    sc = build_accel(scene, kind="bvh")
    bvh = sc.accel
    m = bvh.num_nodes
    skip = np.asarray(bvh.skip)
    count = np.asarray(bvh.tri_count)
    start = np.asarray(bvh.tri_start)
    amin = np.asarray(bvh.aabb_min)
    amax = np.asarray(bvh.aabb_max)
    t = scene.num_triangles

    # Skip links go strictly forward and stay in [0, M].
    assert np.all(skip > np.arange(m))
    assert np.all(skip <= m)
    # Every triangle is covered by exactly one leaf.
    leaves = count > 0
    covered = np.zeros(t, np.int32)
    for s, c in zip(start[leaves], count[leaves]):
        covered[s : s + c] += 1
    np.testing.assert_array_equal(covered, 1)
    # Child AABBs are contained in parents: check leaves vs root.
    verts = np.asarray(sc.vertices)
    np.testing.assert_array_less(amin[0] - 1e-5, verts.min(axis=(0, 1)) + 1e-5)
    # Each leaf AABB contains its triangles.
    for node in np.where(leaves)[0][:50]:
        s, c = start[node], count[node]
        tv = verts[s : s + c]
        assert np.all(tv.min(axis=(0, 1)) >= amin[node] - 1e-5)
        assert np.all(tv.max(axis=(0, 1)) <= amax[node] + 1e-5)


def test_lbvh_single_triangle():
    verts = np.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    bvh = build_lbvh(verts)
    o = jnp.asarray([[0.2, 0.2, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    h = bvh.intersect(jnp.asarray(verts), o, d, 0.01, 1e16, RenderConfig())
    assert bool(h.hit[0]) and float(h.t[0]) == pytest.approx(1.0)


def test_accel_render_matches_brute(scene):
    # Full pipeline: cluster-accelerated render == brute render bitwise.
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import camera_arrays, render_frame

    cfg_b = RenderConfig(
        width=32, height=24, samples_per_launch=1, max_depth=3,
        dof=False, env_mode="constant", intersector="brute",
    )
    cam = camera_arrays(Camera(), cfg_b)
    img_b = np.asarray(render_frame(scene, cam, cfg_b, jnp.int32(0)))
    sc = build_accel(scene, kind="cluster")
    cfg_c = cfg_b.replace(intersector="cluster")
    img_c = np.asarray(render_frame(sc, cam, cfg_c, jnp.int32(0)))
    np.testing.assert_array_equal(img_c, img_b)
