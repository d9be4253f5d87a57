"""Acceleration-structure tests: exact agreement with brute force
(SURVEY.md §4 tier 2: "Pallas/BVH traversal vs brute-force ... exact same
hits"; LBVH validity invariants)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer.accel.build import build_accel, morton_codes, morton_order
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


@pytest.mark.parametrize("kind", ["cluster"])
def test_accel_matches_brute(scene, kind):
    cfg = RenderConfig(intersector=kind)
    sc = build_accel(scene, kind=kind)
    o, d = random_rays(1024)
    hb = intersect_brute(sc.vertices, o, d, 0.01, 1e16)
    ha = sc.accel.intersect(sc.vertices, o, d, 0.01, 1e16, cfg)
    np.testing.assert_array_equal(np.asarray(ha.prim), np.asarray(hb.prim))
    np.testing.assert_allclose(np.asarray(ha.t), np.asarray(hb.t), rtol=1e-5)
    assert np.asarray(hb.hit).sum() > 100  # test is meaningful


@pytest.mark.parametrize("kind", ["cluster"])
def test_accel_rays_from_inside(scene, kind):
    # Rays originating inside the scene AABB (secondary-bounce regime).
    cfg = RenderConfig(intersector=kind)
    sc = build_accel(scene, kind=kind)
    o, d = random_rays(512, seed=3, spread=1.0)
    hb = intersect_brute(sc.vertices, o, d, 0.01, 1e16)
    ha = sc.accel.intersect(sc.vertices, o, d, 0.01, 1e16, cfg)
    np.testing.assert_array_equal(np.asarray(ha.prim), np.asarray(hb.prim))


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


def test_auto_dir_bits_pivot():
    # sort_dir_bits=0 (auto) resolves by cluster count: d2 for compact
    # scenes, d3 where the finer frustum wedges measured faster
    # (round-4 sweep C, artifacts/tpu_sweep_r04c.log).
    class _C:  # minimal stand-in: only num_clusters is consulted
        def __init__(self, n):
            self.num_clusters = n

    from tpu_pathtracer.accel.cluster import ClusterAccel

    cfg_auto = RenderConfig(sort_dir_bits=0)
    assert ClusterAccel._dir_bits(_C(64), cfg_auto) == 2
    assert ClusterAccel._dir_bits(_C(256), cfg_auto) == 3
    # explicit values pass through; -1 means off (0 bits)
    assert ClusterAccel._dir_bits(_C(64), RenderConfig(sort_dir_bits=4)) == 4
    assert ClusterAccel._dir_bits(_C(999), RenderConfig(sort_dir_bits=-1)) == 0


def test_auto_stream_lanes():
    from tpu_pathtracer.render.integrator import resolve_stream_lanes

    cfg = RenderConfig(stream_lanes=0)
    # 1080p -> 2073600/16 = 129600 -> nearest pow2 = 131072
    assert resolve_stream_lanes(cfg, 1920 * 1080) == 131072
    # 512x512 -> 262144/16 = 16384 exactly
    assert resolve_stream_lanes(cfg, 512 * 512) == 16384
    # tiny frames clamp to the floor; huge frames to the ceiling
    assert resolve_stream_lanes(cfg, 64 * 64) == 16384
    assert resolve_stream_lanes(cfg, 8192 * 8192) == 131072
    # explicit setting passes through untouched
    assert resolve_stream_lanes(RenderConfig(stream_lanes=777), 10**6) == 777
