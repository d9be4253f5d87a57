"""Pallas packet-traversal kernel vs brute force (interpret mode on CPU —
SURVEY.md §4 tier 2 equivalence testing)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer.accel.build import build_accel
from tpu_pathtracer.ops.intersect import intersect_brute
from tpu_pathtracer.ops.intersect_pallas import (
    intersect_clusters_pallas,
    pack_cluster_tris,
)
from tpu_pathtracer.scene.procedural import three_spheres_scene


@pytest.fixture(scope="module")
def clustered():
    scene = build_accel(
        three_spheres_scene(stacks=6, slices=12), kind="cluster", cluster_size=64
    )
    return scene


def run_kernel(scene, o, d, r=128):
    acc = scene.accel
    bt, bp, buv = intersect_clusters_pallas(
        acc.tris16, acc.aabb8, acc.order, o, d, 0.01, 1e16,
        rays_per_tile=r, interpret=True,
    )
    prim = np.where(np.asarray(bp) == 0x7FFFFFFF, -1, np.asarray(bp))
    return np.asarray(bt), prim, np.asarray(buv)


def test_kernel_matches_brute(clustered):
    rs = np.random.RandomState(0)
    n = 256
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    bt, prim, buv = run_kernel(clustered, o, d)
    hb = intersect_brute(clustered.vertices, o, d, 0.01, 1e16)
    np.testing.assert_array_equal(prim, np.asarray(hb.prim))
    hit = prim >= 0
    np.testing.assert_allclose(bt[hit], np.asarray(hb.t)[hit], rtol=1e-5)
    # Kernel-carried winner barycentrics match the finalize recompute.
    np.testing.assert_allclose(
        buv[hit], np.asarray(hb.bary)[hit], rtol=1e-4, atol=1e-6
    )
    assert hit.sum() > 50


def test_kernel_ray_padding(clustered):
    # N not a multiple of rays_per_tile: padding lanes must not alias.
    rs = np.random.RandomState(1)
    n = 100
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    bt, prim, _ = run_kernel(clustered, o, d, r=64)
    hb = intersect_brute(clustered.vertices, o, d, 0.01, 1e16)
    np.testing.assert_array_equal(prim, np.asarray(hb.prim))


def test_pack_cluster_tris_layout():
    verts = np.asarray(
        [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32
    )
    packed = pack_cluster_tris(verts, cluster_size=4)
    assert packed.shape == (1, 4, 16)
    np.testing.assert_allclose(packed[0, 0, 0:3], [0, 0, 0])   # v0
    np.testing.assert_allclose(packed[0, 0, 3:6], [1, 0, 0])   # e1
    np.testing.assert_allclose(packed[0, 0, 6:9], [0, 1, 0])   # e2
    # padding triangles are all-zero (degenerate, det == 0)
    np.testing.assert_allclose(packed[0, 1:, :], 0.0)


def test_pack_cluster_tris_bw_layout():
    from tpu_pathtracer.ops.intersect_pallas import pack_cluster_tris_bw

    verts = np.asarray(
        [[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32
    )
    packed = pack_cluster_tris_bw(verts, cluster_size=4)
    assert packed.shape == (1, 4, 16)
    # Unit right triangle in z=0 plane: n = e1 x e2 = +z, d0 = 0,
    # p1 = e2 x n / |n|^2 = (1,0,0), p2 = n x e1 = (0,1,0), c1 = c2 = 0.
    np.testing.assert_allclose(packed[0, 0, 0:3], [0, 0, 1])   # n
    np.testing.assert_allclose(packed[0, 0, 3], 0.0)           # d0
    np.testing.assert_allclose(packed[0, 0, 4:7], [1, 0, 0])   # p1
    np.testing.assert_allclose(packed[0, 0, 7], 0.0)           # c1
    np.testing.assert_allclose(packed[0, 0, 8:11], [0, 1, 0])  # p2
    np.testing.assert_allclose(packed[0, 0, 11], 0.0)          # c2
    # padding triangles are all-zero (n = 0 -> den == 0 culls)
    np.testing.assert_allclose(packed[0, 1:, :], 0.0)
    # degenerate (zero-area) real triangle also packs to a culled row
    degen = np.asarray([[[1, 2, 3], [1, 2, 3], [1, 2, 3]]], np.float32)
    np.testing.assert_allclose(pack_cluster_tris_bw(degen, 4)[0, 0, :], 0.0)


def test_bw_tri_test_matches_mt(clustered):
    """tri_test="bw" (Baldwin–Weber rows) agrees with the MT kernel:
    identical hit decisions and prims on the probe ray set, t/uv to
    formulation-reassociation tolerance (tools/probe_tri_test.py measured
    max rel t err ~1e-4)."""
    rs = np.random.RandomState(2)
    n = 256
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    acc = clustered.accel
    assert acc.tris16bw is not None
    bt_m, bp_m, buv_m = intersect_clusters_pallas(
        acc.tris16, acc.aabb8, acc.order, o, d, 0.01, 1e16,
        rays_per_tile=128, interpret=True,
    )
    bt_b, bp_b, buv_b = intersect_clusters_pallas(
        acc.tris16bw, acc.aabb8, acc.order, o, d, 0.01, 1e16,
        rays_per_tile=128, interpret=True, tri_test="bw",
    )
    np.testing.assert_array_equal(np.asarray(bp_b), np.asarray(bp_m))
    hit = np.asarray(bp_m) != 0x7FFFFFFF
    assert hit.sum() > 50
    np.testing.assert_allclose(
        np.asarray(bt_b)[hit], np.asarray(bt_m)[hit], rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(buv_b)[hit], np.asarray(buv_m)[hit], rtol=5e-3, atol=5e-5
    )


def test_bw_occlusion_matches_mt(clustered):
    """Any-hit kernels under tri_test="bw" return the same occlusion bits
    as MT (decision-only query — no tolerance needed beyond the shared
    probe set's non-grazing rays)."""
    from tpu_pathtracer.ops.intersect_pallas import occluded_clusters_pallas

    rs = np.random.RandomState(3)
    n = 256
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    acc = clustered.accel
    occ_m = occluded_clusters_pallas(
        acc.tris16, acc.aabb8, acc.order, o, d, 0.01, 1e16,
        rays_per_tile=64, interpret=True,
    )
    occ_b = occluded_clusters_pallas(
        acc.tris16bw, acc.aabb8, acc.order, o, d, 0.01, 1e16,
        rays_per_tile=64, interpret=True, tri_test="bw",
    )
    np.testing.assert_array_equal(np.asarray(occ_b), np.asarray(occ_m))
    assert np.asarray(occ_m).sum() > 20


def test_tri_test_auto_resolves_bw(clustered):
    """auto = bw (sweep r05h adoption); explicit modes and the pre-bw
    cache fallback resolve as documented."""
    from tpu_pathtracer.config import RenderConfig

    acc = clustered.accel
    assert acc._tri(RenderConfig())[0] == "bw"
    assert acc._tri(RenderConfig(tri_test="mt"))[0] == "mt"
    assert acc._tri(RenderConfig(tri_test="bw"))[0] == "bw"
    old = acc.replace(tris16bw=None)
    assert old._tri(RenderConfig())[0] == "mt"
    assert old._tri(RenderConfig(tri_test="bw"))[0] == "mt"


def test_bw_render_matches_mt_end_to_end(clustered):
    """Full interpret-mode render with cfg.tri_test="bw" vs "mt" — the
    whole integrator (closest-hit + shading + film) stays visually
    identical; only discrete-decision flips from the t reassociation may
    differ on isolated lanes."""
    import os

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import camera_arrays, render_frame

    cfg = dict(
        width=24, height=16, samples_per_launch=2, max_depth=3,
        dof=False, env_mode="constant", intersector="cluster",
    )
    cam = camera_arrays(Camera(), RenderConfig(**cfg))
    os.environ["TPU_PT_PALLAS_INTERPRET"] = "1"
    try:
        img_m = np.asarray(render_frame(
            clustered, cam, RenderConfig(**cfg, tri_test="mt"), jnp.int32(0)
        ))
        img_b = np.asarray(render_frame(
            clustered, cam, RenderConfig(**cfg, tri_test="bw"), jnp.int32(0)
        ))
    finally:
        del os.environ["TPU_PT_PALLAS_INTERPRET"]
    close = np.isclose(img_b, img_m, rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.995, f"bw vs mt pixel agreement {close.mean()}"


def test_occlusion_kernel_matches_brute(clustered):
    from tpu_pathtracer.ops.intersect import occluded_brute
    from tpu_pathtracer.ops.intersect_pallas import occluded_clusters_pallas

    rs = np.random.RandomState(2)
    n = 300
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    acc = clustered.accel
    occ_k = np.asarray(occluded_clusters_pallas(
        acc.tris16, acc.aabb8, acc.order, o, d, 0.01, 1e16,
        rays_per_tile=64, interpret=True,
    ))
    occ_b = np.asarray(occluded_brute(clustered.vertices, o, d, 0.01, 1e16))
    np.testing.assert_array_equal(occ_k, occ_b)
    assert occ_b.any() and not occ_b.all()


def test_occlusion_active_mask_parks_inactive(clustered):
    """ClusterAccel.occluded(active=mask): active lanes always return
    exactly the unmasked result (the mask is advisory; here on the CPU
    XLA path it is a no-op), and the parking transform the TPU sorted
    path applies (origin outside the scene AABB, direction +x — see
    ClusterAccel.occluded) must make every parked ray miss everything
    in the interpret-mode kernel."""
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.ops.intersect_pallas import occluded_clusters_pallas

    rs = np.random.RandomState(7)
    n = 300
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    mask = jnp.asarray(rs.rand(n) < 0.4)
    acc = clustered.accel
    cfg = RenderConfig(width=8, height=8, intersector="cluster")
    full = np.asarray(
        acc.occluded(clustered.vertices, o, d, 0.01, 1e16, cfg)
    )
    masked = np.asarray(
        acc.occluded(
            clustered.vertices, o, d, 0.01, 1e16, cfg, active=mask
        )
    )
    m = np.asarray(mask)
    np.testing.assert_array_equal(masked[m], full[m])

    # The parking transform itself, through the any-hit kernel.
    park = acc.scene_hi + (acc.scene_hi - acc.scene_lo) + 1.0
    o_park = jnp.broadcast_to(park[None, :], (n, 3))
    d_park = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (n, 3))
    occ_park = np.asarray(occluded_clusters_pallas(
        acc.tris16, acc.aabb8, acc.order, o_park, d_park, 0.01, 1e16,
        rays_per_tile=64, interpret=True,
    ))
    assert not occ_park.any()


def test_occlusion_xla_matches_brute(clustered):
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.ops.intersect import occluded_brute

    rs = np.random.RandomState(3)
    n = 300
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    occ_x = np.asarray(clustered.accel._occluded_xla(
        clustered.vertices, o, d, 0.01, 1e16
    ))
    occ_b = np.asarray(occluded_brute(clustered.vertices, o, d, 0.01, 1e16))
    np.testing.assert_array_equal(occ_x, occ_b)


def test_occlusion_segment_tmax(clustered):
    # A finite t_max must pass segments that END before the geometry.
    from tpu_pathtracer.ops.intersect import occluded_brute
    from tpu_pathtracer.ops.intersect_pallas import occluded_clusters_pallas

    o = jnp.asarray([[0.0, 0.5, 8.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    acc = clustered.accel
    far = occluded_clusters_pallas(acc.tris16, acc.aabb8, acc.order, o, d,
                                   0.01, 1e16, rays_per_tile=64, interpret=True)
    near = occluded_clusters_pallas(acc.tris16, acc.aabb8, acc.order, o, d,
                                    0.01, 1.0, rays_per_tile=64, interpret=True)
    assert bool(far[0]) == bool(occluded_brute(clustered.vertices, o, d, 0.01, 1e16)[0])
    assert not bool(near[0])


def test_streamed_kernel_matches_brute(clustered):
    # Block-major two-level streamed closest hit (scene streamed once per
    # call, per-tile scratch accumulator rows): must agree with brute
    # exactly, incl. partial blocks, padding clusters, and boundary
    # supergroups that mix real and padding children.
    from tpu_pathtracer.ops.intersect_pallas import (
        intersect_clusters_pallas_streamed,
    )

    rs = np.random.RandomState(6)
    n = 200
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    acc = clustered.accel
    bt, bp, buv = intersect_clusters_pallas_streamed(
        acc.tris16, acc.aabb8, o, d, 0.01, 1e16,
        rays_per_tile=128, block_clusters=4, branch=2, interpret=True,
    )
    prim = np.where(np.asarray(bp) == 0x7FFFFFFF, -1, np.asarray(bp))
    hb = intersect_brute(clustered.vertices, o, d, 0.01, 1e16)
    np.testing.assert_array_equal(prim, np.asarray(hb.prim))
    hit = prim >= 0
    np.testing.assert_allclose(
        np.asarray(bt)[hit], np.asarray(hb.t)[hit], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(buv)[hit], np.asarray(hb.bary)[hit], rtol=1e-4, atol=1e-6
    )
    assert hit.sum() > 40


def test_vmem_headroom_is_output_neutral(clustered):
    # cfg.vmem_headroom only scales the scoped-VMEM compile budget (the
    # cli/bench OOM-retry path, config.vmem_headroom): results must be
    # bitwise identical at any headroom.
    from tpu_pathtracer.ops.intersect_pallas import (
        intersect_clusters_pallas_streamed,
    )

    rs = np.random.RandomState(9)
    n = 100
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    acc = clustered.accel
    a = intersect_clusters_pallas_streamed(
        acc.tris16, acc.aabb8, o, d, 0.01, 1e16,
        rays_per_tile=128, block_clusters=4, branch=2, interpret=True,
    )
    b = intersect_clusters_pallas_streamed(
        acc.tris16, acc.aabb8, o, d, 0.01, 1e16,
        rays_per_tile=128, block_clusters=4, branch=2, interpret=True,
        vmem_headroom=2.0,
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_streamed_occlusion_matches_brute(clustered):
    # Streamed two-level any-hit (big-scene NEE shadow rays) vs brute.
    from tpu_pathtracer.ops.intersect import occluded_brute
    from tpu_pathtracer.ops.intersect_pallas import (
        occluded_clusters_pallas_streamed,
    )

    rs = np.random.RandomState(5)
    n = 300
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    acc = clustered.accel
    occ_k = np.asarray(occluded_clusters_pallas_streamed(
        acc.tris16, acc.aabb8, o, d, 0.01, 1e16,
        rays_per_tile=64, block_clusters=4, branch=2, interpret=True,
    ))
    occ_b = np.asarray(occluded_brute(clustered.vertices, o, d, 0.01, 1e16))
    np.testing.assert_array_equal(occ_k, occ_b)
    assert occ_b.any() and not occ_b.all()

    # Finite t_max: segments ending before geometry must pass.
    o1 = jnp.asarray([[0.0, 0.5, 8.0]], jnp.float32)
    d1 = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
    near = occluded_clusters_pallas_streamed(
        acc.tris16, acc.aabb8, o1, d1, 0.01, 1.0,
        rays_per_tile=64, block_clusters=4, branch=2, interpret=True,
    )
    assert not bool(near[0])


def test_octant_sort_roundtrip_and_kernel_equivalence(clustered):
    """octant_sort + interpret-mode kernel + restore == unsorted kernel ==
    brute: the permutation must be a bijection and per-ray results must
    land back on their source lanes."""
    from tpu_pathtracer.ops.intersect_pallas import octant_sort

    rs = np.random.RandomState(2)
    n = 256
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))

    o_s, d_s, restore = octant_sort(o, d)
    # sorted keys are non-decreasing and the permutation restores inputs
    key = lambda dd: (
        (np.asarray(dd)[:, 0] > 0).astype(int)
        + 2 * (np.asarray(dd)[:, 1] > 0).astype(int)
        + 4 * (np.asarray(dd)[:, 2] > 0).astype(int)
    )
    assert (np.diff(key(d_s)) >= 0).all()
    np.testing.assert_array_equal(np.asarray(restore(o_s)), np.asarray(o))
    np.testing.assert_array_equal(np.asarray(restore(d_s)), np.asarray(d))

    bt_s, prim_s, buv_s = run_kernel(clustered, o_s, d_s)
    bt = np.asarray(restore(jnp.asarray(bt_s)))
    prim = np.asarray(restore(jnp.asarray(prim_s)))
    buv = np.asarray(restore(jnp.asarray(buv_s)))
    hb = intersect_brute(clustered.vertices, o, d, 0.01, 1e16)
    np.testing.assert_array_equal(prim, np.asarray(hb.prim))
    hit = prim >= 0
    np.testing.assert_allclose(bt[hit], np.asarray(hb.t)[hit], rtol=1e-5)
    np.testing.assert_allclose(
        buv[hit], np.asarray(hb.bary)[hit], rtol=1e-4, atol=1e-6
    )


def test_spatial_sort_roundtrip(clustered):
    """(origin Morton, octant) key: still a bijection that restores
    per-ray results; keys are spatial-major non-decreasing."""
    from tpu_pathtracer.ops.intersect_pallas import octant_sort

    rs = np.random.RandomState(5)
    n = 200
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    acc = clustered.accel
    o_s, d_s, restore = octant_sort(
        o, d, scene_lo=acc.scene_lo, scene_hi=acc.scene_hi, spatial_bits=5
    )
    np.testing.assert_array_equal(np.asarray(restore(o_s)), np.asarray(o))
    np.testing.assert_array_equal(np.asarray(restore(d_s)), np.asarray(d))
    bt_s, prim_s, _ = run_kernel(clustered, o_s, d_s)
    prim = np.asarray(restore(jnp.asarray(prim_s)))
    hb = intersect_brute(clustered.vertices, o, d, 0.01, 1e16)
    np.testing.assert_array_equal(prim, np.asarray(hb.prim))


def test_dir_bits_sort_roundtrip(clustered):
    """dir_bits-refined key: still a bijection; refined keys stay
    octant-major (the magnitude bits sit BELOW the octant bits); kernel
    results restore to brute exactly; u32 overflow clamp engages."""
    from tpu_pathtracer.ops.intersect_pallas import octant_sort, ray_sort_key

    rs = np.random.RandomState(7)
    n = 200
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    acc = clustered.accel
    o_s, d_s, restore = octant_sort(
        o, d, scene_lo=acc.scene_lo, scene_hi=acc.scene_hi,
        spatial_bits=5, dir_bits=2,
    )
    np.testing.assert_array_equal(np.asarray(restore(o_s)), np.asarray(o))
    np.testing.assert_array_equal(np.asarray(restore(d_s)), np.asarray(d))
    bt_s, prim_s, _ = run_kernel(clustered, o_s, d_s)
    prim = np.asarray(restore(jnp.asarray(prim_s)))
    hb = intersect_brute(clustered.vertices, o, d, 0.01, 1e16)
    np.testing.assert_array_equal(prim, np.asarray(hb.prim))

    # Refinement only reorders WITHIN (cell, octant) groups: stripping
    # the low dir bits recovers the unrefined key order.
    k_fine = np.asarray(ray_sort_key(o, d, acc.scene_lo, acc.scene_hi, 5, 2))
    k_base = np.asarray(ray_sort_key(o, d, acc.scene_lo, acc.scene_hi, 5))
    np.testing.assert_array_equal(k_fine >> 6, k_base)
    # 3*7 spatial + 3 octant leaves 2 dir bits of u32 headroom; 4 must
    # clamp to 2, not overflow.
    k7 = np.asarray(ray_sort_key(o, d, acc.scene_lo, acc.scene_hi, 7, 4))
    np.testing.assert_array_equal(
        k7, np.asarray(ray_sort_key(o, d, acc.scene_lo, acc.scene_hi, 7, 2))
    )


def test_hier_kernel_matches_brute():
    """Two-level (supercluster) kernel vs brute on a many-cluster scene:
    cluster_size=8 over the three-spheres scene yields ~200 clusters /
    ~25 supers, exercising partial groups and inverted pads."""
    from tpu_pathtracer.ops.intersect_pallas import (
        intersect_clusters_pallas_hier,
    )

    scene = build_accel(
        three_spheres_scene(stacks=10, slices=20), kind="cluster",
        cluster_size=8,
    )
    acc = scene.accel
    assert acc.num_clusters >= 100
    rs = np.random.RandomState(4)
    n = 256
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    bt, bp, buv = intersect_clusters_pallas_hier(
        acc.tris16, acc.aabb8_child, acc.aabb8_super, acc.order_super,
        o, d, 0.01, 1e16, rays_per_tile=128, branch=acc.super_branch,
        interpret=True,
    )
    prim = np.where(np.asarray(bp) == 0x7FFFFFFF, -1, np.asarray(bp))
    hb = intersect_brute(scene.vertices, o, d, 0.01, 1e16)
    np.testing.assert_array_equal(prim, np.asarray(hb.prim))
    hit = prim >= 0
    np.testing.assert_allclose(
        np.asarray(bt)[hit], np.asarray(hb.t)[hit], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(buv)[hit], np.asarray(hb.bary)[hit], rtol=1e-4, atol=1e-6
    )
    assert hit.sum() > 50


def test_hier_occlusion_matches_brute():
    from tpu_pathtracer.ops.intersect import occluded_brute
    from tpu_pathtracer.ops.intersect_pallas import (
        occluded_clusters_pallas_hier,
    )

    scene = build_accel(
        three_spheres_scene(stacks=10, slices=20), kind="cluster",
        cluster_size=8,
    )
    acc = scene.accel
    rs = np.random.RandomState(6)
    n = 200
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))
    occ = occluded_clusters_pallas_hier(
        acc.tris16, acc.aabb8_child, acc.aabb8_super, acc.order_super,
        o, d, 0.01, 1e16, rays_per_tile=128, branch=acc.super_branch,
        interpret=True,
    )
    want = occluded_brute(scene.vertices, o, d, 0.01, 1e16)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(want))
    assert np.asarray(want).sum() > 20


def test_entry_rank_matches_scalar_reference(clustered):
    """entry_rank == first front-to-back position whose cluster AABB the
    ray's [t_min, t_max] segment slab-overlaps (scalar numpy replay)."""
    from tpu_pathtracer.ops.intersect_pallas import entry_rank

    acc = clustered.accel
    aabb8 = np.asarray(acc.aabb8)
    order = np.asarray(acc.order)
    c = acc.num_clusters
    rs = np.random.RandomState(11)
    n = 300
    o = (rs.randn(n, 3) * 3).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)

    # block < C exercises the padded-block path.
    rank = np.asarray(entry_rank(
        jnp.asarray(o), jnp.asarray(d), acc.aabb8,
        jnp.argsort(acc.order, axis=1), t_min=0.01, t_max=1e16,
        block=max(8, c // 2),
    ))

    def slab(o1, d1, lo, hi):
        inv = np.where(np.abs(d1) > 1e-12, 1.0 / d1, 3.4e38)
        t0 = (lo - o1) * inv
        t1 = (hi - o1) * inv
        tn = np.minimum(t0, t1).max()
        tf = np.maximum(t0, t1).min()
        return (tn <= tf) and (tf >= 0.01) and (tn <= 1e16)

    for i in range(n):
        oct_ = int((d[i, 0] > 0) + 2 * (d[i, 1] > 0) + 4 * (d[i, 2] > 0))
        want = c
        for pos in range(c):
            cid = order[oct_, pos]
            if slab(o[i], d[i], aabb8[cid, 0:3], aabb8[cid, 3:6]):
                want = pos
                break
        assert rank[i] == want, (i, rank[i], want)


def test_entry_sort_roundtrip_and_kernel_equivalence(clustered):
    """The entry-cluster bucketing sort (cfg.sort_rays='entry') is a
    bijection whose restore lands per-ray results back on source lanes;
    kernel results through it match brute exactly; keys are octant-major
    with the entry rank below."""
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.ops.intersect_pallas import (
        entry_rank, entry_sort_key,
    )

    acc = clustered.accel
    cfg = RenderConfig(width=8, height=8, sort_rays="entry")
    rs = np.random.RandomState(13)
    n = 200
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))

    o_s, d_s, restore = acc._sorted_rays("entry", o, d, cfg)
    np.testing.assert_array_equal(np.asarray(restore(o_s)), np.asarray(o))
    np.testing.assert_array_equal(np.asarray(restore(d_s)), np.asarray(d))

    bt_s, prim_s, _ = run_kernel(clustered, o_s, d_s)
    prim = np.asarray(restore(jnp.asarray(prim_s)))
    hb = intersect_brute(clustered.vertices, o, d, 0.01, 1e16)
    np.testing.assert_array_equal(prim, np.asarray(hb.prim))

    # Sorted keys are non-decreasing and octant-major: stripping rank +
    # dir bits recovers a non-decreasing octant sequence.
    posinv = jnp.argsort(acc.order, axis=1)
    rank = entry_rank(d_s * 0 + o_s * 0 + o_s, d_s, acc.aabb8, posinv)
    octant = (
        (np.asarray(d_s)[:, 0] > 0).astype(np.int32)
        + 2 * (np.asarray(d_s)[:, 1] > 0).astype(np.int32)
        + 4 * (np.asarray(d_s)[:, 2] > 0).astype(np.int32)
    )
    key = np.asarray(entry_sort_key(
        jnp.asarray(octant), rank, acc.num_clusters,
        directions=d_s, dir_bits=acc._dir_bits(cfg),
    ))
    assert (np.diff(key.astype(np.int64)) >= 0).all()
    assert (np.diff(octant) >= 0).all()


def test_entry_nearest_id_matches_scalar_reference(clustered):
    """entry_nearest_id == the overlapped cluster with the smallest
    max(tnear, t_min) (ties -> lower Morton id; C where none)."""
    from tpu_pathtracer.ops.intersect_pallas import entry_nearest_id

    acc = clustered.accel
    aabb8 = np.asarray(acc.aabb8)
    c = acc.num_clusters
    rs = np.random.RandomState(17)
    n = 300
    o = (rs.randn(n, 3) * 3).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)

    got = np.asarray(entry_nearest_id(
        jnp.asarray(o), jnp.asarray(d), acc.aabb8,
        t_min=0.01, t_max=1e16, block=max(8, c // 2),
    ))

    inv = np.where(np.abs(d) > 1e-12, 1.0 / d, 3.4e38).astype(np.float32)
    for i in range(n):
        best_t, best_id = np.inf, c
        for cid in range(c):
            t0 = (aabb8[cid, 0:3] - o[i]) * inv[i]
            t1 = (aabb8[cid, 3:6] - o[i]) * inv[i]
            tn = np.minimum(t0, t1).max()
            tf = np.maximum(t0, t1).min()
            if (tn <= tf) and (tf >= 0.01) and (tn <= 1e16):
                et = max(tn, np.float32(0.01))
                if et < best_t:
                    best_t, best_id = et, cid
        assert got[i] == best_id, (i, got[i], best_id)


def test_entry_sort_streamed_key_is_id_major():
    """For a beyond-VMEM scene _sorted_rays('entry') groups by the
    nearest overlapped cluster's MORTON id (id above octant), matching
    the streamed kernel's block-major visit order; the permutation is
    still a bijection."""
    from tpu_pathtracer.accel.cluster import ClusterAccel, build_cluster_accel
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.ops.intersect_pallas import entry_nearest_id

    scene = build_accel(
        three_spheres_scene(stacks=10, slices=20), kind="cluster",
        cluster_size=8,
    )
    acc = scene.accel
    assert isinstance(acc, ClusterAccel)
    # Force the "streamed" routing decision without a 6 MB scene: shrink
    # the budget by monkeypatching is heavy — instead check the key
    # builder directly through a tiny accel flagged streamed via size.
    cfg = RenderConfig(width=8, height=8, sort_rays="entry")
    rs = np.random.RandomState(19)
    n = 128
    o = jnp.asarray((rs.randn(n, 3) * 3).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3).astype(np.float32))

    streamed = acc.tris16.size * 4 > 6 * 1024 * 1024
    if not streamed:
        # Small test scene: emulate the streamed branch by calling the
        # same primitives _sorted_rays uses for it.
        from tpu_pathtracer.ops.intersect_pallas import (
            entry_sort_key, sort_by_key,
        )

        rank = entry_nearest_id(o, d, acc.aabb8)
        octant = (
            (d[:, 0] > 0).astype(jnp.int32)
            + 2 * (d[:, 1] > 0).astype(jnp.int32)
            + 4 * (d[:, 2] > 0).astype(jnp.int32)
        )
        key = entry_sort_key(
            octant, rank, acc.num_clusters, directions=d,
            dir_bits=2, octant_major=False,
        )
        o_s, d_s, restore = sort_by_key(o, d, key)
        np.testing.assert_array_equal(np.asarray(restore(o_s)), np.asarray(o))
        np.testing.assert_array_equal(np.asarray(restore(d_s)), np.asarray(d))
        # id-major: stripping octant+dir bits leaves non-decreasing ids.
        ks = np.sort(np.asarray(key).astype(np.int64))
        ids = ks >> (3 + 6)   # 2 dir bits per axis below the octant
        assert (np.diff(ids) >= 0).all()
