"""Probe: streamed big-scene kernel parameter sweep (98k-tri sphere field).

Measures marginal in-loop cost (K vs 2K fori_loop iterations, salted,
readback-synced — the profile_inloop.py method) of the block-major
two-level streamed kernel across rays_per_tile / block_clusters /
cluster_size.  History (v5e, 131k lanes):
  tile-major streamed2 rpt1024 blk32      25.2 ms/iter ( 5.2 M/s)
  block-major          rpt1024 blk96      20.4 ms/iter ( 6.4 M/s)
  block-major          rpt512  blk96      16.7 ms/iter ( 7.9 M/s)  <- shipped
  mt_sub sub-span slab gating REFUTED: sub2/4/8 = 17.1/22.7/27.6 ms
  (extra scalar slab loops cost more than the skipped MT work saved).
cs32 (3063 clusters) overflows SMEM: aabb rows cost 64 B/elem there
([3072,8] f32 -> 1.5 MB > the 1 MB bank), so cluster_size >= 64 only.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_streamed.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def main():
    from tpu_pathtracer.utils.logging import enable_compile_cache

    enable_compile_cache()

    from tpu_pathtracer.accel.build import build_accel
    from tpu_pathtracer.ops.intersect_pallas import (
        intersect_clusters_pallas_streamed,
    )
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import camera_arrays, generate_camera_rays
    from tpu_pathtracer.scene.procedural import high_poly_scene
    from tpu_pathtracer.utils import rng
    from tpu_pathtracer.config import RenderConfig

    scene = build_accel(high_poly_scene(total_tris=100_000), kind="cluster")
    acc = scene.accel
    print(f"clusters={acc.tris16.shape[0]} K={acc.tris16.shape[1]}")

    n = 131072
    cfg = RenderConfig(width=1920, height=1080, samples_per_launch=10,
                       max_depth=8, dof=False, env_mode="constant",
                       intersector="cluster")
    cam = camera_arrays(
        Camera(eye=(0, 3, 10), lookat=(0, 1, 0)).with_aspect(1920, 1080), cfg
    )
    n_pix = 1920 * 1080
    start = (n_pix - n) // 2
    pix = (start + jnp.arange(n, dtype=jnp.int32)) % n_pix
    seeds0 = rng.make_seeds(pix, jnp.zeros_like(pix), jnp.int32(0))
    o0, d0, _ = generate_camera_rays(cam, pix % 1920, pix // 1920, seeds0, cfg)
    o0 = jax.block_until_ready(o0)

    salt = [0]
    K = 6

    def measure(name, call):
        def loop(o, d, saltv, iters):
            def step(i, st):
                o_, d_ = st
                t, p, uv = call(o_, d_)
                o2 = o_ + 0.001 * jnp.minimum(t, 10.0)[:, None] * d_
                return (o2, d_)
            return jax.lax.fori_loop(0, iters, step, (o + saltv, d))[0].sum()

        jl = jax.jit(loop, static_argnums=(3,))

        def run(iters):
            salt[0] += 1
            sv = jnp.float32(salt[0] * 1e-3)
            t0 = time.perf_counter()
            float(jl(o0, d0, sv, iters))
            return time.perf_counter() - t0

        run(K); run(2 * K)
        tK = min(run(K) for _ in range(3))
        t2K = min(run(2 * K) for _ in range(3))
        m = (t2K - tK) / K
        print(f"{name:44s}: {m*1e3:7.2f} ms/iter ({n/max(m,1e-9)/1e6:6.1f} M/s)", flush=True)
        return m

    def s(a, rpt, blk, br):
        def call(o, d):
            return intersect_clusters_pallas_streamed(
                a.tris16, a.aabb8, o, d, 0.01, 1e16,
                rays_per_tile=rpt, block_clusters=blk, branch=br,
            )
        return call

    measure("streamed rpt512 blk96 br8 (default)", s(acc, 512, 96, 8))
    for rpt, blk, br in ((512, 48, 8), (512, 192, 8), (256, 96, 8),
                         (512, 96, 16), (1024, 96, 8)):
        try:
            measure(f"streamed rpt{rpt} blk{blk} br{br}", s(acc, rpt, blk, br))
        except Exception as e:
            print(f"rpt{rpt} blk{blk} br{br} FAILED: {str(e)[:160]}",
                  flush=True)

    # Cluster-size sweep: MT waste per surviving cluster scales with K,
    # slab count with C=tris/K.
    from tpu_pathtracer.accel.cluster import build_cluster_accel
    import numpy as np
    verts = np.asarray(scene.vertices)
    for cs in (64, 256):
        try:
            a2 = build_cluster_accel(verts, cluster_size=cs)
            measure(f"streamed cs{cs} rpt512 blk96 br8", s(a2, 512, 96, 8))
        except Exception as e:
            print(f"cs{cs} FAILED: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
