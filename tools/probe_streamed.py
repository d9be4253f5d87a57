"""Probe: what dominates the streamed big-scene kernel's 15.8 ms/iter?

Sweeps block_clusters / rays_per_tile / branch for the streamed2 kernel
on the 98k-tri sphere field, measuring marginal in-loop cost (K vs 2K
fori_loop iterations, salted, readback-synced — the profile_inloop.py
method).  Grid-step count = (lanes/rpt) * ceil(C/block): if cost tracks
step count rather than HBM bytes, per-step fixed overhead dominates and
a block-major redesign (scene streamed ONCE per call, not once per ray
tile) is the fix.

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
        intersect_clusters_pallas_streamed2,
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
        print(f"{name:44s}: {m*1e3:7.2f} ms/iter ({n/max(m,1e-9)/1e6:6.1f} M/s)")
        return m

    def s2(rpt, blk, br):
        def call(o, d):
            return intersect_clusters_pallas_streamed2(
                acc.tris16, acc.aabb8, o, d, 0.01, 1e16,
                rays_per_tile=rpt, block_clusters=blk, branch=br,
            )
        return call

    def s1(rpt, blk):
        def call(o, d):
            return intersect_clusters_pallas_streamed(
                acc.tris16, acc.aabb8, o, d, 0.01, 1e16,
                rays_per_tile=rpt, block_clusters=blk,
            )
        return call

    measure("streamed1 rpt1024 blk16 (r2 default)", s1(1024, 16))
    measure("streamed2 rpt1024 blk32 br8 (default)", s2(1024, 32, 8))
    measure("streamed2 rpt1024 blk96 br8", s2(1024, 96, 8))
    measure("streamed2 rpt1024 blk192 br8", s2(1024, 192, 8))
    measure("streamed2 rpt2048 blk96 br8", s2(2048, 96, 8))
    measure("streamed2 rpt4096 blk192 br8", s2(4096, 192, 8))
    measure("streamed2 rpt1024 blk96 br16", s2(1024, 96, 16))

    try:
        from tpu_pathtracer.ops.intersect_pallas import (
            intersect_clusters_pallas_streamed3,
        )

        def s3(rpt, blk, br):
            def call(o, d):
                return intersect_clusters_pallas_streamed3(
                    acc.tris16, acc.aabb8, o, d, 0.01, 1e16,
                    rays_per_tile=rpt, block_clusters=blk, branch=br,
                )
            return call

        measure("streamed3 rpt1024 blk32 br8", s3(1024, 32, 8))
        measure("streamed3 rpt1024 blk96 br8", s3(1024, 96, 8))
        measure("streamed3 rpt2048 blk96 br8", s3(2048, 96, 8))
    except ImportError:
        print("(streamed3 not built yet)")


if __name__ == "__main__":
    main()
