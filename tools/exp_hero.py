"""Quick hero-scene experiment driver: vary stream_lanes / cluster_size /
rays_per_tile without touching bench.py.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_hero.py \
      [--lanes 131072] [--cluster-size 128] [--frames 4] [--spp 10]
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=131072)
    ap.add_argument("--cluster-size", type=int, default=128)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--spp", type=int, default=10)
    ap.add_argument("--depth", type=int, default=8)
    # Defaults mirror RenderConfig so an unflagged run measures the
    # shipped configuration.
    ap.add_argument("--rays-per-tile", type=int, default=0)
    ap.add_argument("--fifo-depth", type=int, default=4)
    ap.add_argument("--flush-every", type=int, default=32)
    ap.add_argument("--sort-rays", default="auto",
                    choices=["auto", "off", "octant", "spatial"])
    ap.add_argument("--spatial-bits", type=int, default=0)
    ap.add_argument("--dir-bits", type=int, default=0)
    ap.add_argument("--super-branch", type=int, default=8)
    ap.add_argument("--hier-min", type=int, default=192,
                    help="cluster count that routes to the two-level kernel")
    ap.add_argument("--deferred", action="store_true")
    ap.add_argument("--nee", action="store_true",
                    help="env importance sampling (forces rr_mode=standard)")
    ap.add_argument("--chunk-div", type=int, default=4)
    ap.add_argument("--fused", default="auto",
                    choices=("auto", "on", "off"))
    ap.add_argument("--scene", default="suitcase",
                    choices=["suitcase", "monkey", "tower", "highpoly"])
    args = ap.parse_args()

    import jax.numpy as jnp

    from tpu_pathtracer.utils.logging import enable_compile_cache

    enable_compile_cache()

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import camera_arrays, render_frame
    from tpu_pathtracer.scene.builder import load_scene
    from tpu_pathtracer.scene.scene import make_env
    from tpu_pathtracer.utils.image import procedural_hdr

    ref = "/root/reference"
    env = make_env(procedural_hdr(256, 512))
    if args.nee:
        from tpu_pathtracer.render.envmap import with_importance_sampling

        env = with_importance_sampling(env)
    files, scale, cam_args = {
        "highpoly": ([], 1.0, dict(eye=(0, 3, 10), lookat=(0, 1, 0))),
        "suitcase": (["suitcase.obj", "test.obj"], 0.05,
                     dict(eye=(0, 2, 6), lookat=(0, 0.5, 0))),
        "monkey": (["monkey.obj"], 1.0, dict(eye=(0, 1, 4), lookat=(0, 0.6, 0))),
        "tower": (["tower.obj", "fish.obj", "test.obj"], 1.0,
                  dict(eye=(0, 1.5, 5), lookat=(0, 0.6, 0))),
    }[args.scene]
    if args.scene == "monkey":
        args.depth = min(args.depth, 4)   # bench config-2 parity
    if args.scene == "highpoly":
        from tpu_pathtracer.accel.build import build_accel
        from tpu_pathtracer.scene.procedural import high_poly_scene

        scene = build_accel(
            high_poly_scene(total_tris=100_000).replace(env=env),
            kind="cluster", cluster_size=args.cluster_size,
            super_branch=args.super_branch,
        )
    else:
        scene = load_scene(
            [f"{ref}/{f}" for f in files],
            scale=scale, env=env, rng_seed=0, accel="cluster",
            accel_kw={"cluster_size": args.cluster_size,
                      "super_branch": args.super_branch},
        )
    cfg = RenderConfig(
        width=1920, height=1080, samples_per_launch=args.spp,
        max_depth=args.depth, dof=False, env_mode="equirect",
        intersector="cluster", stream_lanes=args.lanes,
        pallas_rays_per_tile=args.rays_per_tile,
        fifo_depth=args.fifo_depth, flush_every=args.flush_every,
        deferred_shade=args.deferred, deferred_chunk_div=args.chunk_div,
        sort_rays=args.sort_rays, sort_spatial_bits=args.spatial_bits,
        sort_dir_bits=args.dir_bits, hier_min_clusters=args.hier_min,
        env_importance_sampling=args.nee,
        rr_mode="standard" if args.nee else "reference",
        fused_schedule=args.fused,
    )
    cam = camera_arrays(
        Camera(**cam_args).with_aspect(cfg.width, cfg.height), cfg
    )

    img = render_frame(scene, cam, cfg, jnp.int32(0))
    float(img.sum())  # compile + sync (axon: only readback really waits)
    t0 = time.perf_counter()
    for k in range(args.frames):
        img = render_frame(scene, cam, cfg, jnp.int32(k + 1))
        float(img.sum())
    dt = (time.perf_counter() - t0) / args.frames
    print(
        f"scene={args.scene} depth={args.depth} "
        f"lanes={args.lanes} cluster={args.cluster_size} rpt={args.rays_per_tile} "
        f"fifo={args.fifo_depth}/{args.flush_every} "
        f"deferred={int(args.deferred)}/{args.chunk_div} "
        f"sort={args.sort_rays}/{args.spatial_bits}+d{args.dir_bits} "
        f"hier>={args.hier_min} "
        f"nee={int(args.nee)} spp={args.spp}: {dt:.3f} s/launch  sum={float(img.sum()):.3e}"
    )


if __name__ == "__main__":
    main()
