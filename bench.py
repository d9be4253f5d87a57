"""Headline benchmark: Mrays/sec/chip on the suitcase PBR scene.

BASELINE.md metric: "Mrays/sec/chip and spp/sec at 1080p, path depth 8
(suitcase PBR scene)"; target > 100 Mrays/sec on one TPU v5e chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}
(vs_baseline = value / 100 against the BASELINE.json north-star target.)

Usage: python bench.py [--small] [--frames N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="tiny CPU-friendly config")
    ap.add_argument("--frames", type=int, default=8, help="timed launches")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--spp", type=int, default=10, help="samples per launch (reference: 10)")
    ap.add_argument("--accel", default="auto", choices=["auto", "brute", "cluster", "bvh"])
    ap.add_argument("--tiles", type=int, default=0, help="pixel tiles per frame (0=auto)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.accel.build import build_accel
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import (
        camera_arrays,
        count_segments,
        render_frame,
    )
    from tpu_pathtracer.scene.scene import make_env
    from tpu_pathtracer.utils.image import procedural_hdr

    if args.small:
        args.width, args.height, args.frames = 256, 192, 4

    ref = "/root/reference"
    env = make_env(procedural_hdr(256, 512))

    if os.path.exists(f"{ref}/suitcase.obj"):
        from tpu_pathtracer.scene.builder import load_scene

        scene = load_scene(
            [f"{ref}/suitcase.obj", f"{ref}/test.obj"],
            scale=0.05,
            env=env,
            rng_seed=0,
            accel=("cluster" if args.accel == "auto" else args.accel)
            if args.accel != "brute" else None,
        )  # the reference hero scene (optixSphere.cpp:829-841)
        camera = Camera(eye=(0.0, 2.0, 6.0), lookat=(0.0, 0.5, 0.0))
    else:  # fallback: procedural
        from tpu_pathtracer.scene.procedural import three_spheres_scene

        scene = three_spheres_scene().replace(env=env)
        camera = Camera()

    n_pix = args.width * args.height
    tiles = args.tiles
    if tiles == 0:
        if args.spp > 1:
            # Streaming work-queue renderer handles the whole frame with a
            # fixed 256k-lane pool; no tiling needed.
            tiles = 1
        else:
            per_tile = 262144
            tiles = max(1, n_pix // per_tile)
            while n_pix % tiles:
                tiles -= 1
    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        samples_per_launch=args.spp,
        max_depth=args.depth,
        dof=False,
        env_mode="equirect",
        intersector=args.accel,
        tile_pixels=(n_pix // tiles) if tiles > 1 else 0,
    )
    if args.accel not in ("brute", "auto") and scene.accel is None:
        scene = build_accel(scene, kind=args.accel)

    cam = camera_arrays(camera.with_aspect(cfg.width, cfg.height), cfg)

    # Compile + warm up.
    render_frame(scene, cam, cfg, jnp.int32(0)).block_until_ready()

    # Measure traced segments (schedule-independent path-segment count).
    segs = int(count_segments(scene, cam, cfg, jnp.int32(0)))

    t0 = time.perf_counter()
    for k in range(args.frames):
        img = render_frame(scene, cam, cfg, jnp.int32(k + 1))
    img.block_until_ready()
    dt = time.perf_counter() - t0

    rays_per_launch = segs  # segments == rays traced
    mrays = rays_per_launch * args.frames / dt / 1e6
    spp_per_sec = args.spp * args.frames / dt

    result = {
        "metric": "Mrays/sec/chip, suitcase PBR scene, "
        f"{args.width}x{args.height}, depth {args.depth}, {args.accel} accel "
        f"({jax.devices()[0].platform})",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "detail": {
            "rays_per_launch": rays_per_launch,
            "spp_per_sec": round(spp_per_sec, 3),
            "sec_per_launch": round(dt / args.frames, 4),
            "triangles": int(scene.num_triangles),
            "frames": args.frames,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
