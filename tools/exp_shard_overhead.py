"""Sharded-path overhead on ONE real chip (VERDICT r3 #9).

The pod-scale claim in docs/perf_notes.md ("8 x v5e = ~110 Mrays/s
aggregate") extrapolates linearly from the single-chip number.  The
missing measured term is what the sharded code path itself costs on one
device: shard_map dispatch, the output-boundary all_gather (pixels mode)
or the pmean collective (samples mode) — on a 1-device mesh these are
degenerate, so the delta vs the plain `render_frame` path IS the fixed
sharding overhead every chip of a pod would pay.

Usage (TPU):
  PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
      python -u tools/exp_shard_overhead.py [--frames 4] [--spp 10]

Correctness cross-check is free: the sharded pixel path is bitwise vs
the single path (tests/test_parallel.py), so only timing is reported.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--spp", type=int, default=10)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--size", default="1920x1080")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    import jax.numpy as jnp
    import numpy as np

    from tpu_pathtracer.utils.logging import enable_compile_cache

    enable_compile_cache()

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.parallel.shard import make_mesh, render_frame_sharded
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import camera_arrays, render_frame
    from tpu_pathtracer.scene.cache import load_scene_cached
    from tpu_pathtracer.scene.scene import make_env
    from tpu_pathtracer.utils.image import procedural_hdr

    ref = "/root/reference"
    scene = load_scene_cached(
        [f"{ref}/suitcase.obj", f"{ref}/test.obj"], scale=0.05,
        env=make_env(procedural_hdr(256, 512)), accel="cluster",
    )
    cfg = RenderConfig(
        width=w, height=h, samples_per_launch=args.spp,
        max_depth=args.depth, intersector="cluster",
    )
    cam = camera_arrays(
        Camera(eye=(0, 2, 6), lookat=(0, 0.5, 0)).with_aspect(w, h), cfg
    )
    mesh = make_mesh(1)

    def timed(fn, tag):
        best = float("inf")
        img_sum = 0.0
        for k in range(args.frames + 1):
            t0 = time.time()
            out = fn(jnp.int32(k))
            # axon: only a device->host readback really syncs.
            img_sum = float(np.asarray(out).sum())
            dt = time.time() - t0
            if k > 0:  # frame 0 carries the compile
                best = min(best, dt)
        assert img_sum > 0.0, f"{tag}: black render — do not trust timing"
        return best

    t_single = timed(lambda k: render_frame(scene, cam, cfg, k), "single")
    t_pix = timed(
        lambda k: render_frame_sharded(scene, cam, cfg, k, mesh, mode="pixels"),
        "sharded-pixels",
    )
    t_smp = timed(
        lambda k: render_frame_sharded(scene, cam, cfg, k, mesh, mode="samples"),
        "sharded-samples",
    )
    # The single arm AGAIN at the end: the first measurement of the
    # process ran 22% slower than the sharded arms in the r04b sweep —
    # if single2 matches the sharded times, that delta was process/tunnel
    # warm-up order effect, not sharding being faster.
    t_single2 = timed(lambda k: render_frame(scene, cam, cfg, k + 16), "single2")
    # Overhead is reported against EACH single arm separately: min() of two
    # noisy baselines biases the estimate downward (can even go negative on
    # baseline noise alone), and keeping both arms distinguishable is what
    # makes the warm-up order-effect diagnostic readable (advisor r4).
    print(json.dumps({
        "size": args.size, "spp": args.spp, "depth": args.depth,
        "s_per_launch": {
            "single": round(t_single, 4),
            "sharded_pixels_1dev": round(t_pix, 4),
            "sharded_samples_1dev": round(t_smp, 4),
            "single_again": round(t_single2, 4),
        },
        "overhead_pct_vs_single": {
            "pixels": round(100 * (t_pix / t_single - 1), 2),
            "samples": round(100 * (t_smp / t_single - 1), 2),
        },
        # single2 ran last = fully warmed; treat as the primary estimate.
        "overhead_pct_vs_single2": {
            "pixels": round(100 * (t_pix / t_single2 - 1), 2),
            "samples": round(100 * (t_smp / t_single2 - 1), 2),
        },
    }))


if __name__ == "__main__":
    main()
