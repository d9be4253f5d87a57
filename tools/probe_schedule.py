"""Probe: streaming-schedule overhead on the hero scene (VERDICT r2 #4).

The bare full bounce measures 6.9 ms/iter at 131k lanes (v5e,
profile_inloop) but the streaming renderer's whole-launch cost implies
~11-12 ms per iteration: ~4-5 ms/iter of queue machinery (FIFO staging,
flush, state merges, respawn).  This probe measures the REAL schedule:
whole launches of render_pixels with the stats return, derives ms/iter
from the in-schedule iteration counter, and sweeps the machinery knobs
(fifo depth, flush cadence) to find where the overhead lives.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/probe_schedule.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp


def main():
    from tpu_pathtracer.utils.logging import enable_compile_cache

    enable_compile_cache()

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import camera_arrays, render_pixels
    from tpu_pathtracer.scene.builder import load_scene
    from tpu_pathtracer.scene.scene import make_env
    from tpu_pathtracer.utils.image import procedural_hdr

    env = make_env(procedural_hdr(256, 512))
    ref = "/root/reference"
    scene = load_scene(
        [f"{ref}/suitcase.obj", f"{ref}/test.obj"],
        scale=0.05, env=env, rng_seed=0, accel="cluster",
    )
    camera = Camera(eye=(0.0, 2.0, 6.0), lookat=(0.0, 0.5, 0.0))

    base = RenderConfig(
        width=1920, height=1080, samples_per_launch=10, max_depth=8,
        dof=False, env_mode="equirect", intersector="cluster",
    )
    cam = camera_arrays(camera.with_aspect(base.width, base.height), base)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def launch(cfg, subframe):
        return render_pixels(
            scene, cam, cfg, None, subframe, return_stats=True
        )

    def measure(name, cfg):
        img, stats = launch(cfg, jnp.int32(0))
        float(img.sum())                       # warm + compile
        best = 1e9
        for k in range(3):
            t0 = time.perf_counter()
            img, stats = launch(cfg, jnp.int32(k + 1))
            s = float(img.sum())
            dt = time.perf_counter() - t0
            best = min(best, dt)
        iters = int(stats["iters"])
        segs = int(stats["segments"])
        print(f"{name:34s}: {best:6.3f} s/launch, {iters} iters, "
              f"{best/iters*1e3:6.2f} ms/iter, "
              f"{segs/best/1e6:5.1f} Mrays/s", flush=True)
        assert s > 0.0
        return best

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", default="fifo", choices=["fifo", "main"])
    args = ap.parse_args()

    if args.set == "fifo":
        # Round-3 measurements (v5e, suitcase 1080p 10spp depth8):
        #   default fifo4/flush32  2.152 s/launch  9.28 ms/iter  13.8 M/s
        #   fifo2/flush16          2.320           10.00         12.8
        # (eager, un-jitted launches measured 2-5x worse and unstable —
        # always measure through one jitted launch.)
        measure("default (fifo4/flush32)", base)
        measure("fifo2/flush16", base.replace(fifo_depth=2, flush_every=16))
        measure("fifo8/flush64", base.replace(fifo_depth=8, flush_every=64))
        measure("lanes 65536", base.replace(stream_lanes=65536))
        measure("lanes 262144", base.replace(stream_lanes=262144))
    else:
        from tpu_pathtracer.render.envmap import with_importance_sampling

        measure("default", base)
        measure("sort off", base.replace(sort_rays="off"))
        scene = scene.replace(env=with_importance_sampling(scene.env))
        nee = base.replace(env_importance_sampling=True, rr_mode="standard")
        measure("nee (nosort shadow)", nee)


if __name__ == "__main__":
    main()
