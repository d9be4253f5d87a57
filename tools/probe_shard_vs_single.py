"""Probe: why did 1-device sharded-pixels measure FASTER than single?

tools/exp_shard_overhead.py (sweep r05f) put sharded_pixels_1dev at
2.80 s vs single 3.42/3.65 s — an 18-23% NEGATIVE "overhead", where
round 4 measured +9-10%.  The arms differ in two ways: the shard_map
wrapper, and pixel_ids = affine (base, count) vs None (identity).  This
probe separates them, interleaved A/B/A to kill tunnel-drift order
effects:

  a. render_frame                      (None identity path)
  b. jit render_pixels w/ affine (0,n) (affine path, NO shard_map)
  c. render_frame_sharded pixels 1dev  (affine path + shard_map)

Run on the real chip:  PYTHONPATH=... python tools/probe_shard_vs_single.py
"""

from __future__ import annotations

import functools
import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_pathtracer.utils.logging import enable_compile_cache

    enable_compile_cache()

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.parallel.shard import make_mesh, render_frame_sharded
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import camera_arrays, render_frame, render_pixels
    from tpu_pathtracer.scene.cache import load_scene_cached
    from tpu_pathtracer.scene.scene import make_env
    from tpu_pathtracer.utils.image import procedural_hdr

    ref = "/root/reference"
    scene = load_scene_cached(
        [f"{ref}/suitcase.obj", f"{ref}/test.obj"], scale=0.05,
        env=make_env(procedural_hdr(256, 512)), accel="cluster",
    )
    w, h = 1920, 1080
    cfg = RenderConfig(
        width=w, height=h, samples_per_launch=10, max_depth=8,
        intersector="cluster",
    )
    cam = camera_arrays(
        Camera(eye=(0, 2, 6), lookat=(0, 0.5, 0)).with_aspect(w, h), cfg
    )
    mesh = make_mesh(1)
    n_pix = w * h

    @functools.partial(jax.jit, static_argnames=())
    def affine_direct(subframe):
        return render_pixels(scene, cam, cfg, (jnp.int32(0), n_pix), subframe)

    arms = {
        "single_none": lambda k: render_frame(scene, cam, cfg, k),
        "affine_nomap": affine_direct,
        "sharded_pixels": lambda k: render_frame_sharded(
            scene, cam, cfg, k, mesh, mode="pixels"
        ),
    }

    def one(fn, k):
        t0 = time.time()
        out = fn(jnp.int32(k))
        s = float(np.asarray(out).sum())
        assert s > 0.0, "black render — do not trust timing"
        return time.time() - t0

    # compile every arm first (excluded from timing)
    for name, fn in arms.items():
        one(fn, 0)

    # interleaved rounds: each arm timed once per round, rotating order
    times = {name: [] for name in arms}
    names = list(arms)
    rounds = 4
    for r in range(rounds):
        order = names[r % 3:] + names[:r % 3]
        for name in order:
            times[name].append(round(one(arms[name], 1 + r), 4))

    print(json.dumps({
        "per_round_s": times,
        "best_s": {n: min(v) for n, v in times.items()},
        "median_s": {n: sorted(v)[len(v) // 2] for n, v in times.items()},
    }))


if __name__ == "__main__":
    main()
