"""Bucket probe v2: one brute pass per ray set, then a (sort-mode x
rays-per-tile) grid of packet-policy visit simulations.

v1 (probe_bucket_opportunity.py) re-ran the brute intersect per sort
mode — 15 min/scene on the 98k field.  The true hit distances do not
depend on the ordering, so v2 computes them ONCE (in the original lane
order) and permutes them alongside the rays for each candidate key.

Answers two VERDICT r4 #2 questions the v1 grid left open:
* does the entry-cluster key close the packet-vs-per-ray gap at FINER
  packets (purer buckets are only realizable if rpt is small enough)?
* what does each (key, rpt) pair cost in visits on primaries (which the
  hero headline is dominated by) vs bounces (configs 2/4)?

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
      python -u tools/probe_bucket_v2.py [--scene suitcase] [--lanes N]
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from probe_bucket_opportunity import _sim_visits  # same policy simulator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="suitcase",
                    choices=["suitcase", "monkey", "highpoly"])
    ap.add_argument("--lanes", type=int, default=131072)
    ap.add_argument("--rpts", default="1024,512,256,128")
    args = ap.parse_args()

    from tpu_pathtracer.utils.logging import enable_compile_cache

    enable_compile_cache()

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import (
        _trace_bounce, camera_arrays, generate_camera_rays,
    )
    from tpu_pathtracer.scene.scene import make_env
    from tpu_pathtracer.utils import rng
    from tpu_pathtracer.utils.image import procedural_hdr

    env = make_env(procedural_hdr(256, 512))
    ref = "/root/reference"
    camera = Camera(eye=(0.0, 2.0, 6.0), lookat=(0.0, 0.5, 0.0))
    if args.scene == "suitcase":
        from tpu_pathtracer.scene.cache import load_scene_cached

        scene = load_scene_cached(
            [f"{ref}/suitcase.obj", f"{ref}/test.obj"],
            scale=0.05, env=env, accel="cluster",
        )
    elif args.scene == "monkey":
        from tpu_pathtracer.scene.cache import load_scene_cached

        scene = load_scene_cached(
            [f"{ref}/monkey.obj"], scale=1.0, env=env, accel="cluster",
        )
        camera = Camera(eye=(0, 1, 4), lookat=(0, 0.6, 0))
    else:
        from tpu_pathtracer.accel.build import build_accel
        from tpu_pathtracer.scene.procedural import high_poly_scene

        scene = build_accel(
            high_poly_scene(total_tris=100_000).replace(env=env),
            kind="cluster",
        )
        camera = Camera(eye=(0, 3, 10), lookat=(0, 1, 0))

    acc = scene.accel
    k = acc.cluster_size
    c = acc.num_clusters
    cfg = RenderConfig(
        width=1920, height=1080, samples_per_launch=10, max_depth=8,
        dof=False, env_mode="equirect", intersector="cluster",
    )
    cam = camera_arrays(camera.with_aspect(cfg.width, cfg.height), cfg)
    n = args.lanes
    n_pix_total = cfg.width * cfg.height
    start = max(0, (n_pix_total - n) // 2)
    pix = (start + jnp.arange(n, dtype=jnp.int32)) % n_pix_total
    seeds0 = rng.make_seeds(pix, jnp.zeros_like(pix), jnp.int32(0))
    o0, d0, seeds0 = generate_camera_rays(
        cam, pix % cfg.width, pix // cfg.width, seeds0, cfg
    )

    att = jnp.ones_like(o0)
    rad = jnp.zeros_like(o0)
    spec = jnp.ones_like(pix, dtype=bool)
    depth8 = jnp.full_like(pix, 8)
    tb = _trace_bounce(scene, cfg, o0, d0, att, rad, seeds0, depth8, spec)
    alive = ~tb["done"]
    pix2 = (pix + n) % n_pix_total
    s2 = rng.make_seeds(pix2, jnp.zeros_like(pix2), jnp.int32(0))
    o_f, d_f, _ = generate_camera_rays(
        cam, pix2 % cfg.width, pix2 // cfg.width, s2, cfg
    )
    o1 = jnp.where(alive[:, None], tb["origin"], o_f)
    d1 = jnp.where(alive[:, None], tb["direction"], d_f)

    rpts = [int(v) for v in args.rpts.split(",")]
    # Judge under the kernel that actually runs: the HBM-streamed kernel
    # visits clusters in MORTON BLOCK order for every octant, not the
    # per-octant front-to-back order (which only the in-VMEM kernels use).
    streamed = acc.tris16.size * 4 > 6 * 1024 * 1024
    order = (
        jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32), (8, c))
        if streamed
        else acc.order
    )
    print(f"scene={args.scene} tris={scene.num_triangles} clusters={c} "
          f"K={k} lanes={n} visit_order={'morton' if streamed else 'f2b'}")

    from tpu_pathtracer.ops.intersect import intersect_brute

    for name, (o, d) in (("primary", (o0, d0)), ("bounce-mix", (o1, d1))):
        # Brute truth ONCE, in the unsorted lane order.
        hit = intersect_brute(jnp.asarray(scene.vertices), o, d, 0.01, 1e16)
        tt0 = jnp.where(hit.hit, hit.t, 1e16)
        tc0 = jnp.where(hit.hit, hit.prim // k, -1)
        packed = jnp.concatenate(
            [o, d, tt0[:, None], tc0.astype(jnp.float32)[:, None]], axis=-1
        )
        def sorted_by(mode):
            if mode in ("spatial", "entry"):
                return acc._sorted_rays(mode, o, d, cfg)
            # experimental: nearest-overlapped-cluster Morton id keys
            from tpu_pathtracer.ops.intersect_pallas import (
                entry_nearest_id, entry_sort_key, sort_by_key,
            )

            nid = entry_nearest_id(o, d, acc.aabb8)
            octant = (
                (d[:, 0] > 0).astype(jnp.int32)
                + 2 * (d[:, 1] > 0).astype(jnp.int32)
                + 4 * (d[:, 2] > 0).astype(jnp.int32)
            )
            key = entry_sort_key(
                octant, nid, c, directions=d, dir_bits=acc._dir_bits(cfg),
                octant_major=(mode == "nid_oct"),
            )
            return sort_by_key(o, d, key)

        for mode in ("spatial", "entry", "nid_oct", "nid_major"):
            os_, ds_, restore = sorted_by(mode)
            # Recover the permutation by sorting a tagged row alongside:
            # restore() inverts it, so apply the FORWARD permutation to
            # the truth rows by sorting packed the same way.
            idx = restore(jnp.arange(n, dtype=jnp.int32))  # slot of lane i
            # idx[i] = slot of lane i  =>  forward perm rows: scatter.
            rows = jnp.zeros_like(packed).at[idx].set(packed)
            tt = rows[:, 6]
            tc = rows[:, 7].astype(jnp.int32)
            assert bool(jnp.all(jnp.abs(rows[:, 0:3] - os_) < 1e-6)), mode
            line = [f"  {name:10s} {mode:7s}:"]
            for r in rpts:
                v = _sim_visits(
                    acc.aabb8, order, os_, ds_, tt, tc, r=r, k=k
                )
                m = float(v.astype(jnp.float32).mean())
                line.append(f"rpt{r}={m:6.2f} ({m * k:5.0f}t)")
            v1 = _sim_visits(acc.aabb8, order, os_, ds_, tt, tc, r=1, k=k)
            line.append(f"per-ray+t={float(v1.astype(jnp.float32).mean()):5.2f}")
            print(" ".join(line))


if __name__ == "__main__":
    main()
