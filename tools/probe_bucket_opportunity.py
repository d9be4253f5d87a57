"""Opportunity probe for cluster-bucketed ray compaction (VERDICT r4 #2).

The packet kernel pays a cluster's WHOLE K-triangle test whenever ANY ray
in the R-lane packet overlaps its AABB; per-ray dense bucketing would pay
it only for the overlapping rays.  The win bound is therefore the ratio

    packet-paid visits per ray  /  per-ray overlap visits

measured under the kernel's real policy (octant-sorted rays, per-octant
front-to-back order, best-t culling).  Best-t is simulated by revealing a
ray's TRUE final hit distance once it visits the cluster containing its
winning primitive — the same information order the real kernel sees
(slightly optimistic for both arms: intermediate farther hits also shrink
t; identical treatment keeps the ratio honest).

Also reports the bucket expansion factor (mean per-ray overlap count =
bucketed rows per ray) and the straggler profile of bucket sizes, which
price the compaction machinery the ratio must out-earn.

Usage (TPU or CPU):
  PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
      python -u tools/probe_bucket_opportunity.py [--scene suitcase] \
      [--lanes 131072]
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("r", "k"))
def _sim_visits(aabb8, order, origins, directions, true_t, true_cluster,
                r: int, k: int, t_min: float = 0.01, t_max: float = 1e16):
    """Visited-cluster counts under the packet kernel's policy.

    origins/directions [N,3] ALREADY sorted; true_t [N] final hit distance
    (t_max where miss); true_cluster [N] cluster of the winning prim (-1
    where miss).  Returns visits [P] summed over the front-to-back scan.
    """
    n = origins.shape[0]
    p = n // r
    c = aabb8.shape[0]
    o = origins[: p * r].reshape(p, r, 3)
    d = directions[: p * r].reshape(p, r, 3)
    tt = true_t[: p * r].reshape(p, r)
    tc = true_cluster[: p * r].reshape(p, r)

    inv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 3.4e38)
    octant = (
        (d[:, 0, 0] > 0).astype(jnp.int32)
        + 2 * (d[:, 0, 1] > 0).astype(jnp.int32)
        + 4 * (d[:, 0, 2] > 0).astype(jnp.int32)
    )                                                    # [P]

    def step(pos, carry):
        best_t, visits = carry
        cid = order[octant, pos]                         # [P]
        b = aabb8[cid]                                   # [P,8]
        t0 = (b[:, None, 0:3] - o) * inv                 # [P,R,3]
        t1 = (b[:, None, 3:6] - o) * inv
        tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)    # [P,R]
        tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
        overlap = (tnear <= tfar) & (tfar >= t_min) & (tnear <= best_t)
        visit = jnp.any(overlap, axis=1)                 # [P]
        visits = visits + visit.astype(jnp.int32)
        # reveal the true t where this cluster holds the ray's winner
        reveal = visit[:, None] & (tc == cid[:, None])
        best_t = jnp.where(reveal, tt, best_t)
        return best_t, visits

    best_t0 = jnp.full((p, r), t_max, jnp.float32)
    _, visits = jax.lax.fori_loop(
        0, c, step, (best_t0, jnp.zeros((p,), jnp.int32))
    )
    return visits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="suitcase",
                    choices=["suitcase", "monkey", "highpoly"])
    ap.add_argument("--lanes", type=int, default=131072)
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

    # bounce mix: one real bounce; terminated lanes respawn fresh primaries
    # from the adjacent pixel window (what the streaming schedule does).
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

    rpt = acc._rpt(cfg)
    print(f"scene={args.scene} tris={scene.num_triangles} clusters={c} "
          f"K={k} rpt={rpt} lanes={n} bounce1_alive={float(alive.mean()):.3f}")

    from tpu_pathtracer.accel.cluster import build_cluster_accel
    from tpu_pathtracer.ops.intersect import intersect_brute

    acc32 = build_cluster_accel(np.asarray(scene.vertices), cluster_size=32)

    for name, (o, d) in (("primary", (o0, d0)), ("bounce-mix", (o1, d1))):
        for mode in ("spatial", "entry"):
            os_, ds_, _restore = acc._sorted_rays(mode, o, d, cfg)
            hit = intersect_brute(
                jnp.asarray(scene.vertices), os_, ds_, 0.01, 1e16
            )
            true_t = jnp.where(hit.hit, hit.t, 1e16)

            def mean_visits(a, kk, r, reveal):
                true_cl = jnp.where(hit.hit, hit.prim // kk, -1)
                visits = _sim_visits(
                    a.aabb8, a.order, os_, ds_,
                    true_t if reveal else jnp.full_like(true_t, 1e16),
                    true_cl if reveal else jnp.full_like(true_cl, -1),
                    r=r, k=kk,
                )
                return float(visits.astype(jnp.float32).mean())

            paid = mean_visits(acc, k, rpt, True)   # packet-paid (policy)
            ideal = mean_visits(acc, k, 1, True)    # per-ray+t lower bound
            flat = mean_visits(acc, k, 1, False)    # independent buckets
            p32 = mean_visits(acc32, 32, rpt, True)  # K=32 packet-paid
            print(f"  {name:10s} sort={mode:7s}: packet visits/ray "
                  f"{paid:7.2f} (tests/ray {paid * k:7.0f}) | per-ray+t "
                  f"{ideal:6.2f} ({ideal * k:6.0f}) | per-ray flat "
                  f"{flat:6.2f} ({flat * k:6.0f}) | K=32 packet "
                  f"{p32:7.2f} ({p32 * 32:6.0f})")


if __name__ == "__main__":
    main()
