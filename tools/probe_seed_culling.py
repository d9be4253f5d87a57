"""Opportunity probe: would seeding per-lane best-t (hit prediction from
the previous sample, reverified by one MT test) reduce packet-kernel MT
work?  Host-side numpy simulation — no kernel build until the ceiling is
known (docs/perf_notes.md round-3 lesson: measure the lever in situ
before building it).

Simulates the flat packet kernel's traversal exactly as shipped:
per-octant front-to-back cluster order, per-lane best-t slab culling at
PACKET granularity (a cluster is MT-tested iff ANY lane's [t_min,
best_t) interval overlaps its AABB), spatial-sorted lane order — then
replays it with every lane's best-t pre-seeded at its true hit t (the
IDEAL prediction; real previous-sample reverified seeds can only do
worse).  Reports MT cluster visits per packet for both.

Usage: python tools/probe_seed_culling.py [--scene suitcase|monkey|tower]
       [--rays-per-tile 1024] [--bounce]
"""

from __future__ import annotations

import argparse

import numpy as np


def slab(o, d, lo, hi, t_min, t_max):
    """Per-lane slab test: does [t_min, t_max) overlap the AABB?"""
    inv = 1.0 / np.where(np.abs(d) < 1e-30, np.where(d >= 0, 1e-30, -1e-30), d)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tn = np.minimum(t0, t1).max(axis=-1)
    tf = np.maximum(t0, t1).min(axis=-1)
    return (tf >= np.maximum(tn, t_min)) & (tn <= t_max)


def traverse(origins, dirs, t_hit, aabbs, order, rpt, seed):
    """Count MT-visited clusters per packet replaying the kernel's loop.

    seed=False: best starts at inf and converges as clusters are visited
    front-to-back (the visited cluster's hits snap best_t to the true t
    for lanes whose winner lives there — the kernel finds it there).
    seed=True: best starts at the true t for every hit lane.
    """
    n = origins.shape[0]
    c = aabbs.shape[0]
    lo, hi = aabbs[:, 0:3], aabbs[:, 3:6]
    visits = []
    for p0 in range(0, n, rpt):
        o = origins[p0 : p0 + rpt]
        d = dirs[p0 : p0 + rpt]
        th = t_hit[p0 : p0 + rpt]
        # Octant convention matches ray_sort_key / octant_orders: bit set
        # when the direction component is POSITIVE.
        oct_ = int(
            (d[:, 0].mean() > 0) | ((d[:, 1].mean() > 0) << 1)
            | ((d[:, 2].mean() > 0) << 2)
        )
        best = th.copy() if seed else np.full(len(o), np.inf)
        nv = 0
        for ci in order[oct_, :c]:
            alive = slab(o, d, lo[ci], hi[ci], 0.01, best)
            if alive.any():
                nv += 1
                # The kernel MT-tests the whole cluster; lanes whose true
                # winner lives in ci snap to t_hit (closest-hit found —
                # front-to-back order makes this the common case).
                in_ci = cluster_of_hit[p0 : p0 + rpt] == ci
                best = np.where(in_ci, np.minimum(best, th), best)
        visits.append(nv)
    return np.array(visits)


def traverse_hier(origins, dirs, t_hit, child8, super8, order_s, branch,
                  rpt, n_clusters):
    """Two-level replay mirroring _cluster_kernel_hier: every super is
    slab-tested (scalar iter each); a passing super slab-tests its
    `branch` children (scalar iter each); passing children are MT-tested.
    Returns (scalar_iters, mt_visits) per packet."""
    n = origins.shape[0]
    s_count = super8.shape[0]
    out = []
    for p0 in range(0, n, rpt):
        o = origins[p0 : p0 + rpt]
        d = dirs[p0 : p0 + rpt]
        th = t_hit[p0 : p0 + rpt]
        oct_ = int(
            (d[:, 0].mean() > 0) | ((d[:, 1].mean() > 0) << 1)
            | ((d[:, 2].mean() > 0) << 2)
        )
        best = np.full(len(o), np.inf)
        scalar = s_count   # every super pays one scalar slab iteration
        mt = 0
        for s in order_s[oct_, :s_count]:
            if not slab(o, d, super8[s, 0:3], super8[s, 3:6], 0.01, best).any():
                continue
            for j in range(branch):
                c = s * branch + j
                if c >= n_clusters:
                    continue
                scalar += 1
                if slab(o, d, child8[c, 0:3], child8[c, 3:6], 0.01, best).any():
                    mt += 1
                    in_ci = cluster_of_hit[p0 : p0 + rpt] == c
                    best = np.where(in_ci, np.minimum(best, th), best)
        out.append((scalar, mt))
    return np.array(out)


def traverse_two_phase(origins, dirs, t_hit, aabbs, order, rpt, r_near):
    """Two-phase closest hit: pass 1 bounds every lane to [t_min, r_near]
    (distant clusters fail the slab's tnear <= t_max), pass 2 re-traverses
    ONLY the pass-1 misses on [r_near, inf) after re-sorting them into
    dense packets.  Exact: closest hit in [tmin,inf) = closest in
    [tmin,r) if one exists else closest in [r,inf).  Returns total MT
    visits normalised per original packet for comparability."""
    n = origins.shape[0]
    c = aabbs.shape[0]
    lo, hi = aabbs[:, 0:3], aabbs[:, 3:6]
    total_visits = 0

    def one_pass(o, d, th, tmin, tmax_init):
        nonlocal total_visits
        for p0 in range(0, len(o), rpt):
            op = o[p0 : p0 + rpt]
            dp = d[p0 : p0 + rpt]
            tp = th[p0 : p0 + rpt]
            oct_ = int(
                (dp[:, 0].mean() > 0) | ((dp[:, 1].mean() > 0) << 1)
                | ((dp[:, 2].mean() > 0) << 2)
            )
            best = np.minimum(np.full(len(op), np.inf), tmax_init)
            for ci in order[oct_, :c]:
                alive = slab(op, dp, lo[ci], hi[ci], tmin, best)
                if alive.any():
                    total_visits += 1
                    in_ci = cluster_of_hit_g[p0 : p0 + rpt] == ci
                    best = np.where(in_ci & (tp <= tmax_init) & (tp >= tmin),
                                    np.minimum(best, tp), best)

    global cluster_of_hit_g
    cluster_of_hit_g = cluster_of_hit
    one_pass(origins, dirs, t_hit, 0.01, r_near)
    near_hit = np.isfinite(t_hit) & (t_hit <= r_near)
    far = ~near_hit
    # Pass 2: re-sorted dense packets of the pass-1 misses.
    o2, d2, t2 = origins[far], dirs[far], t_hit[far]
    cluster_of_hit_g = cluster_of_hit[far]
    one_pass(o2, d2, t2, r_near, np.inf)
    return total_visits / max(1, (n + rpt - 1) // rpt), float(far.mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="suitcase",
                    choices=["suitcase", "monkey", "tower", "highpoly"])
    ap.add_argument("--rays-per-tile", type=int, default=1024)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--bounce", action="store_true",
                    help="also simulate one diffuse bounce batch")
    ap.add_argument("--cluster-size", type=int, default=128,
                    help="rebuild the accel at this cluster size (host sim "
                    "of finer culling; MT tests/lane = visits * K)")
    ap.add_argument("--two-phase", type=float, default=0.0,
                    help="also simulate two-phase traversal with "
                    "r_near = this fraction of the scene diagonal")
    ap.add_argument("--dir-bits", type=int, default=0,
                    help="extra direction bits per axis BELOW the octant "
                    "bits in the sort key (0 = shipped key)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.ops.intersect import intersect_scene
    from tpu_pathtracer.ops.intersect_pallas import octant_sort
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import (
        camera_arrays,
        generate_camera_rays,
    )
    from tpu_pathtracer.scene.builder import load_scene
    from tpu_pathtracer.scene.scene import make_env
    from tpu_pathtracer.utils import rng
    from tpu_pathtracer.utils.image import procedural_hdr

    ref = "/root/reference"
    files, scale, cam_args = {
        "suitcase": (["suitcase.obj", "test.obj"], 0.05,
                     dict(eye=(0, 2, 6), lookat=(0, 0.5, 0))),
        "monkey": (["monkey.obj"], 1.0, dict(eye=(0, 1, 4), lookat=(0, 0.6, 0))),
        "tower": (["tower.obj", "fish.obj", "test.obj"], 1.0,
                  dict(eye=(0, 1.5, 5), lookat=(0, 0.6, 0))),
        "highpoly": ([], 1.0, dict(eye=(0, 3, 10), lookat=(0, 1, 0))),
    }[args.scene]
    env = make_env(procedural_hdr(64, 128))
    if args.scene == "highpoly":
        from tpu_pathtracer.accel.build import build_accel
        from tpu_pathtracer.scene.procedural import high_poly_scene

        scene = build_accel(
            high_poly_scene(total_tris=100_000).replace(env=env),
            kind="cluster", cluster_size=args.cluster_size,
        )
    else:
        scene = load_scene(
            [f"{ref}/{f}" for f in files], scale=scale,
            env=env, rng_seed=0, accel="cluster",
            accel_kw={"cluster_size": args.cluster_size},
        )
    acc = scene.accel
    K = acc.cluster_size
    cfg = RenderConfig(
        width=args.width, height=args.height, samples_per_launch=1,
        dof=False, env_mode="equirect", intersector="cluster",
        use_pallas=False,
    )
    cam = camera_arrays(
        Camera(**cam_args).with_aspect(cfg.width, cfg.height), cfg
    )

    # A mid-frame slab of pixels (the first rows are all sky — perf_notes
    # measurement rules), streaming scanline order, then the shipped
    # spatial sort.
    n = 49152
    start = (args.height // 2 - 20) * args.width
    pix = jnp.arange(start, start + n, dtype=jnp.int32)
    seeds0 = rng.make_seeds(pix, jnp.zeros_like(pix), jnp.int32(1))
    o, d, seeds = generate_camera_rays(
        cam, pix % cfg.width, pix // cfg.width, seeds0, cfg
    )

    sbits = 7 if acc.num_clusters < 256 else 5

    def sort_custom(o, d, db):
        """Shipped spatial key (morton<<3 | octant) with `db` extra
        direction-magnitude bits per axis appended below the octant —
        host-side experiment for the sort-key design space."""
        on, dn = np.asarray(o), np.asarray(d)
        lo = np.asarray(acc.scene_lo)
        hi = np.asarray(acc.scene_hi)
        bits = sbits
        q = np.clip(
            ((on - lo) / np.maximum(hi - lo, 1e-9) * (1 << bits)).astype(np.int64),
            0, (1 << bits) - 1,
        )
        m = np.zeros(len(on), np.int64)
        for b in range(bits):
            for a in range(3):
                m |= ((q[:, a] >> b) & 1) << (3 * b + a)
        octant = (
            (dn[:, 0] > 0).astype(np.int64)
            | ((dn[:, 1] > 0).astype(np.int64) << 1)
            | ((dn[:, 2] > 0).astype(np.int64) << 2)
        )
        key = (m << 3) | octant
        if db:
            mag = np.clip(
                (np.abs(dn) * (1 << db)).astype(np.int64), 0, (1 << db) - 1
            )
            fine = (mag[:, 0] << (2 * db)) | (mag[:, 1] << db) | mag[:, 2]
            key = (key << (3 * db)) | fine
        perm = np.argsort(key, kind="stable")
        return jnp.asarray(on[perm]), jnp.asarray(dn[perm]), None

    def run(label, o, d):
        if args.dir_bits:
            os_, ds_, _ = sort_custom(o, d, args.dir_bits)
        else:
            os_, ds_, _ = octant_sort(
                o, d, scene_lo=acc.scene_lo, scene_hi=acc.scene_hi,
                spatial_bits=sbits,
            )
        hit = intersect_scene(scene, os_, ds_, 0.01, 1e16, cfg)
        th = np.where(np.asarray(hit.hit), np.asarray(hit.t), np.inf)
        global cluster_of_hit
        cluster_of_hit = np.where(
            np.asarray(hit.hit), np.asarray(hit.prim) // K, -1
        )
        aabbs = np.asarray(acc.aabb8)
        order = np.asarray(acc.order)
        on, dn = np.asarray(os_), np.asarray(ds_)
        v0 = traverse(on, dn, th, aabbs, order, args.rays_per_tile, False)
        v1 = traverse(on, dn, th, aabbs, order, args.rays_per_tile, True)
        hitfrac = float(np.isfinite(th).mean())
        hier = ""
        if acc.aabb8_super is not None:
            sh = traverse_hier(
                on, dn, th, np.asarray(acc.aabb8_child),
                np.asarray(acc.aabb8_super), np.asarray(acc.order_super),
                acc.super_branch, args.rays_per_tile, aabbs.shape[0],
            )
            hier = (f"  | hier: scalar {sh[:, 0].mean():6.1f} "
                    f"MT {sh[:, 1].mean():6.2f} (flat scalar {aabbs.shape[0]})")
        two = ""
        if args.two_phase > 0:
            diag = float(np.linalg.norm(
                np.asarray(acc.scene_hi) - np.asarray(acc.scene_lo)
            ))
            v2, far_frac = traverse_two_phase(
                on, dn, th, aabbs, order, args.rays_per_tile,
                args.two_phase * diag,
            )
            two = (f"  | 2phase(r={args.two_phase:g}d): {v2:6.2f} "
                   f"({100*far_frac:.0f}% far)")
        print(
            f"{label:10s} clusters={aabbs.shape[0]:4d} K={K:3d} "
            f"hit-lanes={hitfrac:.2f}  "
            f"MT visits/packet: unseeded {v0.mean():6.2f}  "
            f"ideal-seed {v1.mean():6.2f}  (-{100*(1-v1.mean()/max(v0.mean(),1e-9)):.0f}%)  "
            f"MT tests/lane: {v0.mean()*K:7.0f}{hier}{two}"
        )
        return hit

    hit = run("primary", o, d)

    if args.bounce:
        # One cosine-hemisphere bounce from the hit points (miss lanes
        # re-shoot the same ray — they stay env rays, as in the pool).
        hp = np.asarray(hit.hit)
        t = np.asarray(hit.t)
        on = np.asarray(o)
        dn = np.asarray(d)
        bo = np.where(hp[:, None], on + t[:, None] * dn, on)
        g = np.random.default_rng(0)
        bd = g.normal(size=dn.shape).astype(np.float32)
        bd /= np.linalg.norm(bd, axis=-1, keepdims=True)
        bd = np.where(hp[:, None], bd, dn)
        run("bounce", jnp.asarray(bo), jnp.asarray(bd))


if __name__ == "__main__":
    main()
