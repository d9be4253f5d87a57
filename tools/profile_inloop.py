"""Differential in-loop stage profiler (the only trustworthy method here).

Measurement rules learned the hard way on the tunneled v5e:
* every top-level dispatch carries ~30 ms of fixed overhead -> measure the
  *marginal* cost of one iteration inside a jitted fori_loop (K vs 2K);
* the runtime memoizes identical executions -> salt every timed call;
* loop feedback must change values *meaningfully* (above f32 ulp) or
  entire stages can vanish from the timeline.

Usage: python tools/profile_inloop.py [--lanes N] [--scene suitcase|monkey|highpoly]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=262144)
    ap.add_argument("--scene", default="suitcase")
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--only", default="", help="substring filter on probe names")
    args = ap.parse_args()

    from tpu_pathtracer.utils.logging import enable_compile_cache

    enable_compile_cache()

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.ops.gather import gather_rows
    from tpu_pathtracer.ops.intersect import intersect_scene
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.envmap import eval_env
    from tpu_pathtracer.render.integrator import (
        _shade,
        _trace_bounce,
        camera_arrays,
        generate_camera_rays,
    )
    from tpu_pathtracer.render.texsample import sample_bundle
    from tpu_pathtracer.scene import scene as S
    from tpu_pathtracer.scene.scene import make_env
    from tpu_pathtracer.utils import rng
    from tpu_pathtracer.utils.image import procedural_hdr

    env = make_env(procedural_hdr(256, 512))
    ref = "/root/reference"
    camera = Camera(eye=(0.0, 2.0, 6.0), lookat=(0.0, 0.5, 0.0))
    if args.scene == "suitcase":
        from tpu_pathtracer.scene.builder import load_scene

        scene = load_scene(
            [f"{ref}/suitcase.obj", f"{ref}/test.obj"],
            scale=0.05, env=env, rng_seed=0, accel="cluster",
        )
    elif args.scene == "monkey":
        from tpu_pathtracer.scene.builder import load_scene

        scene = load_scene(
            [f"{ref}/monkey.obj"], scale=1.0, env=env, rng_seed=0,
            accel="cluster",
        )
        camera = Camera(eye=(0, 1, 4), lookat=(0, 0.6, 0))
    else:
        from tpu_pathtracer.accel.build import build_accel
        from tpu_pathtracer.scene.procedural import high_poly_scene

        scene = build_accel(
            high_poly_scene(total_tris=100_000).replace(env=env), kind="cluster"
        )
        camera = Camera(eye=(0, 3, 10), lookat=(0, 1, 0))

    n = args.lanes
    cfgK = RenderConfig(
        width=1920, height=1080, samples_per_launch=10, max_depth=8,
        dof=False, env_mode="equirect", intersector="cluster",
    )
    cfgB = cfgK.replace(intersector="brute")
    cam = camera_arrays(camera.with_aspect(cfgK.width, cfgK.height), cfgK)
    print(f"scene={args.scene} tris={scene.num_triangles} lanes={n}")

    # Center the lane window on the frame: the first n pixels of a 1080p
    # frame are all sky (top scanlines), which makes every packet cull and
    # "intersect" measure ~0.  The middle of the frame sees the scene.
    n_pix_total = cfgK.width * cfgK.height
    start = max(0, (n_pix_total - n) // 2)
    pix = (start + jnp.arange(n, dtype=jnp.int32)) % n_pix_total
    seeds0 = rng.make_seeds(pix, jnp.zeros_like(pix), jnp.int32(0))
    o0, d0, seeds0 = generate_camera_rays(
        cam, pix % cfgK.width, pix // cfgK.width, seeds0, cfgK
    )
    o0 = jax.block_until_ready(o0)
    depth8 = jnp.full_like(pix, 8)

    salt = [0]
    K = args.k

    def measure(name, body):
        """body(scene, o, d, seeds) -> (o', d', seeds') with MEANINGFUL
        feedback (o' must differ from o by > ulp)."""
        if args.only and args.only not in name:
            return None

        def loop(sc, o, d, s, saltv, iters):
            def step(i, st):
                o_, d_, s_ = st
                return body(sc, o_, d_, s_)
            return jax.lax.fori_loop(
                0, iters, step, (o + saltv, d, s)
            )[0].sum()

        jl = jax.jit(loop)

        def run(iters):
            salt[0] += 1
            sv = jnp.float32(salt[0] * 1e-3)
            t0 = time.perf_counter()
            # float() readback: on axon, block_until_ready alone can return
            # before remote execution finishes (measured 0.0 ms "runs").
            float(jl(scene, o0, d0, seeds0, sv, iters))
            return time.perf_counter() - t0

        run(K); run(2 * K)  # compile both shapes
        tK = min(run(K) for _ in range(3))
        t2K = min(run(2 * K) for _ in range(3))
        m = (t2K - tK) / K
        print(f"{name:26s}: {m*1e3:7.2f} ms/iter ({n/max(m,1e-9)/1e6:7.1f} M/s)"
              f"  [abs {tK*1e3:6.1f}/{t2K*1e3:6.1f}]")
        return m

    def clipt(hit):
        return 0.001 * jnp.minimum(hit.t, 10.0)

    # ---- intersect alone ------------------------------------------------
    def intersect_only(cfg):
        def body(sc, o, d, s):
            hit = intersect_scene(sc, o, d, 0.01, 1e16, cfg)
            return (o + clipt(hit)[:, None] * d, d, s)
        return body

    measure("intersect kernel", intersect_only(cfgK))
    measure("intersect nosort", intersect_only(cfgK.replace(sort_rays="off")))
    measure("intersect db1", intersect_only(cfgK.replace(sort_dir_bits=1)))
    measure("intersect db2", intersect_only(cfgK.replace(sort_dir_bits=2)))
    measure("intersect brute", intersect_only(cfgB))

    # ---- + attribute lookups -------------------------------------------
    def k_attrs(sc, o, d, s):
        hit = intersect_scene(sc, o, d, 0.01, 1e16, cfgK)
        prim = jnp.maximum(hit.prim, 0)
        ta = gather_rows(sc.tri_attrs, prim)
        ma = gather_rows(sc.materials.attrs, ta[:, S.TRI_MAT].astype(jnp.int32))
        return (o + clipt(hit)[:, None] * d + 1e-5 * (ta[:, 0:3] + ma[:, 0:3]),
                d, s)

    measure("kernel+attrs", k_attrs)

    # ---- + texture bundle ------------------------------------------------
    def k_tex(sc, o, d, s):
        hit = intersect_scene(sc, o, d, 0.01, 1e16, cfgK)
        prim = jnp.maximum(hit.prim, 0)
        ta = gather_rows(sc.tri_attrs, prim)
        ma = gather_rows(sc.materials.attrs, ta[:, S.TRI_MAT].astype(jnp.int32))
        bs = sample_bundle(
            sc.materials.texture_bundles,
            ma[:, S.MAT_BUNDLE_OFFSET].astype(jnp.int32),
            ma[:, S.MAT_BUNDLE_WIDTH].astype(jnp.int32),
            ma[:, S.MAT_BUNDLE_HEIGHT].astype(jnp.int32),
            hit.bary[:, 0], hit.bary[:, 1],
            morton=sc.materials.bundled_morton,
            scrambled=sc.materials.bundled_scrambled,
            active=hit.hit,
        )
        return (o + clipt(hit)[:, None] * d + 1e-5 * bs[0], d, s)

    measure("kernel+attrs+bundle", k_tex)

    # ---- + env ------------------------------------------------------------
    def k_env(sc, o, d, s):
        hit = intersect_scene(sc, o, d, 0.01, 1e16, cfgK)
        e = eval_env(sc.env, d, cfgK)
        return (o + clipt(hit)[:, None] * d + 1e-5 * e, d, s)

    measure("kernel+env", k_env)

    # ---- full shade --------------------------------------------------------
    def k_shade(cfg):
        def body(sc, o, d, s):
            hit = intersect_scene(sc, o, d, 0.01, 1e16, cfg)
            sh = _shade(sc, cfg, hit, o, d, s, depth8)
            return (jnp.where(hit.hit[:, None], sh["new_origin"], o + 0.001 * d),
                    jnp.where(hit.hit[:, None], sh["new_direction"], d),
                    sh["seeds"])
        return body

    measure("kernel+full shade", k_shade(cfgK))
    measure("brute+full shade", k_shade(cfgB))

    # ---- full bounce (the real body) ----------------------------------------
    att = jnp.ones_like(o0)
    rad = jnp.zeros_like(o0)
    spec = jnp.ones_like(pix, dtype=bool)

    def k_bounce(cfg):
        def body(sc, o, d, s):
            tb = _trace_bounce(sc, cfg, o, d, att, rad, s, depth8, spec)
            return (tb["origin"] + 1e-5 * tb["radiance"],
                    tb["direction"], tb["seeds"])
        return body

    measure("full bounce kernel", k_bounce(cfgK))
    measure("full bounce deferred", k_bounce(cfgK.replace(deferred_shade=True)))
    measure("full bounce brute", k_bounce(cfgB))

    # ---- NEE adders: occlusion pass alone, then the full NEE bounce ------
    from tpu_pathtracer.ops.intersect import occluded_scene
    from tpu_pathtracer.render.envmap import sample_env_alias, with_importance_sampling

    scene_is = scene.replace(env=with_importance_sampling(scene.env))
    cfgN = cfgK.replace(env_importance_sampling=True, rr_mode="standard")

    def k_occl(sc, o, d, s):
        occ = occluded_scene(sc, o, d, 0.01, 1e16, cfgK)
        return (o + 0.001 * d + 1e-5 * occ[:, None].astype(jnp.float32), d, s)

    def k_occl_nosort(sc, o, d, s):
        # NEE shadow rays start at the (already sorted) hit points: does
        # the second spatial sort inside occluded_scene pay for itself?
        occ = occluded_scene(sc, o, d, 0.01, 1e16,
                             cfgK.replace(sort_rays="off"))
        return (o + 0.001 * d + 1e-5 * occ[:, None].astype(jnp.float32), d, s)

    def k_alias(sc, o, d, s):
        s, u1, u2 = rng.uniform2(s)
        s, u3, u4 = rng.uniform2(s)
        env_dir, pdf, env_u, env_v = sample_env_alias(
            sc.env.alias_table, sc.env.height, sc.env.width, u1, u2, u3, u4
        )
        e = eval_env(sc.env, env_dir, cfgK, uv=(env_u, env_v))
        return (o + 0.001 * d + 1e-5 * (e + pdf[:, None]), env_dir, s)

    def k_bounce_nee(sc, o, d, s):
        tb = _trace_bounce(sc, cfgN, o, d, att, rad, s, depth8, spec)
        return (tb["origin"] + 1e-5 * tb["radiance"],
                tb["direction"], tb["seeds"])

    scene_sv = scene
    scene = scene_is  # measure() closes over `scene`
    measure("occluded pass", k_occl)
    measure("occluded pass nosort", k_occl_nosort)
    measure("alias+env eval", k_alias)
    measure("full bounce NEE", k_bounce_nee)
    scene = scene_sv

    # ---- queue/respawn decomposition (VERDICT r2 next #4) ----------------
    from tpu_pathtracer.ops.scan import cumsum_i32

    def k_camregen(sc, o, d, s):
        o_r, d_r, s_r = generate_camera_rays(
            cam, pix % cfgK.width, pix // cfgK.width, s, cfgK
        )
        return (o + 1e-5 * o_r + 0.001 * d, d_r, s_r)

    def k_cumsum(sc, o, d, s):
        done = o[:, 0] > o[:, 1]
        inc = cumsum_i32(done.astype(jnp.int32))
        return (o + 1e-6 * inc[:, None].astype(jnp.float32) + 0.001 * d, d, s)

    measure("camera regen (all lanes)", k_camregen)
    measure("queue cumsum", k_cumsum)


if __name__ == "__main__":
    main()
