"""Per-stage TPU microbenchmark for the wavefront integrator.

Times each hot stage (intersect variants, shade, env, trace_bounce, full
frame) at stream-lane batch size on the suitcase hero scene, with both
primary (coherent) and bounced (incoherent) ray distributions.  This is
the measurement harness behind docs/perf_notes.md.

Usage: python tools/profile_stages.py [--lanes N] [--scene suitcase|monkey|highpoly]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.tree.map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out,
    )
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.tree.map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out,
        )
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=262144)
    ap.add_argument("--scene", default="suitcase")
    ap.add_argument("--depth", type=int, default=8)
    args = ap.parse_args()

    from tpu_pathtracer.utils.logging import enable_compile_cache

    enable_compile_cache()

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import (
        _shade,
        _trace_bounce,
        camera_arrays,
        generate_camera_rays,
        render_frame,
    )
    from tpu_pathtracer.render.envmap import eval_env
    from tpu_pathtracer.ops.intersect import intersect_brute, intersect_scene
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
    cfg = RenderConfig(
        width=1920, height=1080, samples_per_launch=10, max_depth=args.depth,
        dof=False, env_mode="equirect", intersector="cluster",
    )
    cam = camera_arrays(camera.with_aspect(cfg.width, cfg.height), cfg)
    t = int(scene.num_triangles)
    print(f"scene={args.scene} tris={t} lanes={n}")

    # ---- ray populations -------------------------------------------------
    pix = jnp.arange(n, dtype=jnp.int32) % (cfg.width * cfg.height)
    seeds = rng.make_seeds(pix, jnp.zeros_like(pix), jnp.int32(0))
    o_prim, d_prim, seeds = generate_camera_rays(
        cam, pix % cfg.width, pix // cfg.width, seeds, cfg
    )

    @jax.jit
    def one_bounce(scene, o, d, seeds):
        hit = intersect_scene(scene, o, d, cfg.t_min, cfg.t_max, cfg)
        sh = _shade(scene, cfg, hit, o, d, seeds, jnp.full_like(pix, 8))
        return (
            jnp.where(hit.hit[:, None], sh["new_origin"], o),
            jnp.where(hit.hit[:, None], sh["new_direction"], d),
            sh["seeds"],
            hit.hit,
        )

    o_sec, d_sec, seeds2, hitmask = one_bounce(scene, o_prim, d_prim, seeds)
    o_sec.block_until_ready()
    frac_hit = float(jnp.mean(hitmask.astype(jnp.float32)))
    print(f"primary hit fraction: {frac_hit:.3f}")

    # ---- intersect variants ----------------------------------------------
    brute = jax.jit(
        lambda sc, o, d: intersect_brute(sc.vertices, o, d, cfg.t_min, cfg.t_max)
    )
    cl_xla = jax.jit(
        lambda sc, o, d: sc.accel._intersect_xla(
            sc.vertices, o, d, cfg.t_min, cfg.t_max, cfg
        )
    ) if scene.accel is not None else None
    cl = jax.jit(
        lambda sc, o, d: intersect_scene(sc, o, d, cfg.t_min, cfg.t_max, cfg)
    )

    for name, rays in (("primary", (o_prim, d_prim)), ("bounce", (o_sec, d_sec))):
        tb = timeit(brute, scene, *rays)
        print(f"intersect brute    [{name}]: {tb*1e3:8.2f} ms  "
              f"({n/tb/1e6:7.1f} Mrays/s)")
        if cl_xla is not None:
            tx = timeit(cl_xla, scene, *rays)
            print(f"intersect XLA-clus [{name}]: {tx*1e3:8.2f} ms  "
                  f"({n/tx/1e6:7.1f} Mrays/s)")
        tc = timeit(cl, scene, *rays)
        print(f"intersect dispatch [{name}]: {tc*1e3:8.2f} ms  "
              f"({n/tc/1e6:7.1f} Mrays/s)")

    # ---- shade / env ------------------------------------------------------
    hit = cl(scene, o_prim, d_prim)
    shade_fn = jax.jit(
        lambda sc, h, o, d, s: _shade(sc, cfg, h, o, d, s, jnp.full_like(pix, 8))
    )
    ts = timeit(shade_fn, scene, hit, o_prim, d_prim, seeds)
    print(f"shade (all lanes):           {ts*1e3:8.2f} ms  ({n/ts/1e6:7.1f} Mlanes/s)")

    env_fn = jax.jit(lambda e, d: eval_env(e, d, cfg))
    te = timeit(env_fn, scene.env, d_prim)
    print(f"env eval (all lanes):        {te*1e3:8.2f} ms  ({n/te/1e6:7.1f} Mlanes/s)")

    # ---- full bounce ------------------------------------------------------
    att = jnp.ones_like(o_prim)
    rad = jnp.zeros_like(o_prim)
    depth = jnp.full_like(pix, 8)
    spec = jnp.ones_like(pix, dtype=bool)
    tbounce_fn = jax.jit(
        lambda sc, o, d, s: _trace_bounce(sc, cfg, o, d, att, rad, s, depth, spec)
    )
    for name, rays, s_ in (
        ("primary", (o_prim, d_prim), seeds),
        ("bounce", (o_sec, d_sec), seeds2),
    ):
        tt = timeit(tbounce_fn, scene, *rays, s_)
        print(f"trace_bounce [{name}]:        {tt*1e3:8.2f} ms  "
              f"({n/tt/1e6:7.1f} Mrays/s)")

    # ---- end-to-end frame --------------------------------------------------
    tf = timeit(render_frame, scene, cam, cfg, jnp.int32(1), reps=3, warmup=1)
    print(f"render_frame 1080p x{cfg.samples_per_launch}spp: {tf*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
