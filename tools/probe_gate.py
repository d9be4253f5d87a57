"""Probe: what does the per-cluster GATE cost in the flat kernel? (round 5)

Dense math runs at 53 G tests/s (probe_winner) => the hero's ~505
gated tests/ray should cost ~9.5 ns/segment, yet end-to-end intersect
measures ~4x that.  Suspect: the 35 per-visit `jnp.any(overlap)` ->
scalar branch gates — each is a vector reduce + VPU->scalar sync +
branch, a pipeline stall the dense probes never pay.

Arms (real suitcase scene, real camera rays, the shipping wrapper's
tiling and sort):

* ship    — the shipping flat kernel (gates + front-to-back t_acc)
* nogate  — all C clusters visited densely, no slab tests, no order
            lookups, no syncs (per-ray 4.4x the tests, zero stalls)
* mathless— gates exactly as shipped, but the visit body reduced to a
            trivial t_acc update (prices gates+slabs alone)

If nogate ~ ship on the hero (C=35), the gate syncs eat everything the
culling saves and small-C scenes should skip gating entirely.

Run:  PYTHONPATH=/root/.axon_site:. python tools/probe_gate.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pathtracer.ops.intersect_pallas import (
    _BIG_PRIM, _TRI_TESTS, _bounds_scalar, _mt_best, _octant_of,
    _packet_rays, _slab_hits, _vmem_params,
)

T_MIN, T_MAX = 1e-2, 1e16


def _kernel(aabb_ref, order_ref, rays_ref, tris_ref, t_ref, prim_ref,
            t_acc, p_acc, *, num_clusters, cluster_k, mode, tri_test):
    pr = _packet_rays(
        rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :],
        rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :],
    )
    t_acc[:] = jnp.full_like(t_acc, T_MAX)
    p_acc[:] = jnp.full_like(p_acc, _BIG_PRIM)
    octant = _octant_of(rays_ref[3, 0], rays_ref[4, 0], rays_ref[5, 0])

    def tri_visit(c):
        tc, u, v = _TRI_TESTS[tri_test](tris_ref[c], pr, T_MIN, T_MAX)
        t_blk, prim_blk, _, _ = _mt_best(tc, u, v, c, cluster_k)
        best = t_acc[:]
        improved = t_blk < best
        t_acc[:] = jnp.where(improved, t_blk, best)
        p_acc[:] = jnp.where(improved, prim_blk, p_acc[:])

    if mode == "nogate":
        def visit(c, _):
            tri_visit(c)
            return 0
    elif mode == "mathless":
        def visit(pos, _):
            c = order_ref[octant, pos]
            overlap = _slab_hits(_bounds_scalar(aabb_ref, c), pr, T_MIN,
                                 t_acc[:])

            @pl.when(jnp.any(overlap))
            def _():
                # Trivial body: keeps the gate + branch shape, no tri math.
                t_acc[:] = jnp.minimum(t_acc[:], T_MAX)

            return 0
    else:  # ship
        def visit(pos, _):
            c = order_ref[octant, pos]
            overlap = _slab_hits(_bounds_scalar(aabb_ref, c), pr, T_MIN,
                                 t_acc[:])

            @pl.when(jnp.any(overlap))
            def _():
                tri_visit(c)

            return 0

    jax.lax.fori_loop(0, num_clusters, visit, 0)
    t_ref[:] = t_acc[:]
    prim_ref[:] = p_acc[:]


@functools.partial(jax.jit, static_argnames=("mode", "tri_test", "r"))
def run(tris, aabb8, order, rays, mode, tri_test, r=1024):
    c, k, _ = tris.shape
    n_pad = rays.shape[1]
    kernel = functools.partial(
        _kernel, num_clusters=c, cluster_k=k, mode=mode, tri_test=tri_test)
    return pl.pallas_call(
        kernel,
        grid=(n_pad // r,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, r), lambda i: (0, i)),
            pl.BlockSpec((c, k, tris.shape[2]), lambda i: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, r), lambda i: (0, i)),
            pl.BlockSpec((1, r), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, r), jnp.float32),
            pltpu.VMEM((1, r), jnp.int32),
        ],
        compiler_params=_vmem_params(tris.size * 4, r, k),
        interpret=jax.default_backend() != "tpu",
    )(aabb8, order, rays, tris)


def main():
    from tpu_pathtracer.utils.logging import enable_compile_cache

    enable_compile_cache()

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import (
        camera_arrays, generate_camera_rays)
    from tpu_pathtracer.scene.builder import load_scene
    from tpu_pathtracer.scene.scene import make_env
    from tpu_pathtracer.utils import rng
    from tpu_pathtracer.utils.image import procedural_hdr
    from tpu_pathtracer.ops.intersect_pallas import octant_sort

    ref = "/root/reference"
    scene = load_scene([f"{ref}/suitcase.obj", f"{ref}/test.obj"],
                       scale=0.05, env=make_env(procedural_hdr(64, 128)),
                       rng_seed=0, accel="cluster")
    acc = scene.accel
    cfg = RenderConfig(width=1920, height=1080, samples_per_launch=10,
                       max_depth=8, dof=False, intersector="cluster")
    cam = camera_arrays(
        Camera(eye=(0.0, 2.0, 6.0), lookat=(0.0, 0.5, 0.0))
        .with_aspect(cfg.width, cfg.height), cfg)

    n = 131072
    n_pix = cfg.width * cfg.height
    start = (n_pix - n) // 2
    pix = start + jnp.arange(n, dtype=jnp.int32)
    seeds = rng.make_seeds(pix, jnp.zeros_like(pix), jnp.int32(0))
    o, d, _ = generate_camera_rays(cam, pix % cfg.width, pix // cfg.width,
                                   seeds, cfg)
    # Shipping policy: octant-sorted packets (hero auto: pure octant key).
    o_s, d_s, _ = octant_sort(o, d)

    rays = jnp.zeros((8, n), jnp.float32)
    rays = rays.at[0:3].set(o_s.T).at[3:6].set(d_s.T)
    rays = jax.block_until_ready(rays)

    c, k, _ = acc.tris16.shape
    print(f"suitcase: C={c} K={k} lanes={n} (sorted primary rays)")
    tris = {"mt": acc.tris16, "bw": acc.tris16bw}
    name = "bw" if acc.tris16bw is not None else "mt"

    # Correctness: nogate == ship on (t, prim).
    ts, ps = (np.asarray(x) for x in run(tris[name], acc.aabb8, acc.order,
                                         rays, "ship", name))
    tn, pn = (np.asarray(x) for x in run(tris[name], acc.aabb8, acc.order,
                                         rays, "nogate", name))
    print(f"nogate-vs-ship: t identical {bool((ts == tn).all())}, "
          f"prim identical {bool((ps == pn).all())}")

    for mode in ("ship", "nogate", "mathless"):
        out = run(tris[name], acc.aabb8, acc.order, rays, mode, name)
        out[0].block_until_ready()
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(tris[name], acc.aabb8, acc.order, rays, mode, name)
        out[0].block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(f"{mode:9s} {dt * 1e3:8.3f} ms/call  "
              f"{n / dt / 1e6:7.1f} M rays/s  ({dt / n * 1e9:5.1f} ns/ray)")


if __name__ == "__main__":
    main()
