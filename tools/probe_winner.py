"""Probe: WINNER-TRACKING cost inside the traversal loop (round 5).

probe_tri_test.py priced the triangle-test math alone (bw_minok 56
G tests/s dense) but the shipping visit also runs `_mt_best` + the
4-accumulator merge: per test that is ~5 extra (K,R) ops just for the
u/v winner selects (win mask + 2x where + 2x min-reduce).  The winner's
barycentrics can instead be recomputed OUTSIDE the kernel from
(t, prim) — one one-hot MXU gather per bounce, riding the same machinery
`_shade` already pays (ops/gather.py) — so this prices three visit
bodies, all on bw_minok math and the shipping (K,R) layout:

* `full`  — shipping visit: _mt_best (t, prim, u, v) + 4-acc merge
* `nouv`  — track (t, prim) only; u/v recomputed post-kernel (not timed
            here; priced separately below as a one-hot gather)
* `lazy`  — per-SUBLANE running (t_run, c_run) (K,R) accumulators:
            cmp + 2 where per visit, one extraction after the loop.
            Changes equal-t tie-breaks to visit order (shipping is
            lowest-global-id), so it must beat `nouv` clearly to be
            worth the semantic ripple.

Run on the real chip:  PYTHONPATH=. python tools/probe_winner.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from tpu_pathtracer.ops.intersect_pallas import (
    _BIG_PRIM, _bw_tests, _mt_best, _packet_rays,
)
from tools.probe_tri_test import bw_pack

C, K, R = 35, 64, 1024
PACKETS = 512
T_MIN, T_MAX = 1e-3, 1e16


def _kernel(rays_ref, tris_ref, t_ref, p_ref, *, mode):
    pr = _packet_rays(
        rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :],
        rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :],
    )
    if mode == "lazy":
        t_run = jnp.full((K, R), jnp.float32(T_MAX))
        c_run = jnp.zeros((K, R), jnp.int32)

        def visit(c, carry):
            t_run, c_run = carry
            tc, _, _ = _bw_tests(tris_ref[c], pr, T_MIN, T_MAX)
            imp = tc < t_run
            return (jnp.where(imp, tc, t_run), jnp.where(imp, c, c_run))

        t_run, c_run = jax.lax.fori_loop(0, C, visit, (t_run, c_run))
        t_best = jnp.min(t_run, axis=0, keepdims=True)
        win = t_run == t_best
        gid = c_run * K + jax.lax.broadcasted_iota(jnp.int32, t_run.shape, 0)
        p_best = jnp.min(jnp.where(win, gid, _BIG_PRIM), axis=0,
                         keepdims=True)
        t_ref[:] = t_best
        p_ref[:] = p_best
        return

    t_acc = jnp.full((1, R), jnp.float32(T_MAX))
    p_acc = jnp.full((1, R), _BIG_PRIM)
    u_acc = jnp.zeros((1, R), jnp.float32)
    v_acc = jnp.zeros((1, R), jnp.float32)

    def visit(c, carry):
        t_acc, p_acc, u_acc, v_acc = carry
        tc, u, v = _bw_tests(tris_ref[c], pr, T_MIN, T_MAX)
        if mode == "full":
            t_blk, prim_blk, u_blk, v_blk = _mt_best(tc, u, v, c, K)
            improved = t_blk < t_acc
            return (
                jnp.where(improved, t_blk, t_acc),
                jnp.where(improved, prim_blk, p_acc),
                jnp.where(improved, u_blk, u_acc),
                jnp.where(improved, v_blk, v_acc),
            )
        # nouv: t + lowest-gid prim, no u/v selects
        t_blk = jnp.min(tc, axis=0, keepdims=True)
        gid = c * K + jax.lax.broadcasted_iota(jnp.int32, tc.shape, 0)
        prim_blk = jnp.min(jnp.where(tc == t_blk, gid, _BIG_PRIM),
                           axis=0, keepdims=True)
        improved = t_blk < t_acc
        return (
            jnp.where(improved, t_blk, t_acc),
            jnp.where(improved, prim_blk, p_acc),
            u_acc, v_acc,
        )

    t_acc, p_acc, _, _ = jax.lax.fori_loop(
        0, C, visit, (t_acc, p_acc, u_acc, v_acc))
    t_ref[:] = t_acc
    p_ref[:] = p_acc


@functools.partial(jax.jit, static_argnames=("mode",))
def run(rays, tris, mode):
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(PACKETS,),
        in_specs=[
            pl.BlockSpec((8, R), lambda p: (0, p)),
            pl.BlockSpec((C, K, 12), lambda p: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, R), lambda p: (0, p)),
            pl.BlockSpec((1, R), lambda p: (0, p)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, PACKETS * R), jnp.float32),
            jax.ShapeDtypeStruct((1, PACKETS * R), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(rays, tris)


def main():
    rng = np.random.RandomState(0)
    v0 = rng.uniform(-4, 4, (C * K, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (C * K, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (C * K, 3)).astype(np.float32)
    tris = jnp.asarray(bw_pack(v0, e1, e2).reshape(C, K, 12))

    rays = rng.uniform(-6, 6, (8, PACKETS * R)).astype(np.float32)
    d = rays[3:6, :]
    d /= np.maximum(np.sqrt((d * d).sum(0, keepdims=True)), 1e-9)
    rays_j = jnp.asarray(rays)

    # Correctness: nouv must match full on (t, prim) bit-exactly.
    tf, pf = (np.asarray(x) for x in run(rays_j, tris, "full"))
    tn, pn = (np.asarray(x) for x in run(rays_j, tris, "nouv"))
    print(f"nouv-vs-full: t identical {bool((tf == tn).all())}, "
          f"prim identical {bool((pf == pn).all())}")
    tl, plz = (np.asarray(x) for x in run(rays_j, tris, "lazy"))
    print(f"lazy-vs-full: t identical {bool((tf == tl).all())}, "
          f"prim agree {float((pf == plz).mean()):.6f} "
          f"(ties resolve by visit order)")

    tests = PACKETS * C * K * R
    for mode in ("full", "nouv", "lazy"):
        run(rays_j, tris, mode)[0].block_until_ready()
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(rays_j, tris, mode)
        out[0].block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(f"{mode:5s} {dt * 1e3:8.2f} ms/call  "
              f"{tests / dt / 1e9:7.2f} G tests/s")

    # Price the post-kernel uv recompute: one-hot gather of the winner's
    # 12 bw floats at hero scale (131072 lanes, C*K rows), XLA-side.
    n = 131072
    prim = jnp.asarray(rng.randint(0, C * K, n), jnp.int32)
    rows = tris.reshape(C * K, 12)

    @jax.jit
    def uv_gather(prim, rows):
        from tpu_pathtracer.ops.gather import gather_rows
        return gather_rows(rows, prim)

    uv_gather(prim, rows).block_until_ready()
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = uv_gather(prim, rows)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"uv one-hot gather @131k lanes: {dt * 1e3:.3f} ms/bounce")


if __name__ == "__main__":
    main()
