"""Probe: triangle-test FORMULATION cost on the VPU (round 5).

On the hero, ~97% of intersect flops are the dense (K,R) Möller–Trumbore
visits (35 slab tests/packet vs 7.9 x (64,1024) MT tests — perf_notes
round 5), purity bound is 1.36x and entry-sort is refuted, so the only
remaining intersect lever is FEWER OPS PER TEST.  This prices three
formulations as standalone Pallas kernels over synthetic packets:

* `mt`    — the shipping Möller–Trumbore (~47 VPU ops incl. 1 div)
* `bw`    — Baldwin–Weber precomputed-transform (12-float rows:
            n, d0=n.v0, p1, c1=-p1.v0, p2, c2=-p2.v0; t from a plane
            test, u/v affine in the hit point; ~39 ops incl. 1 div)
* `mt_nodiv` — MT with inv_det replaced by det (WRONG math, correct op
            count minus the divide): bounds the division's share.

Dense visits (no slab gating) isolate the math; the grid/packet shape
matches the shipping flat kernel (K=64, R=1024).  A correctness arm
checks bw == mt on random triangles to 1e-3 rel before timing.

Run on the real chip:  PYTHONPATH=... python tools/probe_tri_test.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from tpu_pathtracer.ops.intersect_pallas import _mt_tests, _packet_rays

C, K, R = 35, 64, 1024          # hero-shaped cluster set
PACKETS = 512                   # 512*35*64*1024 = 1.17G tests/call
T_MIN, T_MAX = 1e-3, 1e16


def _bw_tests(tri, pr, t_min, t_max):
    """Baldwin–Weber test of one (K,12) precomputed cluster vs the (1,R)
    packet.  Rows: n(0:3), d0(3), p1(4:7), c1(7), p2(8:11), c2(11)."""
    ox, oy, oz, dx, dy, dz, _, _, _ = pr
    nx, ny, nz = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
    d0 = tri[:, 3:4]
    p1x, p1y, p1z, c1 = tri[:, 4:5], tri[:, 5:6], tri[:, 6:7], tri[:, 7:8]
    p2x, p2y, p2z, c2 = tri[:, 8:9], tri[:, 9:10], tri[:, 10:11], tri[:, 11:12]

    den = nx * dx + ny * dy + nz * dz
    num = d0 - (nx * ox + ny * oy + nz * oz)
    rcp = jnp.where(jnp.abs(den) > 1e-12, 1.0 / den, 0.0)
    t = num * rcp
    hx = ox + t * dx
    hy = oy + t * dy
    hz = oz + t * dz
    u = p1x * hx + p1y * hy + p1z * hz + c1
    v = p2x * hx + p2y * hy + p2z * hz + c2
    ok = (
        (jnp.abs(den) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return jnp.where(ok, t, jnp.float32(jnp.inf)), u, v


def _mt_nodiv_tests(tri, pr, t_min, t_max):
    """MT with the divide removed (multiplies by det instead — WRONG
    results, right op count): times the division's share only."""
    ox, oy, oz, dx, dy, dz, _, _, _ = pr
    v0x, v0y, v0z = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
    e1x, e1y, e1z = tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]
    e2x, e2y, e2z = tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = det                                     # <-- the only change
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min) & (t < t_max)
    )
    return jnp.where(ok, t, jnp.float32(jnp.inf)), u, v


def _bw_nodiv_tests(tri, pr, t_min, t_max):
    """BW with the divide replaced by a multiply (WRONG math, right op
    count): bounds the division's share of the bw loop."""
    ox, oy, oz, dx, dy, dz, _, _, _ = pr
    nx, ny, nz = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
    d0 = tri[:, 3:4]
    p1x, p1y, p1z, c1 = tri[:, 4:5], tri[:, 5:6], tri[:, 6:7], tri[:, 7:8]
    p2x, p2y, p2z, c2 = tri[:, 8:9], tri[:, 9:10], tri[:, 10:11], tri[:, 11:12]
    den = nx * dx + ny * dy + nz * dz
    num = d0 - (nx * ox + ny * oy + nz * oz)
    t = num * den                                      # <-- the only change
    hx = ox + t * dx
    hy = oy + t * dy
    hz = oz + t * dz
    u = p1x * hx + p1y * hy + p1z * hz + c1
    v = p2x * hx + p2y * hy + p2z * hz + c2
    ok = (
        (jnp.abs(den) > 1e-12)
        & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > t_min) & (t < t_max)
    )
    return jnp.where(ok, t, jnp.float32(jnp.inf)), u, v


def _bw_minok_tests(tri, pr, t_min, t_max):
    """BW with the 6-compare/5-and validity chain compacted to
    min-reductions (algebraically identical decisions on finite u/v)."""
    ox, oy, oz, dx, dy, dz, _, _, _ = pr
    nx, ny, nz = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
    d0 = tri[:, 3:4]
    p1x, p1y, p1z, c1 = tri[:, 4:5], tri[:, 5:6], tri[:, 6:7], tri[:, 7:8]
    p2x, p2y, p2z, c2 = tri[:, 8:9], tri[:, 9:10], tri[:, 10:11], tri[:, 11:12]
    den = nx * dx + ny * dy + nz * dz
    num = d0 - (nx * ox + ny * oy + nz * oz)
    rcp = jnp.where(jnp.abs(den) > 1e-12, 1.0 / den, 0.0)
    t = num * rcp
    hx = ox + t * dx
    hy = oy + t * dy
    hz = oz + t * dz
    u = p1x * hx + p1y * hy + p1z * hz + c1
    v = p2x * hx + p2y * hy + p2z * hz + c2
    bary_ok = jnp.minimum(jnp.minimum(u, v), 1.0 - (u + v)) >= 0.0
    ok = bary_ok & (t > t_min) & (t < t_max) & (rcp != 0.0)
    return jnp.where(ok, t, jnp.float32(jnp.inf)), u, v


def _kernel(rays_ref, tris_ref, t_ref, *, test_fn):
    pr = _packet_rays(
        rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :],
        rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :],
    )
    best = jnp.full((1, R), jnp.float32(T_MAX))

    def visit(c, best):
        tc, _, _ = test_fn(tris_ref[c], pr, T_MIN, T_MAX)
        return jnp.minimum(best, jnp.min(tc, axis=0, keepdims=True))

    t_ref[:] = jax.lax.fori_loop(0, C, visit, best)


@functools.partial(jax.jit, static_argnames=("name",))
def run(rays, tris, name):
    fn = {"mt": _mt_tests, "bw": _bw_tests, "mt_nodiv": _mt_nodiv_tests,
          "bw_nodiv": _bw_nodiv_tests, "bw_minok": _bw_minok_tests}[name]
    cols = tris.shape[-1]
    # Packets tile the LANE axis of one long (8, P*R) row — the shipping
    # kernels' layout (intersect_pallas.py out_specs).
    return pl.pallas_call(
        functools.partial(_kernel, test_fn=fn),
        grid=(PACKETS,),
        in_specs=[
            pl.BlockSpec((8, R), lambda p: (0, p)),
            pl.BlockSpec((C, K, cols), lambda p: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, R), lambda p: (0, p)),
        out_shape=jax.ShapeDtypeStruct((1, PACKETS * R), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(rays, tris)


def bw_pack(v0, e1, e2):
    """[T,9] -> [T,12] Baldwin–Weber rows."""
    n = np.cross(e1, e2)
    nn = np.maximum((n * n).sum(-1, keepdims=True), 1e-30)
    p1 = np.cross(e2, n) / nn
    p2 = np.cross(n, e1) / nn
    d0 = (n * v0).sum(-1, keepdims=True)
    c1 = -(p1 * v0).sum(-1, keepdims=True)
    c2 = -(p2 * v0).sum(-1, keepdims=True)
    return np.concatenate([n, d0, p1, c1, p2, c2], axis=-1).astype(np.float32)


def main():
    rng = np.random.RandomState(0)
    v0 = rng.uniform(-4, 4, (C * K, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (C * K, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (C * K, 3)).astype(np.float32)
    tris_mt = np.concatenate(
        [v0, e1, e2, np.zeros((C * K, 7), np.float32)], axis=-1
    ).reshape(C, K, 16)
    tris_bw = bw_pack(v0, e1, e2).reshape(C, K, 12)

    rays = rng.uniform(-6, 6, (8, PACKETS * R)).astype(np.float32)
    d = rays[3:6, :]
    d /= np.maximum(np.sqrt((d * d).sum(0, keepdims=True)), 1e-9)

    rays_j = jnp.asarray(rays)
    arms = {"mt": jnp.asarray(tris_mt), "bw": jnp.asarray(tris_bw),
            "mt_nodiv": jnp.asarray(tris_mt),
            "bw_nodiv": jnp.asarray(tris_bw),
            "bw_minok": jnp.asarray(tris_bw)}

    # Correctness: bw == mt winner-t to 1e-3 rel (discrete flips aside).
    t_mt = np.asarray(run(rays_j, arms["mt"], "mt"))
    t_bw = np.asarray(run(rays_j, arms["bw"], "bw"))
    both = (t_mt < T_MAX) & (t_bw < T_MAX)
    rel = np.abs(t_mt[both] - t_bw[both]) / np.maximum(t_mt[both], 1e-6)
    hit_agree = float(((t_mt < T_MAX) == (t_bw < T_MAX)).mean())
    print(f"bw-vs-mt: hit agree {hit_agree:.6f}, "
          f"max rel t err {rel.max():.2e}, frac>1e-3 {(rel > 1e-3).mean():.2e}")
    # bw_minok must be DECISION-identical to bw (algebraic compaction).
    t_mk = np.asarray(run(rays_j, arms["bw_minok"], "bw_minok"))
    print(f"minok-vs-bw: identical {bool((t_mk == t_bw).all())}")

    tests = PACKETS * C * K * R
    for name, tris in arms.items():
        run(rays_j, tris, name).block_until_ready()      # compile + warm
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(rays_j, tris, name)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:9s} {dt * 1e3:8.2f} ms/call  "
              f"{tests / dt / 1e9:7.2f} G tests/s")


if __name__ == "__main__":
    main()
