"""Pallas TPU kernel: packet-style cluster traversal + Möller–Trumbore.

This is the software replacement for the reference's hardware ray-tracing
core (`optixTraverse` over a driver-built BVH + SER re-sorting, reference
optixSphere.cu:99-118) designed for how a TPU actually executes:

* The grid partitions the ray batch into tiles of R rays; each grid step
  owns one tile ("ray packet").
* The whole clustered scene (Morton-ordered clusters of K triangles, 16
  floats per triangle, component-column layout [C,K,16]) lives in VMEM —
  at reference scene sizes that is a few hundred KB, i.e. the scene rides
  next to the compute units for the entire launch.
* Per cluster, the packet does a vectorised slab test of all R rays
  against the cluster AABB (reading the packet's *current* best-t, so
  closed tiles shrink), reduces to ONE scalar, and `pl.when` skips the
  whole K-triangle test when no ray in the packet can hit — a *real*
  branch on TPU, unlike `where` masking.  This per-tile scalar skip is
  what XLA's batch-level `lax.cond` cannot express (its predicate spans
  the whole launch).
* Triangle tests are dense (R,K) component-unrolled VPU ops — the same
  ~50 G tests/s inner loop as ops/intersect.py, minus all the XLA loop
  and HBM-temp overhead.

Coherence (the reference's `optixReorder`) comes from outside: primary
rays arrive in pixel order; secondary rays can be octant/Morton-sorted by
ops/sort_rays before the trace.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_PRIM = np.int32(0x7FFFFFFF)


# ---------------------------------------------------------------------------
# Shared kernel-body helpers.  Every traversal kernel (flat/hier/streamed x
# closest-hit/any-hit) is the same three primitives composed differently;
# keeping them in ONE place stops the tnear/tfar/t_min gating and the MT
# epsilon conventions from drifting between copies (advisor r4).  All are
# traced inline by Pallas — zero call overhead in the compiled kernel.
# ---------------------------------------------------------------------------


def _packet_rays(ox, oy, oz, dx, dy, dz):
    """Packet-ray tuple: origin/direction (1,R) rows plus guarded inverse
    directions (|d| <= 1e-12 -> huge, so degenerate slabs cull cleanly)."""
    big = jnp.float32(3.4e38)
    ix = jnp.where(jnp.abs(dx) > 1e-12, 1.0 / dx, big)
    iy = jnp.where(jnp.abs(dy) > 1e-12, 1.0 / dy, big)
    iz = jnp.where(jnp.abs(dz) > 1e-12, 1.0 / dz, big)
    return ox, oy, oz, dx, dy, dz, ix, iy, iz


def _octant_of(dxs, dys, dzs):
    """Packet octant from one representative ray's direction scalars.

    Input rays are octant-sorted, so packets are near-uniform; a mixed
    boundary packet only loses ordering quality, never correctness."""
    return (
        (dxs > 0.0).astype(jnp.int32)
        + 2 * (dys > 0.0).astype(jnp.int32)
        + 4 * (dzs > 0.0).astype(jnp.int32)
    )


def _bounds_scalar(ref, idx):
    """Six AABB bound scalars from an SMEM [*,8] row."""
    return (ref[idx, 0], ref[idx, 1], ref[idx, 2],
            ref[idx, 3], ref[idx, 4], ref[idx, 5])


def _bounds_vmem_row(ref, c):
    """Six (1,1) slices from a dynamic VMEM [*,8] row load; they broadcast
    against the (1,R) packet exactly like SMEM scalars do.  (SMEM pads each
    element to 64 B, so large child-bound tables must live in VMEM — the
    [S*B,8] table blows the 1 MB SMEM at ~2k clusters, round 4.)"""
    b = ref[pl.ds(c, 1), :]
    return (b[:, 0:1], b[:, 1:2], b[:, 2:3], b[:, 3:4], b[:, 4:5], b[:, 5:6])


def _slab_hits(bounds, pr, t_min, t_limit):
    """Packet slab test vs one AABB: (1,R) bool.

    `t_limit` gates the near plane — the per-lane running best-t for
    closest-hit kernels (closed lanes shrink the packet) or the scalar
    t_max for any-hit.  Callers AND any extra live predicate (e.g. the
    occlusion kernels' `occ == 0`)."""
    bminx, bminy, bminz, bmaxx, bmaxy, bmaxz = bounds
    ox, oy, oz, _, _, _, ix, iy, iz = pr
    tx0 = (bminx - ox) * ix
    tx1 = (bmaxx - ox) * ix
    ty0 = (bminy - oy) * iy
    ty1 = (bmaxy - oy) * iy
    tz0 = (bminz - oz) * iz
    tz1 = (bmaxz - oz) * iz
    tnear = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    tfar = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    return (tnear <= tfar) & (tfar >= t_min) & (tnear <= t_limit)


def _mt_tests(tri, pr, t_min, t_max):
    """Component-unrolled Möller–Trumbore of one (K,16) cluster against the
    (1,R) packet.  Returns (tc, u, v): (K,R) arrays, tc = candidate
    distance with +inf where the test failed (tc < inf <=> valid hit).

    Orientation is the whole ballgame on TPU: rays live on the LANE axis
    ((1,R) rows), triangles on the SUBLANE axis ((K,1) columns), so every
    intermediate is a well-tiled (K,R) array — the transposed formulation
    measured 3x slower under Mosaic (round 1)."""
    ox, oy, oz, dx, dy, dz, _, _, _ = pr
    v0x = tri[:, 0:1]
    v0y = tri[:, 1:2]
    v0z = tri[:, 2:3]
    e1x = tri[:, 3:4]
    e1y = tri[:, 4:5]
    e1z = tri[:, 5:6]
    e2x = tri[:, 6:7]
    e2y = tri[:, 7:8]
    e2z = tri[:, 8:9]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (
        (jnp.abs(det) > 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return jnp.where(ok, t, jnp.float32(jnp.inf)), u, v


def _bw_tests(tri, pr, t_min, t_max):
    """Baldwin–Weber precomputed-transform test of one (K,16) cluster
    against the (1,R) packet — same contract as `_mt_tests` but ~20%
    fewer VPU ops (tools/probe_tri_test.py prices both): t comes from a
    plane test against the precomputed normal, u/v are affine in the hit
    point.  Rows (pack_cluster_tris_bw): n(0:3), d0=n.v0(3), p1(4:7),
    c1=-p1.v0(7), p2(8:11), c2=-p2.v0(11); padding rows are all-zero =>
    den==0 culls them exactly like MT's det==0."""
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
    # Validity chain compacted to min-reductions: decision-identical to
    # the 6-compare/5-and form (NaN u/v from parked-ray inf overflow
    # propagate through jnp.minimum and fail `>= 0` the same way; rcp
    # != 0 <=> |den| > 1e-12 by construction) and measured -9% loop time
    # on v5e (probe_tri_test: bw_minok 56.0 vs bw 51.0 G tests/s,
    # t outputs bit-identical on the 73M-test probe set).
    bary_ok = jnp.minimum(jnp.minimum(u, v), 1.0 - (u + v)) >= 0.0
    ok = bary_ok & (t > t_min) & (t < t_max) & (rcp != 0.0)
    return jnp.where(ok, t, jnp.float32(jnp.inf)), u, v


# Triangle-test formulation registry: every kernel body takes a static
# `tri_test` name and the caller passes the matching packed operand
# (pack_cluster_tris vs pack_cluster_tris_bw — same [C,K,16] shape).
_TRI_TESTS = {"mt": _mt_tests, "bw": _bw_tests}


def _mt_best(tc, u, v, c, cluster_k):
    """Reduce one cluster's (K,R) candidates to per-lane winners: (1,R)
    rows (t, prim, u, v).  Prim ties resolve to the lowest global id, and
    the winner's barycentrics come off the SAME lane — so callers never
    need a host-side vertices[prim] finalize gather (~20 ns each, ~5 ms
    per 256k-lane bounce)."""
    t_blk = jnp.min(tc, axis=0, keepdims=True)                    # (1,R)
    gid = c * cluster_k + jax.lax.broadcasted_iota(jnp.int32, tc.shape, 0)
    prim_blk = jnp.min(
        jnp.where(tc == t_blk, gid, _BIG_PRIM), axis=0, keepdims=True
    )
    win = gid == prim_blk
    u_blk = jnp.min(jnp.where(win, u, jnp.float32(jnp.inf)),
                    axis=0, keepdims=True)
    v_blk = jnp.min(jnp.where(win, v, jnp.float32(jnp.inf)),
                    axis=0, keepdims=True)
    return t_blk, prim_blk, u_blk, v_blk


def _vmem_params(scene_bytes: int, rays_per_tile: int, cluster_k: int,
                 headroom: float = 1.0, extra_bytes: int = 0):
    """CompilerParams with an explicit scoped-VMEM budget when the kernel
    won't fit the 16 MB default.

    Measured need (Mosaic, v5e): a 5.98 MB cluster operand demands a
    47.9 MB scoped allocation at BOTH R=256 and R=1024 — i.e. the stack
    is dominated by ~8x the scene bytes (Mosaic staging/layout copies of
    the [C,K,16] operand), plus (K,R) Möller–Trumbore temporaries.  The
    old fixed `>12MB -> 100MB` heuristic under-estimated exactly this
    case and OOMed config 4.  Only raise above the 16 MB default when
    needed: an oversized scoped budget measurably degrades the
    XLA-compiled surrounding loop body.

    `headroom` (cfg.vmem_headroom, a static jit-cache-key participant)
    scales the whole model: the 8x staging multiplier is a FIT to one
    Mosaic version's measured compiles, and cli.py / bench.py retry a
    failed compile once at headroom 2.0 so a future toolchain that
    stages differently degrades to a slow-but-working render instead of
    an abort (VERDICT r2 weak #5).

    `extra_bytes` is for per-lane ray/scratch buffers that live in VMEM
    exactly once — they must NOT ride the 8x staging multiplier, which
    models layout copies of the streamed [C,K,16] scene operand only
    (a 131k-lane pool's 16*n_pad ray bytes would otherwise inflate the
    budget by ~16 MB and force the oversized-budget slow path)."""
    need = int(
        (8 * scene_bytes + extra_bytes
         + 40 * cluster_k * rays_per_tile * 4 + (2 << 20))
        * headroom
    )
    if need <= 14 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(int(need * 1.25), 120 * 1024 * 1024)
    )


def _cluster_kernel(
    aabb_ref,    # SMEM [C,8] f32: minx,miny,minz,maxx,maxy,maxz,pad,pad
    order_ref,   # SMEM [8,C] i32: front-to-back cluster order per octant
    rays_ref,    # VMEM (8,R) f32 rows: ox,oy,oz,dx,dy,dz,pad,pad
    tris_ref,    # VMEM [C,K,16] f32 cols: v0xyz(0-2), e1xyz(3-5), e2xyz(6-8)
    t_ref,       # VMEM out (1,R) f32 — lane-major, matches the scratch
    prim_ref,    # VMEM out (1,R) i32
    uv_ref,      # VMEM out (2,R) f32: winner's barycentrics (beta, gamma)
    t_acc,       # VMEM scratch (1,R) f32
    p_acc,       # VMEM scratch (1,R) i32
    u_acc,       # VMEM scratch (1,R) f32
    v_acc,       # VMEM scratch (1,R) f32
    *,
    num_clusters: int,
    cluster_k: int,
    t_min: float,
    t_max: float,
    tri_test: str = "mt",
):
    pr = _packet_rays(
        rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :],
        rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :],
    )

    t_acc[:] = jnp.full_like(t_acc, t_max)
    p_acc[:] = jnp.full_like(p_acc, _BIG_PRIM)
    u_acc[:] = jnp.zeros_like(u_acc)
    v_acc[:] = jnp.zeros_like(v_acc)

    # Visiting clusters front-to-back (per packet octant) makes the
    # (tnear <= best_t) slab condition cull everything behind the packet's
    # first hits.
    octant = _octant_of(rays_ref[3, 0], rays_ref[4, 0], rays_ref[5, 0])

    def visit(pos, _):
        c = order_ref[octant, pos]
        overlap = _slab_hits(_bounds_scalar(aabb_ref, c), pr, t_min, t_acc[:])

        @pl.when(jnp.any(overlap))
        def _():
            tc, u, v = _TRI_TESTS[tri_test](tris_ref[c], pr, t_min, t_max)
            t_blk, prim_blk, u_blk, v_blk = _mt_best(tc, u, v, c, cluster_k)
            best = t_acc[:]
            improved = t_blk < best
            t_acc[:] = jnp.where(improved, t_blk, best)
            p_acc[:] = jnp.where(improved, prim_blk, p_acc[:])
            u_acc[:] = jnp.where(improved, u_blk, u_acc[:])
            v_acc[:] = jnp.where(improved, v_blk, v_acc[:])

        return 0

    jax.lax.fori_loop(0, num_clusters, visit, 0)
    # Lane-major stores: no (1,R)->(R,1) transpose per grid step, and the
    # caller reads back flat [N] vectors in their natural vector layout
    # (the transposed output measured ~3x slower *downstream*: every
    # consumer re-laid-out the sublane-major result).
    t_ref[:] = t_acc[:]
    prim_ref[:] = p_acc[:]
    uv_ref[0:1, :] = u_acc[:]
    uv_ref[1:2, :] = v_acc[:]


def _cluster_kernel_hier(
    aabbs_s,     # SMEM [S,8] f32: supercluster bounds
    order_s,     # SMEM [8,S] i32: per-octant front-to-back SUPER order
    aabb_ref,    # VMEM [S*B,8] f32: child bounds (padding children inverted)
    rays_ref,    # VMEM (8,R) f32
    tris_ref,    # VMEM [C,K,16] f32
    t_ref, prim_ref, uv_ref,
    t_acc, p_acc, u_acc, v_acc,
    *,
    num_supers: int,
    branch: int,
    num_clusters: int,
    cluster_k: int,
    t_min: float,
    t_max: float,
    tri_test: str = "mt",
):
    """Two-level packet traversal: a supercluster (group of `branch`
    Morton-consecutive clusters) is slab-tested ONCE and skipped with one
    scalar branch.  At many hundreds of clusters the flat kernel's cost
    is dominated by per-cluster scalar loop overhead (SMEM reads +
    branch), not triangle math — the top level cuts visited iterations
    ~branch-fold for packets that cull well (sorted packets do)."""
    pr = _packet_rays(
        rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :],
        rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :],
    )

    t_acc[:] = jnp.full_like(t_acc, t_max)
    p_acc[:] = jnp.full_like(p_acc, _BIG_PRIM)
    u_acc[:] = jnp.zeros_like(u_acc)
    v_acc[:] = jnp.zeros_like(v_acc)

    octant = _octant_of(rays_ref[3, 0], rays_ref[4, 0], rays_ref[5, 0])

    def visit_super(pos, _):
        s = order_s[octant, pos]

        @pl.when(jnp.any(_slab_hits(_bounds_scalar(aabbs_s, s), pr,
                                    t_min, t_acc[:])))
        def _():
            def visit_child(j, _):
                c = s * branch + j

                @pl.when(jnp.any(_slab_hits(_bounds_vmem_row(aabb_ref, c),
                                            pr, t_min, t_acc[:])))
                def _():
                    # Padding children are far point boxes and never get
                    # here; clamp anyway so the VMEM read stays in bounds.
                    tc, u, v = _TRI_TESTS[tri_test](
                        tris_ref[jnp.minimum(c, num_clusters - 1)],
                        pr, t_min, t_max,
                    )
                    t_blk, prim_blk, u_blk, v_blk = _mt_best(
                        tc, u, v, c, cluster_k
                    )
                    best = t_acc[:]
                    improved = t_blk < best
                    t_acc[:] = jnp.where(improved, t_blk, best)
                    p_acc[:] = jnp.where(improved, prim_blk, p_acc[:])
                    u_acc[:] = jnp.where(improved, u_blk, u_acc[:])
                    v_acc[:] = jnp.where(improved, v_blk, v_acc[:])

                return 0

            jax.lax.fori_loop(0, branch, visit_child, 0)

        return 0

    jax.lax.fori_loop(0, num_supers, visit_super, 0)
    t_ref[:] = t_acc[:]
    prim_ref[:] = p_acc[:]
    uv_ref[0:1, :] = u_acc[:]
    uv_ref[1:2, :] = v_acc[:]


@functools.partial(
    jax.jit,
    static_argnames=("rays_per_tile", "branch", "t_min", "t_max", "interpret", "vmem_headroom", "tri_test"),
)
def intersect_clusters_pallas_hier(
    tris16: jnp.ndarray,     # [C,K,16] f32
    aabbs_child: jnp.ndarray,  # [S*B,8] f32 (padding children inverted)
    aabbs_super: jnp.ndarray,  # [S,8] f32
    order_super: jnp.ndarray,  # [8,S] i32
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min: float = 0.01,
    t_max: float = 1e16,
    rays_per_tile: int = 1024,
    branch: int = 8,
    interpret: bool = False,
    vmem_headroom: float = 1.0,
    tri_test: str = "mt",
):
    """Two-level closest hit; same returns as intersect_clusters_pallas."""
    n = origins.shape[0]
    c, k, _ = tris16.shape
    s = aabbs_super.shape[0]
    r = rays_per_tile
    n_pad = -(-n // r) * r

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(origins.T)
    rays = rays.at[3:6, :n].set(directions.T)
    if n_pad > n:
        rays = rays.at[0, n:].set(3.0e37).at[3, n:].set(1.0)

    tiles = n_pad // r
    kernel = functools.partial(
        _cluster_kernel_hier,
        num_supers=s,
        branch=branch,
        num_clusters=c,
        cluster_k=k,
        t_min=t_min,
        t_max=t_max,
        tri_test=tri_test,
    )
    best_t, best_prim, best_uv = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # super aabbs
            pl.BlockSpec(memory_space=pltpu.SMEM),      # super orders
            # Child aabbs in VMEM: SMEM pads each element to 64 B, so the
            # [S*B,8] table overflows the 1 MB SMEM at ~2k clusters
            # (cs32 on 98k tris = 3064 — measured compile OOM, round 4).
            pl.BlockSpec(memory_space=pltpu.VMEM),      # child aabbs
            pl.BlockSpec((8, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (c, k, 16), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, r), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((2, n_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, r), jnp.float32),
            pltpu.VMEM((1, r), jnp.int32),
            pltpu.VMEM((1, r), jnp.float32),
            pltpu.VMEM((1, r), jnp.float32),
        ],
        compiler_params=_vmem_params(
            tris16.size * 4, r, k, vmem_headroom,
            # child table lane-padded 8->128 in VMEM, x2 for staging
            extra_bytes=aabbs_child.shape[0] * 128 * 4 * 2,
        ),
        interpret=interpret,
    )(aabbs_super, order_super, aabbs_child, rays, tris16)
    return best_t[0, :n], best_prim[0, :n], best_uv[:, :n].T


def _occlusion_kernel(
    aabb_ref,    # SMEM [C,8] f32
    order_ref,   # SMEM [8,C] i32 (front-to-back per octant — visit order
    #              matters only for how FAST lanes saturate, not results)
    rays_ref,    # VMEM (8,R) f32 rows: ox,oy,oz,dx,dy,dz,pad,pad
    tris_ref,    # VMEM [C,K,16] f32
    occ_ref,     # VMEM out (1,R) i32: 1 where the segment is blocked
    occ_acc,     # VMEM scratch (1,R) i32
    *,
    num_clusters: int,
    t_min: float,
    t_max: float,
    tri_test: str = "mt",
):
    """Any-hit query (the reference's `traceOcclusion`, optixSphere.cu:
    134-156 — dead code there, live here for NEE shadow rays).

    Cheaper than closest-hit: no best-t ordering, no prim/barycentric
    tracking, and the cluster loop EARLY-EXITS once every ray in the
    packet is occluded (a per-packet scalar `while`, which XLA's batch
    lax.cond cannot express)."""
    pr = _packet_rays(
        rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :],
        rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :],
    )

    occ_acc[:] = jnp.zeros_like(occ_acc)

    octant = _octant_of(rays_ref[3, 0], rays_ref[4, 0], rays_ref[5, 0])

    def cond(state):
        pos, all_occ = state
        return (pos < num_clusters) & (all_occ == 0)

    def visit(state):
        pos, _ = state
        c = order_ref[octant, pos]
        overlap = _slab_hits(
            _bounds_scalar(aabb_ref, c), pr, t_min, t_max
        ) & (occ_acc[:] == 0)

        @pl.when(jnp.any(overlap))
        def _():
            tc, _u, _v = _TRI_TESTS[tri_test](tris_ref[c], pr, t_min, t_max)
            hit_any = jnp.any(tc < jnp.inf, axis=0, keepdims=True)  # (1,R)
            occ_acc[:] = jnp.maximum(occ_acc[:], hit_any.astype(jnp.int32))

        all_occ = jnp.min(occ_acc[:]).astype(jnp.int32)
        return (pos + 1, all_occ)

    jax.lax.while_loop(cond, visit, (jnp.int32(0), jnp.int32(0)))
    occ_ref[:] = occ_acc[:]


def _occlusion_kernel_hier(
    aabbs_s,     # SMEM [S,8] f32
    order_s,     # SMEM [8,S] i32
    aabb_ref,    # VMEM [S*B,8] f32 (padding children are far point boxes)
    rays_ref,    # VMEM (8,R) f32
    tris_ref,    # VMEM [C,K,16] f32
    occ_ref,     # VMEM out (1,R) i32
    occ_acc,     # VMEM scratch (1,R) i32
    *,
    num_supers: int,
    branch: int,
    num_clusters: int,
    t_min: float,
    t_max: float,
    tri_test: str = "mt",
):
    """Two-level any-hit: one scalar slab test skips `branch` clusters at
    a time, and the super loop EARLY-EXITS once every ray in the packet
    is occluded (same cost argument as _cluster_kernel_hier — NEE shadow
    rays on many-cluster scenes were paying per-cluster scalar loop
    overhead)."""
    pr = _packet_rays(
        rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :],
        rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :],
    )

    occ_acc[:] = jnp.zeros_like(occ_acc)

    octant = _octant_of(rays_ref[3, 0], rays_ref[4, 0], rays_ref[5, 0])

    def cond(state):
        pos, all_occ = state
        return (pos < num_supers) & (all_occ == 0)

    def visit(state):
        pos, _ = state
        s = order_s[octant, pos]
        live = occ_acc[:] == 0

        @pl.when(jnp.any(_slab_hits(_bounds_scalar(aabbs_s, s), pr,
                                    t_min, t_max) & live))
        def _():
            def child(j, _):
                c = s * branch + j
                hit_c = _slab_hits(
                    _bounds_vmem_row(aabb_ref, c), pr, t_min, t_max
                ) & (occ_acc[:] == 0)

                @pl.when(jnp.any(hit_c))
                def _():
                    tc, _u, _v = _TRI_TESTS[tri_test](
                        tris_ref[jnp.minimum(c, num_clusters - 1)],
                        pr, t_min, t_max,
                    )
                    hit_any = jnp.any(tc < jnp.inf, axis=0, keepdims=True)
                    occ_acc[:] = jnp.maximum(
                        occ_acc[:], hit_any.astype(jnp.int32)
                    )

                return 0

            jax.lax.fori_loop(0, branch, child, 0)

        all_occ = jnp.min(occ_acc[:]).astype(jnp.int32)
        return (pos + 1, all_occ)

    jax.lax.while_loop(cond, visit, (jnp.int32(0), jnp.int32(0)))
    occ_ref[:] = occ_acc[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "rays_per_tile", "branch", "t_min", "t_max", "interpret",
        "vmem_headroom", "tri_test",
    ),
)
def occluded_clusters_pallas_hier(
    tris16: jnp.ndarray,
    aabbs_child: jnp.ndarray,
    aabbs_super: jnp.ndarray,
    order_super: jnp.ndarray,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min: float = 0.01,
    t_max: float = 1e16,
    rays_per_tile: int = 512,
    branch: int = 8,
    interpret: bool = False,
    vmem_headroom: float = 1.0,
    tri_test: str = "mt",
) -> jnp.ndarray:
    """Two-level any-hit; returns occluded [N] bool."""
    n = origins.shape[0]
    c, k, _ = tris16.shape
    s = aabbs_super.shape[0]
    r = rays_per_tile
    n_pad = -(-n // r) * r

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(origins.T)
    rays = rays.at[3:6, :n].set(directions.T)
    if n_pad > n:
        rays = rays.at[0, n:].set(3.0e37).at[3, n:].set(1.0)

    tiles = n_pad // r
    kernel = functools.partial(
        _occlusion_kernel_hier,
        num_supers=s,
        branch=branch,
        num_clusters=c,
        t_min=t_min,
        t_max=t_max,
        tri_test=tri_test,
    )
    occ = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # child aabbs (SMEM cap)
            pl.BlockSpec((8, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (c, k, 16), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, r), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, n_pad), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((1, r), jnp.int32)],
        compiler_params=_vmem_params(
            tris16.size * 4, r, k, vmem_headroom,
            extra_bytes=aabbs_child.shape[0] * 128 * 4 * 2,
        ),
        interpret=interpret,
    )(aabbs_super, order_super, aabbs_child, rays, tris16)[0]
    return occ[0, :n] > 0


@functools.partial(
    jax.jit,
    static_argnames=("rays_per_tile", "t_min", "t_max", "interpret", "vmem_headroom", "tri_test"),
)
def occluded_clusters_pallas(
    tris16: jnp.ndarray,    # [C,K,16] f32
    aabbs: jnp.ndarray,     # [C,8] f32
    order: jnp.ndarray,     # [8,C] i32
    origins: jnp.ndarray,   # [N,3]
    directions: jnp.ndarray,
    t_min: float = 0.01,
    t_max: float = 1e16,
    rays_per_tile: int = 512,
    interpret: bool = False,
    vmem_headroom: float = 1.0,
    tri_test: str = "mt",
) -> jnp.ndarray:
    """Any-hit over the cluster accel; returns occluded [N] bool."""
    n = origins.shape[0]
    c, k, _ = tris16.shape
    r = rays_per_tile
    n_pad = -(-n // r) * r

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(origins.T)
    rays = rays.at[3:6, :n].set(directions.T)
    if n_pad > n:
        # Padding rays point +x from far away: they miss everything, which
        # keeps the early-exit conservative (they never read as occluded).
        rays = rays.at[0, n:].set(3.0e37).at[3, n:].set(1.0)

    tiles = n_pad // r
    kernel = functools.partial(
        _occlusion_kernel,
        num_clusters=c,
        t_min=t_min,
        t_max=t_max,
        tri_test=tri_test,
    )
    occ = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (c, k, 16), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, r), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, n_pad), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((1, r), jnp.int32)],
        compiler_params=_vmem_params(tris16.size * 4, r, k, vmem_headroom),
        interpret=interpret,
    )(aabbs, order, rays, tris16)[0]
    return occ[0, :n] > 0


def _streamed_pads(tris16, aabbs, block_clusters, branch):
    """Pad clusters to a block multiple and build branch-group supers over
    the PADDED range.  Padding clusters are far point boxes; a boundary
    group mixing real and padding children gets a giant (but harmless)
    box — its children are still individually slab-culled."""
    c, k, _ = tris16.shape
    cb = min(block_clusters, max(branch, -(-c // branch) * branch))
    cb = max(cb, branch)
    if cb % branch:
        cb = -(-cb // branch) * branch
    c_pad = -(-c // cb) * cb
    if c_pad > c:
        pad = jnp.zeros((c_pad - c, k, 16), tris16.dtype)
        tris16 = jnp.concatenate([tris16, pad], axis=0)
        apad = jnp.full((c_pad - c, 8), 3.0e37, aabbs.dtype)
        aabbs = jnp.concatenate([aabbs, apad], axis=0)
    s = c_pad // branch
    groups = aabbs.reshape(s, branch, 8)
    supers = jnp.concatenate(
        [
            groups[:, :, 0:3].min(axis=1),
            groups[:, :, 3:6].max(axis=1),
            jnp.zeros((s, 2), aabbs.dtype),
        ],
        axis=-1,
    )
    return tris16, aabbs, supers, cb, c_pad


def _streamed_rays(origins, directions, rays_per_tile):
    """Pack [N,3]+[N,3] rays into (tiles, 8, r) f32 tiles (pads are far
    parallel rays that never hit)."""
    n = origins.shape[0]
    r = rays_per_tile
    n_pad = -(-n // r) * r
    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(origins.T)
    rays = rays.at[3:6, :n].set(directions.T)
    if n_pad > n:
        rays = rays.at[0, n:].set(3.0e37).at[3, n:].set(1.0)
    tiles = n_pad // r
    return rays.reshape(8, tiles, r).transpose(1, 0, 2), tiles, n_pad


def _cluster_kernel_streamed(
    aabbs_s,     # SMEM [Sp,8] f32 supercluster bounds (padded range)
    aabb_ref,    # SMEM [Cp,8] f32 (ALL clusters, padded; tiny)
    rays_ref,    # VMEM (1,8,R) f32 — tile i's rays
    tris_ref,    # VMEM [CB,K,16] f32 — block j's clusters, fetched ONCE
    #              per block: j is the OUTER grid axis, so consecutive
    #              steps share the same block index and Pallas skips the
    #              copy — the whole scene streams HBM->VMEM once per
    #              CALL, not once per ray tile
    t_ref, prim_ref, uv_ref,   # out blocks (1,1,R)x2 / (1,2,R)
    t_acc,       # VMEM scratch (tiles,R) f32 — per-TILE accumulator rows
    p_acc,       # VMEM scratch (tiles,R) i32   persisting across the
    u_acc,       # VMEM scratch (tiles,R) f32   whole grid (~16 B/lane)
    v_acc,       # VMEM scratch (tiles,R) f32
    *,
    num_clusters: int,
    block_clusters: int,
    num_blocks: int,
    cluster_k: int,
    branch: int,
    t_min: float,
    t_max: float,
    tri_test: str = "mt",
):
    """Block-major two-level HBM-streamed closest hit.

    Grid = (cluster_blocks, ray_tiles) with the BLOCK axis outer: the
    big operand (the triangle block) is the slow-moving index, so scene
    bytes stream exactly once per call; the per-step copy is one ray
    tile, and each tile's running best hit lives in a scratch row
    indexed by the tile id.  The earlier tile-major layout (block axis
    minor) re-streamed the entire scene for every ray tile — 128 tiles x
    6.3 MB = 0.8 GB per call on the 98k scene — and measured 1.5x slower
    (25.2 -> 16.7 ms/iter, v5e; docs/perf_notes.md round 3).  A per-
    sub-span slab gate (mt_sub) was also measured and REFUTED: splitting
    the 512-lane tile into 2/4/8 slab-gated spans cost more in extra
    scalar slab loops than the skipped Möller–Trumbore work saved
    (16.7 -> 17.1/22.7/27.6 ms).

    Two-level visit as in the in-VMEM hier kernel: one scalar slab test
    skips `branch` Morton-consecutive clusters at a time."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    supers_per_block = block_clusters // branch
    row = pl.ds(i, 1)

    pr = _packet_rays(
        rays_ref[0, 0:1, :], rays_ref[0, 1:2, :], rays_ref[0, 2:3, :],
        rays_ref[0, 3:4, :], rays_ref[0, 4:5, :], rays_ref[0, 5:6, :],
    )
    w = pr[0].shape[1]

    @pl.when(j == 0)
    def _():
        t_acc[row, :] = jnp.full((1, w), t_max, jnp.float32)
        p_acc[row, :] = jnp.full((1, w), _BIG_PRIM, jnp.int32)
        u_acc[row, :] = jnp.zeros((1, w), jnp.float32)
        v_acc[row, :] = jnp.zeros((1, w), jnp.float32)

    def visit_super(g, _):
        s = j * supers_per_block + g

        @pl.when(jnp.any(_slab_hits(_bounds_scalar(aabbs_s, s), pr,
                                    t_min, t_acc[row, :])))
        def _():
            def child(jj, _):
                local = g * branch + jj
                c = j * block_clusters + local
                hit_c = _slab_hits(
                    _bounds_scalar(aabb_ref, c), pr, t_min, t_acc[row, :]
                )

                @pl.when(jnp.any(hit_c) & (c < num_clusters))
                def _():
                    tc, u, v = _TRI_TESTS[tri_test](
                        tris_ref[local], pr, t_min, t_max
                    )
                    t_blk, prim_blk, u_blk, v_blk = _mt_best(
                        tc, u, v, c, cluster_k
                    )
                    best = t_acc[row, :]
                    improved = t_blk < best
                    t_acc[row, :] = jnp.where(improved, t_blk, best)
                    p_acc[row, :] = jnp.where(improved, prim_blk, p_acc[row, :])
                    u_acc[row, :] = jnp.where(improved, u_blk, u_acc[row, :])
                    v_acc[row, :] = jnp.where(improved, v_blk, v_acc[row, :])

                return 0

            jax.lax.fori_loop(0, branch, child, 0)

        return 0

    jax.lax.fori_loop(0, supers_per_block, visit_super, 0)

    @pl.when(j == num_blocks - 1)
    def _():
        t_ref[0, 0:1, :] = t_acc[row, :]
        prim_ref[0, 0:1, :] = p_acc[row, :]
        uv_ref[0, 0:1, :] = u_acc[row, :]
        uv_ref[0, 1:2, :] = v_acc[row, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "rays_per_tile", "block_clusters", "branch", "t_min", "t_max",
        "interpret",
        "vmem_headroom", "tri_test",
    ),
)
def intersect_clusters_pallas_streamed(
    tris16: jnp.ndarray,    # [C,K,16] f32
    aabbs: jnp.ndarray,     # [C,8] f32
    origins: jnp.ndarray,   # [N,3]
    directions: jnp.ndarray,
    t_min: float = 0.01,
    t_max: float = 1e16,
    rays_per_tile: int = 512,
    block_clusters: int = 96,
    branch: int = 8,
    interpret: bool = False,
    vmem_headroom: float = 1.0,
    tri_test: str = "mt",
):
    """Block-major two-level streamed closest hit for scenes beyond the
    VMEM cluster budget (see _cluster_kernel_streamed for the grid-order
    rationale; defaults measured on the 98k sphere field, v5e).

    Returns (best_t [N], best_prim [N] — 0x7FFFFFFF on miss, bary [N,2])."""
    n = origins.shape[0]
    _, k, _ = tris16.shape
    c = tris16.shape[0]
    tris16, aabbs, supers, cb, c_pad = _streamed_pads(
        tris16, aabbs, block_clusters, branch
    )
    nblocks = c_pad // cb
    r = rays_per_tile
    rays, tiles, n_pad = _streamed_rays(origins, directions, r)

    kernel = functools.partial(
        _cluster_kernel_streamed,
        num_clusters=c,
        block_clusters=cb,
        num_blocks=nblocks,
        cluster_k=k,
        branch=branch,
        t_min=t_min,
        t_max=t_max,
        tri_test=tri_test,
    )
    # Blocked trailing dims must be (8,128)-divisible or whole, so the
    # tile axis leads everywhere: ray blocks are full (8,R) planes and
    # out blocks full (1,R)/(2,R) planes of (tiles,*,R) arrays.
    best_t, best_prim, best_uv = pl.pallas_call(
        kernel,
        grid=(nblocks, tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # supers
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # aabbs
            pl.BlockSpec(
                (1, 8, r), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cb, k, 16), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, r), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, r), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 2, r), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((tiles, 1, r), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 1, r), jnp.int32),
            jax.ShapeDtypeStruct((tiles, 2, r), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tiles, r), jnp.float32),
            pltpu.VMEM((tiles, r), jnp.int32),
            pltpu.VMEM((tiles, r), jnp.float32),
            pltpu.VMEM((tiles, r), jnp.float32),
        ],
        compiler_params=_vmem_params(
            cb * k * 16 * 4, r, k, vmem_headroom, extra_bytes=16 * n_pad
        ),
        interpret=interpret,
    )(supers, aabbs, rays, tris16)
    t_flat = best_t.reshape(n_pad)[:n]
    p_flat = best_prim.reshape(n_pad)[:n]
    uv_flat = best_uv.transpose(0, 2, 1).reshape(n_pad, 2)[:n]
    return t_flat, p_flat, uv_flat


def _occlusion_kernel_streamed(
    aabbs_s,     # SMEM [Sp,8] f32
    aabb_ref,    # SMEM [Cp,8] f32
    rays_ref,    # VMEM (1,8,R) f32
    tris_ref,    # VMEM [CB,K,16] f32
    occ_ref,     # out block (1,1,R) i32
    occ_acc,     # VMEM scratch (tiles,R) i32 — per-tile rows
    *,
    num_clusters: int,
    block_clusters: int,
    num_blocks: int,
    branch: int,
    t_min: float,
    t_max: float,
    tri_test: str = "mt",
):
    """Block-major HBM-streamed two-level any-hit (the occlusion analog
    of _cluster_kernel_streamed): NEE shadow rays on big scenes skip
    distance ordering and prim/bary tracking, and a tile's whole
    compute is skipped once every ray in it is occluded (the DMA still
    streams — the grid is fixed — but the slab/triangle work
    vanishes)."""
    j = pl.program_id(0)
    i = pl.program_id(1)
    supers_per_block = block_clusters // branch
    row = pl.ds(i, 1)

    pr = _packet_rays(
        rays_ref[0, 0:1, :], rays_ref[0, 1:2, :], rays_ref[0, 2:3, :],
        rays_ref[0, 3:4, :], rays_ref[0, 4:5, :], rays_ref[0, 5:6, :],
    )
    w = pr[0].shape[1]

    @pl.when(j == 0)
    def _():
        occ_acc[row, :] = jnp.zeros((1, w), jnp.int32)

    @pl.when(jnp.min(occ_acc[row, :]) == 0)
    def _():
        def visit_super(g, _):
            s = j * supers_per_block + g

            @pl.when(jnp.any(
                _slab_hits(_bounds_scalar(aabbs_s, s), pr, t_min, t_max)
                & (occ_acc[row, :] == 0)
            ))
            def _():
                def child(jj, _):
                    local = g * branch + jj
                    c = j * block_clusters + local
                    hit_c = _slab_hits(
                        _bounds_scalar(aabb_ref, c), pr, t_min, t_max
                    ) & (occ_acc[row, :] == 0)

                    @pl.when(jnp.any(hit_c) & (c < num_clusters))
                    def _():
                        tc, _u, _v = _TRI_TESTS[tri_test](
                            tris_ref[local], pr, t_min, t_max
                        )
                        hit_any = jnp.any(tc < jnp.inf, axis=0, keepdims=True)
                        occ_acc[row, :] = jnp.maximum(
                            occ_acc[row, :], hit_any.astype(jnp.int32)
                        )

                    return 0

                jax.lax.fori_loop(0, branch, child, 0)

            return 0

        jax.lax.fori_loop(0, supers_per_block, visit_super, 0)

    @pl.when(j == num_blocks - 1)
    def _():
        occ_ref[0, 0:1, :] = occ_acc[row, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "rays_per_tile", "block_clusters", "branch", "t_min", "t_max",
        "interpret",
        "vmem_headroom", "tri_test",
    ),
)
def occluded_clusters_pallas_streamed(
    tris16: jnp.ndarray,    # [C,K,16] f32
    aabbs: jnp.ndarray,     # [C,8] f32
    origins: jnp.ndarray,   # [N,3]
    directions: jnp.ndarray,
    t_min: float = 0.01,
    t_max: float = 1e16,
    rays_per_tile: int = 512,
    block_clusters: int = 96,
    branch: int = 8,
    interpret: bool = False,
    vmem_headroom: float = 1.0,
    tri_test: str = "mt",
) -> jnp.ndarray:
    """Block-major HBM-streamed two-level any-hit; returns occluded [N]
    bool (closes ADVICE r2 #5 / VERDICT r2 #3: NEE shadow rays on big
    scenes used to re-pay the full closest-hit streamed kernel)."""
    n = origins.shape[0]
    _, k, _ = tris16.shape
    c = tris16.shape[0]
    tris16, aabbs, supers, cb, c_pad = _streamed_pads(
        tris16, aabbs, block_clusters, branch
    )
    nblocks = c_pad // cb
    r = rays_per_tile
    rays, tiles, n_pad = _streamed_rays(origins, directions, r)

    kernel = functools.partial(
        _occlusion_kernel_streamed,
        num_clusters=c,
        block_clusters=cb,
        num_blocks=nblocks,
        branch=branch,
        t_min=t_min,
        t_max=t_max,
        tri_test=tri_test,
    )
    occ = pl.pallas_call(
        kernel,
        grid=(nblocks, tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 8, r), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cb, k, 16), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, r), lambda j, i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[jax.ShapeDtypeStruct((tiles, 1, r), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((tiles, r), jnp.int32)],
        compiler_params=_vmem_params(
            cb * k * 16 * 4, r, k, vmem_headroom, extra_bytes=4 * n_pad
        ),
        interpret=interpret,
    )(supers, aabbs, rays, tris16)[0]
    return occ.reshape(n_pad)[:n] > 0




def _part1by2(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits of v so bit i lands at bit 3i (3-D Morton)."""
    v = v & jnp.uint32(0x3FF)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def ray_sort_key(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    scene_lo=None,
    scene_hi=None,
    spatial_bits: int = 0,
    dir_bits: int = 0,
) -> jnp.ndarray:
    """[N] u32 packet-coherence sort key: (origin Morton cell << 3) | octant,
    optionally refined by `dir_bits` direction-magnitude bits per axis
    BELOW the octant bits.

    spatial_bits=0 gives the pure direction-octant key.  Consumed by
    `octant_sort`; kept separate so alternative consumers (the removed
    pool sort was one, git 24f2f76) share the exact key definition.

    dir_bits quantises |d| per axis under the octant: primary lanes all
    share one origin cell, so without it a packet is 1024 consecutive
    QUEUE lanes of one octant — a whole scanline row's spread of
    directions.  Direction-magnitude refinement groups them into tight
    frustum wedges (host-sim: suitcase primary packets 13.4 -> 8.4 MT
    cluster visits, monkey 18.6 -> 11.1 at dir_bits=2) while bounce
    packets are barely affected (tools/probe_seed_culling.py).  The key
    is clamped so 3*spatial_bits + 3 + 3*dir_bits fits u32."""
    dir_bits = min(dir_bits, max(0, (32 - 3 - 3 * spatial_bits) // 3))
    key = (
        (directions[:, 0] > 0).astype(jnp.uint32)
        + 2 * (directions[:, 1] > 0).astype(jnp.uint32)
        + 4 * (directions[:, 2] > 0).astype(jnp.uint32)
    )
    if spatial_bits:
        lo = jnp.asarray(scene_lo, jnp.float32)
        span = jnp.maximum(jnp.asarray(scene_hi, jnp.float32) - lo, 1e-6)
        cells = jnp.float32((1 << spatial_bits) - 1)
        q = jnp.clip((origins - lo) / span, 0.0, 1.0) * cells
        qi = q.astype(jnp.uint32)
        morton = (
            _part1by2(qi[:, 0])
            | (_part1by2(qi[:, 1]) << 1)
            | (_part1by2(qi[:, 2]) << 2)
        )
        key = key | (morton << 3)
    if dir_bits:
        cells = jnp.float32((1 << dir_bits) - 1)
        mag = (jnp.clip(jnp.abs(directions), 0.0, 1.0) * cells).astype(
            jnp.uint32
        )
        fine = (
            (mag[:, 0] << (2 * dir_bits)) | (mag[:, 1] << dir_bits) | mag[:, 2]
        )
        key = (key << (3 * dir_bits)) | fine
    return key


@functools.partial(jax.jit, static_argnames=("t_min", "t_max", "block"))
def entry_rank(
    origins: jnp.ndarray,      # [N,3]
    directions: jnp.ndarray,   # [N,3]
    aabb8: jnp.ndarray,        # [C,8] f32 cluster bounds
    posinv: jnp.ndarray,       # [8,C] f32: posinv[o,c] = front-to-back
    #                            position of cluster c in octant o's order
    t_min: float = 0.01,
    t_max: float = 1e16,
    block: int = 128,
) -> jnp.ndarray:
    """[N] i32: front-to-back position (in the ray's octant order) of the
    FIRST cluster whose AABB the ray's [t_min, t_max] segment overlaps —
    i.e. which cluster the packet kernel would test first.  C where the
    ray overlaps nothing (such rays sort to the end of their octant).

    This is the "first overlapped cluster" bucketing key of VERDICT r4 #2:
    sorting rays by (octant, entry rank) makes packets entry-cluster-pure,
    so the existing slab-gated packet kernels degenerate to dense
    per-bucket triangle tests — without any new kernel.

    Cost shape: blocked over clusters so the [N, block] slab temporaries
    bound memory; the per-octant rank select is ONE one-hot [N,8] x [8,B]
    matmul per block (MXU), not a per-element gather.
    """
    n = origins.shape[0]
    c = aabb8.shape[0]
    ox, oy, oz = origins[:, 0:1], origins[:, 1:2], origins[:, 2:3]
    big = jnp.float32(3.4e38)
    inv = jnp.where(jnp.abs(directions) > 1e-12, 1.0 / directions, big)
    ix, iy, iz = inv[:, 0:1], inv[:, 1:2], inv[:, 2:3]
    octant = (
        (directions[:, 0] > 0).astype(jnp.int32)
        + 2 * (directions[:, 1] > 0).astype(jnp.int32)
        + 4 * (directions[:, 2] > 0).astype(jnp.int32)
    )
    onehot = jax.nn.one_hot(octant, 8, dtype=jnp.float32)     # [N,8]
    posinv_f = posinv.astype(jnp.float32)

    c_pad = -(-c // block) * block
    if c_pad > c:
        pad = jnp.full((c_pad - c, 8), 3.0e37, aabb8.dtype)   # far points
        aabb8 = jnp.concatenate([aabb8, pad], axis=0)
        posinv_f = jnp.concatenate(
            [posinv_f, jnp.full((8, c_pad - c), float(c))], axis=1
        )

    def body(carry, inp):
        b, pos_blk = inp                                      # [B,8], [8,B]
        bminx, bminy, bminz = b[None, :, 0], b[None, :, 1], b[None, :, 2]
        bmaxx, bmaxy, bmaxz = b[None, :, 3], b[None, :, 4], b[None, :, 5]
        tx0 = (bminx - ox) * ix
        tx1 = (bmaxx - ox) * ix
        ty0 = (bminy - oy) * iy
        ty1 = (bmaxy - oy) * iy
        tz0 = (bminz - oz) * iz
        tz1 = (bmaxz - oz) * iz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        overlap = (tnear <= tfar) & (tfar >= t_min) & (tnear <= t_max)
        sel = onehot @ pos_blk                                # [N,B] MXU
        cand = jnp.min(
            jnp.where(overlap, sel, jnp.float32(c)), axis=1
        )
        return jnp.minimum(carry, cand), None

    blocks = aabb8.reshape(c_pad // block, block, 8)
    pos_blocks = posinv_f.reshape(8, c_pad // block, block).transpose(1, 0, 2)
    rank, _ = jax.lax.scan(
        body, jnp.full((n,), jnp.float32(c)), (blocks, pos_blocks)
    )
    return rank.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("t_min", "t_max", "block"))
def entry_nearest_id(
    origins: jnp.ndarray,      # [N,3]
    directions: jnp.ndarray,   # [N,3]
    aabb8: jnp.ndarray,        # [C,8] f32 cluster bounds
    t_min: float = 0.01,
    t_max: float = 1e16,
    block: int = 128,
) -> jnp.ndarray:
    """[N] i32: Morton ID of the NEAREST slab-overlapped cluster (entry
    distance = max(tnear, t_min); ties -> lower id; C where none).

    The bucketing label for the HBM-streamed block-major kernel, whose
    visit order is the Morton block order: a bounce ray's nearest
    overlapped cluster is (almost always) the cluster it originates on,
    so sorting by it groups tiles by spatial cluster — what block-major
    slab unions reward.  Same blocked-scan cost shape as entry_rank."""
    n = origins.shape[0]
    c = aabb8.shape[0]
    ox, oy, oz = origins[:, 0:1], origins[:, 1:2], origins[:, 2:3]
    big = jnp.float32(3.4e38)
    inv = jnp.where(jnp.abs(directions) > 1e-12, 1.0 / directions, big)
    ix, iy, iz = inv[:, 0:1], inv[:, 1:2], inv[:, 2:3]

    c_pad = -(-c // block) * block
    if c_pad > c:
        pad = jnp.full((c_pad - c, 8), 3.0e37, aabb8.dtype)
        aabb8 = jnp.concatenate([aabb8, pad], axis=0)

    def body(carry, inp):
        best_t, best_id = carry
        b, base = inp                                         # [B,8], i32
        bminx, bminy, bminz = b[None, :, 0], b[None, :, 1], b[None, :, 2]
        bmaxx, bmaxy, bmaxz = b[None, :, 3], b[None, :, 4], b[None, :, 5]
        tx0 = (bminx - ox) * ix
        tx1 = (bmaxx - ox) * ix
        ty0 = (bminy - oy) * iy
        ty1 = (bmaxy - oy) * iy
        tz0 = (bminz - oz) * iz
        tz1 = (bmaxz - oz) * iz
        tnear = jnp.maximum(
            jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
            jnp.minimum(tz0, tz1),
        )
        tfar = jnp.minimum(
            jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
            jnp.maximum(tz0, tz1),
        )
        overlap = (tnear <= tfar) & (tfar >= t_min) & (tnear <= t_max)
        entry_t = jnp.where(
            overlap, jnp.maximum(tnear, jnp.float32(t_min)), jnp.inf
        )
        blk_t = jnp.min(entry_t, axis=1)                      # [N]
        ids = base + jax.lax.broadcasted_iota(jnp.int32, entry_t.shape, 1)
        blk_id = jnp.min(
            jnp.where(entry_t == blk_t[:, None], ids, jnp.int32(c)), axis=1
        )
        take = blk_t < best_t                                 # strict: ties
        #                                                       keep earlier
        #                                                       (lower) id
        return (
            jnp.minimum(best_t, blk_t),
            jnp.where(take, blk_id, best_id),
        ), None

    blocks = aabb8.reshape(c_pad // block, block, 8)
    bases = (jnp.arange(c_pad // block, dtype=jnp.int32) * block)
    (_, best_id), _ = jax.lax.scan(
        body,
        (jnp.full((n,), jnp.inf, jnp.float32), jnp.full((n,), c, jnp.int32)),
        (blocks, bases),
    )
    return best_id


def entry_sort_key(
    octant: jnp.ndarray,       # [N] i32 (or None -> computed from dirs)
    rank: jnp.ndarray,         # [N] i32 in [0, C]
    num_clusters: int,
    directions: jnp.ndarray = None,
    dir_bits: int = 0,
    octant_major: bool = True,
) -> jnp.ndarray:
    """[N] u32 sort key: (octant, entry rank) with optional direction-
    magnitude tiebreak bits.

    octant_major=True — octant above the rank: right for the in-VMEM
    flat/hier kernels, whose per-packet visit order IS the octant's
    front-to-back cluster order (rank = position in that order; adjacent
    buckets are front-to-back adjacent).

    octant_major=False — rank above the octant: for the HBM-streamed
    block-major kernel, whose visit order is the Morton block order
    regardless of octant; `rank` should then be the entry cluster's
    MORTON ID (pass identity posinv to entry_rank) so packets group by
    spatial cluster first, direction second."""
    rank_bits = max(1, int(np.ceil(np.log2(num_clusters + 1))))
    dir_bits = min(dir_bits, max(0, (32 - 3 - rank_bits) // 3))
    if octant_major:
        key = (
            (octant.astype(jnp.uint32) << rank_bits)
            | rank.astype(jnp.uint32)
        )
    else:
        key = (rank.astype(jnp.uint32) << 3) | octant.astype(jnp.uint32)
    if dir_bits:
        cells = jnp.float32((1 << dir_bits) - 1)
        mag = (jnp.clip(jnp.abs(directions), 0.0, 1.0) * cells).astype(
            jnp.uint32
        )
        fine = (
            (mag[:, 0] << (2 * dir_bits)) | (mag[:, 1] << dir_bits) | mag[:, 2]
        )
        key = (key << (3 * dir_bits)) | fine
    return key


def sort_by_key(origins, directions, key):
    """Stable-sort rays by a precomputed [N] u32 key; returns
    (origins_s, directions_s, restore) like octant_sort (same packed-row
    single-gather cost model)."""
    n = origins.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    _, perm = jax.lax.sort_key_val(key, iota)
    _, inv = jax.lax.sort_key_val(perm, iota)
    packed = jnp.concatenate(
        [origins, directions, jnp.zeros((n, 2), origins.dtype)], axis=-1
    )
    rows = packed[perm]

    def restore(x):
        return x[inv]

    return rows[:, 0:3], rows[:, 3:6], restore


def octant_sort(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    scene_lo=None,
    scene_hi=None,
    spatial_bits: int = 0,
    dir_bits: int = 0,
):
    """Sort rays by direction octant (optionally spatial-major); returns
    (origins_s, directions_s, restore) where restore(x) un-permutes
    per-ray results (first axis).

    spatial_bits > 0 prepends a `spatial_bits`-per-axis Morton code of
    the ray origin (normalized to [scene_lo, scene_hi]) ABOVE the octant
    bits: packets become spatially tight first, octant-pure second —
    what large spread-out scenes want (their divergence is positional;
    a pure octant sort interleaves rays from the whole frame and LOSES
    the queue's pixel coherence).  Compact scenes want the pure octant
    key (spatial_bits=0): all clusters overlap anyway, direction purity
    is what makes the front-to-back order cull.  The sort is stable, so
    ties preserve the queue's pixel order either way.

    Cost model (v5e, 131k rays): lax.sort_key_val 0.07 ms; the permute-in
    is ONE gather of packed [N,8] rows (a per-batch table well under the
    ~16 MB VMEM-staging cliff, ~2.7 ns/row); restore is the same trick
    with the inverse permutation (obtained by sorting the permutation —
    cheaper than a ~40 ns/row scatter).  Total ~1 ms.
    """
    key = ray_sort_key(
        origins, directions, scene_lo, scene_hi, spatial_bits, dir_bits
    )
    return sort_by_key(origins, directions, key)


def octant_orders(aabbs: np.ndarray) -> np.ndarray:
    """[8,C] front-to-back cluster visit order per direction octant.

    Clusters sorted by the min-corner projection onto the octant's
    diagonal direction (entry-distance proxy)."""
    amin = np.asarray(aabbs)[:, 0:3]
    amax = np.asarray(aabbs)[:, 3:6]
    orders = []
    for oct_ in range(8):
        sign = np.array(
            [1.0 if oct_ & 1 else -1.0,
             1.0 if oct_ & 2 else -1.0,
             1.0 if oct_ & 4 else -1.0]
        )
        near_corner = np.where(sign > 0, amin, amax)
        proj = near_corner @ sign
        orders.append(np.argsort(proj, kind="stable"))
    return np.stack(orders).astype(np.int32)


@functools.partial(
    jax.jit,
    static_argnames=("rays_per_tile", "t_min", "t_max", "interpret", "vmem_headroom", "tri_test"),
)
def intersect_clusters_pallas(
    tris16: jnp.ndarray,    # [C,K,16] f32 component-column triangle clusters
    aabbs: jnp.ndarray,     # [C,8] f32 cluster bounds
    order: jnp.ndarray,     # [8,C] i32 per-octant front-to-back order
    origins: jnp.ndarray,   # [N,3]
    directions: jnp.ndarray,
    t_min: float = 0.01,
    t_max: float = 1e16,
    rays_per_tile: int = 512,
    interpret: bool = False,
    vmem_headroom: float = 1.0,
    tri_test: str = "mt",
):
    """Returns (best_t [N], best_prim [N] — 0x7FFFFFFF where miss,
    bary [N,2] — the winner's (beta, gamma)).

    Rays are consumed in caller order.  Pixel/queue order is already
    packet-coherent (neighbouring lanes shade neighbouring pixels); an
    explicit (origin cell, octant) sort was measured at ~8 ms per 256k
    bounce on v5e — more than the culling it buys back at these scene
    sizes, so the integrator does not sort.
    """
    n = origins.shape[0]
    c, k, _ = tris16.shape
    r = rays_per_tile
    n_pad = -(-n // r) * r

    rays = jnp.zeros((8, n_pad), jnp.float32)
    rays = rays.at[0:3, :n].set(origins.T)
    rays = rays.at[3:6, :n].set(directions.T)
    # Padding rays point +x from far away: they miss everything.
    if n_pad > n:
        rays = rays.at[0, n:].set(3.0e37).at[3, n:].set(1.0)

    tiles = n_pad // r
    kernel = functools.partial(
        _cluster_kernel,
        num_clusters=c,
        cluster_k=k,
        t_min=t_min,
        t_max=t_max,
        tri_test=tri_test,
    )
    best_t, best_prim, best_uv = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # aabbs (whole)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # octant orders
            pl.BlockSpec((8, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (c, k, 16), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, r), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((2, n_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, r), jnp.float32),
            pltpu.VMEM((1, r), jnp.int32),
            pltpu.VMEM((1, r), jnp.float32),
            pltpu.VMEM((1, r), jnp.float32),
        ],
        compiler_params=_vmem_params(tris16.size * 4, r, k, vmem_headroom),
        interpret=interpret,
    )(aabbs, order, rays, tris16)
    return best_t[0, :n], best_prim[0, :n], best_uv[:, :n].T


def pack_cluster_tris(vertices: np.ndarray, cluster_size: int) -> np.ndarray:
    """[T,3,3] Morton-permuted vertices -> [C,K,16] component-column layout
    (v0 cols 0-2, e1 cols 3-5, e2 cols 6-8; rest zero => det==0 padding)."""
    t = vertices.shape[0]
    k = cluster_size
    c = max(1, -(-t // k))
    out = np.zeros((c * k, 16), np.float32)
    v0 = vertices[:, 0, :]
    out[:t, 0:3] = v0
    out[:t, 3:6] = vertices[:, 1, :] - v0
    out[:t, 6:9] = vertices[:, 2, :] - v0
    return np.ascontiguousarray(out.reshape(c, k, 16))


def pack_cluster_tris_bw(vertices: np.ndarray, cluster_size: int) -> np.ndarray:
    """[T,3,3] Morton-permuted vertices -> [C,K,16] Baldwin–Weber rows for
    `_bw_tests`: n(0:3), d0=n.v0(3), p1(4:7), c1=-p1.v0(7), p2(8:11),
    c2=-p2.v0(11), rest zero.  Degenerate (zero-area) triangles get n=0
    rows and are culled by the den==0 guard, matching MT's det==0
    behaviour; padding rows are all-zero for the same reason."""
    t = vertices.shape[0]
    k = cluster_size
    c = max(1, -(-t // k))
    out = np.zeros((c * k, 16), np.float32)
    if t:
        v0 = vertices[:, 0, :].astype(np.float64)
        e1 = vertices[:, 1, :].astype(np.float64) - v0
        e2 = vertices[:, 2, :].astype(np.float64) - v0
        n = np.cross(e1, e2)
        nn = (n * n).sum(-1, keepdims=True)
        ok = nn > 1e-30
        safe = np.where(ok, nn, 1.0)
        p1 = np.where(ok, np.cross(e2, n) / safe, 0.0)
        p2 = np.where(ok, np.cross(n, e1) / safe, 0.0)
        n = np.where(ok, n, 0.0)
        out[:t, 0:3] = n
        out[:t, 3:4] = (n * v0).sum(-1, keepdims=True)
        out[:t, 4:7] = p1
        out[:t, 7:8] = -(p1 * v0).sum(-1, keepdims=True)
        out[:t, 8:11] = p2
        out[:t, 11:12] = -(p2 * v0).sum(-1, keepdims=True)
    return np.ascontiguousarray(out.reshape(c, k, 16))
