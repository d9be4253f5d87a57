"""Pallas TPU kernel: packet-style cluster traversal + Möller–Trumbore.

This is the software replacement for the reference's hardware ray-tracing
core (`optixTraverse` over a driver-built BVH + SER re-sorting, reference
optixSphere.cu:99-118) designed for how a TPU actually executes:

* The grid partitions the ray batch into tiles of R rays; each grid step
  owns one tile ("ray packet").
* The whole clustered scene (Morton-ordered clusters of K triangles, 16
  floats per triangle in component-row layout [C,16,K]) lives in VMEM —
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


def _cluster_kernel(
    aabb_ref,    # SMEM [C,8] f32: minx,miny,minz,maxx,maxy,maxz,pad,pad
    order_ref,   # SMEM [8,C] i32: front-to-back cluster order per octant
    rays_ref,    # VMEM (R,8) f32: ox,oy,oz,dx,dy,dz,pad,pad
    tris_ref,    # VMEM [C,16,K] f32 rows: v0xyz(0-2), e1xyz(3-5), e2xyz(6-8)
    t_ref,       # VMEM out (R,1) f32
    prim_ref,    # VMEM out (R,1) i32
    *,
    num_clusters: int,
    cluster_k: int,
    t_min: float,
    t_max: float,
):
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    dx = rays_ref[:, 3:4]
    dy = rays_ref[:, 4:5]
    dz = rays_ref[:, 5:6]

    big = jnp.float32(3.4e38)
    ix = jnp.where(jnp.abs(dx) > 1e-12, 1.0 / dx, big)
    iy = jnp.where(jnp.abs(dy) > 1e-12, 1.0 / dy, big)
    iz = jnp.where(jnp.abs(dz) > 1e-12, 1.0 / dz, big)

    t_ref[:] = jnp.full_like(t_ref, t_max)
    prim_ref[:] = jnp.full_like(prim_ref, _BIG_PRIM)

    # Packet octant from lane 0 (input rays are octant-sorted, so packets
    # are near-uniform; a mixed boundary packet only loses ordering
    # quality, never correctness).  Visiting clusters front-to-back makes
    # the (tnear <= best_t) slab condition cull everything behind the
    # packet's first hits.
    octant = (
        (rays_ref[0, 3] > 0.0).astype(jnp.int32)
        + 2 * (rays_ref[0, 4] > 0.0).astype(jnp.int32)
        + 4 * (rays_ref[0, 5] > 0.0).astype(jnp.int32)
    )

    def visit(pos, _):
        c = order_ref[octant, pos]
        # ---- packet slab test against cluster AABB (scalar-broadcast) --
        bminx = aabb_ref[c, 0]
        bminy = aabb_ref[c, 1]
        bminz = aabb_ref[c, 2]
        bmaxx = aabb_ref[c, 3]
        bmaxy = aabb_ref[c, 4]
        bmaxz = aabb_ref[c, 5]

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
        best_t = t_ref[:]
        overlap = (tnear <= tfar) & (tfar >= t_min) & (tnear <= best_t)

        @pl.when(jnp.any(overlap))
        def _():
            tri = tris_ref[c]                          # (16,K)
            v0x = tri[0:1, :]
            v0y = tri[1:2, :]
            v0z = tri[2:3, :]
            e1x = tri[3:4, :]
            e1y = tri[4:5, :]
            e1z = tri[5:6, :]
            e2x = tri[6:7, :]
            e2y = tri[7:8, :]
            e2z = tri[8:9, :]

            # Component-unrolled Möller–Trumbore over the (R,K) pair grid.
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
            tc = jnp.where(ok, t, jnp.float32(jnp.inf))
            t_blk = jnp.min(tc, axis=1, keepdims=True)          # (R,1)
            lane = jax.lax.broadcasted_iota(jnp.int32, tc.shape, 1)
            prim_blk = jnp.min(
                jnp.where(tc == t_blk, c * cluster_k + lane, _BIG_PRIM),
                axis=1,
                keepdims=True,
            )
            best = t_ref[:]
            improved = t_blk < best
            t_ref[:] = jnp.where(improved, t_blk, best)
            prim_ref[:] = jnp.where(improved, prim_blk, prim_ref[:])

        return 0

    jax.lax.fori_loop(0, num_clusters, visit, 0)


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
    static_argnames=("rays_per_tile", "t_min", "t_max", "interpret"),
)
def intersect_clusters_pallas(
    tris16: jnp.ndarray,    # [C,16,K] f32 component-row triangle clusters
    aabbs: jnp.ndarray,     # [C,8] f32 cluster bounds
    order: jnp.ndarray,     # [8,C] i32 per-octant front-to-back order
    origins: jnp.ndarray,   # [N,3]
    directions: jnp.ndarray,
    t_min: float = 0.01,
    t_max: float = 1e16,
    rays_per_tile: int = 512,
    interpret: bool = False,
):
    """Returns (best_t [N], best_prim [N] — 0x7FFFFFFF where miss).

    For the front-to-back culling to bite, sort the rays by
    (origin cell, direction octant) first — see ClusterAccel.intersect.
    """
    n = origins.shape[0]
    c, _, k = tris16.shape
    r = rays_per_tile
    n_pad = -(-n // r) * r

    rays = jnp.zeros((n_pad, 8), jnp.float32)
    rays = rays.at[:n, 0:3].set(origins)
    rays = rays.at[:n, 3:6].set(directions)
    # Padding rays point +x from far away: they miss everything.
    if n_pad > n:
        rays = rays.at[n:, 0].set(3.0e37).at[n:, 3].set(1.0)

    tiles = n_pad // r
    kernel = functools.partial(
        _cluster_kernel,
        num_clusters=c,
        cluster_k=k,
        t_min=t_min,
        t_max=t_max,
    )
    best_t, best_prim = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # aabbs (whole)
            pl.BlockSpec(memory_space=pltpu.SMEM),      # octant orders
            pl.BlockSpec((r, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (c, 16, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(aabbs, order, rays, tris16)
    return best_t[:n, 0], best_prim[:n, 0]


def pack_cluster_tris(vertices: np.ndarray, cluster_size: int) -> np.ndarray:
    """[T,3,3] Morton-permuted vertices -> [C,16,K] component-row layout
    (v0 rows 0-2, e1 rows 3-5, e2 rows 6-8; rest zero => det==0 padding)."""
    t = vertices.shape[0]
    k = cluster_size
    c = max(1, -(-t // k))
    out = np.zeros((c * k, 16), np.float32)
    v0 = vertices[:, 0, :]
    out[:t, 0:3] = v0
    out[:t, 3:6] = vertices[:, 1, :] - v0
    out[:t, 6:9] = vertices[:, 2, :] - v0
    return np.ascontiguousarray(
        out.reshape(c, k, 16).transpose(0, 2, 1)
    )
