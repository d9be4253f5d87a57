"""Ray-triangle intersection: blocked, divergence-free Möller–Trumbore.

This is the software replacement for the reference's hardware path —
`optixTraverse` over a driver-built GAS (reference optixSphere.cu:99-112,
optixSphere.cpp:860-968).  A TPU has no RT cores, so intersection is a
batched vector computation:

* `intersect_brute` — every ray tests every triangle, processed in
  [N_rays x block] tiles via `lax.scan` so the working set stays bounded.
  Exact; fast enough for the reference's scene sizes (<= ~10k triangles)
  and the correctness oracle for every accelerated path.
* Accelerated variants (cluster-packet BVH, LBVH) live in
  `tpu_pathtracer.accel` and reduce the tested-triangle count; they reuse
  `_mt_block` for their leaf tests.

Triangles are two-sided (the reference never sets OptiX backface culling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

_DET_EPS = 1e-12


@struct.dataclass
class Hit:
    """Closest-hit record for a ray batch ([N] lanes)."""

    t: jnp.ndarray      # [N] f32 hit distance (= t_max sentinel on miss)
    prim: jnp.ndarray   # [N] i32 triangle index (-1 on miss)
    bary: jnp.ndarray   # [N,2] f32 (beta, gamma) barycentrics, OptiX layout
    hit: jnp.ndarray    # [N] bool


def _mt_block(origins, directions, tri_block, t_min, t_max):
    """Möller–Trumbore: [N] rays x [B] triangles -> per-pair (t, u, v, valid).

    origins/directions: [N,3]; tri_block: [B,3,3].
    Returns t [N,B], u [N,B], v [N,B], valid [N,B].
    """
    v0 = tri_block[:, 0, :]                       # [B,3]
    e1 = tri_block[:, 1, :] - v0                  # [B,3]
    e2 = tri_block[:, 2, :] - v0                  # [B,3]

    d = directions[:, None, :]                    # [N,1,3]
    # pvec = dir x e2  -> [N,B,3]
    pvec = jnp.cross(d, e2[None, :, :])
    det = jnp.einsum("bk,nbk->nb", e1, pvec)      # [N,B]
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)

    tvec = origins[:, None, :] - v0[None, :, :]   # [N,B,3]
    u = jnp.einsum("nbk,nbk->nb", tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])        # [N,B,3]
    v = jnp.einsum("nk,nbk->nb", directions, qvec) * inv_det
    t = jnp.einsum("bk,nbk->nb", e2, qvec) * inv_det

    valid = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return t, u, v, valid


def _mt_single(origins, directions, tris, t_min, t_max):
    """Möller–Trumbore with one triangle *per lane*: tris [N,3,3].

    Returns (t, u, v, valid), each [N].  Used by per-ray BVH traversal
    where every lane is testing a different leaf triangle.
    """
    v0 = tris[:, 0, :]
    e1 = tris[:, 1, :] - v0
    e2 = tris[:, 2, :] - v0
    pvec = jnp.cross(directions, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > _DET_EPS, 1.0 / det, 0.0)
    tvec = origins - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(directions * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    valid = (
        (jnp.abs(det) > _DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return t, u, v, valid


def intersect_brute(
    vertices: jnp.ndarray,
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    t_min: float,
    t_max: float,
    block: int = 256,
) -> Hit:
    """Closest hit by exhaustive blocked search.

    vertices: [T,3,3]; origins/directions: [N,3].
    """
    n = origins.shape[0]
    t_count = vertices.shape[0]
    block = max(8, min(block, max(t_count, 8)))
    pad = (-t_count) % block
    if pad:
        # Degenerate (all-zero) triangles never pass the det test.
        vertices = jnp.concatenate(
            [vertices, jnp.zeros((pad, 3, 3), vertices.dtype)], axis=0
        )
    num_blocks = vertices.shape[0] // block
    tri_blocks = vertices.reshape(num_blocks, block, 3, 3)

    # Derive carries from the ray arrays (not fresh constants) so varying
    # manual axes propagate correctly under shard_map.
    init = (
        jnp.full_like(origins[:, 0], t_max),
        jnp.full_like(origins[:, 0], -1, dtype=jnp.int32),
        jnp.zeros_like(origins[:, :2]),
    )

    def body(carry, inp):
        best_t, best_prim, best_bary = carry
        tri_block, base = inp
        t, u, v, valid = _mt_block(origins, directions, tri_block, t_min, t_max)
        t = jnp.where(valid, t, jnp.inf)
        j = jnp.argmin(t, axis=1)                               # [N]
        rows = jnp.arange(n)
        tj = t[rows, j]
        closer = tj < best_t
        best_t = jnp.where(closer, tj, best_t)
        best_prim = jnp.where(closer, base + j.astype(jnp.int32), best_prim)
        bary_j = jnp.stack([u[rows, j], v[rows, j]], axis=-1)
        best_bary = jnp.where(closer[:, None], bary_j, best_bary)
        return (best_t, best_prim, best_bary), None

    bases = (jnp.arange(num_blocks) * block).astype(jnp.int32)
    (best_t, best_prim, best_bary), _ = jax.lax.scan(
        body, init, (tri_blocks, bases)
    )
    hit = best_prim >= 0
    return Hit(t=best_t, prim=best_prim, bary=best_bary, hit=hit)


def intersect_scene(scene, origins, directions, t_min, t_max, cfg) -> Hit:
    """Dispatch to the configured intersector for this scene."""
    mode = cfg.intersector
    accel = scene.accel
    if mode == "brute" or (mode == "auto" and accel is None):
        return intersect_brute(
            scene.vertices, origins, directions, t_min, t_max, cfg.intersect_block
        )
    if accel is None:
        raise ValueError(f"intersector {mode!r} requested but scene has no accel")
    # Accel structures implement .intersect(vertices, o, d, t_min, t_max, cfg)
    return accel.intersect(scene.vertices, origins, directions, t_min, t_max, cfg)
