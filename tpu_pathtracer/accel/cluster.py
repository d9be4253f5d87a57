"""Cluster accel: Morton-ordered triangle clusters with AABB culling.

The TPU-idiomatic middle ground between brute force and a deep BVH:
triangles (already Morton-permuted by `build_accel`) are sliced into
fixed-size clusters; intersection scans clusters and tests each one's
triangles *only when some ray in the batch overlaps its AABB*
(`lax.cond` — XLA Conditional executes a single branch at runtime).

Every arithmetic op stays a dense [rays x cluster_size] vector op — no
per-lane gathers, no divergent stacks — so the VPU runs at full tilt; the
cond-skip supplies the "BVH win" whenever the ray batch is even mildly
coherent.  This is the software analog of the reference's single-level GAS
(reference optixSphere.cpp:860-968) re-shaped for a vector machine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tpu_pathtracer.ops.intersect import Hit, _mt_block


@struct.dataclass
class ClusterAccel:
    aabb_min: jnp.ndarray   # [C,3]
    aabb_max: jnp.ndarray   # [C,3]
    # static metadata
    cluster_size: int = struct.field(pytree_node=False, default=128)

    @property
    def num_clusters(self) -> int:
        return self.aabb_min.shape[0]

    def intersect(self, vertices, origins, directions, t_min, t_max, cfg) -> Hit:
        """Closest hit over all clusters with AABB cond-skip.

        vertices: [T,3,3] Morton-permuted (T padded up to C*K internally).
        """
        n = origins.shape[0]
        k = self.cluster_size
        c = self.num_clusters
        t_count = vertices.shape[0]
        pad = c * k - t_count
        if pad:
            vertices = jnp.concatenate(
                [vertices, jnp.zeros((pad, 3, 3), vertices.dtype)], axis=0
            )
        tri_blocks = vertices.reshape(c, k, 3, 3)

        inv_d = jnp.where(
            jnp.abs(directions) > 1e-12, 1.0 / directions, jnp.inf
        )

        # *_like keeps shard_map varying axes consistent across the carry.
        init = (
            jnp.full_like(origins[:, 0], t_max),
            jnp.full_like(origins[:, 0], -1, dtype=jnp.int32),
            jnp.zeros_like(origins[:, :2]),
        )

        def body(carry, inp):
            best_t, best_prim, best_bary = carry
            tri_block, bmin, bmax, base = inp

            # Slab test: does any ray's live [t_min, best_t] segment touch
            # this cluster's AABB?
            t0 = (bmin[None, :] - origins) * inv_d     # [N,3]
            t1 = (bmax[None, :] - origins) * inv_d
            tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
            tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
            overlap = (tnear <= tfar) & (tfar >= t_min) & (tnear <= best_t)
            any_hit = jnp.any(overlap)

            def test(carry):
                best_t, best_prim, best_bary = carry
                t, u, v, valid = _mt_block(
                    origins, directions, tri_block, t_min, t_max
                )
                t = jnp.where(valid, t, jnp.inf)
                j = jnp.argmin(t, axis=1)
                rows = jnp.arange(n)
                tj = t[rows, j]
                closer = tj < best_t
                best_t = jnp.where(closer, tj, best_t)
                best_prim = jnp.where(
                    closer, base + j.astype(jnp.int32), best_prim
                )
                bary_j = jnp.stack([u[rows, j], v[rows, j]], axis=-1)
                best_bary = jnp.where(closer[:, None], bary_j, best_bary)
                return best_t, best_prim, best_bary

            carry = jax.lax.cond(any_hit, test, lambda x: x, carry)
            return carry, None

        bases = (jnp.arange(c) * k).astype(jnp.int32)
        (best_t, best_prim, best_bary), _ = jax.lax.scan(
            body, init, (tri_blocks, self.aabb_min, self.aabb_max, bases)
        )
        hit = best_prim >= 0
        return Hit(t=best_t, prim=best_prim, bary=best_bary, hit=hit)


def build_cluster_accel(vertices: np.ndarray, cluster_size: int = 128) -> ClusterAccel:
    """Build cluster AABBs over Morton-permuted [T,3,3] vertices."""
    t_count = vertices.shape[0]
    c = max(1, -(-t_count // cluster_size))
    pad = c * cluster_size - t_count
    v = vertices
    if pad:
        # Padding triangles collapse to the last real vertex so they do not
        # inflate the final cluster's AABB.
        fill = np.broadcast_to(v[-1, -1], (pad, 3, 3)) if t_count else np.zeros((pad, 3, 3), np.float32)
        v = np.concatenate([v, fill], axis=0)
    blocks = v.reshape(c, cluster_size, 3, 3)
    amin = blocks.reshape(c, -1, 3).min(axis=1)
    amax = blocks.reshape(c, -1, 3).max(axis=1)
    import jax.numpy as jnp

    return ClusterAccel(
        aabb_min=jnp.asarray(amin, jnp.float32),
        aabb_max=jnp.asarray(amax, jnp.float32),
        cluster_size=cluster_size,
    )
