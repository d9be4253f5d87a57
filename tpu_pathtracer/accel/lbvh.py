"""Threaded LBVH: Morton-split binary hierarchy, flattened depth-first
with skip links, traversed stacklessly one node per lock-step iteration.

Software replacement for the driver-side `optixAccelBuild` + hardware
traversal (reference optixSphere.cpp:860-968, optixSphere.cu:99-112).
Topology follows the LBVH family (split at the highest differing Morton
bit of the sorted codes, median fallback for duplicates); the flattened
skip-link ("threaded") layout turns traversal into a branch-free pointer
chase that fits `lax.while_loop`:

    hit & internal -> node+1 (first child, preorder)
    miss | leaf    -> skip[node] (next subtree in preorder)

Leaves cover contiguous ranges of the Morton-permuted triangle array
(<= leaf_size each), so leaf tests are small per-lane gathers.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tpu_pathtracer.accel.build import morton_codes
from tpu_pathtracer.ops.intersect import Hit, _mt_single


@struct.dataclass
class LBVH:
    aabb_min: jnp.ndarray    # [M,3]
    aabb_max: jnp.ndarray    # [M,3]
    skip: jnp.ndarray        # [M] i32 — next preorder node on miss/leaf
    tri_start: jnp.ndarray   # [M] i32 — leaf triangle range start
    tri_count: jnp.ndarray   # [M] i32 — 0 for internal nodes
    leaf_size: int = struct.field(pytree_node=False, default=4)
    max_iters: int = struct.field(pytree_node=False, default=4096)

    @property
    def num_nodes(self) -> int:
        return self.aabb_min.shape[0]

    def intersect(self, vertices, origins, directions, t_min, t_max, cfg) -> Hit:
        n = origins.shape[0]
        m = self.num_nodes
        k = self.leaf_size

        inv_d = jnp.where(jnp.abs(directions) > 1e-12, 1.0 / directions, jnp.inf)

        # *_like keeps shard_map varying axes consistent across the carry.
        state = (
            jnp.zeros_like(origins[:, 0], dtype=jnp.int32),      # ptr
            jnp.full_like(origins[:, 0], t_max),                 # best_t
            jnp.full_like(origins[:, 0], -1, dtype=jnp.int32),   # best_prim
            jnp.zeros_like(origins[:, :2]),                      # best_bary
            jnp.int32(0),                                        # iterations
        )

        def cond(st):
            ptr, _, _, _, it = st
            return jnp.any(ptr < m) & (it < self.max_iters)

        def body(st):
            ptr, best_t, best_prim, best_bary, it = st
            active = ptr < m
            idx = jnp.minimum(ptr, m - 1)

            bmin = self.aabb_min[idx]                   # [N,3]
            bmax = self.aabb_max[idx]
            t0 = (bmin - origins) * inv_d
            t1 = (bmax - origins) * inv_d
            tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
            tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
            box_hit = (tnear <= tfar) & (tfar >= t_min) & (tnear <= best_t) & active

            count = self.tri_count[idx]
            start = self.tri_start[idx]
            is_leaf = count > 0

            # Leaf: test up to leaf_size triangles, one per lane per step.
            for j in range(k):
                lane_valid = box_hit & is_leaf & (j < count)
                tri_idx = jnp.minimum(
                    start + j, jnp.int32(vertices.shape[0] - 1)
                )
                tris = vertices[tri_idx]                # [N,3,3] gather
                t, u, v, valid = _mt_single(
                    origins, directions, tris, t_min, t_max
                )
                better = lane_valid & valid & (t < best_t)
                best_t = jnp.where(better, t, best_t)
                best_prim = jnp.where(better, tri_idx, best_prim)
                best_bary = jnp.where(
                    better[:, None], jnp.stack([u, v], axis=-1), best_bary
                )

            descend = box_hit & ~is_leaf
            nxt = jnp.where(descend, idx + 1, self.skip[idx])
            ptr = jnp.where(active, nxt, ptr)
            return ptr, best_t, best_prim, best_bary, it + 1

        _, best_t, best_prim, best_bary, _ = jax.lax.while_loop(cond, body, state)
        return Hit(t=best_t, prim=best_prim, bary=best_bary, hit=best_prim >= 0)


def build_lbvh(vertices: np.ndarray, leaf_size: int = 4) -> LBVH:
    """Build over Morton-permuted [T,3,3] vertices (see build_accel)."""
    t_count = vertices.shape[0]
    if t_count == 0:
        raise ValueError("cannot build LBVH over empty scene")
    codes = morton_codes(vertices.mean(axis=1)).astype(np.uint64)
    # The array is already Morton-permuted; codes must be non-decreasing.
    # (If not — e.g. caller skipped build_accel — sort locally.)
    if np.any(np.diff(codes.astype(np.int64)) < 0):
        raise ValueError("build_lbvh expects Morton-permuted triangles")

    tri_min = vertices.min(axis=1)
    tri_max = vertices.max(axis=1)

    aabb_min: List[np.ndarray] = []
    aabb_max: List[np.ndarray] = []
    skip: List[int] = []
    tri_start: List[int] = []
    tri_count: List[int] = []

    def alloc() -> int:
        aabb_min.append(np.zeros(3, np.float32))
        aabb_max.append(np.zeros(3, np.float32))
        skip.append(-1)
        tri_start.append(0)
        tri_count.append(0)
        return len(skip) - 1

    def find_split(lo: int, hi: int) -> int:
        """Split [lo,hi) at the highest differing Morton bit; median if
        all codes equal (duplicate centroids)."""
        first, last = codes[lo], codes[hi - 1]
        if first == last:
            return (lo + hi) // 2
        diff = int(first ^ last)
        msb = diff.bit_length() - 1
        # First index whose code has the msb bit set (codes sorted).
        target = (int(first) >> msb << msb) | (1 << msb)
        split = int(np.searchsorted(codes[lo:hi], np.uint64(target), side="left")) + lo
        if split <= lo or split >= hi:
            return (lo + hi) // 2
        return split

    # Preorder build; during the descent skip[left_child] is set to its
    # sibling, and a second pass turns skip links into "next node after my
    # subtree" for every node.
    root = alloc()

    def build(lo: int, hi: int, node: int):
        aabb_min[node] = tri_min[lo:hi].min(axis=0)
        aabb_max[node] = tri_max[lo:hi].max(axis=0)
        if hi - lo <= leaf_size:
            tri_start[node] = lo
            tri_count[node] = hi - lo
            return
        split = find_split(lo, hi)
        left = alloc()
        build(lo, split, left)
        right = alloc()
        skip[left] = right  # after left subtree comes right child
        build(split, hi, right)
        # skip of right subtree = skip of parent; patched below.

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 64 + 2 * t_count))
    try:
        build(0, t_count, root)
    finally:
        sys.setrecursionlimit(old_limit)

    m = len(skip)
    # Patch skip links: preorder property — skip[node] is the preorder index
    # of the next node that is NOT in node's subtree.  Compute via a pass:
    # a node's subtree occupies [node, subtree_end); children are node+1 ...
    subtree_end = np.zeros(m, np.int64)

    def compute_end(node: int) -> int:
        if tri_count[node] > 0:
            subtree_end[node] = node + 1
            return node + 1
        left = node + 1
        right = skip[left]
        end_l = compute_end(left)
        assert end_l == right, (end_l, right)
        end = compute_end(right)
        subtree_end[node] = end
        return end

    sys.setrecursionlimit(max(old_limit, 64 + 2 * t_count))
    try:
        compute_end(root)
    finally:
        sys.setrecursionlimit(old_limit)

    skip_arr = subtree_end.copy()  # on miss/leaf -> jump past the subtree

    return LBVH(
        aabb_min=jnp.asarray(np.stack(aabb_min), jnp.float32),
        aabb_max=jnp.asarray(np.stack(aabb_max), jnp.float32),
        skip=jnp.asarray(skip_arr, jnp.int32),
        tri_start=jnp.asarray(tri_start, jnp.int32),
        tri_count=jnp.asarray(tri_count, jnp.int32),
        leaf_size=leaf_size,
        max_iters=4 * m + 64,
    )
