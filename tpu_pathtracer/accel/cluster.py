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

from tpu_pathtracer.ops.intersect import Hit, _mt_block, finalize_hit


def _pallas_route(cfg) -> tuple[bool, bool]:
    """(use_pallas_kernels, interpret_mode) for this backend.

    Native Mosaic on TPU; on other backends the env toggle
    TPU_PT_PALLAS_INTERPRET=1 routes the SAME kernels through Pallas
    interpret mode — slow, but it lets the multichip dryrun and CPU
    tests validate the exact shipping traversal + sort path under
    shard_map (VERDICT r4 #7) instead of the XLA fallback."""
    import os

    if not cfg.use_pallas:
        return False, False
    if jax.default_backend() == "tpu":
        return True, False
    if os.environ.get("TPU_PT_PALLAS_INTERPRET") == "1":
        return True, True
    return False, False


@struct.dataclass
class ClusterAccel:
    aabb_min: jnp.ndarray   # [C,3]
    aabb_max: jnp.ndarray   # [C,3]
    # Pallas kernel layouts (ops/intersect_pallas): component-row triangle
    # clusters, 8-wide AABB rows, per-octant front-to-back visit orders,
    # and the scene bounds used for ray sort keys.
    tris16: jnp.ndarray     # [C,K,16] f32 (pack_cluster_tris layout)
    aabb8: jnp.ndarray      # [C,8] f32
    order: jnp.ndarray      # [8,C] i32
    scene_lo: jnp.ndarray   # [3] f32
    scene_hi: jnp.ndarray   # [3] f32
    # Two-level (supercluster) arrays: groups of `super_branch` Morton-
    # consecutive clusters with their own bounds and per-octant visit
    # order; child bounds padded to S*branch rows (pads inverted).
    aabb8_child: jnp.ndarray = None   # [S*B,8] f32
    aabb8_super: jnp.ndarray = None   # [S,8] f32
    order_super: jnp.ndarray = None   # [8,S] i32
    # Baldwin–Weber packed rows (pack_cluster_tris_bw) for tri_test="bw";
    # same [C,K,16] shape as tris16 so the kernels swap operand + static
    # test name only.  None when built by an older cache entry.
    tris16bw: jnp.ndarray = None      # [C,K,16] f32
    # static metadata
    cluster_size: int = struct.field(pytree_node=False, default=128)
    super_branch: int = struct.field(pytree_node=False, default=8)

    @property
    def num_clusters(self) -> int:
        return self.aabb_min.shape[0]

    def _want_sort(self, cfg) -> str:
        """Resolve cfg.sort_rays to the concrete mode for this scene:
        "" (off), "octant", or "spatial" (see config.sort_rays)."""
        if self.num_clusters * self.cluster_size >= (1 << 24):
            # prim ids travel through an exact-f32 packed row after the
            # sorted kernel; ids must stay below 2^24.
            if cfg.sort_rays in ("octant", "spatial", "entry"):
                from tpu_pathtracer.utils import logging as plog

                plog.warn_once(
                    "sort_rays",
                    f"sort_rays={cfg.sort_rays!r} ignored: scene has >= 2^24 "
                    "padded prim ids (sorted-kernel prim transport is "
                    "exact-f32; ids must stay below 2^24)",
                )
            return ""
        if cfg.sort_rays in ("octant", "spatial", "entry"):
            return cfg.sort_rays
        if cfg.sort_rays == "off" or self.num_clusters < 2:
            return ""
        # Spatial-major beat pure octant on every scene measured (monkey
        # 3.32 vs 4.03 s, tower 2.35 vs 2.49, sphere-field 10.5 vs 29.8)
        # and edges out no-sort even on the 18-cluster suitcase (2.23 vs
        # 2.30): auto = spatial whenever there is more than one cluster.
        return "spatial"

    def _rpt(self, cfg) -> int:
        if cfg.pallas_rays_per_tile:
            return cfg.pallas_rays_per_tile
        # auto: finer packets cull better once the two-level kernel has
        # removed the per-cluster scalar overhead (sphere field 7.6 s at
        # 512 vs 8.2 at 1024); flat-kernel scenes prefer 1024.
        return 512 if self.num_clusters >= cfg.hier_min_clusters else 1024

    def _tri(self, cfg):
        """Resolve cfg.tri_test to (name, packed [C,K,16] operand) for the
        Pallas kernels.  "bw" = Baldwin–Weber precomputed-transform rows.
        auto = bw: the sweep-G kernel probe measured -15.5% test-loop
        time (52.2 vs 44.1 G tests/s) and the sweep-H end-to-end A/B won
        on every config vs same-day baselines — hero 15.45 vs 15.06,
        monkey 9.66 vs 9.23, 98k field 4.62 vs 4.36 Mrays/s
        (artifacts/tpu_sweep_r05g/h.log).  Falls back to "mt" when the
        accel predates the bw packing (old cache entry).  The XLA
        fallback path always uses MT."""
        mode = "bw" if cfg.tri_test == "auto" else cfg.tri_test
        if mode == "bw" and self.tris16bw is None:
            mode = "mt"
        return mode, (self.tris16bw if mode == "bw" else self.tris16)

    def _dir_bits(self, cfg) -> int:
        """Resolve cfg.sort_dir_bits for this scene.

        auto (0): 2 bits from the round-4 TPU A/B (artifacts/
        tpu_sweep_r04.log: monkey 3.233 -> 2.974 (-8%), hero within day
        noise) — EXCEPT many-cluster scenes, where the finer d3 wedges
        keep paying (98k field, sweep C: d3 6.910 vs d2 7.18-8.10
        s/launch; monkey at 124 clusters measured d3 2.843 vs d2 2.704,
        so the pivot sits between 124 and 766 — 256 splits it along the
        same boundary as the spatial-bits auto).  -1 = off."""
        if cfg.sort_dir_bits == 0:
            return 3 if self.num_clusters >= 256 else 2
        return max(cfg.sort_dir_bits, 0)

    def _sorted_rays(self, mode, origins, directions, cfg):
        from tpu_pathtracer.ops.intersect_pallas import octant_sort

        db = self._dir_bits(cfg)
        if mode == "entry":
            import jax.numpy as jnp

            from tpu_pathtracer.ops.intersect_pallas import (
                entry_rank, entry_sort_key, sort_by_key,
            )

            # The bucketing label must match the KERNEL's visit order
            # (probe_bucket_v2: rank-major keys HURT the 98k field, whose
            # streamed kernel visits Morton blocks, not front-to-back):
            # * in-VMEM flat/hier kernels -> rank in the octant's
            #   front-to-back order, octant major;
            # * HBM-streamed block-major kernel -> the entry cluster's
            #   MORTON ID, id major (octant below).
            streamed = self.tris16.size * 4 > 6 * 1024 * 1024
            if streamed:
                from tpu_pathtracer.ops.intersect_pallas import (
                    entry_nearest_id,
                )

                rank = entry_nearest_id(
                    origins, directions, self.aabb8,
                    t_min=float(cfg.t_min), t_max=float(cfg.t_max),
                )
            else:
                # posinv[o, c] = position of cluster c in octant o's
                # front-to-back order (argsort inverts a permutation).
                posinv = jnp.argsort(self.order, axis=1)
                rank = entry_rank(
                    origins, directions, self.aabb8, posinv,
                    t_min=float(cfg.t_min), t_max=float(cfg.t_max),
                )
            octant = (
                (directions[:, 0] > 0).astype(jnp.int32)
                + 2 * (directions[:, 1] > 0).astype(jnp.int32)
                + 4 * (directions[:, 2] > 0).astype(jnp.int32)
            )
            key = entry_sort_key(
                octant, rank, self.num_clusters,
                directions=directions, dir_bits=db,
                octant_major=not streamed,
            )
            return sort_by_key(origins, directions, key)
        bits = cfg.sort_spatial_bits
        if bits == 0:   # auto: finer cells for compact scenes
            bits = 7 if self.num_clusters < 256 else 5
        return octant_sort(
            origins,
            directions,
            scene_lo=self.scene_lo,
            scene_hi=self.scene_hi,
            spatial_bits=bits if mode == "spatial" else 0,
            dir_bits=db,
        )

    def intersect(self, vertices, origins, directions, t_min, t_max, cfg) -> Hit:
        """Closest hit over all clusters.

        On TPU (cfg.use_pallas) this runs the packet-traversal Pallas
        kernel with per-tile scalar cluster skipping; elsewhere the pure
        XLA scan with batch-level `lax.cond` skipping below.
        vertices: [T,3,3] Morton-permuted (T padded up to C*K internally).
        """
        vmem_bytes = self.tris16.size * 4
        use_pallas, interp = _pallas_route(cfg)
        if use_pallas:
            tri_name, tri_arr = self._tri(cfg)
            # Octant-sorted packets cull dramatically better on
            # multi-cluster scenes (every lane then agrees with the
            # packet's front-to-back visit order); ~1 ms of sort+gather
            # overhead (ops/intersect_pallas.octant_sort), so "auto"
            # skips it for small scenes where packets are cheap anyway.
            sort = self._want_sort(cfg)
            if sort:
                origins, directions, restore = self._sorted_rays(
                    sort, origins, directions, cfg
                )
            if (
                vmem_bytes <= 6 * 1024 * 1024
                and self.num_clusters >= cfg.hier_min_clusters
                and self.aabb8_super is not None
            ):
                # Many clusters: two-level traversal — one scalar slab
                # test skips super_branch clusters at a time (the flat
                # kernel's cost there is per-cluster scalar loop
                # overhead, not triangle math).
                from tpu_pathtracer.ops.intersect_pallas import (
                    intersect_clusters_pallas_hier,
                )

                best_t, best_prim, bary = intersect_clusters_pallas_hier(
                    tri_arr,
                    self.aabb8_child,
                    self.aabb8_super,
                    self.order_super,
                    origins,
                    directions,
                    t_min=float(t_min),
                    t_max=float(t_max),
                    rays_per_tile=self._rpt(cfg),
                    branch=self.super_branch,
                    vmem_headroom=cfg.vmem_headroom,
                    interpret=interp,
                    tri_test=tri_name,
                )
            elif vmem_bytes <= 6 * 1024 * 1024:
                from tpu_pathtracer.ops.intersect_pallas import (
                    intersect_clusters_pallas,
                )

                best_t, best_prim, bary = intersect_clusters_pallas(
                    tri_arr,
                    self.aabb8,
                    self.order,
                    origins,
                    directions,
                    t_min=float(t_min),
                    t_max=float(t_max),
                    rays_per_tile=self._rpt(cfg),
                    vmem_headroom=cfg.vmem_headroom,
                    interpret=interp,
                    tri_test=tri_name,
                )
            else:
                # Beyond the VMEM budget: stream cluster blocks HBM->VMEM
                # with the BLOCK axis outer on the grid (scene bytes read
                # once per call, not once per ray tile) instead of
                # dropping to the 4x-slower XLA scan.  Two-level: a
                # supercluster slab test skips `super_branch` clusters of
                # scalar loop overhead at a time.
                from tpu_pathtracer.ops.intersect_pallas import (
                    intersect_clusters_pallas_streamed,
                )

                best_t, best_prim, bary = intersect_clusters_pallas_streamed(
                    tri_arr,
                    self.aabb8,
                    origins,
                    directions,
                    t_min=float(t_min),
                    t_max=float(t_max),
                    rays_per_tile=self._rpt(cfg),
                    # The streamed kernel builds its own supergroups
                    # (_streamed_pads), so branch is a free per-call knob:
                    # 16 measured best on the 98k field (16.05 vs 16.64 ms
                    # at br8; tools/probe_streamed.py).
                    branch=2 * self.super_branch,
                    vmem_headroom=cfg.vmem_headroom,
                    interpret=interp,
                    tri_test=tri_name,
                )
            if sort:
                # Un-permute via ONE small-table gather (pack the four
                # per-ray outputs into one row; scatters cost 13x more).
                # prim travels as an exact small float (< 2^24 triangles),
                # NOT a bitcast: the 0x7FFFFFFF miss marker bitcast to f32
                # is a NaN payload, and the TPU float datapath CANONICALISES
                # NaN payloads in copies — every marker came back as a
                # different NaN, every lane read as "hit", and the whole
                # frame went black (caught by a /verify TPU render;
                # interpret mode preserves payloads, so CPU tests passed).
                primf = jnp.where(
                    best_prim == jnp.int32(0x7FFFFFFF),
                    jnp.float32(-1.0),
                    best_prim.astype(jnp.float32),
                )
                packed = jnp.concatenate(
                    [best_t[:, None], primf[:, None], bary], axis=-1
                )
                packed = restore(packed)
                best_t = packed[:, 0]
                best_prim = packed[:, 1].astype(jnp.int32)   # -1 = miss
                bary = packed[:, 2:4]
                hit = best_prim >= 0
            else:
                hit = best_prim < jnp.int32(0x7FFFFFFF)
            # The kernel carries the winner's (t, prim, bary), so the Hit
            # assembles with zero per-lane gathers (no finalize pass).
            return Hit(
                t=best_t,
                prim=jnp.where(hit, best_prim, -1),
                bary=jnp.where(hit[:, None], bary, 0.0),
                hit=hit,
            )
        return self._intersect_xla(
            vertices, origins, directions, t_min, t_max, cfg
        )

    def occluded(
        self, vertices, origins, directions, t_min, t_max, cfg, active=None
    ) -> jnp.ndarray:
        """Any-hit query over the cluster accel: True where the segment
        [t_min, t_max] is blocked.  The software `traceOcclusion`
        (reference optixSphere.cu:134-156) — cheaper than closest-hit:
        no distance ordering, no prim/barycentric tracking, and the
        Pallas kernel early-exits once a packet is fully occluded.

        `active=None` queries every lane.  With a mask, inactive lanes
        are PARKED: origin moved outside the scene AABB, direction +x —
        they fail every slab test, and because a parked origin clamps to
        the maximum Morton cell they share one sort key and compact into
        pure all-parked packets that skip all triangle work.  Parking is
        applied only when the batch is sorted: unsorted parked lanes
        would scatter through every packet and permanently block the
        kernels' all-occluded early exit (a parked lane never occludes)
        while compacting nothing.  Their return value is unspecified
        (False on the Pallas path); callers mask on `active`."""
        vmem_bytes = self.tris16.size * 4
        use_pallas, interp = _pallas_route(cfg)
        if use_pallas:
            tri_name, tri_arr = self._tri(cfg)
            sort = self._want_sort(cfg)
            if active is not None and sort:
                park = self.scene_hi + (self.scene_hi - self.scene_lo) + 1.0
                origins = jnp.where(active[:, None], origins, park[None, :])
                directions = jnp.where(
                    active[:, None],
                    directions,
                    jnp.array([1.0, 0.0, 0.0], directions.dtype),
                )
            if sort:
                origins, directions, restore = self._sorted_rays(
                    sort, origins, directions, cfg
                )
            if (
                vmem_bytes <= 6 * 1024 * 1024
                and self.num_clusters >= cfg.hier_min_clusters
                and self.aabb8_super is not None
            ):
                from tpu_pathtracer.ops.intersect_pallas import (
                    occluded_clusters_pallas_hier,
                )

                occ = occluded_clusters_pallas_hier(
                    tri_arr, self.aabb8_child, self.aabb8_super,
                    self.order_super, origins, directions,
                    t_min=float(t_min), t_max=float(t_max),
                    rays_per_tile=self._rpt(cfg),
                    branch=self.super_branch,
                    vmem_headroom=cfg.vmem_headroom,
                    interpret=interp,
                    tri_test=tri_name,
                )
            elif vmem_bytes <= 6 * 1024 * 1024:
                from tpu_pathtracer.ops.intersect_pallas import (
                    occluded_clusters_pallas,
                )

                occ = occluded_clusters_pallas(
                    tri_arr, self.aabb8, self.order, origins, directions,
                    t_min=float(t_min), t_max=float(t_max),
                    rays_per_tile=self._rpt(cfg),
                    vmem_headroom=cfg.vmem_headroom,
                    interpret=interp,
                    tri_test=tri_name,
                )
            else:
                # Big scene: streamed two-level any-hit — shadow rays no
                # longer re-pay the full closest-hit streamed kernel
                # (ADVICE r2 #5): no t/prim/bary tracking, and a packet's
                # compute stops once all its rays are occluded.
                from tpu_pathtracer.ops.intersect_pallas import (
                    occluded_clusters_pallas_streamed,
                )

                occ = occluded_clusters_pallas_streamed(
                    tri_arr, self.aabb8, origins, directions,
                    t_min=float(t_min), t_max=float(t_max),
                    rays_per_tile=self._rpt(cfg),
                    branch=2 * self.super_branch,   # see intersect() note
                    vmem_headroom=cfg.vmem_headroom,
                    interpret=interp,
                    tri_test=tri_name,
                )
            return restore(occ) if sort else occ
        return self._occluded_xla(vertices, origins, directions, t_min, t_max)

    def _occluded_xla(self, vertices, origins, directions, t_min, t_max) -> jnp.ndarray:
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

        ix, iy, iz = (
            jnp.where(jnp.abs(directions[:, a]) > 1e-12, 1.0 / directions[:, a], jnp.inf)
            for a in range(3)
        )
        ox, oy, oz = origins[:, 0], origins[:, 1], origins[:, 2]
        occ0 = jnp.zeros_like(origins[:, 0], dtype=bool)

        def body(occ, inp):
            tri_block, bmin, bmax = inp
            tx0 = (bmin[0] - ox) * ix
            tx1 = (bmax[0] - ox) * ix
            ty0 = (bmin[1] - oy) * iy
            ty1 = (bmax[1] - oy) * iy
            tz0 = (bmin[2] - oz) * iz
            tz1 = (bmax[2] - oz) * iz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1),
            )
            overlap = (tnear <= tfar) & (tfar >= t_min) & (tnear <= t_max) & ~occ

            def test(occ):
                _, _, _, valid = _mt_block(
                    origins, directions, tri_block, t_min, t_max
                )
                return occ | jnp.any(valid, axis=1)

            occ = jax.lax.cond(jnp.any(overlap), test, lambda o: o, occ)
            return occ, None

        occ, _ = jax.lax.scan(
            body, occ0, (tri_blocks, self.aabb_min, self.aabb_max)
        )
        return occ

    def _intersect_xla(self, vertices, origins, directions, t_min, t_max, cfg) -> Hit:
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

        ix, iy, iz = (
            jnp.where(jnp.abs(directions[:, a]) > 1e-12, 1.0 / directions[:, a], jnp.inf)
            for a in range(3)
        )
        ox, oy, oz = origins[:, 0], origins[:, 1], origins[:, 2]

        # *_like keeps shard_map varying axes consistent across the carry.
        # Reduction-based bookkeeping (no argmin gathers); barycentrics
        # recomputed once at the end — see intersect_brute.
        init = (
            jnp.full_like(origins[:, 0], t_max),
            jnp.full_like(origins[:, 0], jnp.int32(0x7FFFFFFF), dtype=jnp.int32),
        )

        def body(carry, inp):
            best_t, best_prim = carry
            tri_block, bmin, bmax, base = inp

            # Slab test (component-unrolled): does any ray's live
            # [t_min, best_t] segment touch this cluster's AABB?
            tx0 = (bmin[0] - ox) * ix
            tx1 = (bmax[0] - ox) * ix
            ty0 = (bmin[1] - oy) * iy
            ty1 = (bmax[1] - oy) * iy
            tz0 = (bmin[2] - oz) * iz
            tz1 = (bmax[2] - oz) * iz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1),
            )
            overlap = (tnear <= tfar) & (tfar >= t_min) & (tnear <= best_t)
            any_hit = jnp.any(overlap)

            def test(carry):
                best_t, best_prim = carry
                t, u, v, valid = _mt_block(
                    origins, directions, tri_block, t_min, t_max
                )
                t = jnp.where(valid, t, jnp.inf)
                t_blk = jnp.min(t, axis=1)
                lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
                prim_blk = jnp.min(
                    jnp.where(
                        t == t_blk[:, None], base + lane, jnp.int32(0x7FFFFFFF)
                    ),
                    axis=1,
                )
                closer = t_blk < best_t
                return (
                    jnp.where(closer, t_blk, best_t),
                    jnp.where(closer, prim_blk, best_prim),
                )

            carry = jax.lax.cond(any_hit, test, lambda x: x, carry)
            return carry, None

        bases = (jnp.arange(c) * k).astype(jnp.int32)
        (best_t, best_prim), _ = jax.lax.scan(
            body, init, (tri_blocks, self.aabb_min, self.aabb_max, bases)
        )
        return finalize_hit(
            vertices, origins, directions, best_t, best_prim, t_min, t_max
        )


def build_cluster_accel(vertices: np.ndarray, cluster_size: int = 128, super_branch: int = 8) -> ClusterAccel:
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

    from tpu_pathtracer.ops.intersect_pallas import (
        octant_orders,
        pack_cluster_tris,
        pack_cluster_tris_bw,
    )

    aabb8 = np.zeros((c, 8), np.float32)
    aabb8[:, 0:3] = amin
    aabb8[:, 3:6] = amax

    # Supercluster level: groups of `branch` Morton-consecutive clusters.
    branch = super_branch
    s = -(-c // branch)
    child = np.zeros((s * branch, 8), np.float32)
    # Padding children are POINT boxes at 3e37: the slab test is
    # order-agnostic (an "inverted" min>max box behaves exactly like the
    # box spanning the two corners — it does NOT fail), but a far point
    # box yields tnear ~ 3e37/|d| >> t_max and never overlaps.
    child[:, 0:3] = 3.0e37
    child[:, 3:6] = 3.0e37
    child[:c] = aabb8
    super8 = np.zeros((s, 8), np.float32)
    # Super bounds from REAL children only (the far-point pads would
    # otherwise blow up the final group's box).
    for g in range(s):
        real = aabb8[g * branch : min((g + 1) * branch, c)]
        super8[g, 0:3] = real[:, 0:3].min(axis=0)
        super8[g, 3:6] = real[:, 3:6].max(axis=0)

    flat = vertices.reshape(-1, 3) if t_count else np.zeros((1, 3), np.float32)
    return ClusterAccel(
        aabb_min=jnp.asarray(amin, jnp.float32),
        aabb_max=jnp.asarray(amax, jnp.float32),
        tris16=jnp.asarray(pack_cluster_tris(vertices, cluster_size)),
        aabb8=jnp.asarray(aabb8),
        order=jnp.asarray(octant_orders(aabb8)),
        scene_lo=jnp.asarray(flat.min(axis=0), jnp.float32),
        scene_hi=jnp.asarray(flat.max(axis=0), jnp.float32),
        aabb8_child=jnp.asarray(child),
        aabb8_super=jnp.asarray(super8),
        order_super=jnp.asarray(octant_orders(super8)),
        tris16bw=jnp.asarray(pack_cluster_tris_bw(vertices, cluster_size)),
        cluster_size=cluster_size,
        super_branch=branch,
    )
