"""Fused streaming-schedule step: one Pallas kernel per while-iteration.

The streaming work-queue renderer's while-body is trace (intersect +
shade + env, stays in XLA: texture/env gathers cannot live in VMEM)
followed by ~25 small XLA ops of schedule machinery: the Russian-
roulette draw and estimator, retire-FIFO staging, the prefix-sum work
queue, and a dozen masked state merges — round 3 measured this tail at
~2 ms of the ~9 ms iteration (docs/perf_notes.md round-3 budget;
per-stage split in tools/profile_inloop.py).  This module fuses the
schedule into ONE `pallas_call`, so the post-trace step is a single
VMEM-resident pass over the lane pool.

Camera-ray regeneration stays OUTSIDE the kernel on purpose: it is a
pure elementwise chain XLA fuses into one pass, and replaying its float
op sequence inside Mosaic diverged by 1 ulp in the direction (FMA
contraction differences), which is enough to decohere the whole render.
The integrator calls the *same* `generate_camera_rays` both schedules
use and merges on the kernel's regen mask — bitwise by construction
(and DOF is supported for free).

This is the round-5 "resident wavefront" schedule (VERDICT r4 next-1):
shade stays at the hit-buffer boundary, the schedule becomes resident.
Reference tie: the machinery this replaces is what OptiX hides inside
its launch/SER hardware scheduling (reference optixSphere.cu:297-436's
per-thread loop + optixReorder).

State rides in lane-major (k, S, 128) planes (S*128 = lane pool), the
natural vector layout: a [L] vector is a free reshape, a [L,3] matrix
one transpose at the trace boundary.

Bitwise notes:
  * The work queue's global prefix sum is reproduced exactly: the TPU
    grid is sequential, each chunk computes its intra-chunk prefix with
    triangular-matrix matmuls (counts are exact small ints in f32 — the
    ops/scan.cumsum_i32 trick) and a running head carried in SMEM
    scratch supplies the inter-chunk offset in lane order.
  * The PCG chain (utils/rng.py) is pure integer ops — bitwise.
  * The RR draw/estimator are single elementwise float ops (convert,
    mul, div, max, compare) with no mul+add pairs, so no contraction
    ambiguity exists between Mosaic and XLA:TPU.
  * tests/test_fused_schedule.py gates bitwise equality of fused vs
    unfused schedules end-to-end (interpret mode on CPU).
  * Supported envelope (render_pixels_stream falls back otherwise):
    identity pixel mapping, scanline order, no NEE, and a lane pool the
    (rows,128) chunking divides.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32
_INV_U32 = np.float32(2.3283064365386963e-10)
_LANE = 128
# Sublane rows per grid step: 128 rows x 128 lanes = 16384 lanes/chunk
# keeps the ~60 live (rows,128) blocks around 4 MB of VMEM.
_CHUNK_ROWS = 128


def _pcg(x):
    x = x.astype(_U32)
    state = x * _U32(747796405) + _U32(2891336453)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    return (word >> _U32(22)) ^ word


def _u32_to_f32(x):
    """u32 -> f32, bitwise-equal to XLA's convert (round-nearest-even);
    Mosaic has no direct u32->f32 cast.  Both 16-bit halves are exact in
    f32 and hi*2^16 is exact, so the single rounded add (or the FMA it
    may contract to — same result on exact products) performs the one
    correct rounding."""
    lo = (x & _U32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    hi = (x >> _U32(16)).astype(jnp.int32).astype(jnp.float32)
    return hi * np.float32(65536.0) + lo


def _uniform(seed):
    seed = _pcg(seed)
    return seed, _u32_to_f32(seed) * _INV_U32


def _chunk_cumsum(x_f32, tri):
    """Inclusive prefix sum over a (ROWS,128) f32 0/1 chunk in row-major
    lane order; exact for small integer values (same argument as
    ops/scan.cumsum_i32).  tri[q, r] = 1 iff q <= r (upper incl. diag).
    Returns (prefix (ROWS,128), total (1,1))."""
    rows = x_f32.shape[0]
    within = jax.lax.dot_general(
        x_f32, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                             # [ROWS,128] row prefixes
    row_tot = within[:, _LANE - 1 : _LANE]        # [ROWS,1]
    # offsets[r] = sum_{q<r} row_tot[q]: contract dim 0 against the
    # strictly-upper mask, strict[q, r] = 1 iff q < r.
    strict = tri[:rows, :rows] - jnp.eye(rows, dtype=jnp.float32)
    offsets = jax.lax.dot_general(
        strict, row_tot, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                             # [ROWS,1]
    prefix = within + offsets
    total = offsets[rows - 1 : rows, 0:1] + row_tot[rows - 1 : rows, 0:1]
    return prefix, total


def _fused_step_kernel(
    scal_i,      # SMEM (1,4) i32: head_in, spp, sample_offset, seg_in
    tb_o, tb_d, tb_att, tb_rad,      # (3,R,128) f32  trace outputs
    tb_seeds,                        # (R,128) u32
    tb_done,                         # (R,128) i32 (0/1)
    st_o, st_d, st_att, st_rad,      # (3,R,128) f32  pre-trace state
    st_seeds,                        # (R,128) u32
    ints,                            # (5,R,128) i32: slot,pix,sample_i,depth,pend_cnt
    spec,                            # (R,128) i32
    accum,                           # (3,R,128) f32
    pend_slot,                       # (D,R,128) i32
    pend_rgb,                        # (D,3,R,128) f32
    tri,                             # (128,128) f32: tri[q,r] = 1 iff q<=r
    # outputs
    o_o, o_d, o_att, o_rad, o_seeds, o_ints, o_spec, o_accum,
    o_pend_slot, o_pend_rgb,
    o_regen,                         # (R,128) i32 regen mask
    o_scal,                          # SMEM (1,4) i32: head', flush_any, seg', 0
    # scratch
    head_s,                          # SMEM (1,1) f32 running queue head
    flush_s,                         # SMEM (1,1) i32
    seg_s,                           # SMEM (1,1) i32
    *,
    spp: int,
    n_pix: int,
    max_depth: int,
    fifo_d: int,
    rr_reference: bool,
):
    i = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        head_s[0, 0] = scal_i[0, 0].astype(jnp.float32)
        flush_s[0, 0] = 0
        seg_s[0, 0] = scal_i[0, 3]

    slot = ints[0]
    pix = ints[1]
    sample_i = ints[2]
    depth = ints[3]
    pend_cnt = ints[4]
    live = slot < n_pix

    seg_s[0, 0] = seg_s[0, 0] + jnp.sum(live.astype(jnp.int32))

    # ---- Russian roulette (reference cu:379-387) -----------------------
    seeds_new, u_rr = _uniform(tb_seeds[:])
    att0, att1, att2 = tb_att[0], tb_att[1], tb_att[2]
    p = jnp.maximum(jnp.maximum(att0, att1), att2)
    rr_done = (tb_done[:] > 0) | (u_rr > p)
    newly = live & rr_done
    p_safe = jnp.where(p > 0.0, p, 1.0)
    if rr_reference:
        # path_rgb /= p on termination (cu:382-387)
        res0 = tb_rad[0] / p_safe
        res1 = tb_rad[1] / p_safe
        res2 = tb_rad[2] / p_safe
        natt0, natt1, natt2 = att0, att1, att2
    else:
        res0, res1, res2 = tb_rad[0], tb_rad[1], tb_rad[2]
        p_div = jnp.minimum(p_safe, 1.0)   # survival prob is min(p,1)
        surv = live & ~rr_done
        natt0 = jnp.where(surv, att0 / p_div, att0)
        natt1 = jnp.where(surv, att1 / p_div, att1)
        natt2 = jnp.where(surv, att2 / p_div, att2)

    acc0 = accum[0] + jnp.where(newly, res0, 0.0)
    acc1 = accum[1] + jnp.where(newly, res1, 0.0)
    acc2 = accum[2] + jnp.where(newly, res2, 0.0)
    sample_n = sample_i + newly.astype(jnp.int32)
    pixel_done = newly & (sample_n >= spp)

    # ---- retire into the per-lane FIFO ---------------------------------
    # Reciprocal multiply, matching the unfused schedule exactly (a
    # divide-by-constant is rewritten to this by some backends but not
    # others; the explicit mul is deterministic).
    inv_spp = np.float32(1.0 / spp)
    retire_slot = jnp.where(pixel_done, slot, n_pix)
    rr0 = jnp.where(pixel_done, acc0 * inv_spp, 0.0)
    rr1 = jnp.where(pixel_done, acc1 * inv_spp, 0.0)
    rr2 = jnp.where(pixel_done, acc2 * inv_spp, 0.0)
    for fpos in range(fifo_d):
        sel = pixel_done & (pend_cnt == fpos)
        o_pend_slot[fpos] = jnp.where(sel, retire_slot, pend_slot[fpos])
        o_pend_rgb[fpos, 0] = jnp.where(sel, rr0, pend_rgb[fpos, 0])
        o_pend_rgb[fpos, 1] = jnp.where(sel, rr1, pend_rgb[fpos, 1])
        o_pend_rgb[fpos, 2] = jnp.where(sel, rr2, pend_rgb[fpos, 2])
    pend_cnt_n = pend_cnt + pixel_done.astype(jnp.int32)
    flush_s[0, 0] = jnp.maximum(
        flush_s[0, 0], jnp.max((pend_cnt_n >= fifo_d).astype(jnp.int32))
    )

    # ---- work queue: running-head prefix sum ---------------------------
    prefix, total = _chunk_cumsum(pixel_done.astype(jnp.float32), tri[:])
    head0 = head_s[0, 0]
    inc = prefix.astype(jnp.int32)
    new_slot = jnp.where(pixel_done, head0.astype(jnp.int32) + inc - 1, slot)
    head_s[0, 0] = head0 + total[0, 0]
    live_next = new_slot < n_pix
    pix_n = jnp.where(pixel_done, new_slot, pix)       # identity mapping
    sample_n = jnp.where(pixel_done, 0, sample_n)
    acc0 = jnp.where(pixel_done, 0.0, acc0)
    acc1 = jnp.where(pixel_done, 0.0, acc1)
    acc2 = jnp.where(pixel_done, 0.0, acc2)

    # ---- masked state merge ---------------------------------------------
    # Camera regen happens OUTSIDE (see module docstring); regen lanes get
    # their o/d/seeds overwritten there, constants (att/rad/depth/spec)
    # are merged here.
    regen = (newly & live_next) | (pixel_done & live_next)
    adv = live & ~rr_done
    for a in range(3):
        o_o[a] = jnp.where(adv, tb_o[a], st_o[a])
        o_d[a] = jnp.where(adv, tb_d[a], st_d[a])
        o_rad[a] = jnp.where(
            regen, 0.0, jnp.where(adv, tb_rad[a], st_rad[a])
        )
    for a, v in enumerate((natt0, natt1, natt2)):
        o_att[a] = jnp.where(regen, 1.0, jnp.where(adv, v, st_att[a]))
    o_seeds[:] = jnp.where(live, seeds_new, st_seeds[:])
    o_ints[0] = new_slot
    o_ints[1] = pix_n
    o_ints[2] = sample_n
    o_ints[3] = jnp.where(regen, max_depth, jnp.where(adv, depth - 1, depth))
    o_ints[4] = pend_cnt_n
    o_spec[:] = jnp.where(regen, 1, spec[:])
    o_accum[0] = acc0
    o_accum[1] = acc1
    o_accum[2] = acc2
    o_regen[:] = regen.astype(jnp.int32)

    @pl.when(i == nsteps - 1)
    def _():
        o_scal[0, 0] = head_s[0, 0].astype(jnp.int32)
        o_scal[0, 1] = flush_s[0, 0]
        o_scal[0, 2] = seg_s[0, 0]
        o_scal[0, 3] = 0


@functools.partial(
    jax.jit,
    static_argnames=(
        "spp", "n_pix", "max_depth", "rr_reference", "interpret",
    ),
)
def fused_stream_step(
    scal_i,                      # [4] i32: head, unused, sample_offset, segments
    tb_o, tb_d, tb_att, tb_rad,  # (3,S,128) f32
    tb_seeds,                    # (S,128) u32
    tb_done,                     # (S,128) i32
    st_o, st_d, st_att, st_rad,  # (3,S,128) f32
    st_seeds,                    # (S,128) u32
    ints,                        # (5,S,128) i32
    spec,                        # (S,128) i32
    accum,                       # (3,S,128) f32
    pend_slot,                   # (D,S,128) i32
    pend_rgb,                    # (D,3,S,128) f32
    *,
    spp: int,
    n_pix: int,
    max_depth: int,
    rr_reference: bool,
    interpret: bool = False,
):
    """One fused schedule step.  Returns (o, d, att, rad, seeds, ints,
    spec, accum, pend_slot, pend_rgb, regen, scal_out); scal_out [1,4]
    i32 = (head', fifo_full_any, segments', 0).  Regen lanes' o/d/seeds
    must be overwritten by the caller (generate_camera_rays on
    ints[1]/ints[2])."""
    s = tb_seeds.shape[0]
    rows = min(_CHUNK_ROWS, s)
    if s % rows:
        raise ValueError(f"lane rows {s} not a multiple of {rows}")
    steps = s // rows
    d = pend_slot.shape[0]

    tri = jnp.asarray(np.triu(np.ones((_LANE, _LANE), np.float32)))

    kernel = functools.partial(
        _fused_step_kernel,
        spp=spp, n_pix=n_pix, max_depth=max_depth, fifo_d=d,
        rr_reference=rr_reference,
    )

    def vspec(lead):
        if lead is None:
            return pl.BlockSpec(
                (rows, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        zeros = (0,) * len(lead)
        return pl.BlockSpec(
            tuple(lead) + (rows, _LANE),
            lambda i, _z=zeros: _z + (i, 0),
            memory_space=pltpu.VMEM,
        )

    v3 = vspec((3,))
    v1 = vspec(None)
    v5 = vspec((5,))
    vd = vspec((d,))
    vd3 = vspec((d, 3))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    out_shape = [
        jax.ShapeDtypeStruct((3, s, _LANE), jnp.float32),     # o
        jax.ShapeDtypeStruct((3, s, _LANE), jnp.float32),     # d
        jax.ShapeDtypeStruct((3, s, _LANE), jnp.float32),     # att
        jax.ShapeDtypeStruct((3, s, _LANE), jnp.float32),     # rad
        jax.ShapeDtypeStruct((s, _LANE), jnp.uint32),         # seeds
        jax.ShapeDtypeStruct((5, s, _LANE), jnp.int32),       # ints
        jax.ShapeDtypeStruct((s, _LANE), jnp.int32),          # spec
        jax.ShapeDtypeStruct((3, s, _LANE), jnp.float32),     # accum
        jax.ShapeDtypeStruct((d, s, _LANE), jnp.int32),       # pend_slot
        jax.ShapeDtypeStruct((d, 3, s, _LANE), jnp.float32),  # pend_rgb
        jax.ShapeDtypeStruct((s, _LANE), jnp.int32),          # regen
        jax.ShapeDtypeStruct((1, 4), jnp.int32),              # scalars
    ]
    out_specs = [v3, v3, v3, v3, v1, v5, v1, v3, vd, vd3, v1, smem]

    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            smem,
            v3, v3, v3, v3, v1, v1,          # tb
            v3, v3, v3, v3, v1,              # st
            v5, v1, v3, vd, vd3,             # ints/spec/accum/pend
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tri (whole)
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
        # In-place state update: the old state buffers are dead after the
        # step, so the compiler may reuse them for the outputs; tb_done
        # (input 6) is likewise dead and donates to the regen mask.
        input_output_aliases={
            7: 0, 8: 1, 9: 2, 10: 3, 11: 4, 12: 5, 13: 6, 14: 7,
            15: 8, 16: 9, 6: 10,
        },
        interpret=interpret,
    )(
        scal_i.reshape(1, 4),
        tb_o, tb_d, tb_att, tb_rad, tb_seeds, tb_done,
        st_o, st_d, st_att, st_rad, st_seeds,
        ints, spec, accum, pend_slot, pend_rgb, tri,
    )
