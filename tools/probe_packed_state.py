"""Probe: packed-state streaming schedule (round-3 schedule-overhead lever).

The shipped streaming while-body carries ~16 separate per-lane buffers;
probe_schedule.py measured ~2.4 ms/iter of schedule machinery at 131k
lanes of which ~2 ms is unexplained per-iteration fixed cost attributed
to the number of fused kernels/outputs in the compiled body (knob sweeps
exhausted — docs/perf_notes.md round 3).  This probe re-implements the
IDENTICAL schedule with the whole per-lane state packed into two arrays
(one f32, one u32 — seeds/flags bitcast, never through floats: TPU
canonicalises NaN payloads), so every loop iteration materialises 2
per-lane outputs instead of ~16.  If the fixed cost is fusion-output
count, this shows up directly in s/launch.

Output is bitwise-identical to render_pixels (same math, same RNG
chains, same flush cadence) — verified on CPU with --check.

Usage:
  # CPU equivalence:   python tools/probe_packed_state.py --check
  # TPU A/B timing:    PYTHONPATH=/root/.axon_site:/root/repo \
  #                      python tools/probe_packed_state.py
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp


# f32 columns: 0:3 origin, 3:6 direction, 6:9 attenuation, 9:12 radiance,
# 12:15 lane_accum, 15:15+3*FIFO_D pend_rgb.
# u32 columns: 0 slot, 1 pix, 2 depth, 3 sample_i, 4 pend_cnt, 5 seeds,
# 6 spec_last, 7:7+FIFO_D pend_slot.


def render_stream_packed(scene, cam, cfg, subframe, spp, lanes):
    """Whole-frame (identity pixel map) packed-state streaming renderer.

    Mirrors render/integrator.render_pixels_stream bit for bit; see that
    function for the algorithm commentary.  Scanline hand-out only.
    """
    from tpu_pathtracer.ops.scan import cumsum_i32
    from tpu_pathtracer.render.integrator import (
        _trace_bounce,
        generate_camera_rays,
    )
    from tpu_pathtracer.utils import rng

    n_pix = cfg.width * cfg.height
    lanes = min(lanes, n_pix)
    D = cfg.fifo_depth
    FLUSH_EVERY = cfg.flush_every
    NF, NI = 15 + 3 * D, 7 + D

    def make_path(pix, sample_i):
        seeds0 = rng.make_seeds(pix, sample_i, subframe)
        return generate_camera_rays(
            cam, pix % cfg.width, pix // cfg.width, seeds0, cfg
        )

    i32 = lambda x: x.astype(jnp.int32)
    u32 = lambda x: x.astype(jnp.uint32)

    pix0 = jnp.arange(lanes, dtype=jnp.int32)
    o0, d0, s0 = make_path(pix0, jnp.zeros_like(pix0))

    f = jnp.zeros((lanes, NF), jnp.float32)
    f = f.at[:, 0:3].set(o0).at[:, 3:6].set(d0).at[:, 6:9].set(1.0)
    u = jnp.zeros((lanes, NI), jnp.uint32)
    u = (
        u.at[:, 0].set(u32(pix0))                  # slot
        .at[:, 1].set(u32(pix0))                   # pix
        .at[:, 2].set(jnp.uint32(cfg.max_depth))   # depth
        .at[:, 5].set(s0)                          # seeds
        .at[:, 6].set(jnp.uint32(1))               # spec_last
        .at[:, 7 : 7 + D].set(jnp.uint32(n_pix))   # pend_slot
    )

    out0 = jnp.zeros((n_pix + 1, 3), jnp.float32)
    state = (f, u, out0, jnp.int32(lanes), jnp.int32(0), jnp.int32(0))
    max_iters = (n_pix * spp * (cfg.max_depth + 2)) // lanes + cfg.max_depth + 16

    def cond(st):
        _, u_, _, _, it, _ = st
        return jnp.any(i32(u_[:, 0]) < n_pix) & (it < max_iters)

    def body(st):
        f_, u_, out, head, it, segments = st
        slot = i32(u_[:, 0])
        pix = i32(u_[:, 1])
        depth = i32(u_[:, 2])
        sample_i0 = i32(u_[:, 3])
        pend_cnt0 = i32(u_[:, 4])
        seeds = u_[:, 5]
        spec_last = u_[:, 6] > 0

        live = slot < n_pix
        tb = _trace_bounce(
            scene, cfg, f_[:, 0:3], f_[:, 3:6], f_[:, 6:9], f_[:, 9:12],
            seeds, depth, spec_last,
        )
        seeds_new, u_rr = rng.uniform(tb["seeds"])
        p = jnp.max(tb["attenuation"], axis=-1)
        rr_done = tb["done"] | (u_rr > p)
        newly = live & rr_done
        p_safe = jnp.where(p > 0.0, p, 1.0)
        p_div = jnp.minimum(p_safe, 1.0)
        if cfg.rr_mode == "reference":
            result = tb["radiance"] / p_safe[:, None]
        else:
            result = tb["radiance"]
            tb["attenuation"] = jnp.where(
                (live & ~rr_done)[:, None],
                tb["attenuation"] / p_div[:, None],
                tb["attenuation"],
            )

        lane_accum = f_[:, 12:15] + jnp.where(newly[:, None], result, 0.0)
        sample_i = sample_i0 + newly.astype(jnp.int32)
        pixel_done = newly & (sample_i >= spp)

        retire_slot = jnp.where(pixel_done, slot, n_pix)
        retire_rgb = jnp.where(
            pixel_done[:, None], lane_accum / jnp.float32(spp), 0.0
        )
        pend_slot = i32(u_[:, 7 : 7 + D])
        pend_rgb = f_[:, 15 : 15 + 3 * D].reshape(lanes, D, 3)
        for fpos in range(D):
            sel = pixel_done & (pend_cnt0 == fpos)
            pend_slot = pend_slot.at[:, fpos].set(
                jnp.where(sel, retire_slot, pend_slot[:, fpos])
            )
            pend_rgb = pend_rgb.at[:, fpos].set(
                jnp.where(sel[:, None], retire_rgb, pend_rgb[:, fpos])
            )
        pend_cnt = pend_cnt0 + pixel_done.astype(jnp.int32)

        do_flush = (it % FLUSH_EVERY == FLUSH_EVERY - 1) | jnp.any(
            pend_cnt >= D
        )

        def flush(args):
            out_, ps, pr = args
            out_ = out_.at[ps.reshape(-1)].add(pr.reshape(-1, 3))
            return (
                out_,
                jnp.full_like(ps, n_pix),
                jnp.zeros_like(pr),
                jnp.zeros_like(pend_cnt),
            )

        def no_flush(args):
            out_, ps, pr = args
            return (out_, ps, pr, pend_cnt)

        out, pend_slot, pend_rgb, pend_cnt = jax.lax.cond(
            do_flush, flush, no_flush, (out, pend_slot, pend_rgb)
        )

        inc = cumsum_i32(pixel_done.astype(jnp.int32))
        new_slot = jnp.where(pixel_done, head + inc - 1, slot)
        head = head + inc[-1]
        live_next = new_slot < n_pix
        pix = jnp.where(pixel_done, jnp.minimum(new_slot, n_pix - 1), pix)
        sample_i = jnp.where(pixel_done, 0, sample_i)
        lane_accum = jnp.where(pixel_done[:, None], 0.0, lane_accum)

        regen = (newly & live_next) | (pixel_done & live_next)
        o_r, d_r, s_r = make_path(pix, jnp.minimum(sample_i, spp - 1))
        adv = (live & ~rr_done)[:, None]
        rg = regen[:, None]

        origin = jnp.where(rg, o_r, jnp.where(adv, tb["origin"], f_[:, 0:3]))
        direction = jnp.where(
            rg, d_r, jnp.where(adv, tb["direction"], f_[:, 3:6])
        )
        seeds = jnp.where(regen, s_r, jnp.where(live, seeds_new, u_[:, 5]))
        attenuation = jnp.where(
            rg, 1.0, jnp.where(adv, tb["attenuation"], f_[:, 6:9])
        )
        radiance = jnp.where(
            rg, 0.0, jnp.where(adv, tb["radiance"], f_[:, 9:12])
        )
        depth = jnp.where(
            regen,
            jnp.int32(cfg.max_depth),
            jnp.where(live & ~rr_done, depth - 1, depth),
        )
        spec_new = jnp.where(
            regen, True,
            jnp.where(live & ~rr_done, tb["spec_last"], spec_last),
        )

        f_next = jnp.concatenate(
            [origin, direction, attenuation, radiance, lane_accum,
             pend_rgb.reshape(lanes, 3 * D)], axis=-1,
        )
        u_next = jnp.stack(
            [u32(new_slot), u32(pix), u32(depth), u32(sample_i),
             u32(pend_cnt), seeds, spec_new.astype(jnp.uint32)], axis=-1,
        )
        u_next = jnp.concatenate([u_next, u32(pend_slot)], axis=-1)
        return (
            f_next, u_next, out, head, it + 1,
            segments + jnp.sum(live.astype(jnp.int32)),
        )

    f_f, u_f, out, _, it, segments = jax.lax.while_loop(cond, body, state)
    out = out.at[i32(u_f[:, 7 : 7 + D]).reshape(-1)].add(
        f_f[:, 15 : 15 + 3 * D].reshape(-1, 3)
    )
    return out[:n_pix], dict(iters=it, segments=segments)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true", help="CPU bitwise check")
    ap.add_argument("--lanes", type=int, default=131072)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--spp", type=int, default=10)
    args = ap.parse_args()

    if args.check:
        jax.config.update("jax_platforms", "cpu")

    from tpu_pathtracer.utils.logging import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import camera_arrays, render_pixels
    from tpu_pathtracer.scene.scene import make_env
    from tpu_pathtracer.utils.image import procedural_hdr

    env = make_env(procedural_hdr(64 if args.check else 256,
                                  128 if args.check else 512))

    if args.check:
        from tpu_pathtracer.scene.procedural import three_spheres_scene

        scene = three_spheres_scene(stacks=8, slices=16).replace(env=env)
        cfg = RenderConfig(
            width=64, height=48, samples_per_launch=3, max_depth=4,
            dof=False, env_mode="equirect", intersector="brute",
            stream_lanes=512,
        )
    else:
        from tpu_pathtracer.scene.builder import load_scene

        scene = load_scene(
            ["/root/reference/suitcase.obj", "/root/reference/test.obj"],
            scale=0.05, env=env, rng_seed=0, accel="cluster",
        )
        cfg = RenderConfig(
            width=1920, height=1080, samples_per_launch=args.spp,
            max_depth=8, dof=False, env_mode="equirect",
            intersector="cluster", stream_lanes=args.lanes,
        )
    cam = camera_arrays(
        Camera(eye=(0, 2, 6), lookat=(0, 0.5, 0)).with_aspect(
            cfg.width, cfg.height
        ),
        cfg,
    )
    spp = cfg.samples_per_launch
    n_pix = cfg.width * cfg.height

    packed = jax.jit(functools.partial(
        render_stream_packed, scene, cam, cfg, spp=spp,
        lanes=min(cfg.stream_lanes, n_pix),
    ))

    if args.check:
        ref = render_pixels(scene, cam, cfg, None, jnp.int32(3))
        got, stats = packed(jnp.int32(3))
        same = bool(jnp.all(ref == got))
        diff = np.abs(np.asarray(ref) - np.asarray(got))
        # Packing changes XLA's fusion/FMA choices (same ops, same order,
        # different producers), so agreement is ~ULP, not bitwise — the
        # same class of divergence as deferred_shade (config.py).  Gate
        # at 1e-4 absolute on linear radiance.
        print(f"bitwise identical: {same}  max abs diff {diff.max():.2e}  "
              f"rows differing {int((diff.sum(-1) > 0).sum())}/{ref.shape[0]}  "
              f"iters={int(stats['iters'])} segments={int(stats['segments'])}")
        if diff.max() > 1e-4:
            raise SystemExit(1)
        print("OK (within fusion tolerance)")
        return

    # TPU timing A/B: whole launches, readback sync.
    def time_fn(fn, tag):
        r = fn(jnp.int32(0))
        r = r[0] if isinstance(r, tuple) else r
        float(r.sum())
        t0 = time.perf_counter()
        for k in range(args.frames):
            r = fn(jnp.int32(k + 1))
            r = r[0] if isinstance(r, tuple) else r
            float(r.sum())
        dt = (time.perf_counter() - t0) / args.frames
        print(f"{tag:12s}: {dt:.3f} s/launch")
        return dt

    baseline = jax.jit(
        lambda sf: render_pixels(scene, cam, cfg, None, sf)
    )
    time_fn(baseline, "dict-state")
    time_fn(packed, "packed-state")


if __name__ == "__main__":
    main()
