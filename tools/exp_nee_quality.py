"""NEE policy evidence (VERDICT r3 #6): is --nee a *win per second*?

Round 3 measured NEE's wall-clock adder (+60% on the hero: 2.4 ms
occlusion + 2.2 ms alias/env per launch) but shipped no quality-side
number, so the off-by-default policy rested on cost alone.  This
experiment supplies the missing half:

  * VARIANCE at equal sample count (hardware-independent): per-pixel MSE
    of k-spp estimates against a converged mean, averaged over the frame.
    NEE's per-sample variance reduction factor r = Var_bsdf / Var_nee.
  * EQUAL-TIME verdict: with measured wall costs t_nee/t_bsdf per sample,
    NEE wins iff r > t_nee/t_bsdf (variance of an n-sample mean is
    Var_1/n, so quality per second is Var_1 * t per sample — smaller
    wins).  On CPU the cost ratio is substituted from the round-3 TPU
    measurement (1.60) unless --timed is given on real hardware.
  * SSIM at equal time on the displayed (tonemapped) image, the
    user-visible check at small spp budgets.

Scenes: three-spheres under the procedural HDR (bright sun blob — the
case importance sampling exists for) and the textured monkey.  The
suitcase hero runs on TPU via --scene suitcase (CPU compile of the
streamed kernel is impractical).

Usage (CPU): python tools/exp_nee_quality.py --scene spheres --spp 3
Usage (TPU): PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
    python tools/exp_nee_quality.py --scene suitcase --timed
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build(scene_name: str, nee: bool, size):
    import jax.numpy as jnp  # noqa: F401

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import camera_arrays
    from tpu_pathtracer.scene.scene import make_env
    from tpu_pathtracer.utils.image import procedural_hdr

    env = make_env(procedural_hdr(128, 256))
    if nee:
        from tpu_pathtracer.render.envmap import with_importance_sampling

        env = with_importance_sampling(env)
    w, h = size
    nee_opts = set(nee.split("+")) if isinstance(nee, str) else set()
    common = dict(
        width=w, height=h, samples_per_launch=1, dof=False,
        env_mode="equirect", env_importance_sampling=bool(nee),
        nee_defensive_mix="defensive" in nee_opts,
        nee_mis_spec="mis" in nee_opts,
        rr_mode="standard",   # SAME estimator both arms: isolate NEE
    )
    if scene_name == "spheres":
        from tpu_pathtracer.scene.procedural import three_spheres_scene

        scene = three_spheres_scene()
        scene = scene.replace(env=env)
        cfg = RenderConfig(max_depth=6, intersector="brute", **common)
        cam = Camera(eye=(0, 2, 8), lookat=(0, 1, 0))
    elif scene_name == "monkey":
        from tpu_pathtracer.scene.cache import load_scene_cached

        scene = load_scene_cached(
            ["/root/reference/monkey.obj"], env=env, accel="cluster"
        )
        cfg = RenderConfig(max_depth=6, intersector="cluster", **common)
        cam = Camera(eye=(0, 1, 4), lookat=(0, 0.6, 0))
    elif scene_name == "suitcase":
        from tpu_pathtracer.scene.cache import load_scene_cached

        scene = load_scene_cached(
            ["/root/reference/suitcase.obj", "/root/reference/test.obj"],
            scale=0.05, env=env, accel="cluster",
        )
        cfg = RenderConfig(max_depth=8, intersector="cluster", **common)
        cam = Camera(eye=(0, 2, 6), lookat=(0, 0.5, 0))
    else:
        raise SystemExit(f"unknown scene {scene_name}")
    return scene, camera_arrays(cam.with_aspect(w, h), cfg), cfg


def run_arm(scene_name, nee, size, n_frames, timed):
    """Render n 1-spp frames; return (frames [N,H,W,3], sec_per_frame)."""
    import jax.numpy as jnp

    from tpu_pathtracer.render.integrator import render_frame

    scene, cam, cfg = build(scene_name, nee, size)
    frames = []
    t_best = float("inf")
    for k in range(n_frames):
        t0 = time.time()
        f = render_frame(scene, cam, cfg, jnp.int32(k))
        host = np.asarray(f)      # real sync: axon needs the readback
        dt = time.time() - t0
        if k > 0:                 # frame 0 carries the compile
            t_best = min(t_best, dt)
        frames.append(host)
    if not timed:
        t_best = float("nan")
    return np.stack(frames), t_best, cfg


def luminance(img):
    return img @ np.array([0.2126, 0.7152, 0.0722], np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="spheres",
                    choices=["spheres", "monkey", "suitcase"])
    ap.add_argument("--size", default="160x120")
    ap.add_argument("--frames", type=int, default=48,
                    help="1-spp frames per arm (variance + converged mean)")
    ap.add_argument("--spp", type=int, default=3,
                    help="budget for the equal-time SSIM check")
    ap.add_argument("--timed", action="store_true",
                    help="use measured per-frame wall time (real TPU); "
                    "otherwise substitute the round-3 1.60x cost ratio")
    ap.add_argument("--cost-ratio", type=float, default=1.60,
                    help="t_nee/t_bsdf fallback when not --timed "
                    "(docs/perf_notes.md round-3 NEE decomposition)")
    ap.add_argument("--defensive", action="store_true",
                    help="the NEE arm uses the 0.5 alias + 0.5 cosine "
                    "defensive mixture (cfg.nee_defensive_mix)")
    ap.add_argument("--mis", action="store_true",
                    help="the NEE arm uses spec-lobe MIS "
                    "(cfg.nee_mis_spec); combinable with --defensive")
    ap.add_argument("--denoised", action="store_true",
                    help="additionally sweep display SSIM through the "
                    "built-in A-Trous denoiser (the recommended low-spp "
                    "workflow): does --nee win once fireflies are "
                    "clamp+filtered instead of tonemap-clamped?")
    ap.add_argument("--save-frames", default="",
                    help="npz path to dump both arms' frames for reuse")
    args = ap.parse_args()
    w, h = (int(v) for v in args.size.split("x"))

    from tpu_pathtracer.utils.logging import enable_compile_cache

    enable_compile_cache()

    opts = [o for o, on in (("defensive", args.defensive), ("mis", args.mis)) if on]
    nee_mode = "+".join(opts) if opts else True
    f_off, t_off, cfg = run_arm(args.scene, False, (w, h), args.frames, args.timed)
    f_nee, t_nee, _ = run_arm(args.scene, nee_mode, (w, h), args.frames, args.timed)
    if args.save_frames:
        np.savez_compressed(args.save_frames, bsdf=f_off, nee=f_nee)

    # Converged target: mean of BOTH arms' frames (2N spp total; both
    # estimators are unbiased for the same integral — test_nee_matches_
    # bsdf_sampling_mean gates this).
    target = (f_off.mean(axis=0) + f_nee.mean(axis=0)) / 2.0

    def var_of(frames):
        d = luminance(frames) - luminance(target)[None]
        return float(np.mean(d * d))

    v_off, v_nee = var_of(f_off), var_of(f_nee)
    r = v_off / v_nee
    cost = (t_nee / t_off) if args.timed else args.cost_ratio
    # quality/second metric: variance * time per sample (lower = better)
    eff = r / cost

    # Equal-time SSIM on the displayed image: give the BSDF arm `cost`x
    # the sample budget of the NEE arm (same wall clock).
    from tpu_pathtracer.render.film import post_process, to_uint8
    from tpu_pathtracer.utils.ssim import ssim
    import jax.numpy as jnp

    def shown(x):
        return np.asarray(to_uint8(post_process(jnp.asarray(x), cfg))) / 255.0

    img_ref = shown(target)

    # Displayed-image check across budgets: the tonemap clamps BSDF-arm
    # fireflies (rare bright env hits), so the linear-variance verdict and
    # the small-budget display verdict can disagree — sweep to see where
    # they cross.
    ssim_table = {}
    budgets = sorted({args.spp, 1, 2, 4, 8, 16})
    for b in budgets:
        n_off_b = max(1, int(round(b * cost)))
        if b > len(f_nee) or n_off_b > len(f_off):
            continue
        s_o = ssim(shown(f_off[:n_off_b].mean(axis=0)), img_ref)
        s_n = ssim(shown(f_nee[:b].mean(axis=0)), img_ref)
        ssim_table[f"nee@{b}spp_vs_bsdf@{n_off_b}spp"] = [
            round(float(s_n), 5), round(float(s_o), 5)
        ]
    # Same sweep through the built-in denoiser: the recommended low-spp
    # workflow clamps fireflies BEFORE filtering, so the tonemap-clamp
    # advantage of the BSDF arm may not survive.  One deterministic
    # G-buffer serves both arms (estimator-independent geometry pass).
    denoised_table = {}
    if args.denoised:
        from tpu_pathtracer.render.aov import atrous_denoise, render_aov

        scene_d, cam_d, cfg_d = build(args.scene, False, (w, h))
        aov = render_aov(scene_d, cam_d, cfg_d)

        def shown_dn(x):
            return np.asarray(
                to_uint8(post_process(atrous_denoise(jnp.asarray(x), aov), cfg))
            ) / 255.0

        ref_dn = shown(target)  # judge against the converged RAW display
        for b in budgets:
            n_off_b = max(1, int(round(b * cost)))
            if b > len(f_nee) or n_off_b > len(f_off):
                continue
            s_o = ssim(shown_dn(f_off[:n_off_b].mean(axis=0)), ref_dn)
            s_n = ssim(shown_dn(f_nee[:b].mean(axis=0)), ref_dn)
            denoised_table[f"nee@{b}spp_vs_bsdf@{n_off_b}spp"] = [
                round(float(s_n), 5), round(float(s_o), 5)
            ]

    n_nee = args.spp
    n_off = max(1, int(round(args.spp * cost)))
    s_off = ssim(shown(f_off[:n_off].mean(axis=0)), img_ref)
    s_nee = ssim(shown(f_nee[:n_nee].mean(axis=0)), img_ref)

    print(json.dumps({
        "scene": args.scene, "size": args.size, "frames": args.frames,
        "nee_defensive_mix": args.defensive,
        "nee_mis_spec": args.mis,
        "var_bsdf_1spp": v_off, "var_nee_1spp": v_nee,
        "variance_reduction": round(r, 3),
        "cost_ratio": round(cost, 3),
        "timed": args.timed,
        "sec_per_frame": {"bsdf": t_off, "nee": t_nee},
        "equal_time_efficiency": round(eff, 3),
        "nee_wins_equal_time": bool(eff > 1.0),
        "equal_time_ssim": {
            f"bsdf@{n_off}spp": round(float(s_off), 5),
            f"nee@{n_nee}spp": round(float(s_nee), 5),
        },
        "equal_time_ssim_sweep": ssim_table,
        **({"equal_time_ssim_denoised": denoised_table} if denoised_table else {}),
    }))


if __name__ == "__main__":
    main()
