"""Texture-LOD quality + perf gate on the hero scene (TPU).

Renders the suitcase hero at 1080p with texture_lod="off" vs another mode
(default "mip"), accumulating N subframes with identical seeds (noise is
correlated, so the comparison isolates the LOD-induced difference),
tonemaps both and reports SSIM plus s/launch for each mode.

Gate (VERDICT r2 next-round #1): SSIM >= 0.99 at converged spp.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
        python tools/ssim_lod.py [--spp 64] [--mode auto]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=64, help="total samples/pixel (subframes x 10)")
    ap.add_argument("--mode", default="mip", choices=["auto", "mip", "split"])
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--save", default="", help="save both tonemapped PNGs with this path prefix")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from tpu_pathtracer.utils.logging import enable_compile_cache

    enable_compile_cache()

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.film import post_process
    from tpu_pathtracer.render.integrator import camera_arrays, render_frame
    from tpu_pathtracer.scene.builder import load_scene
    from tpu_pathtracer.scene.scene import make_env
    from tpu_pathtracer.utils.image import procedural_hdr
    from tpu_pathtracer.utils.ssim import ssim

    env = make_env(procedural_hdr(256, 512))
    scene = load_scene(
        ["/root/reference/suitcase.obj", "/root/reference/test.obj"],
        scale=0.05, env=env, rng_seed=0, accel="cluster",
    )
    print(
        "mip_level:", scene.materials.mip_level,
        "pool MB:", scene.materials.texture_bundles.nbytes / 2**20,
        "mip MB:", 0 if scene.materials.texture_bundles_mip is None
        else scene.materials.texture_bundles_mip.nbytes / 2**20,
    )
    camera = Camera(eye=(0.0, 2.0, 6.0), lookat=(0.0, 0.5, 0.0))
    spp_launch = 10
    launches = max(1, args.spp // spp_launch)

    outs = {}
    times = {}
    for mode in ("off", args.mode):
        cfg = RenderConfig(
            width=args.width, height=args.height,
            samples_per_launch=spp_launch, max_depth=args.depth,
            dof=False, env_mode="equirect", texture_lod=mode,
        )
        cam = camera_arrays(camera.with_aspect(cfg.width, cfg.height), cfg)
        warm = render_frame(scene, cam, cfg, jnp.int32(0))
        assert float(warm.max()) > 0.0, "black render"
        acc = jnp.zeros_like(warm)
        t0 = time.perf_counter()
        for k in range(launches):
            acc = acc + render_frame(scene, cam, cfg, jnp.int32(k))
        img = post_process(acc / launches, cfg)
        arr = np.asarray(img)
        times[mode] = (time.perf_counter() - t0) / launches
        outs[mode] = arr
        print(f"{mode}: {times[mode]:.3f} s/launch")

    s = ssim(outs["off"], outs[args.mode])
    print(json.dumps({
        "ssim": round(float(s), 5),
        "mode": args.mode,
        "spp": launches * spp_launch,
        "s_per_launch_off": round(times["off"], 4),
        f"s_per_launch_{args.mode}": round(times[args.mode], 4),
        "speedup": round(times["off"] / times[args.mode], 3),
        "pass_0.99": bool(s >= 0.99),
    }))
    if args.save:
        from tpu_pathtracer.utils.image import save_image

        save_image(args.save + "_off.png", outs["off"])
        save_image(args.save + f"_{args.mode}.png", outs[args.mode])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
