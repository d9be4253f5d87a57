"""Headline benchmark: Mrays/sec/chip on the suitcase PBR scene.

BASELINE.md metric: "Mrays/sec/chip and spp/sec at 1080p, path depth 8
(suitcase PBR scene)"; target > 100 Mrays/sec on one TPU v5e chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}
(vs_baseline = value / 100 against the BASELINE.json north-star target.)

Usage: python bench.py [--small] [--frames N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_LAST_BENCH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "artifacts", "last_bench.json"
)


def _backend_probe(timeout_s: int = 240) -> bool:
    """True iff ``jax.devices()`` answers in a fresh subprocess.

    The axon TPU tunnel can be down for hours (round 3 lost its whole
    BENCH artifact to this); probing in a subprocess keeps this process's
    jax backend cache clean so a later retry can still succeed.
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _emit_last_known(reason: str) -> int:
    """Structured fallback: the last measured result, clearly marked stale.

    An outage at capture time must not produce an empty round artifact
    (round 3's 13.9 Mrays/s existed only in prose because of this).
    """
    out = {"error": reason}
    try:
        with open(_LAST_BENCH) as f:
            last = json.load(f)
        out.update(
            {
                "metric": f"{last.get('metric', '')} [STALE: {reason}]",
                "value": last.get("value"),
                "unit": last.get("unit", "Mrays/s"),
                "vs_baseline": last.get("vs_baseline"),
                "last_known": last,
            }
        )
    except Exception:  # noqa: BLE001 — no cache: emit the error alone
        pass
    print(json.dumps(out))
    return 0


def _save_last(result: dict) -> None:
    try:
        os.makedirs(os.path.dirname(_LAST_BENCH), exist_ok=True)
        with open(_LAST_BENCH, "w") as f:
            json.dump(result, f, indent=1)
    except OSError:
        pass


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="tiny CPU-friendly config")
    ap.add_argument("--frames", type=int, default=8, help="timed launches")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument(
        "--spp", type=int, default=None,
        help="samples per launch (default 10 — the reference's hard-coded "
        "batch, optixSphere.cu:323; config 1 defaults to its whole 64-spp "
        "budget in one launch)",
    )
    ap.add_argument("--accel", default="auto", choices=["auto", "brute", "cluster"])
    ap.add_argument("--tiles", type=int, default=0, help="pixel tiles per frame (0=auto)")
    ap.add_argument("--lanes", type=int, default=0, help="streaming lane-pool size (0 = config default)")
    ap.add_argument("--nee", action="store_true", help="env importance sampling (config-3 'GGX + env importance sampling' fidelity)")
    ap.add_argument("--pixel-order", default="auto", choices=["auto", "scanline", "tiled"])
    ap.add_argument("--fused", default="auto", choices=["auto", "on", "off"],
                    help="fused Pallas streaming schedule (ops/fused_schedule)")
    ap.add_argument("--sort-rays", default="auto",
                    choices=["auto", "off", "octant", "spatial", "entry"],
                    help="ray coherence sort key (config.sort_rays)")
    ap.add_argument("--mq", default="auto", choices=["auto", "on", "off"],
                    help="multi-queue NEE (config.nee_multi_queue)")
    ap.add_argument("--rpt", type=int, default=0,
                    help="Pallas rays per tile (0 = auto)")
    ap.add_argument("--tri-test", default="auto",
                    choices=["auto", "mt", "bw"],
                    help="triangle-test formulation (config.tri_test)")
    ap.add_argument(
        "--config", type=int, default=0, choices=range(6),
        help="BASELINE.json benchmark config preset (1-5); 0 = headline "
        "(suitcase @ given dims/depth)",
    )
    ap.add_argument(
        "--probe-minutes", type=float, default=20.0,
        help="bounded backend-availability probe before the timed run; "
        "on exhaustion emit the last measured result marked stale "
        "instead of a traceback (0 disables)",
    )
    args = ap.parse_args()

    # Outage resilience: the axon tunnel drops for hours at a time.  Probe
    # (bounded) before committing to the heavy imports/compiles; fall back
    # to the persisted last-known result if the backend never comes up.
    # Always probe: a healthy (or CPU) backend answers in seconds, and the
    # JAX_PLATFORMS env var is not reliable in this container (sitecustomize
    # pre-binds the axon plugin), so env-based gating would skip the probe
    # exactly when it is needed.
    if args.probe_minutes > 0:
        deadline = time.time() + args.probe_minutes * 60
        ok = _backend_probe(min(240, max(10, deadline - time.time())))
        while not ok and time.time() < deadline:
            time.sleep(min(60, max(1, deadline - time.time())))
            rem = deadline - time.time()
            if rem <= 0:
                break
            ok = _backend_probe(min(240, max(10, rem)))
        if not ok:
            return _emit_last_known(
                f"backend unavailable after {args.probe_minutes:g} min probe"
            )

    try:
        return _run(args)
    except RuntimeError as e:
        msg = str(e).lower()
        if "unavailable" in msg or "backend" in msg:
            return _emit_last_known(f"backend failed mid-run: {str(e)[:200]}")
        raise


def _run(args) -> int:
    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.utils.logging import enable_compile_cache

    enable_compile_cache()

    from tpu_pathtracer.accel.build import build_accel
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import (
        camera_arrays,
        render_frame,
        render_frame_stats,
    )
    from tpu_pathtracer.scene.scene import make_env
    from tpu_pathtracer.utils.image import procedural_hdr

    if args.small:
        args.width, args.height, args.frames = 256, 192, 4

    ref = "/root/reference"
    env = make_env(procedural_hdr(256, 512))
    if args.nee:
        from tpu_pathtracer.render.envmap import with_importance_sampling

        env = with_importance_sampling(env)
    accel_kind = (
        ("cluster" if args.accel == "auto" else args.accel)
        if args.accel != "brute"
        else None
    )
    env_mode = "equirect"
    scene = None
    camera = Camera(eye=(0.0, 2.0, 6.0), lookat=(0.0, 0.5, 0.0))

    def obj_scene(files, scale):
        from tpu_pathtracer.scene.builder import load_scene

        return load_scene(
            [f"{ref}/{f}" for f in files],
            scale=scale, env=env, rng_seed=0, accel=accel_kind,
        )

    # BASELINE.json benchmark config presets.
    if args.config == 1:
        # analytic sphere, diffuse, constant sky, 512x512 @ 64 spp
        from tpu_pathtracer.scene.procedural import single_sphere_scene

        scene = single_sphere_scene(stacks=32, slices=64)
        args.width = args.height = 512
        # The whole 64-spp budget in ONE launch: at 0.26M pixels the
        # per-launch fixed costs and the queue's drain tail dominate an
        # 8-spp launch (the 131k-lane pool only gets ~25 full-work
        # iterations); 64 spp/launch amortises both 8x.
        if args.spp is None:
            args.spp = 64
        args.depth = 8
        env_mode = "constant"
        camera = Camera()
    elif args.config == 2:
        scene = obj_scene(["monkey.obj"], 1.0)
        args.depth = 4
        camera = Camera(eye=(0, 1, 4), lookat=(0, 0.6, 0))
    elif args.config == 3 or args.config == 0:
        if os.path.exists(f"{ref}/suitcase.obj"):
            # the reference hero scene (optixSphere.cpp:829-841)
            scene = obj_scene(["suitcase.obj", "test.obj"], 0.05)
        else:
            from tpu_pathtracer.scene.procedural import three_spheres_scene

            scene = three_spheres_scene().replace(env=env)
            camera = Camera()
    elif args.config == 4:
        # statue/lion substitutes: high-poly, deep traversal
        from tpu_pathtracer.accel.build import build_accel as _ba
        from tpu_pathtracer.scene.procedural import high_poly_scene

        scene = high_poly_scene(total_tris=100_000).replace(env=env)
        if accel_kind:
            scene = _ba(scene, kind=accel_kind)
        camera = Camera(eye=(0, 3, 10), lookat=(0, 1, 0))
    elif args.config == 5:
        scene = obj_scene(["tower.obj", "fish.obj", "test.obj"], 1.0)
        camera = Camera(eye=(0, 1.5, 5), lookat=(0, 0.6, 0))

    if args.spp is None:
        args.spp = 10
    n_pix = args.width * args.height
    tiles = args.tiles
    if tiles == 0:
        if args.spp > 1:
            # Streaming work-queue renderer handles the whole frame with a
            # fixed 256k-lane pool; no tiling needed.
            tiles = 1
        else:
            per_tile = 262144
            tiles = max(1, n_pix // per_tile)
            while n_pix % tiles:
                tiles -= 1
    cfg = RenderConfig(
        width=args.width,
        height=args.height,
        samples_per_launch=args.spp,
        max_depth=args.depth,
        dof=False,
        env_mode=env_mode,
        env_importance_sampling=args.nee,
        # NEE requires the textbook RR estimator (config validation).
        rr_mode="standard" if args.nee else "reference",
        intersector=args.accel,
        tile_pixels=(n_pix // tiles) if tiles > 1 else 0,
        pixel_order=args.pixel_order,
        fused_schedule=args.fused,
        sort_rays=args.sort_rays,
        pallas_rays_per_tile=args.rpt,
        nee_multi_queue=args.mq,
        tri_test=args.tri_test,
        **({"stream_lanes": args.lanes} if args.lanes else {}),
    )
    if args.accel not in ("brute", "auto") and scene.accel is None:
        scene = build_accel(scene, kind=args.accel)

    cam = camera_arrays(camera.with_aspect(cfg.width, cfg.height), cfg)

    # Compile + warm up (float() readback = the only reliable device sync
    # on axon).  Gate on non-black output: a silently broken kernel path
    # renders black AND terminates paths instantly, making every timing
    # look fantastic (see docs/perf_notes.md, TPU NaN-payload hazard).
    try:
        warm = render_frame(scene, cam, cfg, jnp.int32(0))
        float(warm.max())
    except Exception as e:  # noqa: BLE001 — filtered, then re-raised
        # Scoped-VMEM model miss (see config.vmem_headroom): retry once
        # with doubled headroom before giving up.
        msg = str(e).lower()
        if not ("vmem" in msg or "resource_exhausted" in msg):
            raise
        cfg = cfg.replace(vmem_headroom=2.0)
        warm = render_frame(scene, cam, cfg, jnp.int32(0))
    if not (float(warm.max()) > 0.0):
        print(json.dumps({"error": "black render — refusing to benchmark"}))
        return 1

    # Traced-ray accounting from inside the actual render schedule
    # (render_frame_stats), including NEE shadow rays.
    _, stats = render_frame_stats(scene, cam, cfg, jnp.int32(0))
    path_segs = int(stats["segments"])
    shadow_segs = int(stats["shadow_segments"])
    segs = path_segs + shadow_segs

    t0 = time.perf_counter()
    for k in range(args.frames):
        img = render_frame(scene, cam, cfg, jnp.int32(k + 1))
    # Device->host readback: on axon, block_until_ready alone can return
    # before remote execution finishes (docs/perf_notes.md measurement
    # rules) — the readback is the only reliable sync.
    float(img.sum())
    dt = time.perf_counter() - t0

    rays_per_launch = segs  # segments == rays traced
    mrays = rays_per_launch * args.frames / dt / 1e6
    spp_per_sec = args.spp * args.frames / dt

    scene_name = {0: "suitcase PBR", 1: "sphere/constant-sky", 2: "monkey+env",
                  3: "suitcase PBR", 4: "high-poly 100k", 5: "tower+fish+test"}[args.config]
    result = {
        "metric": f"Mrays/sec/chip, {scene_name} scene, "
        f"{args.width}x{args.height}, depth {args.depth}, {args.accel} accel "
        f"({jax.devices()[0].platform})",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
        "detail": {
            "rays_per_launch": rays_per_launch,
            "path_segments": path_segs,
            "shadow_segments": shadow_segs,
            "spp_per_sec": round(spp_per_sec, 3),
            "sec_per_launch": round(dt / args.frames, 4),
            "triangles": int(scene.num_triangles),
            "nee": args.nee,
            "frames": args.frames,
        },
    }
    print(json.dumps(result))
    # Persist for the outage fallback — only real-hardware numbers are
    # worth replaying as "last known", and only the headline config.
    if jax.devices()[0].platform != "cpu" and args.config in (0, 3) and not args.nee:
        _save_last(result)
    return 0


if __name__ == "__main__":
    sys.exit(main())
