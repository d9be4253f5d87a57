"""Probe: in-loop marginal cost of the texture-bundle gather vs pool size.

The round-2 size sweep (docs/perf_notes.md) measured sub-16 MB tables
gathering ~8x faster standalone, but the end-to-end mip-ladder win came
out at only 1.7% — this probe measures the SAME gather inside a jitted
loop shaped like the render loop to find where the staging cliff really
sits when the Pallas intersect kernel shares VMEM.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
        python tools/probe_mip_gather.py [--lanes 131072] [--budgets 12,4,2]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=131072)
    ap.add_argument("--budgets", default="12,8,4,2,1")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--with-intersect", action="store_true",
                    help="run the Pallas intersect in the same loop body")
    args = ap.parse_args()

    from tpu_pathtracer.utils.logging import enable_compile_cache

    enable_compile_cache()

    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.ops.gather import gather_rows
    from tpu_pathtracer.ops.intersect import intersect_scene
    from tpu_pathtracer.render.camera import Camera
    from tpu_pathtracer.render.integrator import camera_arrays, generate_camera_rays
    from tpu_pathtracer.render.texsample import sample_bundle
    from tpu_pathtracer.scene import scene as S
    from tpu_pathtracer.scene.builder import load_scene
    from tpu_pathtracer.scene.scene import make_env, make_material_table
    from tpu_pathtracer.utils import rng
    from tpu_pathtracer.utils.image import procedural_hdr

    ref = "/root/reference"
    env = make_env(procedural_hdr(64, 128))
    scene = load_scene(
        [f"{ref}/suitcase.obj", f"{ref}/test.obj"],
        scale=0.05, env=env, rng_seed=0, accel="cluster",
    )
    cfg = RenderConfig(
        width=1920, height=1080, samples_per_launch=10, max_depth=8,
        dof=False, env_mode="equirect", intersector="cluster",
    )
    cam = camera_arrays(
        Camera(eye=(0.0, 2.0, 6.0), lookat=(0.0, 0.5, 0.0)).with_aspect(
            cfg.width, cfg.height
        ),
        cfg,
    )
    n = args.lanes
    n_pix = cfg.width * cfg.height
    start = max(0, (n_pix - n) // 2)
    pix = (start + jnp.arange(n, dtype=jnp.int32)) % n_pix
    seeds0 = rng.make_seeds(pix, jnp.zeros_like(pix), jnp.int32(0))
    o0, d0, seeds0 = generate_camera_rays(
        cam, pix % cfg.width, pix // cfg.width, seeds0, cfg
    )
    hit0 = intersect_scene(scene, o0, d0, 0.01, 1e16, cfg)
    prim = jnp.maximum(hit0.prim, 0)
    ta = gather_rows(scene.tri_attrs, prim)
    ma0 = gather_rows(
        scene.materials.attrs, ta[:, S.TRI_MAT].astype(jnp.int32)
    )
    u0 = jax.block_until_ready(hit0.bary[:, 0])
    v0 = hit0.bary[:, 1]
    hitm = hit0.hit
    print(f"lanes={n} hit%={float(hitm.mean())*100:.1f}")

    salt = [0]
    K = args.k

    def measure(name, body):
        def loop(u, saltv, iters):
            def step(i, st):
                return body(st)
            return jax.lax.fori_loop(0, iters, step, u + saltv).sum()

        jl = jax.jit(loop)

        def run(iters):
            salt[0] += 1
            sv = jnp.float32(salt[0] * 1e-4)
            t0 = time.perf_counter()
            float(jl(u0, sv, iters))
            return time.perf_counter() - t0

        run(K); run(2 * K)
        tK = min(run(K) for _ in range(3))
        t2K = min(run(2 * K) for _ in range(3))
        m = (t2K - tK) / K
        print(f"{name:34s}: {m*1e3:7.2f} ms/iter"
              f"  ({m/n*1e9:6.2f} ns/lane)  [abs {tK*1e3:6.1f}/{t2K*1e3:6.1f}]")
        return m

    def bundle_body(pool, offc, wc, hc, scrambled, pow2):
        off = ma0[:, offc].astype(jnp.int32)
        w = ma0[:, wc].astype(jnp.int32)
        h = ma0[:, hc].astype(jnp.int32)

        def body(u):
            bs = sample_bundle(
                pool, off, w, h, u, v0,
                morton=False, scrambled=scrambled, pow2_dims=pow2,
                active=hitm,
            )
            return 0.999 * u + 1e-6 * bs[0][:, 0]

        return body

    # Base pool (full res).
    m = scene.materials
    print(f"base pool {m.texture_bundles.nbytes/2**20:.1f} MB "
          f"(scrambled={m.bundled_scrambled})")
    measure("base 128MB", bundle_body(
        m.texture_bundles, S.MAT_BUNDLE_OFFSET, S.MAT_BUNDLE_WIDTH,
        S.MAT_BUNDLE_HEIGHT, m.bundled_scrambled, m.bundled_pow2_dims,
    ))

    # Rebuild material tables at several mip budgets.
    mats = scene.materials._mat_dicts if hasattr(scene.materials, "_mat_dicts") else None
    from tpu_pathtracer.scene import builder as B

    for mb in [float(x) for x in args.budgets.split(",")]:
        tab = make_material_table(
            scene.materials_src, scene.texture_quads_src,
            mip_budget_bytes=int(mb * 2**20), mip_min_pool_bytes=0,
        ) if hasattr(scene, "materials_src") else None
        if tab is None:
            # Reconstruct via the builder path is heavy; instead derive a
            # synthetic mip pool by decimating rows of the base pool: the
            # GATHER cost only depends on table size and index spread.
            rows = m.texture_bundles
            stride = max(1, int(rows.shape[0] * 32 / (mb * 2**20)))
            pool = rows[::stride]
            npool = pool.shape[0]
            off = jnp.zeros_like(ma0[:, 0])

            def body(u, pool=pool, npool=npool):
                idx = (
                    (
                        (u * 1e4).astype(jnp.uint32)
                        + jnp.arange(n, dtype=jnp.uint32)
                        * jnp.uint32(2654435761)
                    )
                    % jnp.uint32(npool)
                ).astype(jnp.int32)
                r = pool[idx]
                return 0.999 * u + 1e-6 * (
                    (r[:, 0] & 0xFF).astype(jnp.float32)
                )

            measure(f"synthetic {mb:5.1f}MB raw gather", body)

    if args.with_intersect:
        def body(u):
            hit = intersect_scene(scene, o0, d0 + 1e-6 * u[:, None], 0.01, 1e16, cfg)
            bs = sample_bundle(
                m.texture_bundles_mip,
                ma0[:, S.MAT_MIP_OFFSET].astype(jnp.int32),
                ma0[:, S.MAT_MIP_WIDTH].astype(jnp.int32),
                ma0[:, S.MAT_MIP_HEIGHT].astype(jnp.int32),
                u, v0,
                morton=False, scrambled=m.mip_scrambled,
                pow2_dims=m.mip_pow2_dims, active=hitm,
            ) if m.texture_bundles_mip is not None else [u[:, None]] * 4
            return 0.999 * u + 1e-6 * (bs[0][:, 0] + hit.t)

        measure("mip 8MB + intersect in body", body)

    if m.texture_bundles_mip is not None:
        print(f"mip pool {m.texture_bundles_mip.nbytes/2**20:.1f} MB "
              f"(scrambled={m.mip_scrambled})")
        measure("mip pool (real)", bundle_body(
            m.texture_bundles_mip, S.MAT_MIP_OFFSET, S.MAT_MIP_WIDTH,
            S.MAT_MIP_HEIGHT, m.mip_scrambled, m.mip_pow2_dims,
        ))


if __name__ == "__main__":
    main()
