"""Multi-chip sharding tests on the 8-virtual-device CPU mesh
(SURVEY.md §4 tier 4: sharded render == single-device render)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.parallel.shard import make_mesh, render_frame_sharded
from tpu_pathtracer.render.camera import Camera
from tpu_pathtracer.render.integrator import camera_arrays, render_frame
from tpu_pathtracer.scene.procedural import single_sphere_scene


@pytest.fixture(scope="module")
def scene():
    return single_sphere_scene(stacks=6, slices=12)


def cfg_(**kw):
    base = dict(
        width=32,
        height=16,
        samples_per_launch=8,
        max_depth=3,
        dof=False,
        env_mode="constant",
        intersector="brute",
    )
    base.update(kw)
    return RenderConfig(**base)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_pixel_sharding_bitwise(scene):
    cfg = cfg_()
    cam = camera_arrays(Camera(), cfg)
    single = np.asarray(render_frame(scene, cam, cfg, jnp.int32(0)))
    mesh = make_mesh()
    sharded = np.asarray(
        render_frame_sharded(scene, cam, cfg, jnp.int32(0), mesh, mode="pixels")
    )
    np.testing.assert_array_equal(sharded, single)


def test_sample_sharding_allclose(scene):
    # Same samples, different summation grouping -> allclose not bitwise.
    cfg = cfg_()
    cam = camera_arrays(Camera(), cfg)
    single = np.asarray(render_frame(scene, cam, cfg, jnp.int32(0)))
    mesh = make_mesh()
    sharded = np.asarray(
        render_frame_sharded(scene, cam, cfg, jnp.int32(0), mesh, mode="samples")
    )
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=2e-5)


def test_pixel_sharding_with_nee_bitwise(scene):
    """Flagship estimator x flagship parallelism: env importance sampling
    under pixel sharding stays bitwise-identical to single-device."""
    from tpu_pathtracer.render.envmap import with_importance_sampling
    from tpu_pathtracer.scene.scene import make_env
    from tpu_pathtracer.utils.image import procedural_hdr

    env = with_importance_sampling(make_env(procedural_hdr(16, 32)))
    sc = scene.replace(env=env)
    cfg = cfg_(env_mode="equirect", env_importance_sampling=True,
               rr_mode="standard")
    cam = camera_arrays(Camera(), cfg)
    single = np.asarray(render_frame(sc, cam, cfg, jnp.int32(0)))
    sharded = np.asarray(
        render_frame_sharded(sc, cam, cfg, jnp.int32(0), make_mesh(), mode="pixels")
    )
    np.testing.assert_array_equal(sharded, single)


def test_device_count_invariance(scene):
    # 2-device and 4-device pixel sharding agree bitwise.
    cfg = cfg_()
    cam = camera_arrays(Camera(), cfg)
    a = np.asarray(
        render_frame_sharded(scene, cam, cfg, jnp.int32(0), make_mesh(2), mode="pixels")
    )
    b = np.asarray(
        render_frame_sharded(scene, cam, cfg, jnp.int32(0), make_mesh(4), mode="pixels")
    )
    np.testing.assert_array_equal(a, b)


def test_indivisible_rejected(scene):
    cfg = cfg_(samples_per_launch=3)
    cam = camera_arrays(Camera(), cfg)
    with pytest.raises(ValueError):
        render_frame_sharded(
            scene, cam, cfg, jnp.int32(0), make_mesh(8), mode="samples"
        )


def test_weak_scaling_per_device_work(scene):
    """VERDICT r4 #4 done-condition: assert sharding DIVIDES the work —
    each device traces ~1/N of the path segments — not just that the
    stitched output is bitwise-equal (a replicate-then-slice bug would
    pass the bitwise tests while making every chip pay the full frame)."""
    from jax.sharding import PartitionSpec as P

    from tpu_pathtracer.parallel.shard import shard_map
    from tpu_pathtracer.render.integrator import (
        render_frame_stats,
        render_pixels,
    )

    cfg = cfg_()
    cam = camera_arrays(Camera(), cfg)
    _, stats = render_frame_stats(scene, cam, cfg, jnp.int32(0))
    total = int(stats["segments"])
    assert total > 0

    ndev = 8
    mesh = make_mesh(ndev)
    chunk = (cfg.width * cfg.height) // ndev

    def worker(scene, cam, subframe):
        base = jax.lax.axis_index("dp").astype(jnp.int32) * chunk
        img, st = render_pixels(
            scene, cam, cfg, (base, chunk), subframe, return_stats=True
        )
        return img, st["segments"][None]

    img, per_dev = shard_map(
        worker,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P("dp"), P("dp")),
    )(scene, cam, jnp.int32(0))
    per_dev = np.asarray(per_dev)
    assert per_dev.shape == (ndev,)
    # Exactly the single-device work, partitioned (same pixels, same seeds).
    assert per_dev.sum() == total
    # Every device does a strict fraction, and the split is balanced.
    assert per_dev.max() < 0.5 * total
    assert per_dev.max() <= 2.0 * per_dev.mean()
    # The stitched shards reproduce the frame.  Bitwise sharded==single is
    # test_pixel_sharding_bitwise's job; this stats-carrying worker compiles
    # to a slightly different fusion (1-ulp reassociation on ~0.1% pixels),
    # so the cross-check here is tolerance-based.
    single = np.asarray(render_frame(scene, cam, cfg, jnp.int32(0)))
    np.testing.assert_allclose(
        np.asarray(img).reshape(cfg.height, cfg.width, 3), single,
        rtol=1e-6, atol=1e-7,
    )


def test_pixel_sharding_streaming_path(scene):
    # Force the streaming work-queue renderer inside shard_map workers.
    cfg = cfg_(stream_lanes=2)
    cam = camera_arrays(Camera(), cfg)
    single = np.asarray(render_frame(scene, cam, cfg, jnp.int32(0)))
    sharded = np.asarray(
        render_frame_sharded(scene, cam, cfg, jnp.int32(0), make_mesh(4), mode="pixels")
    )
    np.testing.assert_array_equal(sharded, single)
