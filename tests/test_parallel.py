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


def test_pixel_sharding_streaming_path(scene):
    # Force the streaming work-queue renderer inside shard_map workers.
    cfg = cfg_(stream_lanes=2)
    cam = camera_arrays(Camera(), cfg)
    single = np.asarray(render_frame(scene, cam, cfg, jnp.int32(0)))
    sharded = np.asarray(
        render_frame_sharded(scene, cam, cfg, jnp.int32(0), make_mesh(4), mode="pixels")
    )
    np.testing.assert_array_equal(sharded, single)
