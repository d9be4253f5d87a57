"""AOV G-buffer pass + A-Trous denoiser (render/aov.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.render.aov import atrous_denoise, render_aov
from tpu_pathtracer.render.camera import Camera
from tpu_pathtracer.render.integrator import camera_arrays
from tpu_pathtracer.scene.procedural import three_spheres_scene


@pytest.fixture(scope="module")
def scene():
    return three_spheres_scene(stacks=12, slices=24)


@pytest.fixture(scope="module")
def cfg():
    return RenderConfig(
        width=96, height=64, samples_per_launch=1, max_depth=2,
        dof=False, env_mode="constant", intersector="brute",
    )


@pytest.fixture(scope="module")
def aov(scene, cfg):
    cam = camera_arrays(
        Camera(eye=(0, 2, 8), lookat=(0, 1, 0)).with_aspect(
            cfg.width, cfg.height
        ),
        cfg,
    )
    return render_aov(scene, cam, cfg)


def test_aov_shapes_and_ranges(aov, cfg):
    assert aov["normal"].shape == (cfg.height, cfg.width, 3)
    assert aov["depth"].shape == (cfg.height, cfg.width)
    assert aov["albedo"].shape == (cfg.height, cfg.width, 3)
    assert aov["mat"].shape == (cfg.height, cfg.width)
    hit = np.asarray(aov["hit"])
    assert hit.any() and not hit.all()
    # Hit normals are unit; miss normals zero; depth positive iff hit.
    n = np.asarray(aov["normal"])
    ln = np.linalg.norm(n, axis=-1)
    np.testing.assert_allclose(ln[hit], 1.0, atol=1e-5)
    assert (ln[~hit] == 0.0).all()
    d = np.asarray(aov["depth"])
    assert (d[hit] > 0).all() and (d[~hit] == 0).all()
    # Material ids: -1 on miss, valid row otherwise.
    mat = np.asarray(aov["mat"])
    assert (mat[~hit] == -1).all() and (mat[hit] >= 0).all()


def test_aov_ground_plane_normal(aov):
    """The procedural scene's ground plane faces +Y; bottom-center pixels
    of the frame look at it head on."""
    hit = np.asarray(aov["hit"])
    n = np.asarray(aov["normal"])
    row, col = 5, 48   # image row 5 = near-bottom scanline (y-up frame)
    assert hit[row, col]
    np.testing.assert_allclose(n[row, col], [0.0, 1.0, 0.0], atol=1e-3)


def test_aov_deterministic(scene, cfg, aov):
    cam = camera_arrays(
        Camera(eye=(0, 2, 8), lookat=(0, 1, 0)).with_aspect(
            cfg.width, cfg.height
        ),
        cfg,
    )
    again = render_aov(scene, cam, cfg)
    for k in ("normal", "depth", "albedo"):
        np.testing.assert_array_equal(np.asarray(aov[k]), np.asarray(again[k]))


def test_denoise_constant_image_unchanged(aov):
    """A flat field is a fixed point: bilateral weights normalise."""
    h, w = aov["depth"].shape
    img = jnp.full((h, w, 3), 0.7)
    out = atrous_denoise(img, aov, iterations=2)
    np.testing.assert_allclose(np.asarray(out), 0.7, rtol=2e-5)


def test_denoise_reduces_variance_preserves_mean(aov):
    h, w = aov["depth"].shape
    rs = np.random.RandomState(0)
    hit = np.asarray(aov["hit"])
    noisy = 0.5 + 0.25 * rs.randn(h, w, 3).astype(np.float32)
    # 1-spp-class noise needs a wide color sigma (the geometry buffers
    # carry the edge-stopping duty).
    out = np.asarray(
        atrous_denoise(jnp.asarray(noisy), aov, iterations=3, sigma_color=8.0)
    )
    # Variance drops a lot inside smooth hit regions; mean is preserved.
    region = hit & np.roll(hit, 3, 0) & np.roll(hit, -3, 0)
    # (the slanted ground plane's depth gradient legitimately limits
    # cross-pixel mixing there — the factor is a smoke bar, not a tuning)
    assert out[region].std() < 0.5 * noisy[region].std()
    np.testing.assert_allclose(
        out[region].mean(), noisy[region].mean(), atol=0.02
    )


def test_denoise_firefly_suppressed(aov):
    """An isolated high-energy outlier on a flat hit region is replaced
    by its neighbourhood, not smeared into a disk."""
    h, w = aov["depth"].shape
    hit = np.asarray(aov["hit"])
    img = np.full((h, w, 3), 0.3, np.float32)
    ys, xs = np.where(hit)
    y, x = int(ys[len(ys) // 2]), int(xs[len(xs) // 2])
    img[y, x] = 80.0
    out = np.asarray(atrous_denoise(jnp.asarray(img), aov, iterations=3))
    assert out[y, x].max() < 1.0
    assert abs(out[hit].mean() - 0.3) < 0.05


def test_denoise_improves_ssim_vs_converged(scene, cfg, aov):
    """End-to-end value check: a denoised 1-spp frame is closer (SSIM on
    the post-processed image) to a converged render than the raw 1-spp
    frame is."""
    from tpu_pathtracer.render.film import post_process, to_uint8
    from tpu_pathtracer.render.integrator import render_frame
    from tpu_pathtracer.utils.ssim import ssim

    cam = camera_arrays(
        Camera(eye=(0, 2, 8), lookat=(0, 1, 0)).with_aspect(
            cfg.width, cfg.height
        ),
        cfg,
    )
    cfg1 = cfg.replace(samples_per_launch=1, max_depth=4)
    frames = [
        np.asarray(render_frame(scene, cam, cfg1, jnp.int32(k)))
        for k in range(32)
    ]
    clean = np.mean(frames, axis=0)
    noisy = jnp.asarray(frames[0])
    den = atrous_denoise(noisy, aov, sigma_color=4.0)

    def shown(x):
        return np.asarray(to_uint8(post_process(jnp.asarray(x), cfg1))) / 255.0

    s_noisy = ssim(shown(noisy), shown(clean))
    s_den = ssim(shown(den), shown(clean))
    assert s_den > s_noisy + 0.05, (s_noisy, s_den)


def test_denoise_respects_hit_miss_boundary(aov):
    """Environment pixels never bleed into surface pixels."""
    h, w = aov["depth"].shape
    hit = np.asarray(aov["hit"])
    img = np.where(hit[..., None], 0.2, 5.0).astype(np.float32)
    out = np.asarray(atrous_denoise(jnp.asarray(img), aov, iterations=3))
    np.testing.assert_allclose(out[hit], 0.2, rtol=2e-4)
    np.testing.assert_allclose(out[~hit], 5.0, rtol=2e-4)
