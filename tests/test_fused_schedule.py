"""Fused streaming schedule (ops/fused_schedule) vs the unfused XLA
schedule.  The kernel replays the exact op sequences (RR draw, estimator,
FIFO staging, prefix-sum queue; camera regen runs outside through the
shared generate_camera_rays), so:

  * stepped EAGERLY (while_loop replaced by a python loop) the two
    schedules are BITWISE identical, field by field — the strong gate on
    op-sequence equality;
  * compiled end-to-end they match to compiler re-association noise
    (XLA fuses each graph differently and re-rounds a handful of FMA
    contractions — the same effect tests/test_integrator.py gates for
    deferred shading), with most pixels still bitwise-equal.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.render.camera import Camera
from tpu_pathtracer.render import integrator as I
from tpu_pathtracer.render.integrator import (
    _fused_stream_ok,
    camera_arrays,
    render_pixels_stream,
    render_pixels_stream_fused,
)
from tpu_pathtracer.scene.procedural import three_spheres_scene


@pytest.fixture(scope="module")
def scene():
    return three_spheres_scene(stacks=8, slices=16)


def _cfg(**kw):
    base = dict(
        width=64, height=48, samples_per_launch=3, max_depth=4,
        dof=False, env_mode="sunsky", intersector="brute",
        fused_schedule="on",
    )
    base.update(kw)
    return RenderConfig(**base)


def _stepped_states(scene, cfg, n_iters, subframe=2, sample_offset=0,
                    lanes=512):
    """Run both schedules for n_iters eager iterations (while_loop
    replaced by a python loop) and return their raw state dicts."""
    cam = camera_arrays(Camera(eye=(0, 2, 8), lookat=(0, 1, 0)), cfg)
    spp = cfg.samples_per_launch
    stash = []
    real_while = jax.lax.while_loop

    def stepped_while(cond, body, state):
        if not (isinstance(state, dict) and "out" in state):
            return real_while(cond, body, state)
        for _ in range(n_iters):
            state = body(state)
        stash.append(state)
        return state

    try:
        jax.lax.while_loop = stepped_while
        render_pixels_stream(
            scene, cam, cfg.replace(fused_schedule="off"), None,
            jnp.int32(subframe), jnp.int32(sample_offset), spp, lanes,
        )
        render_pixels_stream_fused(
            scene, cam, cfg, jnp.int32(subframe), jnp.int32(sample_offset),
            spp, lanes,
        )
    finally:
        jax.lax.while_loop = real_while
    return stash[0], stash[1], lanes


def _compare_states(u, f, lanes):
    """Field-by-field bitwise comparison of unfused vs fused state."""
    def up3(x):   # (3,S,128) -> [L,3]
        return np.asarray(x).reshape(3, lanes).T

    def up1(x):
        return np.asarray(x).reshape(lanes)

    pairs = [
        ("slot", np.asarray(u["slot"]), up1(f["ints"][0])),
        ("pix", np.asarray(u["pix"]), up1(f["ints"][1])),
        ("sample_i", np.asarray(u["sample_i"]), up1(f["ints"][2])),
        ("depth", np.asarray(u["depth"]), up1(f["ints"][3])),
        ("pend_cnt", np.asarray(u["pend_cnt"]), up1(f["ints"][4])),
        ("origin", np.asarray(u["origin"]), up3(f["o"])),
        ("direction", np.asarray(u["direction"]), up3(f["d"])),
        ("seeds", np.asarray(u["seeds"]), up1(f["seeds"])),
        ("attenuation", np.asarray(u["attenuation"]), up3(f["att"])),
        ("radiance", np.asarray(u["radiance"]), up3(f["rad"])),
        ("lane_accum", np.asarray(u["lane_accum"]), up3(f["accum"])),
        ("head", np.asarray(u["head"]), np.asarray(f["head"])),
        ("segments", np.asarray(u["segments"]), np.asarray(f["segments"])),
        ("out", np.asarray(u["out"]), np.asarray(f["out"])),
        ("pend_slot", np.asarray(u["pend_slot"]),
         np.asarray(f["pend_slot"]).reshape(-1, lanes).T),
        ("pend_rgb", np.asarray(u["pend_rgb"]),
         np.asarray(f["pend_rgb"]).reshape(-1, 3, lanes).transpose(2, 0, 1)),
    ]
    for name, a, b in pairs:
        assert a.shape == b.shape, f"{name}: {a.shape} vs {b.shape}"
        if a.dtype.kind == "f":
            eq = (a == b) | (np.isnan(a) & np.isnan(b))
        else:
            eq = a == b
        assert eq.all(), (
            f"{name}: {int((~eq).sum())} bitwise diffs, first at "
            f"{np.argwhere(~eq)[:3].tolist()}"
        )


@pytest.mark.parametrize(
    "rr_mode",
    ["reference", pytest.param("standard", marks=pytest.mark.slow)],
)
def test_fused_stream_stepped_bitwise(scene, rr_mode):
    """Eager-stepped: every state field bitwise after 25 iterations
    (covers several RR terminations, FIFO retires, flushes and queue
    pulls at lanes=512 / 3072 pixels / spp=3)."""
    u, f, lanes = _stepped_states(scene, _cfg(rr_mode=rr_mode), 25)
    _compare_states(u, f, lanes)


@pytest.mark.slow
def test_fused_stream_stepped_bitwise_dof(scene):
    """DOF rides the shared generate_camera_rays outside the kernel."""
    u, f, lanes = _stepped_states(scene, _cfg(dof=True), 25)
    _compare_states(u, f, lanes)


@pytest.mark.slow
def test_fused_stream_stepped_bitwise_sample_offset(scene):
    """Progressive accumulation: non-zero sample_offset threads through
    the regen seed chain identically."""
    u, f, lanes = _stepped_states(
        scene, _cfg(), 25, subframe=0, sample_offset=7
    )
    _compare_states(u, f, lanes)


def test_fused_stream_compiled_ulp(scene):
    """Compiled end-to-end: same schedule semantics; XLA's per-graph
    fusion re-rounds a few FMA contractions inside trace/regen, so gate
    at the deferred-shade tolerance with most pixels bitwise."""
    cfg = _cfg()
    cam = camera_arrays(Camera(eye=(0, 2, 8), lookat=(0, 1, 0)), cfg)
    spp = cfg.samples_per_launch
    ref, ref_stats = render_pixels_stream(
        scene, cam, cfg.replace(fused_schedule="off"), None, jnp.int32(2),
        jnp.int32(0), spp, 512, return_stats=True,
    )
    got, got_stats = render_pixels_stream_fused(
        scene, cam, cfg, jnp.int32(2), jnp.int32(0), spp, 512,
        return_stats=True,
    )
    a, b = np.asarray(got), np.asarray(ref)
    np.testing.assert_allclose(a, b, rtol=3e-5, atol=1e-7)
    assert (a != b).mean() <= 0.25
    assert int(got_stats["segments"]) == int(ref_stats["segments"])
    assert int(got_stats["iters"]) == int(ref_stats["iters"])


def test_fused_envelope_gate():
    cfg = _cfg()
    assert _fused_stream_ok(cfg, None, 512)
    assert not _fused_stream_ok(cfg.replace(fused_schedule="off"), None, 512)
    # non-identity pixel list, tiled order and NEE fall back; DOF is
    # covered (camera regen runs outside the kernel)
    assert not _fused_stream_ok(cfg, jnp.arange(4), 512)
    assert not _fused_stream_ok(cfg.replace(pixel_order="tiled"), None, 512)
    assert _fused_stream_ok(cfg.replace(dof=True), None, 512)
    assert not _fused_stream_ok(
        cfg.replace(env_importance_sampling=True, rr_mode="standard"),
        None, 512,
    )
    # lane pools the (rows,128) chunking cannot divide fall back
    assert not _fused_stream_ok(cfg, None, 500)
    # auto = only on TPU
    assert not _fused_stream_ok(cfg.replace(fused_schedule="auto"), None, 512)
