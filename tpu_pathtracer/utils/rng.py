"""Counter-seeded, per-lane stateful RNG.

The reference advances one PCG-hash chain per CUDA thread
(`pcg_hash` / `myrnd`, reference optixSphere.cu:24-35) seeded with the *raw*
pixel index (`seed = pixel + subframe*W*H`, optixSphere.cu:316-317 — unhashed,
which visibly correlates neighbouring pixels).  It also roundtrips the hash
through `float`, losing low bits.

We keep the same *shape* — one independent uint32 chain per ray lane,
advanced once per draw — but:

  * the chain state stays uint32 end-to-end (no float roundtrip),
  * the initial seed is a proper avalanche hash of the *global* counters
    (pixel_id, sample_id, subframe), which makes every render
    bitwise-reproducible and independent of device count, tiling or
    lane order (the BASELINE.md reproducibility target).

All functions are vectorised: `seed` is a uint32 array of any shape and each
lane advances independently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32
# 1/2^32 — maps uint32 to [0, 1).  np (not jnp) scalar: a module-level
# jnp constant would initialise the XLA backend at import time, breaking
# jax.distributed.initialize (tests/_dist_worker.py).
_INV_U32 = np.float32(2.3283064365386963e-10)


def pcg_hash(x: jnp.ndarray) -> jnp.ndarray:
    """One round of the PCG-RXS-M-XS output permutation (public PCG family;
    same generator the reference uses at optixSphere.cu:24-30)."""
    x = x.astype(_U32)
    state = x * _U32(747796405) + _U32(2891336453)
    word = ((state >> ((state >> _U32(28)) + _U32(4))) ^ state) * _U32(277803737)
    return (word >> _U32(22)) ^ word


def make_seeds(pixel_id: jnp.ndarray, sample_id: jnp.ndarray, subframe: jnp.ndarray) -> jnp.ndarray:
    """Counter-based initial seed: hash(pixel, sample, subframe).

    Three avalanche rounds with golden-ratio offsets decorrelate the three
    counters; the result is a uint32 per lane.
    """
    p = jnp.asarray(pixel_id, dtype=_U32)
    s = jnp.asarray(sample_id, dtype=_U32)
    f = jnp.asarray(subframe, dtype=_U32)
    h = pcg_hash(p ^ _U32(0x9E3779B9))
    h = pcg_hash(h + s * _U32(0x85EBCA6B))
    h = pcg_hash(h + f * _U32(0xC2B2AE35))
    # Guard against the all-zero fixed-point-ish start.
    return h | _U32(1)


def uniform(seed: jnp.ndarray):
    """Advance each lane's chain once. Returns (new_seed, u in [0,1))."""
    seed = pcg_hash(seed)
    return seed, seed.astype(jnp.float32) * _INV_U32


def uniform2(seed: jnp.ndarray):
    seed, u1 = uniform(seed)
    seed, u2 = uniform(seed)
    return seed, u1, u2


def uniform3(seed: jnp.ndarray):
    seed, u1 = uniform(seed)
    seed, u2 = uniform(seed)
    seed, u3 = uniform(seed)
    return seed, u1, u2, u3


def random_in_unit_sphere(seed: jnp.ndarray):
    """Rejection-sample points in the unit ball, per lane.

    Mirrors reference `random_in_unit_sphere` (optixSphere.cu:257-263): each
    lane draws float3 in [-1,1)^3 until |p| < 1.  Implemented as a masked
    `while_loop`: accepted lanes stop advancing their seed (identical
    per-lane draw counts to a scalar loop), so results stay deterministic.

    Returns (new_seed, p [...,3]).
    """
    shape = seed.shape

    def draw(seed):
        seed, u1, u2, u3 = uniform3(seed)
        p = 2.0 * jnp.stack([u1, u2, u3], axis=-1) - 1.0
        return seed, p

    seed0, p0 = draw(seed)
    accepted0 = jnp.sum(p0 * p0, axis=-1) < 1.0

    def cond(state):
        _, _, accepted = state
        return ~jnp.all(accepted)

    def body(state):
        seed, p, accepted = state
        seed_n, p_n = draw(seed)
        seed = jnp.where(accepted, seed, seed_n)
        p = jnp.where(accepted[..., None], p, p_n)
        accepted = accepted | (jnp.sum(p_n * p_n, axis=-1) < 1.0)
        return seed, p, accepted

    seed, p, _ = jax.lax.while_loop(cond, body, (seed0, p0, accepted0))
    return seed, p


def cosine_sample_hemisphere(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted hemisphere sample with the cosine axis in +y,
    matching reference `cosine_sample_hemisphere` (optixSphere.cu:244-254)."""
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    x = r * jnp.cos(phi)
    z = r * jnp.sin(phi)
    y = jnp.sqrt(jnp.maximum(0.0, 1.0 - x * x - z * z))
    return jnp.stack([x, y, z], axis=-1)
