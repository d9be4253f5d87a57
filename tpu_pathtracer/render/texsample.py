"""Bilinear texture sampling from the flat texture pool.

Replaces the reference's `sampleTexture` / `setMaterialProperty`
(reference optixSphere.cu:569-613): repeat-wrapped bilinear fetch over raw
float4 arrays, with a constant fallback when a material has no map.

Here every map lives in one [P,3] pool; each ray lane carries its own
(offset, width, height) — gathered from the material table — so a single
vectorized fetch serves a batch of rays hitting *different* materials.
This is the TPU analog of per-material SBT texture pointers.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear_pool(
    pool: jnp.ndarray,       # [P,3] f32 texel pool
    offset: jnp.ndarray,     # [N] i32 start row of each lane's map
    width: jnp.ndarray,      # [N] i32
    height: jnp.ndarray,     # [N] i32
    u: jnp.ndarray,          # [N] f32
    v: jnp.ndarray,          # [N] f32
) -> jnp.ndarray:
    """Repeat-wrap bilinear sample; returns [N,3].

    Matches sampleTexture (cu:569-596) with correct (non-negative) wrap of
    the x0/y0 texel index — the reference's `(int)floorf(x)` can be -1 at
    the wrap seam and read the previous row (SURVEY quirk list; fixed).
    """
    u = u - jnp.floor(u)
    v = v - jnp.floor(v)
    wf = width.astype(jnp.float32)
    hf = height.astype(jnp.float32)
    x = u * wf - 0.5
    y = v * hf - 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    s = (x - x0f)[..., None]
    t = (y - y0f)[..., None]

    x0 = jnp.mod(x0f.astype(jnp.int32), width)
    x1 = jnp.mod(x0 + 1, width)
    y0 = jnp.mod(y0f.astype(jnp.int32), height)
    y1 = jnp.mod(y0 + 1, height)

    def fetch(yi, xi):
        idx = offset + yi * width + xi
        return pool[idx]

    c00 = fetch(y0, x0)
    c10 = fetch(y0, x1)
    c01 = fetch(y1, x0)
    c11 = fetch(y1, x1)

    c0 = c00 + (c10 - c00) * s
    c1 = c01 + (c11 - c01) * s
    return c0 + (c1 - c0) * t


def material_property(
    pool: jnp.ndarray,
    has_map: jnp.ndarray,    # [N] bool
    offset: jnp.ndarray,     # [N] i32
    width: jnp.ndarray,
    height: jnp.ndarray,
    fallback: jnp.ndarray,   # [N,3]
    u: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """`setMaterialProperty` equivalent (cu:598-613): sample the map when
    present, else the per-material constant fallback."""
    sampled = sample_bilinear_pool(pool, offset, width, height, u, v)
    return jnp.where(has_map[..., None], sampled, fallback)
