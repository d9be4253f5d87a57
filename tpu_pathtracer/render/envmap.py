"""Environment lighting: equirectangular HDR eval + CDF importance sampling.

Replaces the reference miss program (reference optixSphere.cu:531-567):
direction -> equirect UV (cu:543-544), hand-rolled bilinear fetch
(`sampleHDRI`, cu:503-529), and the procedural sun+sky fallback behind the
`use_hdr` flag (cu:547-558).

Importance sampling (build_env_cdf / sample_env) goes beyond the reference,
whose NEE helper is dead code (cu:134-156, 858) — it is the north-star
"env importance sampling" capability from BASELINE.json.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.scene.scene import EnvironmentMap
from tpu_pathtracer.utils import math as vm


def direction_to_uv(direction: jnp.ndarray):
    """Equirect mapping, matching reference optixSphere.cu:543-544:
    u = 0.5 + atan2(z, x)/2pi;  v = 0.5 - asin(y)/pi."""
    d = vm.normalize(direction)
    u = 0.5 + jnp.arctan2(d[..., 2], d[..., 0]) / (2.0 * jnp.pi)
    v = 0.5 - jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
    return u, v


def uv_to_direction(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of direction_to_uv (for env importance sampling)."""
    phi = (u - 0.5) * (2.0 * jnp.pi)
    theta = (0.5 - v) * jnp.pi          # elevation; y = sin(theta)
    y = jnp.sin(theta)
    c = jnp.cos(theta)
    x = c * jnp.cos(phi)
    z = c * jnp.sin(phi)
    return jnp.stack([x, y, z], axis=-1)


def sample_equirect(data: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, quads=None, active=None, scrambled: bool = False) -> jnp.ndarray:
    """Bilinear fetch from an equirect image [H,W,3] at (u,v) in [0,1].

    Matches `sampleHDRI` (cu:503-529) except that x/y wrap uses non-negative
    modulo (the reference's C `%` can go negative at the u=0 seam and read
    out of bounds — a bug we fix; SURVEY.md quirk list).

    With `quads` ([H*W,12] from scene.make_env) the four texel fetches
    collapse into one row gather — 4x fewer latency-bound HBM accesses.
    scrambled=True addresses hash-permuted quad rows (EnvironmentMap
    .quads_scrambled): scattered rows are ~2x faster on the v5e gather
    unit than the adjacent rows coherent miss packets would otherwise hit.
    `active` (bool mask) spreads inactive lanes' gathers over hashed
    distinct rows (duplicates serialise); their result is garbage and
    callers must only consume active lanes.
    """
    h, w = data.shape[0], data.shape[1]
    x = u * w - 0.5
    y = v * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    xi0 = jnp.mod(x0.astype(jnp.int32), w)
    yi0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)

    if quads is not None:
        rows = yi0 * w + xi0
        if scrambled:
            from tpu_pathtracer.scene.scene import SCRAMBLE_MULT

            rows = (
                (rows.astype(jnp.uint32) * jnp.uint32(SCRAMBLE_MULT))
                & jnp.uint32(h * w - 1)
            ).astype(jnp.int32)
        if active is not None:
            from tpu_pathtracer.render.texsample import _spread_rows

            rows = jnp.where(active, rows, _spread_rows(rows.shape[0], h * w))
        q = quads[rows]                            # [N,12]
        c00, c10, c01, c11 = q[..., 0:3], q[..., 3:6], q[..., 6:9], q[..., 9:12]
    else:
        xi1 = jnp.mod(xi0 + 1, w)
        yi1 = jnp.clip(yi0 + 1, 0, h - 1)
        c00 = data[yi0, xi0]
        c10 = data[yi0, xi1]
        c01 = data[yi1, xi0]
        c11 = data[yi1, xi1]

    s = (x - x0)[..., None]
    t = (y - y0)[..., None]
    c0 = c00 + (c10 - c00) * s
    c1 = c01 + (c11 - c01) * s
    return c0 + (c1 - c0) * t


def sunsky(direction: jnp.ndarray) -> jnp.ndarray:
    """Procedural sun+sky fallback, reference optixSphere.cu:552-557:
    a disk of (200,175,125) around normalize(0,2,3), else (0.4,0.4,0.6)."""
    d = vm.normalize(direction)
    sun_dir = vm.normalize(jnp.array([0.0, 2.0, 3.0], dtype=jnp.float32))
    in_sun = vm.dot(d, sun_dir) > 0.99
    sun = jnp.array([200.0, 175.0, 125.0], dtype=jnp.float32)
    sky = jnp.array([0.4, 0.4, 0.6], dtype=jnp.float32)
    return jnp.where(in_sun[..., None], sun, sky)


def eval_env(env: EnvironmentMap, direction: jnp.ndarray, cfg: RenderConfig, active=None, uv=None) -> jnp.ndarray:
    """Environment radiance for (a batch of) ray direction(s) [...,3].

    `active`: optional bool mask — lanes outside it return garbage but
    skip the real gather row (see sample_equirect).
    `uv`: optional (u, v) pair when the caller already knows the exact
    equirect coordinates (alias-table NEE draws compute the direction
    FROM (u, v)) — skips the per-lane normalize+atan2+asin round-trip
    and evaluates the radiance at the very coordinates the pdf was
    computed for.  Ignored for constant/sunsky modes."""
    if cfg.env_mode == "constant":
        return jnp.broadcast_to(
            jnp.asarray(cfg.env_constant, dtype=jnp.float32),
            direction.shape,
        )
    if cfg.env_mode == "sunsky":
        return sunsky(direction)
    u, v = uv if uv is not None else direction_to_uv(direction)
    return sample_equirect(
        env.data, u, v, quads=env.quads, active=active,
        scrambled=env.quads_scrambled,
    )


# ---------------------------------------------------------------------------
# Environment importance sampling (beyond-reference capability)
# ---------------------------------------------------------------------------
#
# Two samplers over the luminance*sin(theta) texel distribution:
#   * CDF tables (build_env_cdf / sample_env) — the textbook method; kept
#     as the reference implementation and for tests.
#   * An alias table (build_env_alias / sample_env_alias) — O(1) per draw:
#     ONE row gather instead of a log2(H*W)-step binary search, which on
#     TPU (latency-bound gathers) is ~17x fewer memory accesses.  This is
#     what the integrator's NEE path uses.


def _env_texel_weights(data: jnp.ndarray):
    h, w = data.shape[0], data.shape[1]
    lum = jnp.einsum("hwk,k->hw", data, jnp.array([0.2126, 0.7152, 0.0722]))
    theta = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * jnp.pi
    weights = lum * jnp.sin(theta)[:, None] + 1e-12
    return weights, theta


def build_env_cdf(env: EnvironmentMap) -> EnvironmentMap:
    """Precompute marginal/conditional CDFs over luminance*sin(theta)."""
    data = env.data
    h, w = data.shape[0], data.shape[1]
    lum = jnp.einsum("hwk,k->hw", data, jnp.array([0.2126, 0.7152, 0.0722]))
    # solid-angle weight: sin(theta) for row centers
    theta = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * jnp.pi
    weights = lum * jnp.sin(theta)[:, None] + 1e-12
    row_sums = jnp.sum(weights, axis=1)                      # [H]
    cdf_rows = jnp.cumsum(row_sums) / jnp.sum(row_sums)      # [H]
    cdf_cols = jnp.cumsum(weights, axis=1) / row_sums[:, None]  # [H,W]
    return env.replace(cdf_rows=cdf_rows, cdf_cols=cdf_cols)


def sample_env(env: EnvironmentMap, u1: jnp.ndarray, u2: jnp.ndarray):
    """Draw env directions ~ luminance. Returns (dir [...,3], pdf [...])."""
    if env.cdf_rows is None:
        raise ValueError("call build_env_cdf(env) first")
    h, w = env.data.shape[0], env.data.shape[1]
    row = jnp.searchsorted(env.cdf_rows, u1, side="left")
    row = jnp.clip(row, 0, h - 1)
    cols = env.cdf_cols[row]                                  # [...,W]
    col = jnp.clip(
        jnp.sum((cols < u2[..., None]).astype(jnp.int32), axis=-1), 0, w - 1
    )
    u = (col.astype(jnp.float32) + 0.5) / w
    v = (row.astype(jnp.float32) + 0.5) / h
    direction = uv_to_direction(u, v)

    # pdf in solid-angle measure
    lum = jnp.einsum("hwk,k->hw", env.data, jnp.array([0.2126, 0.7152, 0.0722]))
    theta = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * jnp.pi
    weights = lum * jnp.sin(theta)[:, None] + 1e-12
    total = jnp.sum(weights)
    p_texel = weights[row, col] / total
    sin_theta = jnp.maximum(jnp.sin(theta)[row], 1e-6)
    pdf = p_texel * (h * w) / (2.0 * jnp.pi * jnp.pi * sin_theta)
    return direction, pdf


def build_env_alias(env: EnvironmentMap):
    """Vose alias table over env texels.  Returns a [H*W, 4] f32 table:
    (accept_prob, alias_index, pmass_self, pmass_alias) — pmass is the
    texel's *probability mass*; the solid-angle pdf is computed at sample
    time from the actual jittered elevation (using the texel-centre
    sin(theta) instead biased the estimator several percent on coarse
    envs — the sample is uniform within the texel, so the density must be
    evaluated where the sample lands)."""
    import numpy as np

    data = np.asarray(env.data, np.float64)
    h, w = data.shape[:2]
    lum = data @ np.array([0.2126, 0.7152, 0.0722])
    theta = (np.arange(h) + 0.5) / h * np.pi
    weights = lum * np.sin(theta)[:, None] + 1e-12
    p = (weights / weights.sum()).reshape(-1)           # texel probabilities
    n = p.size

    # Vose's algorithm
    scaled = p * n
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    prob = np.ones(n)
    alias = np.arange(n)
    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = scaled[s]
        alias[s] = l
        scaled[l] = scaled[l] - (1.0 - scaled[s])
        (small if scaled[l] < 1.0 else large).append(l)

    table = np.zeros((n, 4), np.float32)
    table[:, 0] = prob
    table[:, 1] = alias.astype(np.float32)
    table[:, 2] = p
    table[:, 3] = p[alias]
    return jnp.asarray(table)


def sample_env_alias(table: jnp.ndarray, height: int, width: int, u1, u2, u3, u4):
    """O(1) env direction sample: one alias-table row gather per lane.

    Returns (direction [...,3], pdf [...] in solid angle, u, v).  u3/u4
    jitter within the chosen texel (the pdf is texel-constant); (u, v)
    are the exact equirect coordinates of the draw — pass them to
    eval_env(uv=...) so radiance is fetched where the pdf lives, with no
    direction->uv float round-trip."""
    n = height * width
    i = jnp.minimum((u1 * n).astype(jnp.int32), n - 1)
    row = table[i]                                       # [N,4] — the gather
    take_self = u2 < row[..., 0]
    texel = jnp.where(take_self, i, row[..., 1].astype(jnp.int32))
    pmass = jnp.where(take_self, row[..., 2], row[..., 3])
    ty = texel // width
    tx = texel % width
    u = (tx.astype(jnp.float32) + u3) / width
    v = (ty.astype(jnp.float32) + u4) / height
    # Solid-angle pdf at the SAMPLED elevation: the (u,v)->sphere Jacobian
    # is 2*pi^2*cos(elev) per unit (u,v)^2, and the mass is uniform within
    # the texel.  (Texel-centre sin(theta) here measurably biased NEE.)
    cos_elev = jnp.maximum(jnp.cos((0.5 - v) * jnp.pi), 1e-6)
    pdf = pmass * (height * width) / (2.0 * jnp.pi * jnp.pi * cos_elev)
    return uv_to_direction(u, v), pdf, u, v


def with_importance_sampling(env: EnvironmentMap) -> EnvironmentMap:
    """Attach CDF + alias tables; required for cfg.env_importance_sampling."""
    env = build_env_cdf(env)
    return env.replace(alias_table=build_env_alias(env))


def env_pdf_alias(
    table: jnp.ndarray, height: int, width: int, direction: jnp.ndarray
) -> jnp.ndarray:
    """Solid-angle pdf of `sample_env_alias` at arbitrary directions.

    Gathers the texel probability MASS from the alias table (column 2 —
    the exact masses the sampler draws from, cheaper and more consistent
    than recomputing luminance like `env_pdf`) and applies the same
    continuous-elevation Jacobian as `sample_env_alias`, so the density
    agrees with the sampler everywhere — required for defensive-mixture
    (one-sample MIS) weights."""
    u, v = direction_to_uv(direction)
    col = jnp.clip((u * width).astype(jnp.int32), 0, width - 1)
    row = jnp.clip((v * height).astype(jnp.int32), 0, height - 1)
    pmass = table[row * width + col, 2]
    cos_elev = jnp.maximum(jnp.cos((0.5 - v) * jnp.pi), 1e-6)
    return pmass * (height * width) / (2.0 * jnp.pi * jnp.pi * cos_elev)


def env_pdf(env: EnvironmentMap, direction: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf of sample_env for given directions."""
    h, w = env.data.shape[0], env.data.shape[1]
    u, v = direction_to_uv(direction)
    col = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    row = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    lum = jnp.einsum("hwk,k->hw", env.data, jnp.array([0.2126, 0.7152, 0.0722]))
    theta = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * jnp.pi
    weights = lum * jnp.sin(theta)[:, None] + 1e-12
    total = jnp.sum(weights)
    p_texel = weights[row, col] / total
    sin_theta = jnp.maximum(jnp.sin(theta)[row], 1e-6)
    return p_texel * (h * w) / (2.0 * jnp.pi * jnp.pi * sin_theta)
