"""Microbench: XLA row-gather cost vs row width / index pattern on TPU.

Validates the layout rule the texture bundle design rests on: rows up to
~48B cost one latency unit (~20 ns); wider rows cost more.  Measured via
marginal-iteration timing (see profile_inloop.py header for the rules).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/microbench_gather.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def measure(table, idx, iters=8):
    def loop(t, ix, salt, n_it):
        def step(_, carry):
            ix_, acc = carry
            rows = t[ix_]
            # consume EVERY column or XLA narrows the gather's slice_sizes
            # to just the used columns (measured: un-consumed widths are
            # free) — exactly what a real kernel cannot do.
            s = rows.sum(axis=1)
            acc = acc + s
            ix_ = (ix_ + (s & 1).astype(jnp.int32)) % t.shape[0]
            return (ix_, acc)
        return jax.lax.fori_loop(0, n_it, step, (ix + salt, jnp.zeros_like(ix, jnp.uint32)))[1].sum()

    jl = jax.jit(loop, static_argnames=("n_it",))
    salt = [0]

    def run(n_it):
        salt[0] += 1
        t0 = time.perf_counter()
        jax.block_until_ready(jl(table, idx, salt[0], n_it))
        return time.perf_counter() - t0

    run(iters); run(2 * iters)
    a = min(run(iters) for _ in range(3))
    b = min(run(2 * iters) for _ in range(3))
    return (b - a) / iters, a, b


def main():
    n = 131072
    rows = 4_194_304  # 2048^2 texels
    rng = np.random.default_rng(0)
    rand_idx = jnp.asarray(rng.integers(0, rows, n), jnp.int32)
    coh_idx = jnp.asarray(
        (np.arange(n) // 16 + rng.integers(0, 8, n)) % rows, jnp.int32
    )
    const_idx = jnp.zeros((n,), jnp.int32)

    for width in (4, 8, 10, 12, 16, 24):
        table = jnp.asarray(
            rng.integers(0, 2**31, (rows, width), np.int64).astype(np.uint32)
        )
        for name, idx in (("rand", rand_idx), ("coh", coh_idx), ("const", const_idx)):
            m, a, b = measure(table, idx)
            print(
                f"width={width:3d}u32 ({width*4:3d}B) idx={name:5s}: "
                f"{m*1e3:6.2f} ms  ({m/n*1e9:5.1f} ns/row)"
                f"  [abs {a*1e3:6.1f}/{b*1e3:6.1f}]"
            )


if __name__ == "__main__":
    main()
