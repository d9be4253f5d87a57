"""Microbench: XLA scatter-add cost into a large (image-sized) table.

The streaming renderer's retire flush does
    out.at[slots].add(rgb)        # out [n_pix+1,3], slots [lanes*D]
where non-retired FIFO entries all point at the sink row n_pix (zero
adds).  Round-1 notes called this scatter "table-size-bound" (~4.5 ms
into a 1080p image regardless of update count); this isolates whether
the duplicate sink rows (non-unique indices) or the table rewrite is
the cost, and what unique_indices / smaller updates buy.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/microbench_scatter.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=8):
    def loop(n_it, salt, *a):
        def step(_, carry):
            out = fn(carry, salt, *a)
            return out
        return jax.lax.fori_loop(0, n_it, step, a[0] * 0.0 + salt)

    jl = jax.jit(loop)
    salt = [0]

    def run(n_it):
        salt[0] += 1
        t0 = time.perf_counter()
        float(jl(n_it, jnp.float32(salt[0]), *args).sum())
        return time.perf_counter() - t0

    run(iters); run(2 * iters)
    a = min(run(iters) for _ in range(3))
    b = min(run(2 * iters) for _ in range(3))
    return (b - a) / iters


def main():
    n_pix = 1920 * 1080
    lanes = 131072
    d = 3
    rng = np.random.default_rng(0)
    # ~7% of entries are real retires (unique rows), rest point at sink.
    n_real = lanes * d // 14
    rows = np.full(lanes * d, n_pix, np.int32)
    rows[:n_real] = rng.choice(n_pix, n_real, replace=False).astype(np.int32)
    rng.shuffle(rows)
    slots = jnp.asarray(rows)
    rgb = jnp.asarray(rng.random((lanes * d, 3), np.float32))

    out0 = jnp.zeros((n_pix + 1, 3), jnp.float32)

    def scat_plain(out, salt, *a):
        return out.at[slots].add(rgb + salt)

    def scat_unique(out, salt, *a):
        return out.at[slots].add(rgb + salt, unique_indices=True)

    def scat_drop_sink(out, salt, *a):
        # sink rows dropped via OOB + mode="drop"; real rows unique
        return out.at[jnp.where(slots == n_pix, n_pix + 5, slots)].add(
            rgb + salt, mode="drop", unique_indices=True
        )

    small = jnp.asarray(rows[: lanes // 8])
    rgb_small = rgb[: lanes // 8]

    def scat_small(out, salt, *a):
        return out.at[small].add(rgb_small + salt)

    for name, fn in (
        ("add 393k rows (dup sink)", scat_plain),
        ("add 393k rows unique_indices", scat_unique),
        ("add 393k rows drop-sink unique", scat_drop_sink),
        ("add 16k rows (dup sink)", scat_small),
    ):
        m = timed(fn, out0)
        print(f"{name:34s}: {m*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
