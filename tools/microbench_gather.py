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
            acc = acc + s.astype(jnp.float32)
            ix_ = (ix_ + (s.astype(jnp.int32) & 1)) % t.shape[0]
            return (ix_, acc)
        return jax.lax.fori_loop(0, n_it, step, (ix + salt, jnp.zeros_like(ix, jnp.float32)))[1].sum()

    jl = jax.jit(loop)  # n_it traced: dynamic trip count, no unroll/cache
    salt = [0]

    def run(n_it):
        salt[0] += 1
        t0 = time.perf_counter()
        # float() readback: on axon block_until_ready alone can return
        # before remote execution finishes (measured 0.0 ms "runs").
        float(jl(table, idx, salt[0], n_it))
        return time.perf_counter() - t0

    run(iters); run(2 * iters)
    a = min(run(iters) for _ in range(3))
    b = min(run(2 * iters) for _ in range(3))
    return (b - a) / iters, a, b


def measure_consume(table, idx, consume, iters=8):
    """Like measure() but with a custom consumer mapping rows->[N] f32."""
    def loop(t, ix, salt, n_it):
        is_multi = isinstance(t, (tuple, list))

        def step(_, carry):
            ix_, acc = carry
            rows = [a[ix_] for a in t] if is_multi else t[ix_]
            s = consume(rows)
            acc = acc + s
            ix_ = (ix_ + (s.astype(jnp.int32) & 1)) % (
                t[0].shape[0] if is_multi else t.shape[0]
            )
            return (ix_, acc)
        return jax.lax.fori_loop(
            0, n_it, step, (ix + salt, jnp.zeros_like(ix, jnp.float32))
        )[1].sum()

    jl = jax.jit(loop)
    salt = [0]

    def run(n_it):
        salt[0] += 1
        t0 = time.perf_counter()
        # float() readback: on axon block_until_ready alone can return
        # before remote execution finishes (measured 0.0 ms "runs").
        float(jl(table, idx, salt[0], n_it))
        return time.perf_counter() - t0

    run(iters); run(2 * iters)
    a = min(run(iters) for _ in range(3))
    b = min(run(2 * iters) for _ in range(3))
    return (b - a) / iters, a, b


def consumers(n):
    import functools

    def rowsum(rows):
        return rows.sum(axis=1).astype(jnp.float32)

    def coldecode(rows):
        # texsample-style: extract every column, byte-decode, combine.
        out = jnp.zeros(rows.shape[:1], jnp.float32)
        for k in range(rows.shape[1]):
            w = rows[:, k]
            out = out + (w & 0xFF).astype(jnp.float32)
            out = out + ((w >> 8) & 0xFF).astype(jnp.float32)
        return out

    return rowsum, coldecode


def main2():
    """Consumption-pattern experiment: is the cost the gather or the
    column-extraction relayout of its [N,16] result?"""
    n = 131072
    rows = 4_194_304
    rng = np.random.default_rng(0)
    rand_idx = jnp.asarray(rng.integers(0, rows, n), jnp.int32)
    base = rng.integers(0, 2**31, (rows, 16), np.int64).astype(np.uint32)
    table = jnp.asarray(base)
    rowsum, coldecode = consumers(n)

    for name, cons in (("rowsum", rowsum), ("coldecode", coldecode)):
        m, a, b = measure_consume(table, rand_idx, cons)
        print(f"[2d table ] consume={name:9s}: {m*1e3:6.2f} ms ({m/n*1e9:5.1f} ns/row) [abs {a*1e3:6.1f}/{b*1e3:6.1f}]")

    # 16 separate [rows] arrays: each gather's output is already lane-major.
    cols = tuple(jnp.asarray(base[:, k]) for k in range(16))

    def split_consume(rows_list):
        out = jnp.zeros_like(rows_list[0], dtype=jnp.float32)
        for w in rows_list:
            out = out + (w & 0xFF).astype(jnp.float32)
            out = out + ((w >> 8) & 0xFF).astype(jnp.float32)
        return out

    m, a, b = measure_consume(cols, rand_idx, split_consume)
    print(f"[16 arrays] consume=bytedecode: {m*1e3:6.2f} ms ({m/n*1e9:5.1f} ns/row) [abs {a*1e3:6.1f}/{b*1e3:6.1f}]")


def main3():
    """Table-SIZE sweep: gather ns/row vs total table bytes at fixed width.

    Motivation: env-quad gathers (2 MB table) measured ~1 ns/row inside the
    render loop while texture-bundle gathers (268 MB) pay ~20 ns/row — if
    the cliff sits near the VMEM capacity, shrinking the bundle below it
    (narrower rows + more gathers) could beat the 'floor'."""
    n = 131072
    rng = np.random.default_rng(0)
    for width, rows in (
        (16, 131_072),     # 8 MB
        (16, 524_288),     # 32 MB
        (16, 1_048_576),   # 64 MB
        (16, 2_097_152),   # 128 MB
        (16, 4_194_304),   # 256 MB (current bundle layout)
        (2, 4_194_304),    # 32 MB — 8B rows: the 4-gather bilinear layout
        (4, 4_194_304),    # 64 MB — 16B rows
        (8, 4_194_304),    # 128 MB — 32B channel-packed quad layout
    ):
        base = rng.integers(0, 2**31, (rows, width), np.int64).astype(np.uint32)
        table = jnp.asarray(base)
        idx = jnp.asarray(rng.integers(0, rows, n), jnp.int32)
        m, a, b = measure(table, idx)
        mb = rows * width * 4 / 1e6
        print(
            f"rows={rows:9d} width={width:2d} ({mb:6.1f} MB): "
            f"{m*1e3:6.2f} ms  ({m/n*1e9:5.1f} ns/row)  [abs {a*1e3:6.1f}/{b*1e3:6.1f}]"
        )


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
        base = rng.integers(0, 2**31, (rows, width), np.int64).astype(np.uint32)
        for dt in ("u32", "f32"):
            if dt == "u32":
                table = jnp.asarray(base)
            else:
                table = jnp.asarray((base >> 9).astype(np.float32))
            for name, idx in (("rand", rand_idx), ("coh", coh_idx), ("const", const_idx)):
                m, a, b = measure(table, idx)
                print(
                    f"width={width:3d} ({width*4:3d}B) {dt} idx={name:5s}: "
                    f"{m*1e3:6.2f} ms  ({m/n*1e9:5.1f} ns/row)"
                    f"  [abs {a*1e3:6.1f}/{b*1e3:6.1f}]"
                )




def main4():
    """Decode-cost experiment for the 8-col channel-packed bundle: is the
    ~1.5 ms above the raw-gather floor the byte-decode chain, the [N,8]
    column slicing, or the index math?"""
    n = 131072
    rows = 4_194_304
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, rows, n), jnp.int32)
    base = rng.integers(0, 2**31, (rows, 8), np.int64).astype(np.uint32)
    table = jnp.asarray(base)

    def rowsum(r):
        return r.sum(axis=1).astype(jnp.float32)

    def full_decode(r):
        # texsample-style: 8 words -> 8x4 byte channels, 16 bilinear lerps
        s = jnp.float32(0.3)
        t = jnp.float32(0.6)
        out = jnp.zeros(r.shape[:1], jnp.float32)
        for ch in range(4):          # rgb + alpha per word group
            for grp in (0, 4):
                c = [((r[:, grp + j] >> (8 * ch)) & 0xFF).astype(jnp.float32)
                     for j in range(4)]
                c0 = c[0] + (c[1] - c[0]) * s
                c1 = c[2] + (c[3] - c[2]) * s
                out = out + c0 + (c1 - c0) * t
        return out

    for name, cons in (("rowsum", rowsum), ("full decode", full_decode)):
        m, a, b = measure_consume(table, idx, cons)
        print(f"[8-col table] {name:12s}: {m*1e3:6.2f} ms ({m/n*1e9:5.1f} ns/row)")

    # same decode from 8 separate single-column tables (each gather is [N])
    cols = tuple(jnp.asarray(base[:, k]) for k in range(8))

    def split_decode(rl):
        s = jnp.float32(0.3)
        t = jnp.float32(0.6)
        out = jnp.zeros_like(rl[0], dtype=jnp.float32)
        for ch in range(4):
            for grp in (0, 4):
                c = [((rl[grp + j] >> (8 * ch)) & 0xFF).astype(jnp.float32)
                     for j in range(4)]
                c0 = c[0] + (c[1] - c[0]) * s
                c1 = c[2] + (c[3] - c[2]) * s
                out = out + c0 + (c1 - c0) * t
        return out

    m, a, b = measure_consume(cols, idx, split_decode)
    print(f"[8x1-col tables] full decode: {m*1e3:6.2f} ms ({m/n*1e9:5.1f} ns/row)")


if __name__ == "__main__":
    import sys

    if "--consume" in sys.argv:
        main2()
    elif "--decode" in sys.argv:
        main4()
    elif "--size-sweep" in sys.argv:
        main3()
    else:
        main()
