"""Characterize the embedding-gather wall (PERF.md: ~120ns/row, gather-bound).

Each variant runs inside a 256-iteration scan (one dispatch, ~33ms tunnel
latency amortized), different ids per iteration, output summed into the
carry so nothing is hoisted. Reports ns per gathered row.

Questions answered:
  1. Is the cost per ROW or per BYTE?   (d=128 vs d=256, f32 vs bf16)
  2. Does table size matter?            (100k vs 30-row table)
  3. Is one 2B-row gather cheaper than two B-row gathers? (combined table)
  4. Can one-hot matmul beat gather for tiny tables?      (30-row domain table)
  5. Can a deep-pipelined Pallas DMA ring beat XLA's gather?
  6. Contiguous-slice floor (no gather at all).

Run only when the TPU is free:  timeout 1500 python scripts/probe_gather.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mamdr_tpu.ops.embedding_lookup import (
    pallas_gather_rows,
    pallas_gather_rows_pipelined,
)

B, STEPS, NT = 1024, 256, 100_000


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    t128 = jnp.asarray(rng.normal(0, 0.1, (NT, 128)), jnp.float32)
    t256 = jnp.asarray(rng.normal(0, 0.1, (NT, 256)), jnp.float32)
    t128_bf = t128.astype(jnp.bfloat16)
    t2x = jnp.asarray(rng.normal(0, 0.1, (2 * NT, 128)), jnp.float32)
    t30 = jnp.asarray(rng.normal(0, 0.1, (30, 128)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, NT, (STEPS, B)), jnp.int32)
    ids2 = jnp.asarray(rng.integers(0, NT, (STEPS, B)), jnp.int32)
    ids_2x = jnp.asarray(rng.integers(0, 2 * NT, (STEPS, 2 * B)), jnp.int32)
    ids30 = jnp.asarray(rng.integers(0, 30, (STEPS, B)), jnp.int32)
    off = jnp.asarray(rng.integers(0, NT - B, (STEPS,)), jnp.int32)

    def scan_over(fn, xs):
        @jax.jit
        def run():
            def body(c, x):
                return c + fn(x), None

            c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), xs)
            return c

        return run

    def timeit(name, fn, rows_per_step):
        try:
            out = fn()
            float(out)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
            return
        ts = []
        for _ in range(5):
            t0 = time.time()
            float(fn())
            ts.append(time.time() - t0)
        med = sorted(ts)[2]
        per_step = med / STEPS
        print(
            f"{name}: {med*1000:6.1f}ms total, {per_step*1e6:7.1f}us/step, "
            f"{per_step/rows_per_step*1e9:6.1f}ns/row "
            f"({rows_per_step*128*4/per_step/1e9:5.1f} GB/s-equiv)"
        )

    take = lambda t: lambda i: jnp.sum(jnp.take(t, i, axis=0, mode="clip"))

    timeit("xla take 1024 of [100k,128] f32 ", scan_over(take(t128), ids), B)
    timeit("xla take 1024 of [100k,256] f32 ", scan_over(
        lambda i: jnp.sum(jnp.take(t256, i, axis=0, mode="clip")), ids), B)
    timeit("xla take 1024 of [100k,128] bf16", scan_over(
        lambda i: jnp.sum(jnp.take(t128_bf, i, axis=0, mode="clip")
                          .astype(jnp.float32)), ids), B)
    timeit("xla 2 takes (u,p) same table    ", scan_over(
        lambda xs: jnp.sum(jnp.take(t128, xs[0], axis=0, mode="clip"))
        + jnp.sum(jnp.take(t128, xs[1], axis=0, mode="clip")),
        (ids, ids2)), 2 * B)
    timeit("xla 1 take 2048 of [200k,128]   ", scan_over(
        lambda i: jnp.sum(jnp.take(t2x, i, axis=0, mode="clip")), ids_2x), 2 * B)
    timeit("xla take 1024 of [30,128]       ", scan_over(take(t30), ids30), B)
    timeit("one-hot matmul 1024x[30,128]    ", scan_over(
        lambda i: jnp.sum(jax.nn.one_hot(i, 30, dtype=t30.dtype) @ t30),
        ids30), B)
    timeit("contiguous slice [1024,128]     ", scan_over(
        lambda o: jnp.sum(jax.lax.dynamic_slice_in_dim(t128, o, B, 0)), off), B)
    timeit("pallas ring k=32 1024x[100k,128]", scan_over(
        lambda i: jnp.sum(pallas_gather_rows_pipelined(t128, i, k=32)), ids), B)
    timeit("pallas ring k=128               ", scan_over(
        lambda i: jnp.sum(pallas_gather_rows_pipelined(t128, i, k=128)), ids), B)
    timeit("pallas tile8 (old kernel)       ", scan_over(
        lambda i: jnp.sum(pallas_gather_rows(t128, i)), ids), B)


if __name__ == "__main__":
    main()
