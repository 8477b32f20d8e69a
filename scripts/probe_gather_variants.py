"""Gather-variant probe: the fused step is gather-floor-bound (~31us of a
~37us serial gather+tower step, probe_pipeline.py; software pipelining was
1.02x — XLA already overlaps). Remaining levers on the gather itself:

  f32-2take   two 1024-row takes from f32 [100k,128] tables + concat (prod)
  f32-1take   ONE 2048-row take from a vertically fused [200k,128] table
              (pid ids offset by n_uid), reshape to [B, 256]
  bf16-2take  two takes from bf16 tables, cast f32 after concat
  bf16-1take  fused-table take at bf16, cast f32
  bf16-keep   fused-table take at bf16, NO cast (tower consumes bf16)

If the cost is per-row issue, bf16 changes nothing; if per-byte, 2x.
If per-op overhead matters, 1take beats 2take.

4096 steps per dispatch (>> 33ms tunnel RTT floor).
Run only when the TPU is free: timeout 1500 python scripts/probe_gather_variants.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, STEPS, NT, D = 1024, 4096, 100_000, 128


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    tu = jnp.asarray(rng.normal(0, 0.1, (NT, D)), jnp.float32)
    tp = jnp.asarray(rng.normal(0, 0.1, (NT, D)), jnp.float32)
    fused_f32 = jnp.concatenate([tu, tp], axis=0)
    tu16, tp16 = tu.astype(jnp.bfloat16), tp.astype(jnp.bfloat16)
    fused_bf16 = fused_f32.astype(jnp.bfloat16)
    ids_u = jnp.asarray(rng.integers(0, NT, (STEPS, B)), jnp.int32)
    ids_p = jnp.asarray(rng.integers(0, NT, (STEPS, B)), jnp.int32)

    def scan_sum(gather_fn):
        @jax.jit
        def run():
            def body(c, xs):
                iu, ip = xs
                x = gather_fn(iu, ip)
                return c + jnp.sum(x.astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, jnp.zeros(()), (ids_u, ids_p))
            return c

        return run

    def g_f32_2take(iu, ip):
        return jnp.concatenate(
            [jnp.take(tu, iu, axis=0), jnp.take(tp, ip, axis=0)], axis=-1)

    def g_f32_1take(iu, ip):
        ids = jnp.concatenate([iu, ip + NT])
        return jnp.take(fused_f32, ids, axis=0).reshape(B, 2 * D)

    def g_bf16_2take(iu, ip):
        x = jnp.concatenate(
            [jnp.take(tu16, iu, axis=0), jnp.take(tp16, ip, axis=0)], axis=-1)
        return x.astype(jnp.float32)

    def g_bf16_1take(iu, ip):
        ids = jnp.concatenate([iu, ip + NT])
        return jnp.take(fused_bf16, ids, axis=0).reshape(B, 2 * D).astype(jnp.float32)

    def g_bf16_keep(iu, ip):
        ids = jnp.concatenate([iu, ip + NT])
        return jnp.take(fused_bf16, ids, axis=0).reshape(B, 2 * D)

    def timeit(name, fn):
        out = fn()
        float(out)
        ts = []
        for _ in range(5):
            t0 = time.time()
            float(fn())
            ts.append(time.time() - t0)
        med = sorted(ts)[2]
        per = med / STEPS
        print(f"{name:11s}: {med*1000:7.1f}ms -> {per*1e6:6.2f}us/step "
              f"({2*B/per/1e6:6.1f}M rows/s, {B/per/1e6:6.2f}M ex/s)",
              flush=True)

    for name, g in [
        ("f32-2take", g_f32_2take),
        ("f32-1take", g_f32_1take),
        ("bf16-2take", g_bf16_2take),
        ("bf16-1take", g_bf16_1take),
        ("bf16-keep", g_bf16_keep),
    ]:
        timeit(name, scan_sum(g))


if __name__ == "__main__":
    main()
