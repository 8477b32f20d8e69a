"""Does gathering rows in sorted-id order beat random order on TPU?

Within-batch row order is irrelevant to a batch-mean gradient (modulo fp
summation order), so the epoch formation could sort each batch's rows by
uid for free. Worth doing only if sorted-order gathers are actually faster
(locality / sequential HBM streams). Variants (per 1024-row step, f32
[100k,128] tables, 4096 steps/dispatch >> 33ms RTT floor):

  rand-rand    both gathers random-order ids            (production)
  sort-rand    uid ids sorted per batch, pid random     (achievable: sort by uid)
  sort-sort    both sorted                              (upper bound; NOT
               achievable — one permutation can't sort two key columns)
  hot-rand     random ids drawn from a 20k-row hot set  (bench's per-domain
               locality) for calibration
  hot-sort     sorted ids from the 20k hot set

Run only when the TPU is free: timeout 1500 python scripts/probe_sorted_gather.py
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
    iu = rng.integers(0, NT, (STEPS, B))
    ip = rng.integers(0, NT, (STEPS, B))
    ih = rng.integers(0, 20_000, (STEPS, B))
    mk = lambda a: jnp.asarray(a, jnp.int32)
    ids = {
        "rand-rand": (mk(iu), mk(ip)),
        "sort-rand": (mk(np.sort(iu, axis=1)), mk(ip)),
        "sort-sort": (mk(np.sort(iu, axis=1)), mk(np.sort(ip, axis=1))),
        "hot-rand": (mk(ih), mk(rng.integers(0, 20_000, (STEPS, B)))),
        "hot-sort": (mk(np.sort(ih, axis=1)),
                     mk(np.sort(rng.integers(0, 20_000, (STEPS, B)), axis=1))),
    }

    def scan_sum(sorted_hint):
        def run(iu, ip):
            def body(c, xs):
                a, b = xs
                x = jnp.concatenate(
                    [jnp.take(tu, a, axis=0, indices_are_sorted=sorted_hint),
                     jnp.take(tp, b, axis=0, indices_are_sorted=sorted_hint)],
                    axis=-1)
                return c + jnp.sum(x), None

            c, _ = jax.lax.scan(body, jnp.zeros(()), (iu, ip))
            return c

        return jax.jit(run)

    def timeit(name, fn, a, b):
        float(fn(a, b))
        ts = []
        for _ in range(5):
            t0 = time.time()
            float(fn(a, b))
            ts.append(time.time() - t0)
        med = sorted(ts)[2]
        per = med / STEPS
        print(f"{name:10s}: {med*1000:7.1f}ms -> {per*1e6:6.2f}us/step",
              flush=True)

    run_plain = scan_sum(False)
    run_hint = scan_sum(True)
    for name, (a, b) in ids.items():
        timeit(name, run_plain, a, b)
    # the hint only matters when true; measure it on the sorted cases
    timeit("sort-sort+hint", run_hint, *ids["sort-sort"])
    timeit("hot-sort+hint", run_hint, *ids["hot-sort"])


if __name__ == "__main__":
    main()
