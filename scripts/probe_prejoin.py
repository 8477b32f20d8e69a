"""Pre-joined-block gather probe (VERDICT r2 item 5: cross-lane/epoch
gather redundancy in the parallel-lanes DR).

The lane step's dominant cost is frozen-table row gathers (~676 of
~1320 us at 30 lanes, PERF.md): per step each lane issues 2x1024 rows of
512B (u, v from the [100k,128] f32 tables). The gather is per-ROW
issue-bound (~11 ns/row; bf16/table-fusion/pipelining all no-ops), so the
lever is ROW COUNT, not bytes: pre-join u||v into the domain block ONCE
per DR call (valid while tables are FROZEN — the flagship Taobao regime),
then each step's batch formation take widens from ~32B rows to ~1KB rows
but the per-step embedding takes disappear: 3x fewer row issues per epoch
(2 emb takes + 1 formation take -> 1 wide formation take).

Variants (30 vmapped lanes, B=1024, scan >= 512 steps/dispatch):
  prod      per lane: 2 takes of 1024 rows from [100k,128] f32 tables
            (+ the 32B-row formation take, itself ~free)
  prejoin   per lane: ONE take of 1024 rows from its [12288, 264] f32
            pre-joined block (u 128 || v 128 || 8 id/label cols)
  join      the amortized join cost: 2 takes of D*12288 rows building
            join_all [30, 12288, 256] (once per DR call; a 30-lane DR call
            runs 30 lanes x 2K=12 epochs over it)

Decision: prejoin-step < ~0.5x prod-step makes the fused DR >25M ex/s.
Run only when the TPU is free: timeout 1500 python scripts/probe_prejoin.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B, STEPS, NT, D, LANES, NPAD = 1024, 512, 100_000, 128, 30, 12288


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    tu = jnp.asarray(rng.normal(0, 0.1, (NT, D)), jnp.float32)
    tp = jnp.asarray(rng.normal(0, 0.1, (NT, D)), jnp.float32)
    # per-lane id streams [STEPS, LANES, B]
    ids_u = jnp.asarray(rng.integers(0, NT, (STEPS, LANES, B)), jnp.int32)
    ids_p = jnp.asarray(rng.integers(0, NT, (STEPS, LANES, B)), jnp.int32)
    # pre-joined per-lane blocks [LANES, NPAD, 2D+8] and formation indices
    join_all = jnp.asarray(
        rng.normal(0, 0.1, (LANES, NPAD, 2 * D + 8)), jnp.float32
    )
    idx = jnp.asarray(rng.integers(0, NPAD, (STEPS, LANES, B)), jnp.int32)
    # block ids for the join variant [LANES, NPAD]
    blk_u = jnp.asarray(rng.integers(0, NT, (LANES, NPAD)), jnp.int32)
    blk_p = jnp.asarray(rng.integers(0, NT, (LANES, NPAD)), jnp.int32)

    def timeit(name, fn, n_work, unit="step"):
        out = fn()
        float(out)
        ts = []
        for _ in range(5):
            t0 = time.time()
            float(fn())
            ts.append(time.time() - t0)
        med = sorted(ts)[2]
        per = med / n_work
        print(f"{name:9s}: {med*1000:7.1f}ms -> {per*1e6:7.2f}us/{unit}",
              flush=True)
        return per

    # arrays go in as ARGUMENTS: a jit closure constant is serialized into
    # the remote-compile request (the 389MB join_all blew its length limit)
    @jax.jit
    def run_prod(tu_, tp_, ids_u_, ids_p_):
        def body(c, xs):
            iu, ip = xs

            def lane(iu1, ip1):
                x = jnp.concatenate(
                    [jnp.take(tu_, iu1, axis=0), jnp.take(tp_, ip1, axis=0)],
                    axis=-1,
                )
                return jnp.sum(x)

            return c + jnp.sum(jax.vmap(lane)(iu, ip)), None

        c, _ = jax.lax.scan(body, jnp.zeros(()), (ids_u_, ids_p_))
        return c

    @jax.jit
    def run_prejoin(join_all_, idx_):
        def body(c, ix):
            def lane(blk, ix1):
                return jnp.sum(jnp.take(blk, ix1, axis=0))

            return c + jnp.sum(jax.vmap(lane)(join_all_, ix)), None

        c, _ = jax.lax.scan(body, jnp.zeros(()), idx_)
        return c

    @jax.jit
    def run_join(tu_, tp_, blk_u_, blk_p_):
        # the once-per-DR-call join, repeated 8x to clear the RTT floor
        def body(c, _):
            u = jnp.take(tu_, blk_u_.reshape(-1), axis=0)
            p = jnp.take(tp_, blk_p_.reshape(-1), axis=0)
            return c + jnp.sum(u) + jnp.sum(p), None

        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=8)
        return c

    prod = timeit("prod", lambda: run_prod(tu, tp, ids_u, ids_p), STEPS)
    pre = timeit("prejoin", lambda: run_prejoin(join_all, idx), STEPS)
    join = timeit("join", lambda: run_join(tu, tp, blk_u, blk_p), 8,
                  unit="join")
    # a 30-lane DR call at bench shapes runs ~2*K=12 epochs/lane x 12
    # steps/epoch = 4320 lane-steps; the join amortizes over all of them
    amort = join / (12 * 12)
    print(
        f"verdict: prod {prod*1e6:.1f}us vs prejoin {pre*1e6:.1f}us "
        f"+ join amortized {amort*1e6:.2f}us/step "
        f"-> gather speedup {prod/(pre+amort):.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    main()
