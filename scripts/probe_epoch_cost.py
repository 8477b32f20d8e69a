"""Isolate the fused-epoch formation cost (argsort shuffle + 5-array take).

probe_step_anatomy.py: bare train step = ~50us; bench end-to-end = ~110us.
The gap must be _epoch_on_flat's per-epoch formation: argsort(n_pad) + 5
jnp.take gathers of the whole block. Bench shapes: domain block n_pad=20480,
n_steps=20, B=1024; E=200 epochs per dispatch -> 4000 steps (device time
~0.4s+ >> 33ms RTT floor).

Variants (all run the REAL fast train step on the formed batches):
  reshape       no shuffle, no take: flat.reshape(S,B) scan       (floor)
  take-noshuf   perm=arange + 5 takes                             (take cost)
  argsort       current production path                           (sort+take)
  sortkey-only  argsort alone, batches from reshape               (sort cost)
  packed        argsort + ONE [N,4]-int32 take, unpack in body
  feistel       sort-free bijection (4-round Feistel + cycle walk) + packed take

Run only when the TPU is free:  timeout 3000 python scripts/probe_epoch_cost.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.train.trainer import Trainer
from mamdr_tpu.train.state import TrainState

B, N_STEPS, EPOCHS = 1024, 20, 200
N_PAD = N_STEPS * B          # 20480
N_REAL = 20000               # 480-row pad tail, like the bench
N_UID = N_PID = 100_000
S_TOTAL = N_STEPS * EPOCHS


def feistel_perm(rng, pos, n):
    """Random bijection over [0, n) applied to pos (< n); identity for
    pos >= n. Balanced 4-round Feistel over the next even-bit power of two
    plus cycle-walking back into [0, n). Sort-free, O(n) elementwise."""
    k = max(4, int(np.ceil(np.log2(max(n, 2)))))
    k += k % 2  # balanced halves require even width
    h = k // 2
    mask = (1 << h) - 1
    keys = jax.random.randint(rng, (4,), 0, np.int32(2**31 - 1), jnp.int32)

    def cipher(x):
        l = x >> h
        r = x & mask
        for i in range(4):
            f = (((r ^ keys[i]) * np.int32(-1640531527)) >> 11) & mask
            l, r = r, l ^ f
        return (l << h) | r

    live = pos < n

    def walk(x):
        def cond(v):
            return jnp.any((v >= n) & live)

        def body(v):
            return jnp.where((v >= n) & live, cipher(v), v)

        return jax.lax.while_loop(cond, body, x)

    return jnp.where(live, walk(cipher(pos)), pos)


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    cfg = ExperimentConfig.from_dict(
        {
            "model": {
                "name": "mlp_meta_mamdr_finetune",
                "user_dim": 128, "item_dim": 128, "domain_dim": 128,
                "hidden_dim": [256, 128, 64], "dropout": 0.5,
            },
            "train": {"load_pretrain_emb": True, "emb_trainable": False,
                      "learning_rate": 1e-3, "epoch": 1},
            "dataset": {"name": "synthetic", "batch_size": B, "seed": 123},
        }
    )
    ds = make_synthetic_dataset(
        n_domain=30, n_uid=N_UID, n_pid=N_PID, n_per_domain=2048,
        seed=123, long_tail=False, batch_size=B,
    )
    rng = np.random.default_rng(0)
    ds.user_emb = rng.normal(0, 0.1, (N_UID, 128)).astype(np.float32)
    ds.item_emb = rng.normal(0, 0.1, (N_PID, 128)).astype(np.float32)
    trainer = Trainer(cfg, ds, verbose=False)
    train_step = trainer.train_step_fn()

    flat = {
        "uid": jnp.asarray(rng.integers(0, N_UID, (N_PAD,)), jnp.int32),
        "pid": jnp.asarray(rng.integers(0, N_PID, (N_PAD,)), jnp.int32),
        "domain": jnp.zeros((N_PAD,), jnp.int32),
        "label": jnp.asarray(rng.integers(0, 2, (N_PAD,)), jnp.float32),
        "weight": jnp.asarray(
            (np.arange(N_PAD) < N_REAL).astype(np.float32)),
    }
    packed = jnp.stack(
        [
            flat["uid"],
            flat["pid"],
            flat["label"].astype(jnp.int32),
            flat["weight"].astype(jnp.int32),
        ],
        axis=1,
    )  # [N_PAD, 4] int32

    def st0():
        return TrainState.create(
            params=trainer.state.params,
            opt_state=trainer.fns.init_opt(trainer.state.params),
            batch_stats=trainer.state.batch_stats,
            rng=jax.random.PRNGKey(0),
        )

    def unpack(rows):  # [B,4] int32 -> batch dict
        return {
            "uid": rows[:, 0],
            "pid": rows[:, 1],
            "domain": jnp.zeros((rows.shape[0],), jnp.int32),
            "label": rows[:, 2].astype(jnp.float32),
            "weight": rows[:, 3].astype(jnp.float32),
        }

    def run_epochs(form_batches):
        """form_batches(rng_e) -> pytree the scan consumes per epoch."""

        @jax.jit
        def run(state):
            def epoch(state, rng_e):
                state, loss = form_batches(state, rng_e)
                return state, loss

            rngs = jax.random.split(jax.random.PRNGKey(1), EPOCHS)
            state, losses = jax.lax.scan(epoch, state, rngs)
            return jnp.mean(losses), state

        return run

    def timeit(name, fn, *args):
        try:
            out = fn(*args)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        except Exception as e:
            print(f"{name:14s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            return
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = fn(*args)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
            ts.append(time.time() - t0)
        med = sorted(ts)[1]
        per = med / S_TOTAL
        print(f"{name:14s}: {med*1000:7.1f}ms, {per*1e6:7.2f}us/step, "
              f"{B/per/1e6:6.2f}M ex/s", flush=True)

    # ---- variants ----
    def v_reshape(state, rng_e):
        batches = {k: v.reshape(N_STEPS, B) for k, v in flat.items()}
        state, losses = jax.lax.scan(train_step, state, batches)
        return state, jnp.mean(losses)

    def v_take_noshuf(state, rng_e):
        idx = jnp.arange(N_PAD).reshape(N_STEPS, B)
        batches = {k: jnp.take(v, idx, axis=0) for k, v in flat.items()}
        state, losses = jax.lax.scan(train_step, state, batches)
        return state, jnp.mean(losses)

    def v_argsort(state, rng_e):
        sort_key = jax.random.uniform(rng_e, (N_PAD,)) + jnp.where(
            flat["weight"] > 0.0, 0.0, 2.0)
        perm = jnp.argsort(sort_key)
        idx = perm.reshape(N_STEPS, B)
        batches = {k: jnp.take(v, idx, axis=0) for k, v in flat.items()}
        state, losses = jax.lax.scan(train_step, state, batches)
        return state, jnp.mean(losses)

    def v_sortkey_only(state, rng_e):
        sort_key = jax.random.uniform(rng_e, (N_PAD,)) + jnp.where(
            flat["weight"] > 0.0, 0.0, 2.0)
        perm = jnp.argsort(sort_key)
        batches = {k: v.reshape(N_STEPS, B) for k, v in flat.items()}
        # consume perm so it isn't DCE'd (value-dependent, unfoldable)
        batches["uid"] = batches["uid"] + perm.reshape(N_STEPS, B) // N_PAD
        state, losses = jax.lax.scan(train_step, state, batches)
        return state, jnp.mean(losses)

    def v_packed(state, rng_e):
        sort_key = jax.random.uniform(rng_e, (N_PAD,)) + jnp.where(
            flat["weight"] > 0.0, 0.0, 2.0)
        perm = jnp.argsort(sort_key)
        rows = jnp.take(packed, perm.reshape(N_STEPS, B), axis=0)  # [S,B,4]

        def body(st, r):
            return train_step(st, unpack(r))

        state, losses = jax.lax.scan(body, state, rows)
        return state, jnp.mean(losses)

    def v_feistel(state, rng_e):
        pos = jnp.arange(N_PAD, dtype=jnp.int32)
        perm = feistel_perm(rng_e, pos, N_REAL)
        rows = jnp.take(packed, perm.reshape(N_STEPS, B), axis=0)

        def body(st, r):
            return train_step(st, unpack(r))

        state, losses = jax.lax.scan(body, state, rows)
        return state, jnp.mean(losses)

    # sanity: feistel must be a permutation
    p = np.asarray(feistel_perm(jax.random.PRNGKey(7),
                                jnp.arange(N_PAD, dtype=jnp.int32), N_REAL))
    assert sorted(p.tolist()) == list(range(N_PAD)), "feistel not a bijection"
    assert (p[N_REAL:] == np.arange(N_REAL, N_PAD)).all(), "pad tail moved"
    print("feistel bijection ok; head:", p[:8], file=sys.stderr)

    timeit("reshape", run_epochs(v_reshape), st0())
    timeit("take-noshuf", run_epochs(v_take_noshuf), st0())
    timeit("argsort", run_epochs(v_argsort), st0())
    timeit("sortkey-only", run_epochs(v_sortkey_only), st0())
    timeit("packed", run_epochs(v_packed), st0())
    timeit("feistel", run_epochs(v_feistel), st0())


if __name__ == "__main__":
    main()
