"""Does vmapping train steps across parallel lanes beat sequential steps?

Motivation: the MAMDR DR phase (train/fused.py:make_fused_mamdr.dr_phase)
is sequential over query domains, but the per-query work is independent
once `shared` is frozen (reference mamdr.py:60-108 chains Adam slots
across query domains — a side effect of reusing one model, not an
algorithmic requirement). DR is ~92% of the flagship epoch's steps and
the tower matmuls at B=1024 are latency-bound (PERF.md anatomy), so an
L-lane vmapped DR could trade L sequential 63us steps for one wider step.

This probe measures the raw lane economics with the REAL subset train
step (steps.make_subset_train_step — frozen tables shared across lanes,
exactly what a vmapped DR would carry):

  seq      scan of S single steps               (production step cost)
  vmapL    scan of S/L steps, each vmap'd L-wide (L = 8, 30)

Run only when the TPU is free:  timeout 2400 python scripts/probe_vmap_lanes.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.train.steps import make_subset_train_step
from mamdr_tpu.train.state import TrainState
from mamdr_tpu.train import fused
from mamdr_tpu.utils import trees

import os

S = int(os.environ.get("PROBE_STEPS", 4080))  # lcm-friendly for L in {8, 30}
B = int(os.environ.get("PROBE_BATCH", 1024))
N_UID = N_PID = int(os.environ.get("PROBE_ROWS", 100_000))


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    cfg = ExperimentConfig.from_dict(
        {
            "model": {
                "name": "mlp_meta_mamdr_finetune",
                "user_dim": 128,
                "item_dim": 128,
                "domain_dim": 128,
                "hidden_dim": [256, 128, 64],
                "dropout": 0.5,
            },
            "train": {
                "load_pretrain_emb": True,
                "emb_trainable": False,
                "learning_rate": 1e-3,
                "epoch": 1,
            },
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

    from mamdr_tpu.train.trainer import Trainer

    trainer = Trainer(cfg, ds, verbose=False)
    params = trainer.state.params

    frozen_mask = trees.named_tree_map(
        lambda n, x: "user_emb" in n or "item_emb" in n, params
    )
    step, to_sub, _ = make_subset_train_step(
        trainer.model, trainer.tx, trainer.step_cfg, frozen_mask, params
    )
    sub_params = to_sub(params)
    st = TrainState.create(
        params=sub_params,
        opt_state=jax.jit(trainer.tx.init)(sub_params),
        batch_stats=trainer.state.batch_stats,
        rng=jax.random.PRNGKey(0),
    )

    def batches(shape):
        return {
            "uid": jnp.asarray(rng.integers(0, N_UID, shape), jnp.int32),
            "pid": jnp.asarray(rng.integers(0, N_PID, shape), jnp.int32),
            "domain": jnp.zeros(shape, jnp.int32),
            "label": jnp.asarray(rng.integers(0, 2, shape), jnp.float32),
            "weight": jnp.ones(shape, jnp.float32),
        }

    def timeit(name, fn, *args, n_examples):
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = fn(*args)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
            ts.append(time.time() - t0)
        med = sorted(ts)[1]
        print(
            f"{name:10s}: {med*1000:7.1f}ms, {med/n_examples*1e9:6.2f} ns/example, "
            f"{n_examples/med/1e6:7.2f}M ex/s",
            flush=True,
        )
        return med

    seq_data = batches((S, B))

    @jax.jit
    def run_seq(state, data):
        def body(c, b):
            c, loss = step(c, b)
            return c, loss
        state, losses = jax.lax.scan(body, state, data)
        return jnp.mean(losses), state

    timeit("seq", run_seq, st, seq_data, n_examples=S * B)

    for L in (8, 30):
        n_outer = S // L
        lane_data = batches((n_outer, L, B))
        states = fused.stack_states(st, L)

        @jax.jit
        def run_vmap(states, data):
            vstep = jax.vmap(step)

            def body(c, b):
                c, loss = vstep(c, b)
                return c, loss
            states, losses = jax.lax.scan(body, states, data)
            return jnp.mean(losses), states

        timeit(f"vmap{L}", run_vmap, states, lane_data,
               n_examples=n_outer * L * B)


if __name__ == "__main__":
    main()
