"""A/B probe: where does a campaign-scale fused domain-epoch spend time?

Hypothesis (PERF.md): at reference scale the up-front batch-forming takes
(5 x [steps*batch]-element permutation gathers per domain-epoch) cost as
much as the training steps themselves, because XLA's gather is ~120ns per
element regardless of batching. Variants measured:

  A. current: permute+gather all columns BEFORE the scan ([S,B] arrays)
  B. in-scan: scan over [S,B] index rows, gather each step's 1024 rows
     inside the body (fusable/overlappable with the step)
  C. no-shuffle floor: natural-order contiguous slicing (no gather at all)

Run only when the TPU is free:  timeout 590 python scripts/probe_epoch_ab.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.train.steps import StepConfig, make_optimizer, make_train_step
from mamdr_tpu.train.state import TrainState
from mamdr_tpu.train import fused


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    B = 1024
    # campaign-scale single domain: 280k rows -> 274 steps
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp", "user_dim": 128, "item_dim": 128,
                       "domain_dim": 128, "hidden_dim": [256, 128, 64],
                       "dropout": 0.5},
            "train": {"emb_trainable": False},
            "dataset": {"name": "synthetic", "batch_size": B, "seed": 0},
        }
    )
    ds = make_synthetic_dataset(
        n_domain=2, n_uid=200_000, n_pid=60_000, n_per_domain=470_000,
        seed=0, long_tail=False, batch_size=B,
    )
    rng = np.random.default_rng(0)
    ds.user_emb = rng.normal(0, 0.1, (200_000, 128)).astype(np.float32)
    ds.item_emb = rng.normal(0, 0.1, (60_000, 128)).astype(np.float32)

    from mamdr_tpu.train.trainer import Trainer

    t = Trainer(cfg, ds, verbose=False)
    train_step, _ = make_train_step(t.model, t.tx, t.step_cfg)
    block, n_steps = fused.stack_domains_on_device(ds.train, B)
    flat = {k: v[0] for k, v in block.items()}
    n_pad = n_steps * B
    print(f"n_steps={n_steps}", file=sys.stderr)

    @jax.jit
    def epoch_pre(state, flat, r):
        return fused._epoch_on_flat(train_step, state, flat, r, n_steps, B)

    @jax.jit
    def epoch_inscan(state, flat, r):
        sort_key = jax.random.uniform(r, (n_pad,)) + jnp.where(
            flat["weight"] > 0.0, 0.0, 2.0
        )
        idx2d = jnp.argsort(sort_key)[: n_steps * B].reshape(n_steps, B)

        def body(state, idx_row):
            b = {k: jnp.take(v, idx_row, axis=0) for k, v in flat.items()}
            return train_step(state, b)

        state, losses = jax.lax.scan(body, state, idx2d)
        return state, jnp.mean(losses)

    @jax.jit
    def epoch_noshuffle(state, flat, r):
        return fused._epoch_on_flat(
            train_step, state, flat, r, n_steps, B, shuffle=False
        )

    def timeit(name, fn):
        state = t.state
        s2, l = fn(state, flat, jax.random.PRNGKey(0))
        float(l)
        ts = []
        for i in range(4):
            t0 = time.time()
            s2, l = fn(s2, flat, jax.random.PRNGKey(i))
            float(l)
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: {med*1000:.0f}ms/epoch -> {med/n_steps*1e6:.0f}us/step "
              f"({n_steps*B/med/1e6:.2f}M ex/s)")

    timeit("A pre-gathered ", epoch_pre)
    timeit("B in-scan take ", epoch_inscan)
    timeit("C no-shuffle   ", epoch_noshuffle)


if __name__ == "__main__":
    main()
