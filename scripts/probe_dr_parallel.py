"""Decompose the parallel-DR lane-step cost at bench shapes.

bench.py with the vmapped-lanes DR measured 14.4M ex/s where the raw
lane probe (probe_vmap_lanes.py: 42.9 ns/example at 30 lanes) predicted
~18M. The raw probe skipped per-lane epoch FORMATION (argsort shuffle +
packed take, done once per lane-epoch inside _epoch_on_flat). Suspect:
the vmapped [30, N] batched argsort.

Variants (bench shapes: 30 domains x 12288 rows, B=1024, frozen tables):
  dr_shuffle    real parallel DR phase (argsort formation per lane-epoch)
  dr_natural    same graph with shuffle=False (formation = arange reshape)

Run only when the TPU is free: timeout 2400 python scripts/probe_dr_parallel.py
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.strategies.mamdr import MAMDRStrategy
from mamdr_tpu.train import fused
from mamdr_tpu.train.steps import make_subset_train_step
from mamdr_tpu.train.trainer import Trainer
from mamdr_tpu.utils import trees

B = 1024
N_UID = N_PID = 100_000


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    cfg = ExperimentConfig.from_dict(
        {
            "model": {
                "name": "mlp_meta_mamdr_finetune",
                "user_dim": 128, "item_dim": 128, "domain_dim": 128,
                "hidden_dim": [256, 128, 64], "dropout": 0.5,
            },
            "train": {
                "load_pretrain_emb": True, "emb_trainable": False,
                "learning_rate": 1e-3, "meta_learning_rate": 0.1,
                "merged_method": "plus", "sample_num": 5,
                "add_query_domain": True, "epoch": 1,
            },
            "dataset": {"name": "synthetic", "batch_size": B, "seed": 123},
        }
    )
    ds = make_synthetic_dataset(
        n_domain=30, n_uid=N_UID, n_pid=N_PID, n_per_domain=20_000,
        seed=123, long_tail=False, batch_size=B,
    )
    rng = np.random.default_rng(0)
    ds.user_emb = rng.normal(0, 0.1, (N_UID, 128)).astype(np.float32)
    ds.item_emb = rng.normal(0, 0.1, (N_PID, 128)).astype(np.float32)
    trainer = Trainer(cfg, ds, verbose=False)
    strat = MAMDRStrategy(trainer)

    frozen_mask = trees.named_tree_map(
        lambda n, x: "user_emb" in n or "item_emb" in n, trainer.state.params
    )
    sub_step, to_sub, combine = make_subset_train_step(
        trainer.model, trainer.tx, trainer.step_cfg, frozen_mask,
        trainer.state.params,
    )
    block, n_steps = trainer.train_block()
    spec_stack = fused.stack_specific(strat.specific, strat.mask)
    order = np.arange(30, dtype=np.int32)
    k = 6
    aux = np.stack([
        np.r_[np.random.default_rng(q).choice(
            [d for d in range(30) if d != q], size=5, replace=False), q]
        for q in range(30)
    ]).astype(np.int32)
    key = jax.random.PRNGKey(3)

    def timeit(name, fn):
        t0 = time.time()
        st, sp = fn(trainer.state, strat.shared, spec_stack, block, order,
                    aux, key, 0.1)
        float(jax.tree_util.tree_leaves(sp)[3].sum())
        print(f"{name}: compile+run {time.time()-t0:.1f}s", file=sys.stderr)
        ts = []
        for _ in range(3):
            t0 = time.time()
            st, sp = fn(trainer.state, strat.shared, spec_stack, block,
                        order, aux, key, 0.1)
            float(jax.tree_util.tree_leaves(sp)[3].sum())
            ts.append(time.time() - t0)
        med = sorted(ts)[1]
        n_ex = 30 * k * 2 * n_steps * B
        print(f"{name:12s}: {med*1000:7.1f}ms DR phase, "
              f"{n_ex/med/1e6:7.2f}M ex/s", flush=True)

    for name, shuf in (("dr_shuffle", True), ("dr_natural", False)):
        dr = fused.make_fused_dr_parallel(
            sub_step, to_sub, combine, strat.mask, "plus", n_steps, B,
            domain_regulation_step=0, shuffle=shuf,
        )
        timeit(name, dr)


if __name__ == "__main__":
    main()
