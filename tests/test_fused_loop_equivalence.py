"""Bit-level equivalence of the fused and loop execution paths.

With shuffling disabled and dropout off, the fused DN epoch (one dispatch)
must produce the same parameters as the per-domain loop path — same batch
order, same optimizer trajectory, same outer update.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.strategies.domain_negotiation import DomainNegotiationStrategy
from mamdr_tpu.train import fused
from mamdr_tpu.train.trainer import Trainer


def make_trainer(tmp_path, tag):
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp_meta_domain_negotiation", "user_dim": 8,
                       "item_dim": 8, "domain_dim": 8, "hidden_dim": [16, 8],
                       "dropout": 0.0},
            "train": {"epoch": 1, "learning_rate": 0.01, "meta_learning_rate": 0.1,
                       "patience": 5, "shuffle_sequence": False,
                       "metrics_jsonl": False},
            "dataset": {"name": "synthetic", "batch_size": 64, "seed": 21},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / f"c{tag}")
    cfg.train.result_save_path = str(tmp_path / f"r{tag}")
    ds = make_synthetic_dataset(n_domain=3, n_uid=40, n_pid=40, n_per_domain=500,
                                seed=21, batch_size=64)
    ds.fixed_train = True  # loop path: natural order, no reshuffle
    return Trainer(cfg, ds, verbose=False), ds


def test_fused_dn_equals_loop_dn(tmp_path):
    # --- loop path: one DN epoch by hand (load meta once, chain domains,
    # reptile outer update) ---
    t1, ds = make_trainer(tmp_path, 1)
    s1 = DomainNegotiationStrategy(t1)
    meta1 = t1.state.params
    t1.state = t1.state.replace(params=s1.load_meta(t1.state.params, meta1))
    for idx in [0, 1, 2]:
        t1.state, _ = t1.fit_domain(t1.state, idx)
    meta1 = s1.reptile_step(meta1, t1.state.params, 0.1)

    # --- fused path: same epoch as one dispatch, shuffle disabled ---
    t2, _ = make_trainer(tmp_path, 2)
    s2 = DomainNegotiationStrategy(t2)
    block, n_steps = fused.stack_domains_on_device(ds.train, 64)
    dn_epoch = fused.make_fused_dn(
        t2.train_step_fn(), s2.mask, n_steps, 64, shuffle=False
    )
    meta2 = t2.state.params
    t2.state, meta2, _ = dn_epoch(
        t2.state, meta2, block, np.asarray([0, 1, 2], np.int32),
        jax.random.PRNGKey(0), 0.1,
    )

    for a, b in zip(
        jax.tree_util.tree_leaves(meta1), jax.tree_util.tree_leaves(meta2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
