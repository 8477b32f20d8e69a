"""Fused (vmapped) vs loop meta_finetune_val.

The meta-finetune validation protocol (reference maml.py:245-287) finetunes
every domain from the current meta weights for meta_finetune_step epochs,
evaluates val AUC per domain, and restores. The sequential form is
D x (steps + 1) dispatches; the fused form runs all domains as vmapped lanes
in meta_finetune_step + 1 dispatches. Both start every domain from the SAME
state (params, optimizer slots, step counter) — only the shuffle RNG stream
differs — so per-domain AUCs must agree closely (not bitwise) on a learnable
synthetic, and the meta state must be untouched afterwards.
"""

import jax
import numpy as np

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.strategies.reptile import ReptileStrategy
from mamdr_tpu.train.trainer import Trainer


def make_trainer(tmp_path):
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp_meta_reptile", "user_dim": 16,
                       "item_dim": 16, "domain_dim": 16,
                       "hidden_dim": [32, 16], "dropout": 0.0},
            "train": {"epoch": 3, "learning_rate": 0.01,
                       "meta_learning_rate": 0.1, "patience": 5,
                       "meta_finetune_step": 2, "metrics_jsonl": False},
            "dataset": {"name": "synthetic", "batch_size": 128, "seed": 11},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / "ckpt")
    cfg.train.result_save_path = str(tmp_path / "result")
    ds = make_synthetic_dataset(
        n_domain=3, n_uid=60, n_pid=60, n_per_domain=3000, seed=11,
        batch_size=128,
    )
    return Trainer(cfg, ds, verbose=False)


def test_fused_meta_finetune_val_matches_loop(tmp_path):
    t = make_trainer(tmp_path)
    s = ReptileStrategy(t)
    # a couple of real meta epochs so the optimizer slots / step counter the
    # protocol must carry into the lanes are non-trivial
    for idx in [0, 1, 2]:
        t.state, _ = t.fit_domain(t.state, idx)
    base_params = jax.tree_util.tree_map(np.asarray, t.state.params)
    base_step = int(t.state.step)

    assert t.fused_padding_ok()
    fused_out = s.meta_finetune_val()

    # meta state untouched by the protocol
    for a, b in zip(
        jax.tree_util.tree_leaves(base_params),
        jax.tree_util.tree_leaves(t.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(t.state.step) == base_step

    t.fused_padding_ok = lambda *a, **k: False
    loop_out = s.meta_finetune_val()

    for out in (fused_out, loop_out):
        avg_loss, avg_auc, domain_loss, domain_auc = out
        assert sorted(domain_auc) == ["0", "1", "2"]
        assert np.isfinite(avg_loss)
        assert avg_auc > 0.62, f"meta-finetune val did not learn: {avg_auc}"

    # same protocol, different shuffle streams: close, not bitwise
    for k in ("0", "1", "2"):
        assert abs(fused_out[3][k] - loop_out[3][k]) < 0.05, (
            k, fused_out[3][k], loop_out[3][k]
        )
    assert abs(fused_out[1] - loop_out[1]) < 0.03
