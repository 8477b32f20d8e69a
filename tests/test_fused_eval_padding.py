"""Regression: fused all-domain eval must match per-domain eval exactly even
when short domains are padded to a much larger block (the all-pad batches
previously diluted the loss average toward zero)."""

import numpy as np

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.train.trainer import Trainer


def test_fused_eval_matches_per_domain_with_heavy_padding(tmp_path):
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp", "user_dim": 8, "item_dim": 8, "domain_dim": 8,
                       "hidden_dim": [16, 8], "dropout": 0.0},
            "train": {"metrics_jsonl": False},
            "dataset": {"name": "synthetic", "batch_size": 64, "seed": 2},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / "c")
    cfg.train.result_save_path = str(tmp_path / "r")
    # long-tailed: domain 0 is ~9x domain 2 -> domain 2's eval block is
    # mostly padding
    ds = make_synthetic_dataset(n_domain=3, n_uid=50, n_pid=50, n_per_domain=3000,
                                seed=2, batch_size=64, long_tail=True)
    t = Trainer(cfg, ds, verbose=False)

    losses, aucs = t._fused_eval(t.state.params, t.state.batch_stats, t.eval_block("val"))
    for d in range(3):
        l, a = t.evaluate_domain("val", d, t.state.params, t.state.batch_stats)
        assert abs(float(losses[d]) - l) < 1e-5, (d, float(losses[d]), l)
        assert abs(float(aucs[d]) - a) < 1e-5
