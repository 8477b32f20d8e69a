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

    # the long-tail steps are non-uniform, so this exercises the RAGGED
    # fused eval (padded variant is pinned by uniform-split tests)
    losses, aucs = t.fused_eval_fn("val")(
        t.state.params, t.state.batch_stats, t.eval_block("val")
    )
    for d in range(3):
        l, a = t.evaluate_domain("val", d, t.state.params, t.state.batch_stats)
        assert abs(float(losses[d]) - l) < 1e-5, (d, float(losses[d]), l)
        assert abs(float(aucs[d]) - a) < 1e-5


def test_merged_ragged_eval_matches_per_domain(tmp_path):
    """MAMDR's merged fused eval (ragged on this long-tail split) must match
    the per-domain params_fn loop exactly."""
    from mamdr_tpu.strategies.mamdr import MAMDRStrategy

    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp_meta_mamdr", "user_dim": 8, "item_dim": 8,
                       "domain_dim": 8, "hidden_dim": [16, 8], "dropout": 0.0},
            "train": {"metrics_jsonl": False, "sample_num": 2},
            "dataset": {"name": "synthetic", "batch_size": 64, "seed": 2},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / "c2")
    cfg.train.result_save_path = str(tmp_path / "r2")
    ds = make_synthetic_dataset(n_domain=3, n_uid=50, n_pid=50, n_per_domain=3000,
                                seed=2, batch_size=64, long_tail=True)
    t = Trainer(cfg, ds, verbose=False)
    s = MAMDRStrategy(t)
    assert len(set(t.eval_steps_per_domain("val"))) > 1  # genuinely ragged

    _, _, _, auc_fused = s._merged_eval("val", s.shared, s.specific)
    for d in range(3):
        params, stats = s.val_params_fn(d)
        _, a = t.evaluate_domain("val", d, params, stats)
        assert abs(auc_fused[str(d)] - a) < 1e-5, (d, auc_fused[str(d)], a)
