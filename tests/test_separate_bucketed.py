"""Bucketed vmapped separate/finetune execution (long-tail lane padding).

vmap lanes run in lockstep, so on long-tailed datasets the single-vmap
separate path pays global-max steps in EVERY lane. separate.step_buckets
partitions domains into step-count buckets (waste bounded by max_ratio) and
_separate_bucketed runs the fused path per bucket; domains are independent,
so per-domain results are the same computation as the single vmap up to the
in-jit shuffle/init rng draws.
"""

import numpy as np

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.strategies.separate import (
    _separate_bucketed,
    separate_train_val_test,
    step_buckets,
)
from mamdr_tpu.train.trainer import Trainer


def test_step_buckets_partition_and_ratio():
    steps = [211, 141, 94, 63, 42, 28, 19, 13, 9, 6, 4, 3, 2]
    buckets = step_buckets(steps, max_ratio=2.0)
    seen = sorted(i for b in buckets for i in b)
    assert seen == list(range(len(steps)))  # exact partition
    for b in buckets:
        mx = max(steps[i] for i in b)
        mn = min(steps[i] for i in b)
        assert mx <= 2.0 * mn  # per-bucket padding waste bounded
    assert 1 < len(buckets) < len(steps)  # genuinely grouped


def test_step_buckets_balanced_is_single():
    assert step_buckets([12, 12, 12]) == [[0, 1, 2]]


def _make_trainer(tmp_path):
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp_separate", "user_dim": 16, "item_dim": 16,
                       "domain_dim": 16, "hidden_dim": [32, 16], "dropout": 0.0},
            "train": {"epoch": 10, "learning_rate": 0.01, "patience": 3},
            "dataset": {"name": "synthetic", "batch_size": 128, "seed": 11},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / "ckpt")
    cfg.train.result_save_path = str(tmp_path / "result")
    # long_tail: 3000/2000/1333/889 rows -> 24/16/11/7 steps -> 2 buckets
    ds = make_synthetic_dataset(
        n_domain=4, n_uid=60, n_pid=60, n_per_domain=3000, seed=11,
        batch_size=128,
    )
    return Trainer(cfg, ds, verbose=False), ds


def test_bucketed_separate_learns(tmp_path):
    t, ds = _make_trainer(tmp_path)
    steps = t.steps_per_domain()
    assert len(step_buckets(steps)) >= 2  # the dataset is genuinely ragged
    avg_loss, avg_auc, domain_loss, domain_auc = _separate_bucketed(
        t, init_params=True, params_fn=None, max_finetune_epochs=None
    )
    assert len(domain_auc) == 4
    assert sorted(domain_auc) == ["0", "1", "2", "3"]  # global ids, all buckets
    assert np.isfinite(avg_loss)
    assert avg_auc >= 0.60, f"bucketed separate failed to learn: {avg_auc}"


def test_bucketed_matches_single_vmap_quality(tmp_path):
    # Same data through the single-vmap path (the default gate keeps small
    # datasets on it): per-domain AUCs should agree closely — the paths
    # differ only in rng draw order, not semantics.
    t1, _ = _make_trainer(tmp_path / "a")
    _, _, _, auc_full = separate_train_val_test(t1, init_params=True)
    t2, _ = _make_trainer(tmp_path / "b")
    _, _, _, auc_bucket = _separate_bucketed(
        t2, init_params=True, params_fn=None, max_finetune_epochs=None
    )
    for k in auc_full:
        assert abs(auc_full[k] - auc_bucket[k]) < 0.06, (
            k, auc_full[k], auc_bucket[k]
        )
