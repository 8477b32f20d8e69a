"""End-to-end smoke for every learning strategy on tiny synthetic data.

Each strategy must run its full reference flow (train -> early stop -> test
with best weights [-> finetune]) and produce finite per-domain metrics.
"""

import numpy as np
import pytest

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.strategies import build_strategy
from mamdr_tpu.train.trainer import Trainer


def run_strategy(name, tmp_path, n_domain=3, epochs=2, **train_overrides):
    cfg = ExperimentConfig.from_dict(
        {
            "model": {
                "name": name,
                "user_dim": 8,
                "item_dim": 8,
                "domain_dim": 8,
                "hidden_dim": [16, 8],
                "dropout": 0.0,
            },
            "train": {
                "epoch": epochs,
                "learning_rate": 0.01,
                "meta_learning_rate": 0.1,
                "patience": 3,
                "sample_num": 2,
                **train_overrides,
            },
            "dataset": {"name": "synthetic", "batch_size": 128, "seed": 11},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / "ckpt")
    cfg.train.result_save_path = str(tmp_path / "result")
    ds = make_synthetic_dataset(
        n_domain=n_domain, n_uid=60, n_pid=60, n_per_domain=700, seed=11, batch_size=128
    )
    t = Trainer(cfg, ds, verbose=False)
    result = build_strategy(t).run()
    avg_loss, avg_auc, domain_loss, domain_auc = result
    assert len(domain_auc) == n_domain
    assert np.isfinite(avg_loss), f"{name}: loss {avg_loss}"
    assert 0.0 <= avg_auc <= 1.0
    return result


def test_reptile(tmp_path):
    run_strategy("mlp_meta_reptile", tmp_path)


def test_reptile_batch(tmp_path):
    run_strategy("mlp_meta_reptile_batch", tmp_path)


def test_domain_negotiation(tmp_path):
    run_strategy("mlp_meta_domain_negotiation", tmp_path)


def test_dn_fixed_sequence(tmp_path):
    run_strategy(
        "mlp_meta_domain_negotiation", tmp_path,
        shuffle_sequence=False, meta_sequence=[2, 0, 1],
    )


def test_mamdr(tmp_path):
    run_strategy(
        "mlp_meta_mamdr", tmp_path,
        meta_learning_rate=0.1, sample_num=2, add_query_domain=True,
    )


def test_mamdr_finetune_times_merge(tmp_path):
    run_strategy(
        "mlp_meta_mamdr_finetune", tmp_path, epochs=1,
        merged_method="times", sample_num=1, finetune_every_epoch=True,
    )


def test_mamdr_batch(tmp_path):
    run_strategy("mlp_meta_mamdr_batch", tmp_path, epochs=1, sample_num=2)


def test_maml(tmp_path):
    run_strategy(
        "mlp_meta_maml", tmp_path,
        meta_learning_rate=0.001, meta_split="meta-train/val", meta_split_ratio=0.5,
    )


def test_maml_batch_mean(tmp_path):
    run_strategy(
        "mlp_meta_maml_batch", tmp_path, epochs=1,
        average_meta_grad="mean", meta_train_step=2,
    )


def test_maml_finetune_val(tmp_path):
    run_strategy(
        "mlp_meta_maml", tmp_path, epochs=1, meta_finetune_step=1,
    )


def test_mldg(tmp_path):
    run_strategy(
        "mlp_meta_mldg", tmp_path,
        learning_rate=1e-4, meta_learning_rate=0.001,
        meta_split="meta-train/val", meta_split_ratio=0.5,
    )


def test_pcgrad(tmp_path):
    run_strategy("mlp_pcgrad", tmp_path, meta_learning_rate=0.001)


def test_uncertainty_weight(tmp_path):
    run_strategy("mlp_uncertainty_weight", tmp_path)


def test_target_domain_dn(tmp_path):
    # leave-one-domain-out: early stop tracks the target domain's AUC
    run_strategy(
        "mlp_meta_domain_negotiation", tmp_path, target_domain=1,
    )


def test_meta_parms_all_hidden(tmp_path):
    run_strategy("mlp_meta_reptile", tmp_path, meta_parms=["all_hidden"])
