"""End-to-end learning tests for every strategy and base model.

Each strategy must run its full reference flow (train -> early stop -> test
with best weights [-> finetune]) AND provably learn: the structured synthetic
(labels = Bernoulli(sigmoid(3·u·(v+tilt)))) is learnable to ~0.75-0.82 AUC at
this scale, so every test asserts a per-variant floor well above chance. An
untrained model (AUC 0.5) fails every floored test.

Floors are per-variant because the strategies genuinely differ in sample
efficiency at this scale (first-order MAML's meta updates move slowly —
matching the paper's ordering where MAML trails DN/MAMDR), with ~0.04-0.05
margin under the fixed seed (CPU runs are deterministic).
"""

import numpy as np
import pytest

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.strategies import build_strategy
from mamdr_tpu.train.trainer import Trainer


def run_strategy(name, tmp_path, floor, n_domain=3, epochs=15,
                 model_overrides=None, **train_overrides):
    model = {
        "name": name,
        "user_dim": 16,
        "item_dim": 16,
        "domain_dim": 16,
        "hidden_dim": [32, 16],
        "dropout": 0.0,
    }
    model.update(model_overrides or {})
    cfg = ExperimentConfig.from_dict(
        {
            "model": model,
            "train": {
                "epoch": epochs,
                "learning_rate": 0.01,
                "meta_learning_rate": 0.1,
                "patience": 5,
                "sample_num": 2,
                **train_overrides,
            },
            "dataset": {"name": "synthetic", "batch_size": 128, "seed": 11},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / "ckpt")
    cfg.train.result_save_path = str(tmp_path / "result")
    ds = make_synthetic_dataset(
        n_domain=n_domain, n_uid=60, n_pid=60, n_per_domain=3000, seed=11,
        batch_size=128,
    )
    t = Trainer(cfg, ds, verbose=False)
    result = build_strategy(t).run()
    avg_loss, avg_auc, domain_loss, domain_auc = result
    assert len(domain_auc) == n_domain
    assert np.isfinite(avg_loss), f"{name}: loss {avg_loss}"
    assert avg_auc >= floor, (
        f"{name}: avg test AUC {avg_auc:.4f} below learned floor {floor}"
    )
    return result


# ---------------- joint base-model zoo ----------------

ZOO = ["mlp", "wdl", "nfm", "autoint", "ccpm", "pnn", "deepfm"]
MTL = ["shared_bottom", "mmoe", "ple"]


@pytest.mark.parametrize("name", ZOO)
def test_joint_deepctr_zoo(tmp_path, name):
    run_strategy(name, tmp_path, floor=0.65)


@pytest.mark.parametrize("name", MTL)
def test_joint_mtl_zoo(tmp_path, name):
    run_strategy(
        name, tmp_path, floor=0.63,
        model_overrides={"tower_hidden_dim": [16]},
    )


def test_joint_star(tmp_path):
    run_strategy(
        "star", tmp_path, floor=0.63,
        model_overrides={"norm": "pn", "dense": "star",
                          "auxiliary_net": True, "auxiliary_dim": 16},
    )


def test_separate(tmp_path):
    run_strategy("mlp_separate", tmp_path, floor=0.60)


def test_finetune(tmp_path):
    run_strategy("mlp_finetune", tmp_path, floor=0.68)


# ---------------- strategy wrappers ----------------

def test_reptile(tmp_path):
    run_strategy("mlp_meta_reptile", tmp_path, floor=0.62)


def test_reptile_batch(tmp_path):
    run_strategy("mlp_meta_reptile_batch", tmp_path, floor=0.62)


def test_domain_negotiation(tmp_path):
    run_strategy("mlp_meta_domain_negotiation", tmp_path, floor=0.60)


def test_dn_fixed_sequence(tmp_path):
    run_strategy(
        "mlp_meta_domain_negotiation", tmp_path, floor=0.60,
        shuffle_sequence=False, meta_sequence=[2, 0, 1],
    )


def test_mamdr(tmp_path):
    run_strategy(
        "mlp_meta_mamdr", tmp_path, floor=0.66,
        meta_learning_rate=0.1, sample_num=2, add_query_domain=True,
    )


def test_mamdr_finetune_times_merge(tmp_path):
    # "times" merge with the reference's random specific init is
    # reference-parity pathological: merged = shared ⊙ random-specific makes
    # tiny products, so the model is near-dead (reference mamdr.py:30-33 +
    # specific_base_model.py:164-172 behave identically; every shipped config
    # uses "plus"). This is a flow smoke test only — no learned floor.
    run_strategy(
        "mlp_meta_mamdr_finetune", tmp_path, floor=0.0, epochs=2,
        merged_method="times", sample_num=1, finetune_every_epoch=True,
    )


def test_mamdr_batch(tmp_path):
    run_strategy("mlp_meta_mamdr_batch", tmp_path, floor=0.65, sample_num=2)


def test_maml(tmp_path):
    run_strategy(
        "mlp_meta_maml", tmp_path, floor=0.56,
        meta_learning_rate=0.05, meta_split="meta-train/val",
        meta_split_ratio=0.5,
    )


def test_maml_batch_mean(tmp_path):
    run_strategy(
        "mlp_meta_maml_batch", tmp_path, floor=0.55, epochs=20,
        meta_learning_rate=0.01, average_meta_grad="mean", meta_train_step=2,
    )


def test_maml_finetune_val(tmp_path):
    run_strategy(
        "mlp_meta_maml", tmp_path, floor=0.55, epochs=3,
        meta_learning_rate=0.05, meta_finetune_step=1,
        meta_split="train-train",
    )


def test_maml_finetune_stage(tmp_path):
    run_strategy(
        "mlp_meta_maml_finetune", tmp_path, floor=0.58,
        meta_learning_rate=0.05, meta_split="train-train",
        finetune_learning_rate=0.01,
    )


def test_mldg(tmp_path):
    run_strategy(
        "mlp_meta_mldg", tmp_path, floor=0.63,
        learning_rate=0.01, meta_learning_rate=0.01,
        meta_split="meta-train/val", meta_split_ratio=0.8,
    )


def test_pcgrad(tmp_path):
    run_strategy("mlp_pcgrad", tmp_path, floor=0.65, meta_learning_rate=0.01)


def test_uncertainty_weight(tmp_path):
    run_strategy("mlp_uncertainty_weight", tmp_path, floor=0.68)


def test_target_domain_dn(tmp_path):
    # leave-one-domain-out: early stop tracks the target domain's AUC, so
    # the learned floor applies to the target domain, not the macro average.
    result = run_strategy(
        "mlp_meta_domain_negotiation", tmp_path, floor=0.0, target_domain=1,
    )
    assert result[3]["1"] >= 0.66, f"target-domain AUC {result[3]['1']:.4f}"


def test_meta_parms_all_hidden(tmp_path):
    run_strategy(
        "mlp_meta_reptile", tmp_path, floor=0.65, meta_parms=["all_hidden"]
    )


def test_mamdr_parallel_vs_sequential_learning_parity(tmp_path):
    """Under Adam + dropout the parallel-lanes DR differs from the sequential
    dr_phase in optimizer-slot lineage (each lane starts from the DR-entry
    slots) and dropout streams (per-lane fold_in vs sequential step offsets).
    Neither may change learning quality: same config trained both ways lands
    within noise. Dropout is ON here deliberately — it exercises the
    per-lane rng decorrelation axis the bit-equivalence tests turn off."""
    _, auc_par, _, _ = run_strategy(
        "mlp_meta_mamdr", tmp_path / "p", floor=0.64, dr_parallel="on",
        model_overrides={"dropout": 0.3},
    )
    _, auc_seq, _, _ = run_strategy(
        "mlp_meta_mamdr", tmp_path / "s", floor=0.64, dr_parallel="off",
        model_overrides={"dropout": 0.3},
    )
    assert abs(auc_par - auc_seq) < 0.02, (auc_par, auc_seq)


def test_bf16_compute_tower_learns(tmp_path):
    """Mixed-precision towers (compute_dtype=bfloat16, f32 master params)
    must learn like f32 — a single knob for the 2x MXU bf16 rate."""
    _, auc_bf16, _, _ = run_strategy(
        "mlp", tmp_path / "b", floor=0.65,
        model_overrides={"compute_dtype": "bfloat16"},
    )
    _, auc_f32, _, _ = run_strategy("mlp", tmp_path / "f", floor=0.65)
    assert abs(auc_bf16 - auc_f32) < 0.02, (auc_bf16, auc_f32)
