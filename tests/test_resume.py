"""Checkpoint/resume: full train state round-trips and training continues."""

import numpy as np
import jax

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.strategies import build_strategy
from mamdr_tpu.train import checkpoints
from mamdr_tpu.train.trainer import Trainer


def make(tmp_path, name="mlp", epochs=2, **train_overrides):
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": name, "user_dim": 8, "item_dim": 8, "domain_dim": 8,
                       "hidden_dim": [16, 8], "dropout": 0.0},
            "train": {"epoch": epochs, "learning_rate": 0.01, "patience": 5,
                       "resume_every": 1, "sample_num": 1, **train_overrides},
            "dataset": {"name": "synthetic", "batch_size": 128, "seed": 5},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / "ckpt")
    cfg.train.result_save_path = str(tmp_path / "result")
    ds = make_synthetic_dataset(n_domain=2, n_uid=50, n_pid=50, n_per_domain=600,
                                seed=5, batch_size=128)
    return cfg, ds


def test_train_state_roundtrip(tmp_path):
    cfg, ds = make(tmp_path)
    t = Trainer(cfg, ds, verbose=False)
    t.state, _ = t.fit_domain(t.state, 0)
    t.stopper.step(0.6)
    checkpoints.save_train_state(
        str(tmp_path / "rs"), t.state, epoch=3, stopper=t.stopper, np_rng=t.np_rng,
        extra_trees={"best_params": t.state.params},
    )
    t2 = Trainer(cfg, ds, verbose=False)
    state, epoch, st, np_state, extras = checkpoints.load_train_state(
        str(tmp_path / "rs"), t2.state, {"best_params": t2.state.params}
    )
    assert epoch == 3
    assert st["best_metric"] == 0.6
    # params identical after round trip
    a = jax.tree_util.tree_leaves(t.state.params)
    b = jax.tree_util.tree_leaves(state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # optimizer slots restored too
    oa = jax.tree_util.tree_leaves(t.state.opt_state)
    ob = jax.tree_util.tree_leaves(state.opt_state)
    for x, y in zip(oa, ob):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert "best_params" in extras


def test_joint_resume_continues(tmp_path):
    cfg, ds = make(tmp_path, epochs=2)
    t = Trainer(cfg, ds, verbose=False)
    build_strategy(t).run()
    # a resume snapshot exists
    assert checkpoints.has_train_state(t.resume_dir)

    # new process simulation: resume + 2 more epochs
    cfg2, _ = make(tmp_path, epochs=4)
    cfg2.train.resume = True
    t2 = Trainer(cfg2, ds, verbose=False)
    r = t2.try_resume({"best_params": t2.state.params})
    assert r is not None and r[0] == 2
    # resumed params differ from fresh init (training actually happened)
    fresh = Trainer(cfg2, ds, verbose=False)
    diff = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).sum())
        for a, b in zip(
            jax.tree_util.tree_leaves(t2.state.params["model"]["dnn"]),
            jax.tree_util.tree_leaves(fresh.state.params["model"]["dnn"]),
        )
    )
    assert diff > 0


def test_mamdr_resume(tmp_path):
    cfg, ds = make(tmp_path, name="mlp_meta_mamdr", epochs=2,
                   meta_learning_rate=0.1)
    t = Trainer(cfg, ds, verbose=False)
    s = build_strategy(t)
    s.run()
    assert checkpoints.has_train_state(t.resume_dir)

    cfg2, _ = make(tmp_path, name="mlp_meta_mamdr", epochs=3,
                   meta_learning_rate=0.1)
    cfg2.train.resume = True
    t2 = Trainer(cfg2, ds, verbose=False)
    s2 = build_strategy(t2)
    # full run resumes and completes without error
    avg_loss, avg_auc, _, domain_auc = s2.run()
    assert len(domain_auc) == 2 and np.isfinite(avg_loss)


def test_meta_family_resume(tmp_path):
    """r5: the whole meta family (MLDG here; MAML/Reptile/DN share
    meta_base.try_resume_meta/maybe_snapshot) snapshots and resumes its
    fused loop — meta weights + meta-optimizer slots + stopper + rngs —
    so uncapped reruns continue instead of restarting (VERDICT r4 item 1)."""
    for name, extra in (
        ("mlp_meta_mldg", {"meta_learning_rate": 0.001}),
        ("mlp_meta_domain_negotiation", {"meta_learning_rate": 0.1}),
    ):
        sub = tmp_path / name
        sub.mkdir()
        cfg, ds = make(sub, name=name, epochs=2, **extra)
        t = Trainer(cfg, ds, verbose=False)
        s = build_strategy(t)
        s.run()
        assert checkpoints.has_train_state(t.resume_dir), name

        cfg2, _ = make(sub, name=name, epochs=3, **extra)
        cfg2.train.resume = True
        t2 = Trainer(cfg2, ds, verbose=False)
        s2 = build_strategy(t2)
        avg_loss, avg_auc, _, domain_auc = s2.run()
        assert len(domain_auc) == 2 and np.isfinite(avg_loss), name


def test_per_domain_finetune_artifacts(tmp_path):
    """separate/finetune writes domain_{idx}.npz best-weights artifacts
    (reference ModelCheckpoint layout, base_model.py:77-90)."""
    import os.path as osp

    import numpy as np

    from mamdr_tpu.config import ExperimentConfig
    from mamdr_tpu.data.synthetic import make_synthetic_dataset
    from mamdr_tpu.strategies import build_strategy
    from mamdr_tpu.train import checkpoints
    from mamdr_tpu.train.trainer import Trainer

    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp_separate", "user_dim": 8, "item_dim": 8,
                       "domain_dim": 8, "hidden_dim": [16, 8], "dropout": 0.0},
            "train": {"epoch": 2, "learning_rate": 0.01, "patience": 2,
                       "metrics_jsonl": False},
            "dataset": {"name": "synthetic", "batch_size": 128, "seed": 7},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / "ckpt")
    cfg.train.result_save_path = str(tmp_path / "res")
    ds = make_synthetic_dataset(n_domain=3, n_uid=40, n_pid=40,
                                n_per_domain=600, seed=7, batch_size=128)
    t = Trainer(cfg, ds, verbose=False)
    build_strategy(t).run()
    for i in range(3):
        p = osp.join(t.checkpoint_dir, f"domain_{i}.npz")
        assert osp.exists(p), f"missing {p}"
        tree = checkpoints.load_pytree(p, t.state.params)
        assert all(
            np.all(np.isfinite(np.asarray(x)))
            for x in __import__("jax").tree_util.tree_leaves(tree)
        )


def test_decomposition_masked_roundtrip(tmp_path):
    """save_decomposition(mask=...) writes only masked leaves per specific
    (unmasked leaves alias shared — writing them was n_domain x full-model
    bytes per improving epoch); load restores the aliases from shared."""
    from mamdr_tpu.strategies.mamdr import MAMDRStrategy

    cfg, ds = make(tmp_path, name="mlp_meta_mamdr", epochs=1,
                   meta_learning_rate=0.1)
    t = Trainer(cfg, ds, verbose=False)
    s = MAMDRStrategy(t)
    d = str(tmp_path / "decomp")
    checkpoints.save_decomposition(
        d, s.shared, s.specific, extra={"merged_method": "plus"}, mask=s.mask
    )
    # specific files hold exactly the masked leaves (frozen/pretrained
    # tables are unmasked on Taobao configs and stay out of every specific)
    z = np.load(d + "/specific_0.npz")
    mask_flat = {}
    jax.tree_util.tree_map_with_path(
        lambda p, m: mask_flat.__setitem__(
            checkpoints.path_str(p).replace("/", checkpoints.SEP), bool(m)
        ),
        s.mask,
    )
    assert set(z.files) == {k for k, m in mask_flat.items() if m}
    shared2, specific2, meta = checkpoints.load_decomposition(d, t.state.params)
    assert meta["masked_only"]
    for a, b in zip(jax.tree_util.tree_leaves(s.specific[0]),
                    jax.tree_util.tree_leaves(specific2[0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
