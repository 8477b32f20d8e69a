"""Fused execution: pad-step no-ops, long-tail padding, STAR through the
fused MAMDR phases."""

import jax
import jax.numpy as jnp
import numpy as np

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.strategies import build_strategy
from mamdr_tpu.train.steps import make_train_step
from mamdr_tpu.train.trainer import Trainer


def make_trainer(tmp_path, name="mlp", n_domain=2, **model_overrides):
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": name, "user_dim": 8, "item_dim": 8, "domain_dim": 8,
                       "hidden_dim": [16, 8], "dropout": 0.0, **model_overrides},
            "train": {"epoch": 2, "learning_rate": 0.01, "patience": 3,
                       "meta_learning_rate": 0.1, "sample_num": 1,
                       "metrics_jsonl": False},
            "dataset": {"name": "synthetic", "batch_size": 64, "seed": 9},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / "ckpt")
    cfg.train.result_save_path = str(tmp_path / "result")
    ds = make_synthetic_dataset(n_domain=n_domain, n_uid=40, n_pid=40,
                                n_per_domain=400, seed=9, batch_size=64)
    return Trainer(cfg, ds, verbose=False)


def test_all_pad_batch_is_noop(tmp_path):
    t = make_trainer(tmp_path)
    step, _ = make_train_step(t.model, t.tx, t.step_cfg)
    b = 64
    batch = {
        "uid": jnp.zeros((b,), jnp.int32),
        "pid": jnp.zeros((b,), jnp.int32),
        "domain": jnp.zeros((b,), jnp.int32),
        "label": jnp.zeros((b,), jnp.float32),
        "weight": jnp.zeros((b,), jnp.float32),  # all padding
    }
    new_state, _ = jax.jit(step)(t.state, batch)
    for a, c in zip(
        jax.tree_util.tree_leaves(t.state.params),
        jax.tree_util.tree_leaves(new_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    for a, c in zip(
        jax.tree_util.tree_leaves(t.state.opt_state),
        jax.tree_util.tree_leaves(new_state.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    assert int(new_state.step) == int(t.state.step)

    # a real batch does advance
    batch["weight"] = jnp.ones((b,), jnp.float32)
    batch["label"] = (jnp.arange(b) % 2).astype(jnp.float32)
    new_state, _ = jax.jit(step)(t.state, batch)
    assert int(new_state.step) == int(t.state.step) + 1


def test_fused_joint_long_tail_matches_domain_count(tmp_path):
    """Long-tailed domains (different step counts) still train correctly
    through the padded fused pass."""
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp", "user_dim": 8, "item_dim": 8, "domain_dim": 8,
                       "hidden_dim": [16, 8], "dropout": 0.0},
            "train": {"epoch": 3, "learning_rate": 0.02, "patience": 3,
                       "metrics_jsonl": False},
            "dataset": {"name": "synthetic", "batch_size": 64, "seed": 4},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / "c")
    cfg.train.result_save_path = str(tmp_path / "r")
    # long_tail=True: domain sizes 1200 / 800 / 533...
    ds = make_synthetic_dataset(n_domain=3, n_uid=60, n_pid=60, n_per_domain=1200,
                                seed=4, batch_size=64, long_tail=True)
    t = Trainer(cfg, ds, verbose=False)
    assert t.fused_padding_ok()
    _, avg_auc, _, domain_auc = build_strategy(t).run()
    assert len(domain_auc) == 3
    assert avg_auc > 0.5


def test_star_mamdr_fused(tmp_path):
    """STAR (PartitionedNorm batch stats) through the fused MAMDR phases with
    the reference's STAR meta_parms filter."""
    t = make_trainer(
        tmp_path, name="star_meta_mamdr", n_domain=2,
        norm="pn", dense="star", auxiliary_dim=8,
    )
    t.config.train.meta_parms = ["emb", "kernel_shared", "bias_shared"]
    s = build_strategy(t)
    assert s.use_fused
    avg_loss, avg_auc, _, domain_auc = s.run()
    assert np.isfinite(avg_loss) and len(domain_auc) == 2
    # PN moving stats were updated during fused training
    mm = np.asarray(t.state.batch_stats["partitioned_norm"]["moving_mean"])
    assert np.abs(mm).sum() > 0


def test_star_auxiliary_net_forward():
    from mamdr_tpu.models.zoo import build_model

    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "star", "norm": "pn", "dense": "star",
                       "auxiliary_net": True, "auxiliary_dim": 8,
                       "user_dim": 8, "item_dim": 8, "domain_dim": 8,
                       "hidden_dim": [16, 8], "dropout": 0.0},
            "train": {},
            "dataset": {},
        }
    )
    model = build_model(cfg, n_uid=20, n_pid=20, n_domain=2)
    rng = jax.random.PRNGKey(0)
    uid = jnp.arange(8, dtype=jnp.int32)
    variables = model.init({"params": rng}, uid, uid, jnp.zeros((8,), jnp.int32), train=False)
    out = model.apply(variables, uid, uid, jnp.zeros((8,), jnp.int32), train=False)
    assert out.shape == (8,) and np.isfinite(np.asarray(out)).all()


def test_fused_step_counts_match_reference(tmp_path):
    """Long-tailed fused training must take exactly ceil(n_d/B) optimizer
    steps per domain per epoch — padded steps are no-ops because the in-jit
    shuffle keeps the pad tail last."""
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp", "user_dim": 8, "item_dim": 8, "domain_dim": 8,
                       "hidden_dim": [16, 8], "dropout": 0.0},
            "train": {"epoch": 1, "learning_rate": 0.01, "metrics_jsonl": False},
            "dataset": {"name": "synthetic", "batch_size": 64, "seed": 6},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / "c")
    cfg.train.result_save_path = str(tmp_path / "r")
    ds = make_synthetic_dataset(n_domain=3, n_uid=50, n_pid=50, n_per_domain=2000,
                                seed=6, batch_size=64, long_tail=True)
    t = Trainer(cfg, ds, verbose=False)
    from mamdr_tpu.train import fused

    block, n_steps = t.train_block()
    seq_pass = fused.make_fused_passes(t.train_step_fn(), n_steps, 64)
    expected = sum(-(-s.n // 64) for s in ds.train)
    step0 = int(t.state.step)
    t.state, _ = seq_pass(
        t.state, block, np.asarray([0, 1, 2], np.int32), jax.random.PRNGKey(0)
    )
    assert int(t.state.step) - step0 == expected, (
        f"took {int(t.state.step) - step0} steps, reference takes {expected}"
    )


def test_subset_train_step_matches_full(tmp_path):
    """make_subset_train_step (frozen tables as shared closure constants,
    scalar placeholders in the carried state) must produce the same params
    and loss as the full train step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mamdr_tpu.config import ExperimentConfig
    from mamdr_tpu.data.synthetic import make_synthetic_dataset
    from mamdr_tpu.train.steps import make_subset_train_step, make_train_step
    from mamdr_tpu.train.trainer import Trainer
    from mamdr_tpu.utils import trees

    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp", "user_dim": 8, "item_dim": 8,
                       "domain_dim": 8, "hidden_dim": [16, 8], "dropout": 0.0},
            "train": {"emb_trainable": False, "metrics_jsonl": False},
            "dataset": {"name": "synthetic", "batch_size": 64, "seed": 5},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / "c")
    cfg.train.result_save_path = str(tmp_path / "r")
    ds = make_synthetic_dataset(n_domain=2, n_uid=30, n_pid=30,
                                n_per_domain=300, seed=5, batch_size=64)
    # pretend-pretrained frozen tables
    rng = np.random.default_rng(0)
    ds.user_emb = rng.normal(0, 0.1, (30, 8)).astype(np.float32)
    ds.item_emb = rng.normal(0, 0.1, (30, 8)).astype(np.float32)
    t = Trainer(cfg, ds, verbose=False)

    frozen_mask = trees.named_tree_map(
        lambda n, x: "user_emb" in n or "item_emb" in n, t.state.params
    )
    full_step, _ = make_train_step(t.model, t.tx, t.step_cfg)
    sub_step, to_sub, combine = make_subset_train_step(
        t.model, t.tx, t.step_cfg, frozen_mask, t.state.params
    )

    batch = {k: jnp.asarray(v[0]) for k, v in
             __import__("mamdr_tpu.train.fused", fromlist=["x"]).stack_domains_on_device(
                 ds.train, 64)[0].items()}
    batch = {k: v[:64] for k, v in batch.items()}

    s_full, loss_full = jax.jit(full_step)(t.state, batch)
    sub_state = t.state.replace(params=to_sub(t.state.params))
    s_sub, loss_sub = jax.jit(sub_step)(sub_state, batch)

    np.testing.assert_allclose(float(loss_full), float(loss_sub), rtol=1e-6)
    recombined = combine(s_sub.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_full.params),
        jax.tree_util.tree_leaves(recombined),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-8)


def test_packed_formation_bit_identical():
    """_form_batches (one packed [N,C] gather) must produce bit-identical
    batches to the naive one-take-per-column formation it replaced — same
    argsort permutation, float columns round-tripped through int32 bitcast.
    Covers shuffle on/off and cap_steps truncation."""
    from mamdr_tpu.train.fused import _form_batches

    rng = np.random.default_rng(7)
    n_steps, batch = 6, 32
    n_pad = n_steps * batch
    flat = {
        "uid": jnp.asarray(rng.integers(0, 1000, (n_pad,)), jnp.int32),
        "pid": jnp.asarray(rng.integers(0, 500, (n_pad,)), jnp.int32),
        "domain": jnp.full((n_pad,), 3, jnp.int32),
        # arbitrary (non-binary) floats: bitcast must be exact regardless
        "label": jnp.asarray(rng.normal(size=(n_pad,)), jnp.float32),
        "weight": jnp.asarray(
            (np.arange(n_pad) < 150).astype(np.float32) * 1.37
        ),
    }

    def naive(flat, key, cap_steps, shuffle):
        if shuffle:
            sort_key = jax.random.uniform(key, (n_pad,)) + jnp.where(
                flat["weight"] > 0.0, 0.0, 2.0
            )
            perm = jnp.argsort(sort_key)
        else:
            perm = jnp.arange(n_pad)
        steps = n_steps if cap_steps <= 0 else min(cap_steps, n_steps)
        idx = perm[: steps * batch].reshape(steps, batch)
        return {k: jnp.take(v, idx, axis=0) for k, v in flat.items()}

    for shuffle in (True, False):
        for cap in (0, 2):
            key = jax.random.PRNGKey(42)
            got = _form_batches(flat, key, n_steps, batch, cap, shuffle)
            want = naive(flat, key, cap, shuffle)
            assert sorted(got) == sorted(want)
            for k in want:
                assert got[k].dtype == want[k].dtype, k
                np.testing.assert_array_equal(
                    np.asarray(got[k]), np.asarray(want[k]), err_msg=k
                )


def test_dr_parallel_eligibility_gate(tmp_path):
    """Parallel-lanes DR (fused.make_fused_dr_parallel) is gated to configs
    whose meta mask covers every trainable leaf: STAR's meta_parms subset
    (non-meta specific kernels need the chained lineage) must fall back to
    the sequential dr_phase; plain MLP MAMDR is eligible; dr_parallel="off"
    forces sequential."""
    t = make_trainer(tmp_path, name="mlp_meta_mamdr", n_domain=2)
    s = build_strategy(t)
    assert s._dr_parallel_eligible()

    t2 = make_trainer(
        tmp_path, name="star_meta_mamdr", n_domain=2,
        norm="pn", dense="star", auxiliary_dim=8,
    )
    t2.config.train.meta_parms = ["emb", "kernel_shared", "bias_shared"]
    s2 = build_strategy(t2)
    assert not s2._dr_parallel_eligible()

    t3 = make_trainer(tmp_path, name="mlp_meta_mamdr", n_domain=2)
    t3.config.train.dr_parallel = "off"
    s3 = build_strategy(t3)
    assert not s3._dr_parallel_eligible()


def test_auto_lane_chunk_for_wide_trainable_fans(tmp_path):
    """Wide TRAINABLE-table lane fans auto-chunk to 7 lanes per scanned
    group: 13 unchunked lanes at Amazon-13 shapes crash the TPU worker
    deterministically while 7-lane chunks run clean (bisect_a13.json —
    width-triggered). Narrow fans and explicit dr_lane_chunk are untouched."""
    t = make_trainer(tmp_path, name="mlp_meta_mamdr", n_domain=9)
    s = build_strategy(t)
    assert s._dr_parallel_eligible()
    s.prepare_fused()
    assert s._dr_lane_chunk_effective == 7  # auto (trainable tables, d>7)

    t2 = make_trainer(tmp_path, name="mlp_meta_mamdr", n_domain=4)
    s2 = build_strategy(t2)
    s2.prepare_fused()
    assert s2._dr_lane_chunk_effective == 0  # narrow fan: unchunked

    t3 = make_trainer(tmp_path, name="mlp_meta_mamdr", n_domain=9)
    t3.config.train.dr_lane_chunk = 3
    s3 = build_strategy(t3)
    s3.prepare_fused()
    assert s3._dr_lane_chunk_effective == 3  # explicit knob wins

    # frozen user/item tables (Taobao regime): wide fans stay unchunked —
    # the lane state excludes the big tables (subset step) and 30-lane
    # frozen campaigns ran clean
    t4 = make_trainer(tmp_path, name="mlp_meta_mamdr", n_domain=9)
    t4.config.train.emb_trainable = False
    s4 = build_strategy(t4)
    s4.prepare_fused()
    assert s4._dr_lane_chunk_effective == 0


def test_many_domains_fused_dn(tmp_path):
    """The production scaling axis is domain COUNT (paper: thousands of
    domains, avg AUC over 69,102 production domains — SURVEY §5.7). The
    ragged flattened DN pass must stay one compact scan as D grows: 300
    long-tailed domains train+eval end-to-end in seconds, with the graph
    size independent of D (per-step domain ids are data, not program)."""
    from mamdr_tpu.config import ExperimentConfig
    from mamdr_tpu.strategies import build_strategy

    D = 300
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp_meta_domain_negotiation", "user_dim": 8,
                       "item_dim": 8, "domain_dim": 8, "hidden_dim": [16, 8],
                       "dropout": 0.0},
            "train": {"epoch": 1, "learning_rate": 0.01,
                       "meta_learning_rate": 0.1, "patience": 1,
                       "metrics_jsonl": False},
            "dataset": {"name": "synthetic", "batch_size": 64, "seed": 5},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / "ckpt")
    cfg.train.result_save_path = str(tmp_path / "result")
    ds = make_synthetic_dataset(n_domain=D, n_uid=2000, n_pid=2000,
                                n_per_domain=256, seed=5, long_tail=True,
                                batch_size=64)
    t = Trainer(cfg, ds, verbose=False)
    s = build_strategy(t)
    avg_loss, avg_auc, _, domain_auc = s.run()
    assert np.isfinite(avg_loss) and len(domain_auc) == D
    assert all(0.0 <= a <= 1.0 for a in domain_auc.values())
