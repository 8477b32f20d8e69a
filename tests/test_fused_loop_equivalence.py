"""Equivalence of the fused and loop execution paths, per strategy.

With shuffling disabled (natural batch order, pad tail last) and dropout off,
each fused whole-epoch dispatch must produce the same parameters as the
per-domain loop path — same batch composition, same optimizer trajectory,
same weight-space algebra. The loop path is the reference-semantics oracle
(it mirrors model_zoo/{maml,mldg,pcgrad,reptile,mamdr,domain_negotiation}.py
step for step), so these tests pin the fused rewrites to it.

The synthetic dataset is LONG-TAILED (domain sizes 360/240/160 train rows at
batch 64 -> 6/4/3 steps), so the fused block pads short domains with
weight-0 rows: the tests therefore also pin the padding semantics — pad rows
sort last, all-pad batches are no-ops for both Adam steps and meta-grad
accumulation.

Tolerances are rtol=2e-5: runs are float32 and XLA fuses the fused path's
scans differently from the loop path's per-domain jits, so the last couple of
mantissa bits legitimately differ; anything beyond that is a semantics bug.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.dataset import stack_batches
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.strategies.domain_negotiation import DomainNegotiationStrategy
from mamdr_tpu.strategies.maml import MAMLStrategy
from mamdr_tpu.strategies.mamdr import MAMDRStrategy
from mamdr_tpu.strategies.mldg import MLDGStrategy
from mamdr_tpu.strategies.pcgrad import PCGradStrategy
from mamdr_tpu.strategies.reptile import ReptileStrategy
from mamdr_tpu.train import fused
from mamdr_tpu.train.trainer import Trainer
from mamdr_tpu.utils import trees

BATCH = 64
ORDER = [0, 1, 2]


def make_trainer(tmp_path, tag, model_name, extra_train=None):
    train = {
        "epoch": 1, "learning_rate": 0.01, "meta_learning_rate": 0.1,
        "patience": 5, "shuffle_sequence": False, "metrics_jsonl": False,
    }
    train.update(extra_train or {})
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": model_name, "user_dim": 8, "item_dim": 8,
                       "domain_dim": 8, "hidden_dim": [16, 8], "dropout": 0.0},
            "train": train,
            "dataset": {"name": "synthetic", "batch_size": BATCH, "seed": 21},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / f"c{tag}")
    cfg.train.result_save_path = str(tmp_path / f"r{tag}")
    # long-tailed: train rows 360/240/160 -> 6/4/3 steps of 64
    ds = make_synthetic_dataset(n_domain=3, n_uid=40, n_pid=40, n_per_domain=600,
                                seed=21, batch_size=BATCH)
    ds.fixed_train = True  # loop path: natural order, no reshuffle
    return Trainer(cfg, ds, verbose=False), ds


def assert_trees_close(a, b, rtol=2e-5, atol=2e-6):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def natural_stack(trainer, split, cap=0):
    stacked = stack_batches(split, BATCH, shuffle=False)
    if cap and cap > 0:
        stacked = {k: v[:cap] for k, v in stacked.items()}
    return jax.device_put(stacked)


def grad_accumulate(trainer, params, stats, split, acc, cap=0):
    """Loop-path grad accumulation, natural order (oracle for
    _grad_epoch_on_flat with shuffle off)."""
    acc, _ = trainer.fns.grad_epoch(
        params, stats, natural_stack(trainer, split, cap),
        jax.random.PRNGKey(0), acc,
    )
    return acc


def test_fused_dn_equals_loop_dn(tmp_path):
    t1, ds = make_trainer(tmp_path, 1, "mlp_meta_domain_negotiation")
    s1 = DomainNegotiationStrategy(t1)
    meta1 = t1.state.params
    t1.state = t1.state.replace(params=s1.load_meta(t1.state.params, meta1))
    for idx in ORDER:
        t1.state, _ = t1.fit_domain(t1.state, idx)
    meta1 = s1.reptile_step(meta1, t1.state.params, 0.1)

    t2, _ = make_trainer(tmp_path, 2, "mlp_meta_domain_negotiation")
    s2 = DomainNegotiationStrategy(t2)
    block, n_steps = fused.stack_domains_on_device(ds.train, BATCH)
    dn_epoch = fused.make_fused_dn(
        t2.train_step_fn(), s2.mask, n_steps, BATCH, shuffle=False
    )
    meta2 = t2.state.params
    t2.state, meta2, _ = dn_epoch(
        t2.state, meta2, block, np.asarray(ORDER, np.int32),
        jax.random.PRNGKey(0), 0.1,
    )
    assert_trees_close(meta1, meta2)


def test_fused_reptile_equals_loop(tmp_path):
    # loop oracle (reptile.py:44-90): per domain load meta, inner epoch,
    # meta += (adapted - meta) * meta_lr
    t1, ds = make_trainer(tmp_path, 1, "mlp_meta_reptile")
    s1 = ReptileStrategy(t1)
    meta1 = t1.state.params
    for idx in ORDER:
        t1.state = t1.state.replace(params=s1.load_meta(t1.state.params, meta1))
        t1.state, _ = t1.fit_domain(t1.state, idx)
        meta1 = s1.reptile_step(meta1, t1.state.params, 0.1)

    t2, _ = make_trainer(tmp_path, 2, "mlp_meta_reptile")
    s2 = ReptileStrategy(t2)
    block, n_steps = fused.stack_domains_on_device(ds.train, BATCH)
    reptile_epoch = fused.make_fused_reptile(
        t2.train_step_fn(), s2.mask, n_steps, BATCH, batch_mode=False,
        shuffle=False,
    )
    meta2 = t2.state.params
    t2.state, meta2, _ = reptile_epoch(
        t2.state, meta2, block, np.asarray(ORDER, np.int32),
        jax.random.PRNGKey(0), 0.1,
    )
    assert_trees_close(meta1, meta2)


def test_fused_maml_equals_loop(tmp_path):
    # loop oracle (maml.py:60-121, train-train split): per domain — load
    # meta, inner-Adam epoch on the train set, accumulate query grads at the
    # adapted weights over the same set, meta-Adam apply, clear.
    extra = {"meta_split": "train-train", "meta_learning_rate": 1e-3}
    t1, ds = make_trainer(tmp_path, 1, "mlp_meta_maml", extra)
    s1 = MAMLStrategy(t1)
    meta1 = t1.state.params
    for idx in ORDER:
        t1.state = t1.state.replace(params=s1.load_meta(t1.state.params, meta1))
        t1.state, _ = t1.fit_domain(t1.state, idx)
        acc = grad_accumulate(
            t1, t1.state.params, t1.state.batch_stats, ds.train[idx],
            trees.tree_zeros_like(meta1),
        )
        meta1 = s1.meta_apply(meta1, acc)

    t2, _ = make_trainer(tmp_path, 2, "mlp_meta_maml", extra)
    s2 = MAMLStrategy(t2)
    block, n_steps = fused.stack_domains_on_device(ds.train, BATCH)
    epoch_fn = fused.make_fused_maml(
        t2.train_step_fn(), t2.accum_grad_fn, s2.mask, s2.meta_tx,
        n_steps, n_steps, BATCH, batch_mode=False, shuffle=False,
    )
    meta2 = t2.state.params
    t2.state, meta2, s2.meta_opt_state = epoch_fn(
        t2.state, meta2, s2.meta_opt_state, block, block,
        np.asarray(ORDER, np.int32), jax.random.PRNGKey(0), 1.0,
    )
    assert_trees_close(meta1, meta2)


def test_fused_mldg_equals_loop(tmp_path):
    # loop oracle (mldg.py:92-119, train-train): per domain — accumulate
    # support grads at meta, mid-stream meta-Adam apply (accumulator kept,
    # moments advance), accumulate query grads at the adapted weights,
    # restore meta and apply + clear.
    extra = {"meta_split": "train-train", "meta_learning_rate": 1e-4}
    t1, ds = make_trainer(tmp_path, 1, "mlp_meta_mldg", extra)
    s1 = MLDGStrategy(t1)
    meta1 = t1.state.params
    acc = trees.tree_zeros_like(meta1)
    for idx in ORDER:
        t1.state = t1.state.replace(params=s1.load_meta(t1.state.params, meta1))
        acc = grad_accumulate(
            t1, t1.state.params, t1.state.batch_stats, ds.train[idx], acc
        )
        adapted, s1.meta_opt_state = s1._meta_apply(
            t1.state.params, s1.meta_opt_state, acc, 1.0
        )
        t1.state = t1.state.replace(params=adapted)
        acc = grad_accumulate(
            t1, t1.state.params, t1.state.batch_stats, ds.train[idx], acc
        )
        meta1 = s1.meta_apply(meta1, acc)
        acc = trees.tree_zeros_like(meta1)

    t2, _ = make_trainer(tmp_path, 2, "mlp_meta_mldg", extra)
    s2 = MLDGStrategy(t2)
    block, n_steps = fused.stack_domains_on_device(ds.train, BATCH)
    epoch_fn = fused.make_fused_maml(
        t2.train_step_fn(), t2.accum_grad_fn, s2.mask, s2.meta_tx,
        n_steps, n_steps, BATCH, batch_mode=False, mldg=True, shuffle=False,
    )
    meta2 = t2.state.params
    t2.state, meta2, s2.meta_opt_state = epoch_fn(
        t2.state, meta2, s2.meta_opt_state, block, block,
        np.asarray(ORDER, np.int32), jax.random.PRNGKey(0), 1.0,
    )
    assert_trees_close(meta1, meta2)


@pytest.mark.parametrize("mode", ["reference", "paper"])
def test_fused_pcgrad_equals_loop(tmp_path, mode):
    # loop oracle (pcgrad.py:60-127): per query domain — accumulate query
    # grads at current weights, project each sampled aux domain's full-epoch
    # grads (vs the running sum in "reference" mode, vs the original query
    # grads in "paper" mode), apply the sum with the meta-Adam. Weights
    # advance between query domains.
    AUX = np.asarray([[1, 2], [2, 0], [0, 1]], np.int32)
    extra = {"meta_learning_rate": 1e-3, "pcgrad_mode": mode, "sample_num": 2}
    t1, ds = make_trainer(tmp_path, 1, "mlp_pcgrad", extra)
    s1 = PCGradStrategy(t1)
    for qi, q in enumerate(ORDER):
        qg = grad_accumulate(
            t1, t1.state.params, t1.state.batch_stats, ds.train[q],
            trees.tree_zeros_like(t1.state.params),
        )
        running = qg
        for a in AUX[qi]:
            ag = grad_accumulate(
                t1, t1.state.params, t1.state.batch_stats, ds.train[int(a)],
                trees.tree_zeros_like(t1.state.params),
            )
            base = running if mode == "reference" else qg
            running = s1._add(running, s1._project(base, ag))
        t1.state = t1.state.replace(params=s1.meta_apply(t1.state.params, running))

    t2, _ = make_trainer(tmp_path, 2, "mlp_pcgrad", extra)
    s2 = PCGradStrategy(t2)
    block, n_steps = fused.stack_domains_on_device(ds.train, BATCH)
    epoch_fn = fused.make_fused_pcgrad(
        t2.accum_grad_fn, s2.mask, s2.meta_tx, n_steps, BATCH, mode=mode,
        shuffle=False,
    )
    t2.state, s2.meta_opt_state = epoch_fn(
        t2.state, s2.meta_opt_state, block, np.asarray(ORDER, np.int32),
        AUX, jax.random.PRNGKey(0), 1.0,
    )
    assert_trees_close(t1.state.params, t2.state.params)


def test_fused_mamdr_dr_equals_loop(tmp_path):
    # loop oracle (mamdr.py:60-105 phase 2): per query domain q with fixed
    # aux rows — merged = merge(shared, specific[q]); per support s: load
    # merged, full epoch on s, full epoch on q (reg step 0), specific[q] +=
    # (θ - merged)*meta_lr, re-merge.
    AUX = np.asarray([[1, 2, 0], [2, 0, 1], [0, 1, 2]], np.int32)
    extra = {"specific_init": "zeros", "sample_num": 2, "add_query_domain": True}
    t1, ds = make_trainer(tmp_path, 1, "mlp_meta_mamdr", extra)
    s1 = MAMDRStrategy(t1)
    shared1 = t1.state.params
    for qi, q in enumerate(ORDER):
        merged = s1.merge(shared1, s1.specific[q])
        for a in AUX[qi]:
            t1.state = t1.state.replace(
                params=s1.load_meta(t1.state.params, merged)
            )
            t1.state, _ = t1.fit_domain(t1.state, int(a))
            t1.state, _ = t1.fit_domain(t1.state, q, max_steps=0)
            s1.specific[q] = s1.scaled_add_from(
                s1.specific[q], t1.state.params, merged, 0.1
            )
            merged = s1.merge(shared1, s1.specific[q])

    t2, _ = make_trainer(tmp_path, 2, "mlp_meta_mamdr", extra)
    s2 = MAMDRStrategy(t2)
    shared2 = t2.state.params
    block, n_steps = fused.stack_domains_on_device(ds.train, BATCH)
    _, dr_phase = fused.make_fused_mamdr(
        t2.train_step_fn(), s2.mask, "plus", n_steps, BATCH,
        domain_regulation_step=0, shuffle=False,
    )
    spec_stack = fused.stack_specific(s2.specific, s2.mask)
    t2.state, spec_stack = dr_phase(
        t2.state, shared2, spec_stack, block, np.asarray(ORDER, np.int32),
        AUX, jax.random.PRNGKey(0), 0.1,
    )
    spec2 = fused.unstack_specific(spec_stack, s2.mask, 3)
    for q in ORDER:
        assert_trees_close(s1.specific[q], spec2[q])
    assert_trees_close(t1.state.params, t2.state.params)

def test_fused_mamdr_dr_capped_equals_loop(tmp_path):
    """domain_regulation_step > 0 (reference mamdr.py:92-99 caps each
    support run's query-regularization pass) — the Amazon-13 recipe knob
    (benchmarks.py) — is bit-equivalent between the fused DR phase and the
    loop oracle."""
    CAP = 2
    AUX = np.asarray([[1, 2, 0], [2, 0, 1], [0, 1, 2]], np.int32)
    extra = {"specific_init": "zeros", "sample_num": 2,
             "add_query_domain": True, "domain_regulation_step": CAP}
    t1, ds = make_trainer(tmp_path, 1, "mlp_meta_mamdr", extra)
    s1 = MAMDRStrategy(t1)
    shared1 = t1.state.params
    for qi, q in enumerate(ORDER):
        merged = s1.merge(shared1, s1.specific[q])
        for a in AUX[qi]:
            t1.state = t1.state.replace(
                params=s1.load_meta(t1.state.params, merged)
            )
            t1.state, _ = t1.fit_domain(t1.state, int(a))
            t1.state, _ = t1.fit_domain(t1.state, q, max_steps=CAP)
            s1.specific[q] = s1.scaled_add_from(
                s1.specific[q], t1.state.params, merged, 0.1
            )
            merged = s1.merge(shared1, s1.specific[q])

    t2, _ = make_trainer(tmp_path, 2, "mlp_meta_mamdr", extra)
    s2 = MAMDRStrategy(t2)
    shared2 = t2.state.params
    block, n_steps = fused.stack_domains_on_device(ds.train, BATCH)
    _, dr_phase = fused.make_fused_mamdr(
        t2.train_step_fn(), s2.mask, "plus", n_steps, BATCH,
        domain_regulation_step=CAP, shuffle=False,
    )
    spec_stack = fused.stack_specific(s2.specific, s2.mask)
    t2.state, spec_stack = dr_phase(
        t2.state, shared2, spec_stack, block, np.asarray(ORDER, np.int32),
        AUX, jax.random.PRNGKey(0), 0.1,
    )
    spec2 = fused.unstack_specific(spec_stack, s2.mask, 3)
    for q in ORDER:
        assert_trees_close(s1.specific[q], spec2[q])
    assert_trees_close(t1.state.params, t2.state.params)


def test_ragged_dn_equals_loop_dn(tmp_path):
    # Same oracle as test_fused_dn_equals_loop_dn, but the fused pass is the
    # RAGGED flattened scan (steps_list given): one scan over sum(steps) real
    # steps instead of D x max(steps). Long-tail sizes make the step counts
    # genuinely ragged (6/4/3).
    t1, ds = make_trainer(tmp_path, 1, "mlp_meta_domain_negotiation")
    s1 = DomainNegotiationStrategy(t1)
    meta1 = t1.state.params
    t1.state = t1.state.replace(params=s1.load_meta(t1.state.params, meta1))
    for idx in ORDER:
        t1.state, _ = t1.fit_domain(t1.state, idx)
    meta1 = s1.reptile_step(meta1, t1.state.params, 0.1)

    t2, _ = make_trainer(tmp_path, 2, "mlp_meta_domain_negotiation")
    s2 = DomainNegotiationStrategy(t2)
    block, n_steps = fused.stack_domains_on_device(ds.train, BATCH)
    steps_list = fused.domain_step_counts(ds.train, BATCH)
    assert len(set(steps_list)) > 1  # genuinely ragged
    dn_epoch = fused.make_fused_dn(
        t2.train_step_fn(), s2.mask, n_steps, BATCH, shuffle=False,
        steps_list=steps_list,
    )
    meta2 = t2.state.params
    t2.state, meta2, _ = dn_epoch(
        t2.state, meta2, block, np.asarray(ORDER, np.int32),
        jax.random.PRNGKey(0), 0.1,
    )
    assert_trees_close(meta1, meta2)


def test_ragged_matches_padded_with_shuffle(tmp_path):
    # The bit-identity claim behind the ragged pass: with shuffle ON and the
    # SAME rng, the ragged scan visits the same batches in the same order as
    # the padded domain-scan (pad steps are no-ops that advance nothing), so
    # both paths produce the same parameters.
    t1, ds = make_trainer(tmp_path, 1, "mlp_meta_domain_negotiation")
    s1 = DomainNegotiationStrategy(t1)
    block, n_steps = fused.stack_domains_on_device(ds.train, BATCH)
    order = np.asarray([2, 0, 1], np.int32)
    key = jax.random.PRNGKey(7)

    dn_pad = fused.make_fused_dn(
        t1.train_step_fn(), s1.mask, n_steps, BATCH, shuffle=True
    )
    meta_p = t1.state.params
    state_p, meta_p, _ = dn_pad(t1.state, meta_p, block, order, key, 0.1)

    t2, _ = make_trainer(tmp_path, 2, "mlp_meta_domain_negotiation")
    s2 = DomainNegotiationStrategy(t2)
    dn_rag = fused.make_fused_dn(
        t2.train_step_fn(), s2.mask, n_steps, BATCH, shuffle=True,
        steps_list=fused.domain_step_counts(ds.train, BATCH),
    )
    meta_r = t2.state.params
    state_r, meta_r, _ = dn_rag(t2.state, meta_r, block, order, key, 0.1)

    assert_trees_close(meta_p, meta_r)
    assert_trees_close(state_p.params, state_r.params)
    assert int(state_p.step) == int(state_r.step)


def test_dynamic_dr_equals_loop(tmp_path):
    # The DR phase with steps_list: support/query epochs run as dynamically
    # bounded fori_loops (only the traced domain's real batches). Oracle =
    # the same loop path as test_fused_mamdr_dr_equals_loop.
    AUX = np.asarray([[1, 2, 0], [2, 0, 1], [0, 1, 2]], np.int32)
    extra = {"specific_init": "zeros", "sample_num": 2, "add_query_domain": True}
    t1, ds = make_trainer(tmp_path, 1, "mlp_meta_mamdr", extra)
    s1 = MAMDRStrategy(t1)
    shared1 = t1.state.params
    for qi, q in enumerate(ORDER):
        merged = s1.merge(shared1, s1.specific[q])
        for a in AUX[qi]:
            t1.state = t1.state.replace(
                params=s1.load_meta(t1.state.params, merged)
            )
            t1.state, _ = t1.fit_domain(t1.state, int(a))
            t1.state, _ = t1.fit_domain(t1.state, q, max_steps=0)
            s1.specific[q] = s1.scaled_add_from(
                s1.specific[q], t1.state.params, merged, 0.1
            )
            merged = s1.merge(shared1, s1.specific[q])

    t2, _ = make_trainer(tmp_path, 2, "mlp_meta_mamdr", extra)
    s2 = MAMDRStrategy(t2)
    shared2 = t2.state.params
    block, n_steps = fused.stack_domains_on_device(ds.train, BATCH)
    _, dr_phase = fused.make_fused_mamdr(
        t2.train_step_fn(), s2.mask, "plus", n_steps, BATCH,
        domain_regulation_step=0, shuffle=False,
        steps_list=fused.domain_step_counts(ds.train, BATCH),
    )
    spec_stack = fused.stack_specific(s2.specific, s2.mask)
    t2.state, spec_stack = dr_phase(
        t2.state, shared2, spec_stack, block, np.asarray(ORDER, np.int32),
        AUX, jax.random.PRNGKey(0), 0.1,
    )
    spec2 = fused.unstack_specific(spec_stack, s2.mask, 3)
    for q in ORDER:
        assert_trees_close(s1.specific[q], spec2[q])
    assert_trees_close(t1.state.params, t2.state.params)


@pytest.mark.parametrize("ragged", [False, True])
def test_parallel_dr_equals_sequential_dr(tmp_path, ragged):
    # The vmapped-lanes DR phase (fused.make_fused_dr_parallel) against the
    # sequential dr_phase. With a slotless optimizer (SGD) and dropout off,
    # the ONLY sequential-vs-parallel delta — optimizer-slot / step-counter
    # lineage chained across query domains — vanishes, so the two must agree
    # (up to batched-matmul reduction order). shuffle=True pins the per-lane
    # rng derivation too (split(rng, D)[l], then split(r, K)).
    AUX = np.asarray([[1, 2, 0], [2, 0, 1], [0, 1, 2]], np.int32)
    extra = {
        "specific_init": "zeros", "sample_num": 2, "add_query_domain": True,
        "optimizer": "sgd",
    }
    steps_list = None
    t1, ds = make_trainer(tmp_path, 1, "mlp_meta_mamdr", extra)
    if ragged:
        steps_list = fused.domain_step_counts(ds.train, BATCH)
    s1 = MAMDRStrategy(t1)
    shared = t1.state.params
    block, n_steps = fused.stack_domains_on_device(ds.train, BATCH)
    _, dr_seq = fused.make_fused_mamdr(
        t1.train_step_fn(), s1.mask, "plus", n_steps, BATCH,
        domain_regulation_step=0, shuffle=True, steps_list=steps_list,
    )
    spec_seq = fused.stack_specific(s1.specific, s1.mask)
    st1, spec_seq = dr_seq(
        t1.state, shared, spec_seq, block, np.asarray(ORDER, np.int32),
        AUX, jax.random.PRNGKey(7), 0.1,
    )

    t2, _ = make_trainer(tmp_path, 2, "mlp_meta_mamdr", extra)
    s2 = MAMDRStrategy(t2)
    from mamdr_tpu.train.steps import make_subset_train_step

    frozen_mask = trees.named_tree_map(lambda n, x: False, t2.state.params)
    sub_step, to_sub, combine = make_subset_train_step(
        t2.model, t2.tx, t2.step_cfg, frozen_mask, t2.state.params
    )
    dr_par = fused.make_fused_dr_parallel(
        sub_step, to_sub, combine, s2.mask, "plus", n_steps, BATCH,
        domain_regulation_step=0, shuffle=True, steps_list=steps_list,
    )
    spec_par = fused.stack_specific(s2.specific, s2.mask)
    st2, spec_par = dr_par(
        t2.state, shared, spec_par, block, np.asarray(ORDER, np.int32),
        AUX, jax.random.PRNGKey(7), 0.1,
    )

    for q in ORDER:
        a = fused.unstack_specific(spec_seq, s1.mask, 3)[q]
        b = fused.unstack_specific(spec_par, s2.mask, 3)[q]
        assert_trees_close(a, b)
    assert_trees_close(st1.params, st2.params)


@pytest.mark.parametrize("ragged", [False, True])
def test_chunked_lanes_equal_unchunked(tmp_path, ragged):
    # lane_chunk=C runs the lanes as a scan over ⌈d/C⌉ groups (the HBM/
    # graph-size control for Amazon-13-scale trainable-table lanes). Every
    # real lane's inputs — entry state, split(rng, d)[l], fold_in(rng, l) —
    # are derived for the TRUE d, so the chunked result must be bitwise the
    # unchunked one, Adam + dropout included; d=3 with C=2 exercises the
    # padded final chunk whose writeback scatters out-of-range (drop).
    AUX = np.asarray([[1, 2, 0], [2, 0, 1], [0, 1, 2]], np.int32)
    extra = {
        "specific_init": "zeros", "sample_num": 2, "add_query_domain": True,
        "dropout": 0.5,
    }
    t1, ds = make_trainer(tmp_path, 1, "mlp_meta_mamdr", extra)
    s1 = MAMDRStrategy(t1)
    shared = t1.state.params
    block, n_steps = fused.stack_domains_on_device(ds.train, BATCH)
    steps_list = fused.domain_step_counts(ds.train, BATCH) if ragged else None
    from mamdr_tpu.train.steps import make_subset_train_step

    frozen_mask = trees.named_tree_map(lambda n, x: False, t1.state.params)
    sub_step, to_sub, combine = make_subset_train_step(
        t1.model, t1.tx, t1.step_cfg, frozen_mask, t1.state.params
    )
    results = []
    for chunk in (0, 2):
        dr = fused.make_fused_dr_parallel(
            sub_step, to_sub, combine, s1.mask, "plus", n_steps, BATCH,
            domain_regulation_step=0, shuffle=True, lane_chunk=chunk,
            steps_list=steps_list,
        )
        spec = fused.stack_specific(s1.specific, s1.mask)
        st, spec = dr(
            t1.state, shared, spec, block, np.asarray(ORDER, np.int32),
            AUX, jax.random.PRNGKey(11), 0.1,
        )
        results.append((st, spec))
    (st_a, spec_a), (st_b, spec_b) = results
    for q in ORDER:
        a = fused.unstack_specific(spec_a, s1.mask, 3)[q]
        b = fused.unstack_specific(spec_b, s1.mask, 3)[q]
        assert_trees_close(a, b)
    assert_trees_close(st_a.params, st_b.params)
    assert_trees_close(st_a.opt_state, st_b.opt_state)
