"""Per-domain separate training / the post-hoc finetune stage.

Reference: BaseModel.separate_train_val_test (base_model.py:41-109).
  - init_params=True ("separate" strategy): one fresh global init; every
    domain starts from the SAME initial weights; the model's own optimizer
    (Adam) is used and its slots are NOT reset between domains (only the
    global init reset them).
  - init_params=False ("finetune" stage): every domain starts from the best
    checkpointed weights and trains with plain SGD (Keras recompile with
    GradientDescentOptimizer — base_model.py:69; lr hardcoded 0.001 in the
    SpecificBase variant, specific_base_model.py:120).
Per domain: train full epochs with per-domain early stopping on val AUC
(patience, min_delta=1e-4, mode max — base_model.py:79-82) keeping the best
weights, then evaluate that domain's test split with them.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax

from mamdr_tpu.train.trainer import Trainer


def separate_train_val_test(
    trainer: Trainer,
    init_params: bool = True,
    params_fn: Optional[Callable[[int], Tuple]] = None,
    max_finetune_epochs: Optional[int] = None,
):
    """Returns (avg_loss, avg_auc, domain_loss, domain_auc) over test splits.

    ``params_fn(idx) -> (params, batch_stats)`` overrides the starting weights
    per domain (used by SpecificBase/MAMDR finetune with merged weights,
    specific_base_model.py:99-162).

    Execution: when padding allows, all domains train SIMULTANEOUSLY as a
    vmapped batch of independent models (one dispatch per epoch — see
    fused.make_fused_separate, incl. the optimizer-slot compat note);
    otherwise the sequential per-domain loop below.
    """
    t = trainer
    if not getattr(t.config.train, "separate_fused", True):
        return _separate_loop(t, init_params, params_fn, max_finetune_epochs)
    if t.fused_padding_ok():
        return _separate_fused(t, init_params, params_fn, max_finetune_epochs)
    if t.fused_padding_ok(ragged=True):
        # Long-tailed: a single vmap pads every lane to the global max step
        # count (lanes run in lockstep, so unlike the ragged sequential
        # passes the waste is real compute). Partition domains into
        # step-count buckets and run the fused path once per bucket —
        # domains are independent, so results are identical, and dispatches
        # stay O(buckets x epochs) instead of the loop path's O(D x epochs).
        return _separate_bucketed(t, init_params, params_fn, max_finetune_epochs)
    return _separate_loop(t, init_params, params_fn, max_finetune_epochs)


def step_buckets(steps, max_ratio: float = 2.0):
    """Greedy partition of domain indices by step count: descending sort,
    open a new bucket when the bucket head exceeds max_ratio x this domain's
    steps. Bounds per-lane padding waste by max_ratio while keeping the
    bucket count (extra compiles + dispatches) small."""
    order = sorted(range(len(steps)), key=lambda i: -steps[i])
    buckets = []
    for i in order:
        if buckets and steps[buckets[-1][0]] <= max_ratio * steps[i]:
            buckets[-1].append(i)
        else:
            buckets.append([i])
    return buckets


def _separate_bucketed(
    trainer: Trainer,
    init_params: bool,
    params_fn,
    max_finetune_epochs,
):
    steps = trainer.steps_per_domain()
    domain_loss: Dict[str, float] = {}
    domain_auc: Dict[str, float] = {}
    for bucket in step_buckets(steps):
        _, _, dl, da = _separate_fused(
            trainer, init_params, params_fn, max_finetune_epochs,
            domains=bucket,
        )
        domain_loss.update(dl)
        domain_auc.update(da)
    return trainer.summarize("test", domain_loss, domain_auc)


def _separate_fused(
    trainer: Trainer,
    init_params: bool,
    params_fn,
    max_finetune_epochs,
    domains=None,
):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mamdr_tpu.train import fused
    from mamdr_tpu.train.steps import make_subset_train_step
    from mamdr_tpu.utils import trees

    t = trainer
    tc = t.config.train
    d = t.dataset.n_domain if domains is None else len(domains)
    tx = t.finetune_tx if not init_params else t.tx
    # Frozen pretrained tables are shared across the vmapped domain batch —
    # the carried/stacked state holds scalar placeholders for them (stacking
    # D copies of ~125MB tables exhausts HBM at reference Taobao scale).
    frozen_mask = trees.named_tree_map(
        lambda n, x: (not tc.emb_trainable)
        and ("user_emb" in n or "item_emb" in n),
        t.state.params,
    )
    train_step, to_sub, combine = make_subset_train_step(
        t.model, tx, t.step_cfg, frozen_mask, t.state.params
    )

    def loss_fn_sub(p, stats, batch, rng, train):
        return t.loss_fn(combine(p), stats, batch, rng, train)

    block, n_steps = t.train_block()
    if domains is not None:
        # bucket subset: keep only these domains' lanes, truncated to the
        # bucket's own max step count (real rows sit first in each lane)
        steps_all = t.steps_per_domain()
        n_steps = max(steps_all[i] for i in domains)
        idx = np.asarray(domains, np.int32)
        block = {
            k: v[idx, : n_steps * t.dataset.batch_size]
            for k, v in block.items()
        }
    epoch_all, eval_all, select_best = fused.make_fused_separate(
        train_step, loss_fn_sub, n_steps, t.dataset.batch_size
    )

    global_ids = list(range(d)) if domains is None else list(domains)
    # Per-domain starting params (same start, or params_fn merges).
    if params_fn is None:
        base_params = [to_sub(t.state.params)] * d
        base_stats = [t.state.batch_stats] * d
    else:
        pairs = [params_fn(i) for i in global_ids]
        base_params = [to_sub(p) for p, _ in pairs]
        base_stats = [s for _, s in pairs]
    params_stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *base_params
    )
    stats_stacked = (
        jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *base_stats)
        if t.state.batch_stats
        else {}
    )
    t.rng, sub = jax.random.split(t.rng)
    states = t.state.replace(
        params=params_stacked,
        batch_stats=stats_stacked,
        opt_state=jax.jit(jax.vmap(tx.init))(params_stacked),
        rng=jax.random.split(sub, d),
        step=jnp.zeros((d,), jnp.int32),
    )

    val_block = t.eval_block("val")
    test_block = t.eval_block("test")
    if domains is not None:
        sel = jnp.asarray(domains, jnp.int32)
        val_block = {k: v[sel] for k, v in val_block.items()}
        test_block = {k: v[sel] for k, v in test_block.items()}
    best_params = states.params
    best_stats = states.batch_stats
    best_auc = np.full(d, -np.inf)
    counter = np.zeros(d, np.int32)
    epochs_cap = max_finetune_epochs or tc.epoch
    min_delta = tc.min_delta

    for _epoch in range(epochs_cap):
        t.rng, sub = jax.random.split(t.rng)
        states, _losses = epoch_all(states, block, sub)
        _, aucs = eval_all(states.params, states.batch_stats, val_block)
        aucs = np.asarray(aucs)
        # A domain that has exhausted its patience is FROZEN (the reference's
        # per-domain Keras EarlyStopping ends that domain's fit permanently,
        # base_model.py:79-82); without this gate a stopped domain would keep
        # training under the vmap and could overwrite its best params later.
        improved = (aucs > best_auc + min_delta) & (counter < tc.patience)
        if improved.any():
            imp = jnp.asarray(improved)
            best_params = select_best(best_params, states.params, imp)
            if t.state.batch_stats:
                best_stats = select_best(best_stats, states.batch_stats, imp)
        best_auc = np.where(improved, aucs, best_auc)
        counter = np.where(improved, 0, counter + 1)
        if (counter >= tc.patience).all():
            break

    losses, aucs = eval_all(best_params, best_stats, test_block)
    losses, aucs = np.asarray(losses), np.asarray(aucs)
    domain_loss = {str(g): float(losses[i]) for i, g in enumerate(global_ids)}
    domain_auc = {str(g): float(aucs[i]) for i, g in enumerate(global_ids)}
    if tc.domain_checkpoints:
        # artifacts hold the per-domain TRAINABLE leaves (frozen pretrained
        # tables are immutable and live in model_parameters.npz)
        _save_domain_checkpoints(
            t,
            lambda i: jax.tree_util.tree_map(lambda x: x[i], best_params),
            global_ids,
        )
    if domains is not None:
        return 0.0, 0.0, domain_loss, domain_auc
    return t.summarize("test", domain_loss, domain_auc)


def _save_domain_checkpoints(trainer, params_for, global_ids=None):
    """Per-domain best-weights artifacts, the reference ModelCheckpoint
    layout (base_model.py:77-90: checkpoint_dir/domain_{idx}.h5 -> .npz).
    params_for takes the LOCAL (stacked-lane) index; global_ids maps it to
    the domain id in the filename."""
    import os.path as osp

    from mamdr_tpu.train import checkpoints

    ids = global_ids or list(range(trainer.dataset.n_domain))
    for i, g in enumerate(ids):
        checkpoints.save_pytree(
            osp.join(trainer.checkpoint_dir, f"domain_{g}.npz"), params_for(i)
        )


def _separate_loop(
    trainer: Trainer,
    init_params: bool = True,
    params_fn: Optional[Callable[[int], Tuple]] = None,
    max_finetune_epochs: Optional[int] = None,
):
    t = trainer
    tc = t.config.train
    start_params = t.state.params
    start_stats = t.state.batch_stats
    min_delta = tc.min_delta

    domain_loss: Dict[str, float] = {}
    domain_auc: Dict[str, float] = {}
    epochs_cap = max_finetune_epochs or tc.epoch

    for idx in range(t.dataset.n_domain):
        if params_fn is not None:
            params, stats = params_fn(idx)
        else:
            params, stats = start_params, start_stats
        # Fresh optimizer slots per domain only for the SGD finetune path
        # (Keras recompile); the separate path keeps slots across domains.
        if init_params:
            state = t.state.replace(params=params, batch_stats=stats)
        else:
            state = t.state.replace(
                params=params,
                batch_stats=stats,
                opt_state=t.finetune_fns.init_opt(params),
            )
        if t.verbose:
            print(f"Train on domain: {idx}")

        best_auc = None
        best_params = state.params
        best_stats = state.batch_stats
        counter = 0
        for _epoch in range(epochs_cap):
            state, _ = t.fit_domain(state, idx, finetune=not init_params)
            _, val_auc = t.evaluate_domain(
                "val", idx, state.params, state.batch_stats
            )
            if best_auc is None or val_auc > best_auc + min_delta:
                best_auc = val_auc
                best_params = state.params
                best_stats = state.batch_stats
                counter = 0
            else:
                counter += 1
                if counter >= tc.patience:
                    break

        l, a = t.evaluate_domain("test", idx, best_params, best_stats)
        domain_loss[str(idx)] = l
        domain_auc[str(idx)] = a
        if tc.domain_checkpoints:
            from mamdr_tpu.train import checkpoints
            import os.path as osp

            checkpoints.save_pytree(
                osp.join(t.checkpoint_dir, f"domain_{idx}.npz"), best_params
            )

    avg_loss = sum(domain_loss.values()) / len(domain_loss)
    avg_auc = sum(domain_auc.values()) / len(domain_auc)
    if t.verbose:
        print("Loss: ", domain_loss)
        print("AUC: ")
        for k, v in domain_auc.items():
            print(f"{k}: {v}")
        w = t.weighted_auc("test", domain_auc)
        print(f"Overall test Loss: {avg_loss}, AUC: {avg_auc}, Weighted AUC: {w}")
    return avg_loss, avg_auc, domain_loss, domain_auc
