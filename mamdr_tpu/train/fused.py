"""Fused execution: whole training phases as single jit calls.

On a tunneled/production TPU every dispatch costs tens of milliseconds while
a batch-1024 CTR step computes in ~1ms, so per-epoch host orchestration —
not FLOPs — bounds throughput. This module removes it:

  - all domain data lives ON DEVICE once, padded to a uniform
    [n_domain, n_steps*batch] block (weight-0 tail rows);
  - epoch shuffling happens inside jit (random-key argsort that keeps the
    pad tail last + gather);
  - a sequential multi-domain pass (the DN phase / joint loop) is ONE call:
    lax.scan over domains, inner lax.scan over steps;
  - the entire MAMDR DR phase (every query domain x sampled support runs,
    including all merge/outer-update weight algebra) is ONE call.

A full MAMDR epoch is then 2 dispatches instead of ~1000, with identical
update semantics to the reference schedule (model_zoo/mamdr.py:41-108).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mamdr_tpu.data.dataset import DomainSplit
from mamdr_tpu.strategies import ops
from mamdr_tpu.train.state import TrainState

Pytree = Any


def stack_domains_on_device(
    splits: List[DomainSplit], batch_size: int
) -> Tuple[Dict[str, jax.Array], int]:
    """Pack all domains into one device-resident block.

    Returns ({col: [D, N_pad]}, n_steps) with N_pad = max_steps*batch over
    domains; short domains wrap-around-pad with weight-0 rows.
    """
    d = len(splits)
    max_n = max(s.n for s in splits)
    n_steps = -(-max_n // batch_size)
    n_pad = n_steps * batch_size
    cols = {k: np.empty((d, n_pad), np.int32) for k in ("uid", "pid", "domain")}
    cols["label"] = np.empty((d, n_pad), np.float32)
    cols["weight"] = np.zeros((d, n_pad), np.float32)
    for i, s in enumerate(splits):
        idx = np.arange(n_pad) % s.n
        cols["uid"][i] = s.uid[idx]
        cols["pid"][i] = s.pid[idx]
        cols["domain"][i] = s.domain[idx]
        cols["label"][i] = s.label[idx]
        cols["weight"][i, : s.n] = 1.0
    return jax.device_put(cols), n_steps


def _form_batches(flat, rng, n_steps: int, batch: int,
                  cap_steps: int = 0, shuffle: bool = True):
    """Shuffled [steps, B] batches from a flat [N_pad] column block, formed
    by ONE gather.

    The shuffle permutes only the REAL rows and keeps the weight-0 pad tail
    LAST (sort by random-key + pad-penalty): the domain then trains exactly
    ceil(n_d/B) effective steps — one trailing partial batch, the rest of the
    pad forming all-zero-weight batches that train_step no-ops — matching the
    reference's per-domain step counts even when the block is padded to a
    much larger domain. (Scattering pad rows across batches instead would
    hand short domains extra full-magnitude Adam steps, since weighted_bce
    renormalises by the batch's real-row count.)

    Formation cost: one `jnp.take` per column was ~5x the cost of a single
    take (scripts/probe_epoch_cost.py — five takes were ~34us of a ~96us
    fused step at bench shapes; the argsort itself is free). All 32-bit
    columns are therefore packed into one [N_pad, C] int32 array (float
    columns bitcast, bit-exact round trip) and gathered ONCE, which lands
    within ~3us/step of the no-shuffle floor. The permutation is unchanged,
    so batch contents are bit-identical to the per-column path.
    """
    n_pad = n_steps * batch
    if shuffle:
        sort_key = jax.random.uniform(rng, (n_pad,)) + jnp.where(
            flat["weight"] > 0.0, 0.0, 2.0
        )
        perm = jnp.argsort(sort_key)
    else:
        # fixed_train / equivalence testing: natural order, pad tail last
        perm = jnp.arange(n_pad)
    steps = n_steps if cap_steps <= 0 else min(cap_steps, n_steps)
    idx = perm[: steps * batch].reshape(steps, batch)
    keys = sorted(flat)
    packable = [k for k in keys if flat[k].dtype.itemsize == 4]
    rest = [k for k in keys if k not in packable]
    batches = {}
    if packable:
        packed = jnp.stack(
            [
                flat[k]
                if flat[k].dtype == jnp.int32
                else jax.lax.bitcast_convert_type(flat[k], jnp.int32)
                for k in packable
            ],
            axis=1,
        )
        rows = jnp.take(packed, idx, axis=0)  # [steps, B, C]
        for j, k in enumerate(packable):
            r = rows[..., j]
            batches[k] = (
                r
                if flat[k].dtype == jnp.int32
                else jax.lax.bitcast_convert_type(r, flat[k].dtype)
            )
    for k in rest:  # non-32-bit columns (none today): per-column fallback
        batches[k] = jnp.take(flat[k], idx, axis=0)
    return batches


def _epoch_on_flat(train_step, state, flat, rng, n_steps: int, batch: int,
                   cap_steps: int = 0, shuffle: bool = True, real_steps=None):
    """One shuffled epoch over a flat [N_pad] block, inside jit.

    Batch formation (pad-tail-last shuffle semantics): see _form_batches.

    With `real_steps` (a traced per-domain step count), the step loop is a
    dynamically-bounded fori_loop that runs ONLY the real batches instead of
    scanning through the weight-0 pad tail. Bit-identical to the full scan —
    real rows sort first and train_step no-ops pad batches without advancing
    params/opt/step/rng — but skips the pad-step compute, which dominates on
    long-tailed blocks where this domain is far smaller than the block's
    global max (the scan length here must be static, so it pads to that max).
    """
    batches = _form_batches(flat, rng, n_steps, batch, cap_steps, shuffle)
    if real_steps is None:
        # keep the single-domain invariant for pad rows: domain col is constant
        state, losses = jax.lax.scan(train_step, state, batches)
        return state, jnp.mean(losses)
    steps = n_steps if cap_steps <= 0 else min(cap_steps, n_steps)
    bound = jnp.minimum(real_steps, steps)

    def body(i, carry):
        state, loss_sum = carry
        b = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False),
            batches,
        )
        state, loss = train_step(state, b)
        return state, loss_sum + loss

    state, loss_sum = jax.lax.fori_loop(0, bound, body, (state, jnp.zeros(())))
    return state, loss_sum / jnp.maximum(bound.astype(jnp.float32), 1.0)


def domain_step_counts(splits: List[DomainSplit], batch_size: int) -> List[int]:
    """Static per-domain real step counts ceil(n_d / B)."""
    return [-(-s.n // batch_size) for s in splits]


def _ragged_batches(block, order, rngs, steps_of, total_steps: int, batch: int,
                    shuffle: bool = True):
    """[T, B] batches covering every domain in `order` with ZERO pad steps.

    The padded sequential pass (scan domains x scan global-max steps) runs
    `D * max_d ceil(n_d/B)` steps; on long-tailed datasets most are weight-0
    no-ops (Amazon-13: ~3.7x waste). Because `train_step` advances neither
    params, optimizer slots, `step`, nor therefore its fold_in(rng, step)
    stream on an all-pad batch, DROPPING those steps is bit-identical — so
    this flattens the pass into ONE scan over exactly
    T = sum_d ceil(n_d/B) real steps.

    Per-step domain ids come from `jnp.repeat(order, steps_of[order],
    total_repeat_length=T)` (T is static: `order` is a permutation of all
    domains, so the sum is order-invariant). Each position i in `order`
    shuffles its domain's rows with rngs[i] — the SAME key the padded path's
    `split(rng, D)[i]` gives that position — with the identical pad-tail-last
    sort, so batch contents match the padded path bit-for-bit.

    Returns (batches, pos) where pos[t] is the position in `order` of step
    t's domain (for per-position loss segmentation).
    """
    d, n_pad = block["weight"].shape
    w = jnp.take(block["weight"], order, axis=0)
    if shuffle:
        def perm1(r, wrow):
            key = jax.random.uniform(r, (n_pad,)) + jnp.where(wrow > 0.0, 0.0, 2.0)
            return jnp.argsort(key)

        perms = jax.vmap(perm1)(rngs, w)  # [D, n_pad]
    else:
        perms = jnp.broadcast_to(jnp.arange(n_pad), (d, n_pad))
    seg = jnp.take(steps_of, order)                       # [D] steps at position i
    starts = jnp.cumsum(seg) - seg                        # [D]
    pos = jnp.repeat(jnp.arange(d), seg, total_repeat_length=total_steps)
    local = jnp.arange(total_steps) - jnp.take(starts, pos)  # step within domain
    rows = perms[pos[:, None], local[:, None] * batch + jnp.arange(batch)[None, :]]
    dom = jnp.take(order, pos)                            # [T]
    gidx = dom[:, None] * n_pad + rows                    # [T, B] into flattened cols
    keys = sorted(block)
    packable = [k for k in keys if block[k].dtype.itemsize == 4]
    rest = [k for k in keys if k not in packable]
    batches = {}
    if packable:
        packed = jnp.stack(
            [
                block[k].reshape(-1)
                if block[k].dtype == jnp.int32
                else jax.lax.bitcast_convert_type(block[k].reshape(-1), jnp.int32)
                for k in packable
            ],
            axis=1,
        )
        out = jnp.take(packed, gidx, axis=0)  # [T, B, C]
        for j, k in enumerate(packable):
            r = out[..., j]
            batches[k] = (
                r
                if block[k].dtype == jnp.int32
                else jax.lax.bitcast_convert_type(r, block[k].dtype)
            )
    for k in rest:
        batches[k] = jnp.take(block[k].reshape(-1), gidx, axis=0)
    return batches, pos


def _ragged_pass(train_step, state, block, order, rng, steps_of,
                 total_steps: int, batch: int, shuffle: bool = True):
    """Sequential multi-domain pass (one epoch per domain in `order`, chained
    without reset) as ONE scan over only the real steps. Bit-identical to the
    padded domain-scan pass (see _ragged_batches). Returns (state, [D] losses
    where losses[i] is the mean over the REAL steps of the domain at order
    position i — the loop path's convention)."""
    d = order.shape[0]
    rngs = jax.random.split(rng, d)
    batches, pos = _ragged_batches(
        block, order, rngs, steps_of, total_steps, batch, shuffle
    )
    state, losses = jax.lax.scan(train_step, state, batches)
    seg = jnp.take(steps_of, order).astype(jnp.float32)
    per_pos = jax.ops.segment_sum(losses, pos, num_segments=d) / jnp.maximum(seg, 1.0)
    return state, per_pos


def stack_domains_eval(
    splits: List[DomainSplit], batch_size: int
) -> Dict[str, jax.Array]:
    """Eval block [D, S, B], deterministic order, weight-0 padding."""
    cols, n_steps = stack_domains_on_device(splits, batch_size)
    return {
        k: v.reshape(v.shape[0], n_steps, batch_size) for k, v in cols.items()
    }


def _make_eval_step(loss_fn, num_thresholds: int):
    """Shared per-batch eval body: weighted loss (all-pad batches excluded
    from the average) + 500-threshold confusion-count accumulation. Single
    source of truth for every fused eval variant."""
    from mamdr_tpu.metrics.auc import auc_init, auc_update

    def init():
        return (auc_init(num_thresholds), jnp.zeros(()), jnp.zeros(()))

    def step(carry, batch, params, batch_stats):
        auc_state, loss_sum, n = carry
        loss, (_, probs, _) = loss_fn(
            params, batch_stats, batch, jax.random.PRNGKey(0), False
        )
        auc_state = auc_update(
            auc_state, batch["label"], probs, batch["weight"], num_thresholds
        )
        has_data = (jnp.sum(batch["weight"]) > 0.0).astype(jnp.float32)
        return (auc_state, loss_sum + loss * has_data, n + has_data)

    return init, step


def _ragged_eval_schedule(steps_list):
    """Static flattened eval schedule: ([T] domain ids, [T] within-domain
    step indices). Eval order is deterministic (no shuffle), so unlike the
    train pass the whole schedule is a host-side constant."""
    steps_arr = np.asarray(steps_list, np.int64)
    dom = np.repeat(np.arange(len(steps_list)), steps_arr).astype(np.int32)
    local = np.concatenate(
        [np.arange(s) for s in steps_arr] or [np.zeros(0)]
    ).astype(np.int32)
    return dom, local


def _make_ragged_eval(eval_step, init, num_thresholds, steps_list, params_for):
    """Flattened eval scan over only the real batches of every domain.

    The padded [D, S, B] eval scan runs S = max_d steps per domain; on
    long-tailed datasets most are weight-0 no-ops. auc_update is purely
    additive (confusion-count sums), so per-batch deltas scatter-add into a
    [D]-row accumulator instead: ONE scan over sum_d ceil(n_d/B) steps.
    `params_for(d)` supplies the (possibly per-domain merged) eval params.
    """
    from mamdr_tpu.metrics.auc import auc_result

    dom_np, local_np = _ragged_eval_schedule(steps_list)
    d_count = len(steps_list)

    def eval_all_ragged(params_ctx, batch_stats, block):
        s = jax.tree_util.tree_leaves(block)[0].shape[1]
        flat_idx = jnp.asarray(dom_np) * s + jnp.asarray(local_np)
        batches = {
            k: jnp.take(v.reshape((-1,) + v.shape[2:]), flat_idx, axis=0)
            for k, v in block.items()
        }
        auc0, l0, n0 = init()
        acc0 = (
            jax.tree_util.tree_map(
                lambda z: jnp.zeros((d_count,) + z.shape, z.dtype), auc0
            ),
            jnp.zeros((d_count,)),
            jnp.zeros((d_count,)),
        )

        def body(carry, xs):
            b, d = xs
            da, dl, dn = eval_step(
                init(), b, params_for(params_ctx, d), batch_stats
            )
            auc_acc, loss_acc, n_acc = carry
            auc_acc = jax.tree_util.tree_map(
                lambda acc, x: acc.at[d].add(x), auc_acc, da
            )
            return (auc_acc, loss_acc.at[d].add(dl), n_acc.at[d].add(dn)), None

        (auc_acc, loss_acc, n_acc), _ = jax.lax.scan(
            body, acc0, (batches, jnp.asarray(dom_np))
        )
        return loss_acc / jnp.maximum(n_acc, 1.0), jax.vmap(auc_result)(auc_acc)

    return eval_all_ragged


def make_fused_eval(loss_fn, num_thresholds: int = 500, steps_list=None):
    """One dispatch evaluating EVERY domain: scan domains, inner scan batches
    accumulating the 500-threshold confusion counts. Returns ([D] losses,
    [D] aucs). Replaces the reference's per-domain model.evaluate loop
    (base_model.py:130-136). With a non-uniform `steps_list` the scan is
    ragged — only real batches run (see _make_ragged_eval)."""
    from mamdr_tpu.metrics.auc import auc_result

    init, eval_step = _make_eval_step(loss_fn, num_thresholds)
    if steps_list is not None and len(set(steps_list)) > 1:
        ragged = _make_ragged_eval(
            eval_step, init, num_thresholds, steps_list,
            lambda params, d: params,
        )
        return jax.jit(ragged)

    @jax.jit
    def eval_all(params, batch_stats, block):
        def dom_body(_, dom_block):
            def body(carry, b):
                return eval_step(carry, b, params, batch_stats), None

            (auc_state, loss_sum, n), _ = jax.lax.scan(body, init(), dom_block)
            return None, (loss_sum / jnp.maximum(n, 1.0), auc_result(auc_state))

        _, (losses, aucs) = jax.lax.scan(dom_body, None, block)
        return losses, aucs

    return eval_all


def make_fused_eval_merged(
    loss_fn, mask: Pytree, merged_method: str, num_thresholds: int = 500,
    steps_list=None,
):
    """Fused eval with per-domain merged weights (MAMDR/SpecificBase
    semantics, specific_base_model.py:64-97): domain d evaluates
    load(params, merge(shared, specific[d])). Non-uniform `steps_list`:
    ragged scan over only the real batches, with the merge/load done
    per step (cheap: masked leaves are the tower, not the tables)."""
    from mamdr_tpu.metrics.auc import auc_result

    merge = partial(ops.merge_weights, mask=mask, method=merged_method)
    init, eval_step = _make_eval_step(loss_fn, num_thresholds)

    if steps_list is not None and len(set(steps_list)) > 1:
        def params_for(ctx, d):
            params, shared, specific_stack = ctx
            spec_d = jax.tree_util.tree_map(
                lambda m, s: s[d] if m else s, mask, specific_stack
            )
            return ops.load_masked(params, merge(shared, spec_d), mask)

        ragged = _make_ragged_eval(
            eval_step, init, num_thresholds, steps_list, params_for
        )

        @jax.jit
        def eval_all_r(params, batch_stats, shared, specific_stack, block):
            return ragged((params, shared, specific_stack), batch_stats, block)

        return eval_all_r

    @jax.jit
    def eval_all(params, batch_stats, shared, specific_stack, block):
        n_domain = jax.tree_util.tree_leaves(block)[0].shape[0]

        def dom_body(_, xs):
            d, dom_block = xs
            spec_d = jax.tree_util.tree_map(
                lambda m, s: s[d] if m else s, mask, specific_stack
            )
            p = ops.load_masked(params, merge(shared, spec_d), mask)

            def body(carry, b):
                return eval_step(carry, b, p, batch_stats), None

            (auc_state, loss_sum, n), _ = jax.lax.scan(body, init(), dom_block)
            return None, (loss_sum / jnp.maximum(n, 1.0), auc_result(auc_state))

        _, (losses, aucs) = jax.lax.scan(
            dom_body, None, (jnp.arange(n_domain), block)
        )
        return losses, aucs

    return eval_all


def make_fused_separate(train_step, loss_fn, n_steps: int, batch: int,
                        num_thresholds: int = 500):
    """Per-domain independent training, vmapped over the domain axis.

    The reference's separate/finetune stage trains one model per domain
    sequentially (base_model.py:41-109). The models are independent, so the
    TPU-native form batches them: TrainState stacked [D, ...], one vmapped
    epoch trains every domain simultaneously (one dispatch per epoch instead
    of D x epochs), and a vmapped eval scores each domain with its own
    weights. Per-domain early stopping runs on host over the [D] AUC vector
    with on-device best-params selection.

    Compat note: for the finetune path (fresh SGD per domain, reference
    recompiles — specific_base_model.py:118-122) this is exact. For the
    "separate" strategy the reference leaks Adam slots across its sequential
    domain loop (only the initial global init resets them); the batched form
    gives every domain fresh slots — the paper-intent semantics.
    """
    from mamdr_tpu.metrics.auc import auc_result

    init, eval_step = _make_eval_step(loss_fn, num_thresholds)

    @jax.jit
    def epoch_all(states, block, rng):
        """states: TrainState with leading [D] axis; block: {col: [D, N_pad]}."""
        d = jax.tree_util.tree_leaves(block)[0].shape[0]
        rngs = jax.random.split(rng, d)

        def one(state, flat, r):
            return _epoch_on_flat(train_step, state, flat, r, n_steps, batch)

        return jax.vmap(one)(states, block, rngs)

    @jax.jit
    def eval_all(params_stacked, stats_stacked, eval_block):
        """Per-domain params [D,...] against per-domain eval blocks [D,S,B]."""

        def one(params, stats, dom_block):
            def body(carry, b):
                return eval_step(carry, b, params, stats), None

            (auc_state, loss_sum, n), _ = jax.lax.scan(body, init(), dom_block)
            return loss_sum / jnp.maximum(n, 1.0), auc_result(auc_state)

        return jax.vmap(one)(params_stacked, stats_stacked, eval_block)

    @jax.jit
    def select_best(best, current, improved):
        """best[d] <- current[d] where improved[d] (on device)."""

        def sel(b, c):
            mask = improved.reshape((-1,) + (1,) * (b.ndim - 1))
            return jnp.where(mask, c, b)

        return jax.tree_util.tree_map(sel, best, current)

    return epoch_all, eval_all, select_best


def stack_states(state: TrainState, n: int) -> TrainState:
    """Replicate a TrainState n times along a new leading axis, with
    distinct per-domain RNG keys."""
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (n,) + x.shape), state
    )
    return stacked.replace(rng=jax.random.split(state.rng, n))


def _effective_steps_list(steps_list, n_steps: int, cap_steps: int = 0):
    """Drop the per-domain step list when it buys nothing: on balanced
    blocks (every domain at the global max), ragged/dynamic execution runs
    exactly the padded schedule but compiles measurably slower (the
    dynamically-bounded fori_loop DR graph: 412s vs 181s through the remote
    compile service at bench shapes). Returns None in that case."""
    if steps_list is None:
        return None
    full = n_steps if cap_steps <= 0 else min(cap_steps, n_steps)
    capped = [min(s, cap_steps) if cap_steps > 0 else s for s in steps_list]
    if all(s == full for s in capped):
        return None
    return steps_list


def _make_sequential_pass(train_step, n_steps: int, batch: int,
                          steps_list=None, cap_steps: int = 0,
                          shuffle: bool = True):
    """Inner sequential pass: ragged single-scan when per-domain step counts
    are provided (zero pad-step compute), padded domain-scan otherwise."""
    steps_list = _effective_steps_list(steps_list, n_steps, cap_steps)
    if steps_list is not None:
        capped = [
            min(s, cap_steps) if cap_steps > 0 else s for s in steps_list
        ]
        total = int(sum(capped))
        steps_of = jnp.asarray(capped, jnp.int32)

        def seq(state, block, order, rng):
            return _ragged_pass(
                train_step, state, block, order, rng, steps_of, total, batch,
                shuffle=shuffle,
            )

        return seq

    def seq(state, block, order, rng):
        def body(carry, xs):
            state = carry
            dom_idx, r = xs
            flat = {k: v[dom_idx] for k, v in block.items()}
            state, loss = _epoch_on_flat(
                train_step, state, flat, r, n_steps, batch,
                cap_steps=cap_steps, shuffle=shuffle,
            )
            return state, loss

        rngs = jax.random.split(rng, order.shape[0])
        state, losses = jax.lax.scan(body, state, (order, rngs))
        return state, losses

    return seq


def make_fused_passes(train_step, n_steps: int, batch: int, steps_list=None):
    """Jitted multi-domain passes over a device-resident [D, N_pad] block.

    With `steps_list` (per-domain real step counts), the pass runs as ONE
    ragged scan over sum(steps) steps instead of D x max(steps) — bit-identical
    (pad steps are no-ops; see _ragged_batches) but free of padding waste."""
    seq = _make_sequential_pass(train_step, n_steps, batch, steps_list)

    @jax.jit
    def sequential_pass(state: TrainState, block, order, rng):
        """Train one epoch on each domain in `order`, chained without reset
        (DN inner loop / joint loop body). order: [D] int32."""
        return seq(state, block, order, rng)

    return sequential_pass


def _grad_epoch_on_flat(
    grad_fn, params, batch_stats, flat, rng, n_steps: int, batch: int,
    acc, accumulate: str = "sum", cap_steps: int = 0, shuffle: bool = True,
    real_steps=None,
):
    """Accumulate grads over a flat block at fixed params (inference mode,
    matching the reference's learning-phase-0 accumulate function).

    The shuffle keeps the weight-0 pad tail LAST (same sort-key trick as
    _epoch_on_flat) and all-pad batches are skipped entirely: the accumulated
    meta-grad is then exactly the sum of the domain's real ceil(n/B) per-batch
    weighted means, matching the loop path and the reference's accumulate
    semantics (maml.py:196-234 accumulates over real train_step batches only).
    Scattering pad rows instead would inflate short padded domains' grads by
    the padding ratio, and all-pad batches would still leak l2-embedding (and
    uncertainty log-var) gradients into the accumulator."""
    from mamdr_tpu.utils import trees as trees_mod

    batches = _form_batches(flat, rng, n_steps, batch, cap_steps, shuffle)

    def accum(acc, b, i):
        grads = grad_fn(params, batch_stats, b, jax.random.fold_in(rng, i))
        if accumulate == "ema":
            new_acc = jax.tree_util.tree_map(
                lambda a, g: a * 0.999 + g * 0.001, acc, grads
            )
        else:
            new_acc = trees_mod.tree_add(acc, grads)
        has_data = jnp.sum(b["weight"]) > 0.0
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(has_data, n, o), new_acc, acc
        )

    if real_steps is None:
        def step(carry, b):
            acc, i = carry
            return (accum(acc, b, i), i + 1), None

        (acc, _), _ = jax.lax.scan(
            step, (acc, jnp.zeros((), jnp.int32)), batches
        )
        return acc

    # dynamically-bounded variant: run only this domain's real batches
    # (bit-identical — pad batches are has_data-gated out of the accumulator
    # and real rows sort first; see _epoch_on_flat)
    steps = n_steps if cap_steps <= 0 else min(cap_steps, n_steps)
    bound = jnp.minimum(real_steps, steps)

    def body(i, acc):
        b = jax.tree_util.tree_map(
            lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False),
            batches,
        )
        return accum(acc, b, i)

    return jax.lax.fori_loop(0, bound, body, acc)


def make_fused_maml(
    train_step,
    grad_fn,
    mask: Pytree,
    meta_tx,
    n_steps_support: int,
    n_steps_query: int,
    batch: int,
    batch_mode: bool,
    cap_steps: int = 0,
    accumulate: str = "sum",
    mldg: bool = False,
    shuffle: bool = True,
    steps_list_support=None,
    steps_list_query=None,
):
    """MAML or MLDG epoch as one dispatch.

    MAML (maml.py:60-121): per domain — load meta, inner-Adam adaptation on
    the support block, accumulate query grads at the adapted weights, then
    (non-batch) apply the masked meta-Adam at meta and clear; batch defers
    the apply to epoch end.

    MLDG (mldg.py:92-119): support grads are ACCUMULATED at meta (no inner
    Adam), mid-stream meta-Adam apply produces the adapted weights (the
    accumulator is NOT cleared and the meta-Adam moments advance), query
    grads at the adapted weights join the same accumulator, then
    restore-and-apply.
    """
    from mamdr_tpu.utils import trees as trees_mod

    steps_list_support = _effective_steps_list(
        steps_list_support, n_steps_support, cap_steps
    )
    steps_list_query = _effective_steps_list(
        steps_list_query, n_steps_query, cap_steps
    )
    sup_steps_of = (
        None if steps_list_support is None
        else jnp.asarray(steps_list_support, jnp.int32)
    )
    q_steps_of = (
        None if steps_list_query is None
        else jnp.asarray(steps_list_query, jnp.int32)
    )

    def masked_scale(grads, scale):
        return jax.tree_util.tree_map(
            lambda m, g: g * scale if m else g, mask, grads
        )

    @jax.jit
    def maml_epoch(
        state: TrainState, meta, meta_opt, support_block, query_block,
        order, rng, grad_scale,
    ):
        def apply_meta(target, opt, acc):
            import optax

            updates, opt = meta_tx.update(masked_scale(acc, grad_scale), opt, target)
            return optax.apply_updates(target, updates), opt

        def body(carry, xs):
            state, meta, meta_opt, acc = carry
            dom_idx, r = xs
            r_sup, r_q = jax.random.split(r)
            sup_flat = {k: v[dom_idx] for k, v in support_block.items()}
            q_flat = {k: v[dom_idx] for k, v in query_block.items()}
            state = state.replace(params=ops.load_masked(state.params, meta, mask))
            sup_rs = None if sup_steps_of is None else sup_steps_of[dom_idx]
            q_rs = None if q_steps_of is None else q_steps_of[dom_idx]
            if mldg:
                acc = _grad_epoch_on_flat(
                    grad_fn, state.params, state.batch_stats, sup_flat, r_sup,
                    n_steps_support, batch, acc, accumulate, cap_steps, shuffle,
                    real_steps=sup_rs,
                )
                adapted, meta_opt = apply_meta(state.params, meta_opt, acc)
                state = state.replace(params=adapted)
            else:
                state, _ = _epoch_on_flat(
                    train_step, state, sup_flat, r_sup, n_steps_support, batch,
                    cap_steps=cap_steps, shuffle=shuffle, real_steps=sup_rs,
                )
            acc = _grad_epoch_on_flat(
                grad_fn, state.params, state.batch_stats, q_flat, r_q,
                n_steps_query, batch, acc, accumulate, cap_steps, shuffle,
                real_steps=q_rs,
            )
            if not batch_mode:
                meta, meta_opt = apply_meta(meta, meta_opt, acc)
                acc = trees_mod.tree_zeros_like(acc)
            return (state, meta, meta_opt, acc), None

        acc0 = trees_mod.tree_zeros_like(meta)
        rngs = jax.random.split(rng, order.shape[0])
        (state, meta, meta_opt, acc), _ = jax.lax.scan(
            body, (state, meta, meta_opt, acc0), (order, rngs)
        )
        if batch_mode:
            meta, meta_opt = apply_meta(meta, meta_opt, acc)
        state = state.replace(params=ops.load_masked(state.params, meta, mask))
        return state, meta, meta_opt

    return maml_epoch


def make_fused_pcgrad(
    grad_fn,
    mask: Pytree,
    meta_tx,
    n_steps: int,
    batch: int,
    cap_steps: int = 0,
    mode: str = "reference",
    shuffle: bool = True,
    steps_list=None,
):
    """PCGrad epoch as one dispatch (reference pcgrad.py:60-127).

    Per (shuffled) query domain: accumulate the query's grads at the current
    weights (capped by meta_train_step), then for each sampled aux domain
    accumulate a FULL-epoch grad and project it — against the RUNNING sum in
    mode="reference" (the original's in-place aliasing) or against the
    original query grads in mode="paper" — then apply the sum with the
    masked meta-Adam. Weights advance between query domains.
    """
    import optax

    from mamdr_tpu.utils import trees as trees_mod

    steps_list = _effective_steps_list(steps_list, n_steps)
    steps_of = (
        None if steps_list is None else jnp.asarray(steps_list, jnp.int32)
    )

    @jax.jit
    def pcgrad_epoch(state: TrainState, meta_opt, block, order, aux, rng, grad_scale):
        def q_body(carry, xs):
            state, meta_opt = carry
            q, aux_q, r = xs
            r_q, r_a = jax.random.split(r)
            zero = trees_mod.tree_zeros_like(state.params)
            q_flat = {k: v[q] for k, v in block.items()}
            qg = _grad_epoch_on_flat(
                grad_fn, state.params, state.batch_stats, q_flat, r_q,
                n_steps, batch, zero, "sum", cap_steps, shuffle,
                real_steps=None if steps_of is None else steps_of[q],
            )

            def a_body(running, xs2):
                a_idx, r2 = xs2
                a_flat = {k: v[a_idx] for k, v in block.items()}
                ag = _grad_epoch_on_flat(
                    grad_fn, state.params, state.batch_stats, a_flat, r2,
                    n_steps, batch, trees_mod.tree_zeros_like(running), "sum", 0,
                    shuffle,
                    real_steps=None if steps_of is None else steps_of[a_idx],
                )
                base = running if mode == "reference" else qg
                proj = ops.pcgrad_project(base, ag, mode)
                return trees_mod.tree_add(running, proj), None

            rngs2 = jax.random.split(r_a, aux_q.shape[0])
            running, _ = jax.lax.scan(a_body, qg, (aux_q, rngs2))
            grads = jax.tree_util.tree_map(
                lambda m, g: g * grad_scale if m else g, mask, running
            )
            updates, meta_opt = meta_tx.update(grads, meta_opt, state.params)
            state = state.replace(params=optax.apply_updates(state.params, updates))
            return (state, meta_opt), None

        rngs = jax.random.split(rng, order.shape[0])
        (state, meta_opt), _ = jax.lax.scan(
            q_body, (state, meta_opt), (order, aux, rngs)
        )
        return state, meta_opt

    return pcgrad_epoch


def make_fused_reptile(
    train_step,
    mask: Pytree,
    n_steps: int,
    batch: int,
    batch_mode: bool,
    cap_steps: int = 0,
    shuffle: bool = True,
    steps_list=None,
):
    """Reptile epoch as one dispatch (reference reptile.py:44-90):
    per domain — load meta, capped inner epoch, then either immediate
    meta interpolation (non-batch) or delta accumulation with one scaled
    apply at epoch end ("batch")."""
    steps_list = _effective_steps_list(steps_list, n_steps, cap_steps)
    steps_of = (
        None if steps_list is None else jnp.asarray(steps_list, jnp.int32)
    )

    @jax.jit
    def reptile_epoch(state: TrainState, meta, block, order, rng, meta_lr):
        def body(carry, xs):
            state, meta, acc = carry
            dom_idx, r = xs
            state = state.replace(params=ops.load_masked(state.params, meta, mask))
            flat = {k: v[dom_idx] for k, v in block.items()}
            state, loss = _epoch_on_flat(
                train_step, state, flat, r, n_steps, batch, cap_steps=cap_steps,
                shuffle=shuffle,
                real_steps=None if steps_of is None else steps_of[dom_idx],
            )
            if batch_mode:
                acc = ops.delta_accumulate(acc, state.params, meta, mask)
            else:
                meta = ops.reptile_update(meta, state.params, meta_lr, mask)
            return (state, meta, acc), loss

        from mamdr_tpu.utils import trees

        acc0 = trees.tree_zeros_like(meta)
        rngs = jax.random.split(rng, order.shape[0])
        (state, meta, acc), losses = jax.lax.scan(
            body, (state, meta, acc0), (order, rngs)
        )
        if batch_mode:
            meta = ops.scaled_add(meta, acc, meta_lr, mask)
        state = state.replace(params=ops.load_masked(state.params, meta, mask))
        return state, meta, losses

    return reptile_epoch


def make_fused_dn(
    train_step,
    mask: Pytree,
    n_steps: int,
    batch: int,
    cap_steps: int = 0,
    shuffle: bool = True,
    steps_list=None,
):
    """Domain Negotiation epoch as one dispatch (domain_negotiation.py:49-88):
    load meta once, chain sequentially through `order` without reset, then
    meta += (θ_final - meta)*meta_lr. With `steps_list`, the inner pass is
    the ragged zero-pad-compute scan (see _ragged_batches)."""
    seq = _make_sequential_pass(
        train_step, n_steps, batch, steps_list, cap_steps, shuffle
    )

    @jax.jit
    def dn_epoch(state: TrainState, meta, block, order, rng, meta_lr):
        state = state.replace(params=ops.load_masked(state.params, meta, mask))
        state, losses = seq(state, block, order, rng)
        meta = ops.reptile_update(meta, state.params, meta_lr, mask)
        state = state.replace(params=ops.load_masked(state.params, meta, mask))
        return state, meta, losses

    return dn_epoch


def make_fused_mamdr(
    train_step,
    mask: Pytree,
    merged_method: str,
    n_steps: int,
    batch: int,
    domain_regulation_step: int = 0,
    shuffle: bool = True,
    steps_list=None,
):
    """The full MAMDR epoch as two jitted calls (DN + DR).

    Semantics per reference mamdr.py:41-108 (non-batch, no
    finetune_every_epoch — the shipped DN+DR configs):

    dn_phase: load shared -> sequential pass over `order` -> shared +=
    (θ_end - shared)*meta_lr.

    dr_phase: for each query domain q in `order`, for each support domain s
    in aux[q]: load merge(shared, specific[q]); full epoch on s; ≤reg_step
    epoch on q; specific[q] += (θ - merged)*meta_lr; re-merge. specific is
    carried as a [D]-stacked pytree.
    """

    merge = partial(ops.merge_weights, mask=mask, method=merged_method)
    seq = _make_sequential_pass(
        train_step, n_steps, batch, steps_list, shuffle=shuffle
    )
    # balanced blocks: dynamic bounds buy nothing for either the support
    # (full) or capped query epochs — drop them for the faster-compiling
    # static graph (_effective_steps_list)
    steps_list = _effective_steps_list(steps_list, n_steps)
    steps_of = (
        None if steps_list is None else jnp.asarray(steps_list, jnp.int32)
    )

    @jax.jit
    def dn_phase(state: TrainState, shared, block, order, rng, meta_lr):
        state = state.replace(params=ops.load_masked(state.params, shared, mask))
        state, losses = seq(state, block, order, rng)
        shared = ops.reptile_update(shared, state.params, meta_lr, mask)
        return state, shared, losses

    @jax.jit
    def dr_phase(state: TrainState, shared, specific_stack, block, order, aux, rng, meta_lr):
        """order: [D] query domains; aux: [D, K] support domains per query;
        specific_stack: pytree with leading axis n_domain on masked leaves."""

        def get_spec(q):
            return jax.tree_util.tree_map(
                lambda m, s: s[q] if m else s, mask, specific_stack
            )

        def query_body(carry, xs):
            state, specific_stack = carry
            q, aux_q, r = xs
            spec_q = get_spec(q)
            query_flat = {k: v[q] for k, v in block.items()}

            def aux_body(inner, xs2):
                state, spec_q = inner
                s_idx, r2 = xs2
                merged = merge(shared, spec_q)
                state = state.replace(
                    params=ops.load_masked(state.params, merged, mask)
                )
                sup_flat = {k: v[s_idx] for k, v in block.items()}
                r_sup, r_q = jax.random.split(r2)
                state, _ = _epoch_on_flat(
                    train_step, state, sup_flat, r_sup, n_steps, batch,
                    shuffle=shuffle,
                    real_steps=None if steps_of is None else steps_of[s_idx],
                )
                state, _ = _epoch_on_flat(
                    train_step, state, query_flat, r_q, n_steps, batch,
                    cap_steps=domain_regulation_step, shuffle=shuffle,
                    real_steps=None if steps_of is None else steps_of[q],
                )
                spec_q = jax.tree_util.tree_map(
                    lambda m, sp, a, mg: sp + (a - mg) * meta_lr if m else sp,
                    mask, spec_q, state.params, merged,
                )
                return (state, spec_q), None

            rngs2 = jax.random.split(r, aux_q.shape[0])
            (state, spec_q), _ = jax.lax.scan(
                aux_body, (state, spec_q), (aux_q, rngs2)
            )
            specific_stack = jax.tree_util.tree_map(
                lambda m, st, sq: st.at[q].set(sq) if m else st,
                mask, specific_stack, spec_q,
            )
            return (state, specific_stack), None

        rngs = jax.random.split(rng, order.shape[0])
        (state, specific_stack), _ = jax.lax.scan(
            query_body, (state, specific_stack), (order, aux, rngs)
        )
        return state, specific_stack

    return dn_phase, dr_phase


def make_fused_dr_parallel(
    sub_step,
    to_sub,
    combine,
    mask: Pytree,
    merged_method: str,
    n_steps: int,
    batch: int,
    domain_regulation_step: int = 0,
    shuffle: bool = True,
    steps_list=None,
    lane_sharding=None,
    table_lane_sharding=None,
    row_sharded_shapes=(),
    lane_chunk: int = 0,
):
    """DR phase with every query domain as a vmapped lane — one dispatch.

    The per-query DR work (reference mamdr.py:60-108) is independent once
    the DN phase has fixed `shared`: query q's loop only reads shared and
    the data block and writes specific[q]. The sequential dr_phase chains
    the optimizer slots and the step counter through query domains anyway —
    a side effect of the reference reusing one live Keras model, not an
    algorithmic requirement. This variant instead starts every lane from the
    DR-entry state (params / optimizer slots / step counter) and runs all
    lanes as ONE vmapped scan over the K support runs. At B=1024 the tower
    matmuls are latency-bound (PERF.md), so L lanes cost far less than L
    sequential epochs.

    Semantics vs dr_phase: bit-identical when the inner optimizer is
    slotless (SGD) and dropout is off (tests/test_fused_loop_equivalence.py).
    Otherwise two lineages differ: optimizer slots (each lane starts from
    the DR-entry slots instead of the previous query's) and the dropout
    stream (per-lane fold_in of the lane index instead of the sequential
    step-counter offsets) — both validated for learning parity
    (test_strategies_e2e parity test, RESULTS.md). Eligibility is gated by
    the caller (MAMDRStrategy): meta mask must cover every trainable leaf
    and the model must carry no batch statistics, else those would also
    need per-lane lineage.

    Frozen tables are shared across lanes via the subset step
    (steps.make_subset_train_step): the lane states stack only trainable
    leaves, so Taobao-scale frozen 125MB tables exist once.

    With `lane_sharding` (a NamedSharding whose PartitionSpec names the mesh
    axis for dim 0), the lane axis is SHARDED across devices: lanes are
    embarrassingly parallel (zero cross-lane dataflow until the final
    specific-stack writeback), so the DR phase scales across chips with no
    collectives beyond XLA's output gather — the multi-chip scale-out path
    for the flagship (docs/SCALING.md "domain-level concurrency"). The data
    block and frozen tables stay replicated.

    Row-sharded TRAINABLE tables (Amazon-style production shapes) compose
    with the lanes too: the lane-stacked copies are [L, rows, D] leaves whose
    lane axis shards over `data` and row axis over `table`
    (`table_lane_sharding` = P(data, table, None); `row_sharded_shapes` is
    the set of (rows, dim) shapes of the row-sharded param tables, used to
    recognise those leaves across params / specific stacks). The vmap
    batching rule for the shard_map lookup handles the batched table operand
    — forward masked-gather+psum and its scatter-add transpose — and XLA
    propagates the (data, table) layout through the lane bodies
    (scripts/probe_lanes_sharded_trainable.py;
    tests/test_mesh_dr_parallel.py pins single-device parity). Flat-Adam
    slots stay lane-sharded only (the raveled vector mixes tables and
    towers).

    With ``lane_chunk=C > 0``, lanes run as a lax.scan over ⌈d/C⌉ groups of
    C vmapped lanes instead of one d-wide vmap — same dispatch count (1),
    but the concurrent lane state (params + opt slots + activations) is
    bounded to C lanes. Every real lane's inputs are derived for the true d
    (global lane indices for dropout fold_in, split(rng, d) for shuffles),
    so chunked and unchunked results are bitwise-equal; pad lanes scatter
    out-of-range and are dropped. This is the HBM/graph-size control for
    large trainable-table domain counts (Amazon-13 shapes).

    Returned callable has the dr_phase signature:
    (state, shared, specific_stack, block, order, aux, rng, meta_lr)
    -> (state, specific_stack).
    """
    row_sharded_shapes = frozenset(tuple(s) for s in row_sharded_shapes)
    steps_list = _effective_steps_list(steps_list, n_steps)
    steps_of = (
        None if steps_list is None else jnp.asarray(steps_list, jnp.int32)
    )

    def merge_sub(shared_sub, spec_sub):
        return ops.merge_weights(shared_sub, spec_sub, mask, merged_method)

    @jax.jit
    def dr_parallel(state: TrainState, shared, specific_stack, block,
                    order, aux, rng, meta_lr):
        d = order.shape[0]
        sub0 = to_sub(state.params)
        shared_sub = to_sub(shared)

        def lane(substate, spec_q, query_flat, aux_q, r, q):
            def aux_body(inner, xs2):
                substate, spec_q = inner
                s_idx, r2 = xs2
                merged = merge_sub(shared_sub, spec_q)
                substate = substate.replace(
                    params=ops.load_masked(substate.params, merged, mask)
                )
                sup_flat = jax.tree_util.tree_map(
                    lambda v: v[s_idx], block
                )
                r_sup, r_q = jax.random.split(r2)
                substate, _ = _epoch_on_flat(
                    sub_step, substate, sup_flat, r_sup, n_steps, batch,
                    shuffle=shuffle,
                    real_steps=None if steps_of is None else steps_of[s_idx],
                )
                substate, _ = _epoch_on_flat(
                    sub_step, substate, query_flat, r_q, n_steps, batch,
                    cap_steps=domain_regulation_step, shuffle=shuffle,
                    real_steps=None if steps_of is None else steps_of[q],
                )
                spec_q = jax.tree_util.tree_map(
                    lambda m, sp, a, mg: sp + (a - mg) * meta_lr if m else sp,
                    mask, spec_q, substate.params, merged,
                )
                return (substate, spec_q), None

            rngs2 = jax.random.split(r, aux_q.shape[0])
            (substate, spec_q), _ = jax.lax.scan(
                aux_body, (substate, spec_q), (aux_q, rngs2)
            )
            return substate, spec_q

        def make_lane_states(lane_rngs_w, w):
            stack_w = lambda x: jnp.broadcast_to(x[None], (w,) + jnp.shape(x))
            return state.replace(
                params=jax.tree_util.tree_map(stack_w, sub0),
                opt_state=jax.tree_util.tree_map(stack_w, state.opt_state),
                batch_stats=(
                    jax.tree_util.tree_map(stack_w, state.batch_stats)
                    if state.batch_stats else {}
                ),
                rng=lane_rngs_w,
                step=jnp.full((w,), state.step, jnp.int32),
            )

        def constrain(x):
            if lane_sharding is None:
                return x
            if (
                table_lane_sharding is not None
                and getattr(x, "ndim", 0) >= 3
                and x.shape[1:3] in row_sharded_shapes
            ):
                return jax.lax.with_sharding_constraint(x, table_lane_sharding)
            return jax.lax.with_sharding_constraint(x, lane_sharding)

        shard_lanes = lambda t: jax.tree_util.tree_map(constrain, t)

        # Per-lane dropout streams: fold the GLOBAL lane index into the state
        # rng — a broadcast rng + equal step counters would give every query
        # domain IDENTICAL dropout masks at aligned steps (the sequential
        # dr_phase decorrelates them via distinct step offsets). No effect
        # with dropout off (the state rng's only consumer). Derived for the
        # true d (not the chunk-padded count) so chunked and unchunked lanes
        # are bitwise-identical.
        lane_rngs = jax.vmap(lambda i: jax.random.fold_in(state.rng, i))(
            jnp.arange(d)
        )
        # lane l handles query domain order[l] — identical per-lane rng
        # derivation to dr_phase's scan (split(rng, D)[l] then split(r, K)).
        rngs = jax.random.split(rng, d)

        def pick_last(lane_states_w, local_idx):
            last = jax.tree_util.tree_map(
                lambda x: x[local_idx], lane_states_w.params
            )
            return state.replace(
                params=combine(last),
                opt_state=jax.tree_util.tree_map(
                    lambda x: x[local_idx], lane_states_w.opt_state
                ),
                batch_stats=(
                    jax.tree_util.tree_map(
                        lambda x: x[local_idx], lane_states_w.batch_stats
                    )
                    if state.batch_stats else {}
                ),
                step=lane_states_w.step[local_idx],
            )

        if lane_chunk <= 0 or d <= lane_chunk:
            # ---- single dispatch: all lanes in one vmap ----
            # Unmasked leaves are never read inside a lane (every weight op
            # is mask-gated) and — by the caller's eligibility gate — are
            # exactly the frozen tables; carry [d] scalar placeholders so the
            # vmapped outputs never materialise d copies of a 125MB table.
            spec_lanes = jax.tree_util.tree_map(
                lambda m, s: s[order] if m else jnp.zeros((d,), s.dtype),
                mask, specific_stack,
            )
            query_flats = jax.tree_util.tree_map(lambda v: v[order], block)
            lane_states = shard_lanes(make_lane_states(lane_rngs, d))
            spec_lanes = shard_lanes(spec_lanes)
            query_flats = shard_lanes(query_flats)

            lane_states, spec_lanes = jax.vmap(lane)(
                lane_states, spec_lanes, query_flats, aux, rngs, order
            )

            specific_stack = jax.tree_util.tree_map(
                lambda m, st, lanes: st.at[order].set(lanes) if m else st,
                mask, specific_stack, spec_lanes,
            )
            return pick_last(lane_states, -1), specific_stack

        # ---- chunked: lax.scan over ceil(d/C) groups of C lanes ----
        # Bounds the CONCURRENT lane state (params + opt slots + activations)
        # to C lanes — the HBM/graph-size control for large domain counts
        # (Amazon-13's 13 trainable-table lanes crashed the TPU worker; see
        # strategies/mamdr.py). Lanes are padded to a multiple of C with
        # order[0] repeats whose spec writebacks scatter out-of-range
        # (mode="drop") — every real lane's inputs (entry state, rngs[l],
        # fold_in(rng, l)) are identical to the unchunked dispatch, so the
        # results are bitwise-equal (test_fused_loop_equivalence).
        C = int(lane_chunk)
        n_chunks = -(-d // C)
        padn = n_chunks * C - d

        def pad_lanes(x):
            if padn == 0:
                return x
            return jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (padn,) + x.shape[1:])]
            )

        DROP = jnp.int32(2**30)  # out-of-range scatter index for pad lanes
        scatter_idx = jnp.concatenate(
            [order, jnp.full((padn,), DROP)]
        ) if padn else order
        to_chunks = lambda x: x.reshape((n_chunks, C) + x.shape[1:])
        xs = (
            to_chunks(pad_lanes(order)),
            to_chunks(scatter_idx),
            to_chunks(pad_lanes(aux)),
            to_chunks(pad_lanes(rngs)),
            to_chunks(pad_lanes(lane_rngs)),
            # local index of the lane whose state chains out (the global
            # last REAL lane d-1 sits in the final chunk)
            jnp.clip(jnp.int32(d - 1) - jnp.arange(n_chunks, dtype=jnp.int32) * C,
                     0, C - 1),
        )

        def chunk_body(spec_stack_c, xs_c):
            order_c, sidx_c, aux_c, rngs_c, lrngs_c, keep_local = xs_c
            spec_lanes = jax.tree_util.tree_map(
                lambda m, s: s[order_c] if m else jnp.zeros((C,), s.dtype),
                mask, spec_stack_c,
            )
            query_flats = jax.tree_util.tree_map(lambda v: v[order_c], block)
            lane_states = shard_lanes(make_lane_states(lrngs_c, C))
            spec_lanes = shard_lanes(spec_lanes)
            query_flats = shard_lanes(query_flats)

            lane_states, spec_lanes = jax.vmap(lane)(
                lane_states, spec_lanes, query_flats, aux_c, rngs_c, order_c
            )
            spec_stack_c = jax.tree_util.tree_map(
                lambda m, st, lanes: st.at[sidx_c].set(lanes, mode="drop")
                if m else st,
                mask, spec_stack_c, spec_lanes,
            )
            return spec_stack_c, pick_last(lane_states, keep_local)

        specific_stack, last_states = jax.lax.scan(
            chunk_body, specific_stack, xs
        )
        final_state = jax.tree_util.tree_map(lambda x: x[-1], last_states)
        return final_state, specific_stack

    return dr_parallel


def stack_specific(specific_list: List[Pytree], mask: Pytree) -> Pytree:
    """[per-domain pytrees] -> one pytree with leading domain axis on masked
    leaves (unmasked leaves take domain 0's value — they're never used)."""
    return jax.tree_util.tree_map(
        lambda m, *leaves: jnp.stack(leaves) if m else leaves[0],
        mask, *specific_list,
    )


def unstack_specific(stacked: Pytree, mask: Pytree, n_domain: int) -> List[Pytree]:
    return [
        jax.tree_util.tree_map(
            lambda m, s: s[i] if m else s, mask, stacked
        )
        for i in range(n_domain)
    ]
