"""Jitted compute core: loss, train step, scan-fused epochs, eval, grad accumulation.

One `train_step(state, batch)` is shared by every strategy (SURVEY §7.1.2);
strategies differ only in host-side scheduling and in the on-device
weight-space ops applied between inner runs. A per-domain epoch is a
`lax.scan` over `[n_steps, B]` stacked batches under a single jit — the
replacement for the reference's per-batch `session.run` hot loop
(reference model_zoo/DeepCTR/deepctr.py:76, maml.py:92-99).

Loss semantics (reference parity):
  - binary cross-entropy on sigmoid probabilities, masked weighted mean
    (Keras weighted loss with 0/1 weights == sum(w*bce)/sum(w));
  - l2 regularisation 1e-5 on embedding tables (deepctr.py:118-136 defaults);
    frozen tables contribute a stop_gradient'ed constant;
  - optional Kendall uncertainty weighting per domain:
    loss = bce/var^2 + log(var), var = log_vars[domain_id]
    (reference model_zoo/uncertainty_weight/weighted_loss.py:29-42).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from mamdr_tpu.metrics.auc import AucState, auc_init, auc_result, auc_update
from mamdr_tpu.train.state import TrainState
from mamdr_tpu.utils import trees


class StepConfig(NamedTuple):
    uncertainty_weight: bool = False
    l2_emb: float = 1e-5
    emb_trainable: bool = True
    num_thresholds: int = 500
    has_batch_stats: bool = False
    has_dropout: bool = False
    # Use the fused Pallas forward+backward kernel for the train step when
    # the model/config shape is eligible (ops/fused_mlp_step.py); autodiff
    # otherwise. Kernel-vs-autodiff equivalence: tests/test_fused_mlp_step.py.
    fused_kernel: bool = True
    # Meta-grad accumulation mode (average_meta_grad, reference
    # maml.py:208-229): "sum" (none/mean — mean scales at apply time),
    # "ema" (moving_mean, 0.999), "drop" (Dropout 0.2 on 1-D grads).
    # NOTE reference quirk: its accumulate K.function runs at learning phase
    # 0, so its Dropout is actually a no-op and query grads see no dropout;
    # we match the no-dropout part (train=False below) but implement "drop"
    # as real inverted dropout (the code's evident intent; no shipped config
    # uses it).
    meta_accumulate: str = "sum"


def weighted_bce(logits, labels, weights):
    """sum(w * bce) / sum(w) — Keras masked-weighted mean with 0/1 weights."""
    bce = optax.sigmoid_binary_cross_entropy(logits, labels)
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    return jnp.sum(bce * weights) / denom


def _l2_term(model_params, l2_emb: float, emb_trainable: bool):
    """l2 * sum(table^2) over embedding-table params ('emb' in path).

    When tables are frozen the term is constant — stop_gradient so the
    backward pass never materialises a dense table-sized gradient.
    """
    if l2_emb <= 0.0:
        return 0.0

    def leaf_term(name, x):
        if "emb" not in name:
            return 0.0
        t = jnp.sum(jnp.square(x))
        if not emb_trainable and ("user_emb" in name or "item_emb" in name):
            t = jax.lax.stop_gradient(t)
        return t

    terms = trees.named_tree_map(leaf_term, model_params)
    return l2_emb * jax.tree_util.tree_reduce(jnp.add, terms, 0.0)


def make_loss_fn(model, cfg: StepConfig):
    """Returns loss_fn(params, batch_stats, batch, rng, train) -> (loss, aux)."""

    def loss_fn(params, batch_stats, batch, rng, train: bool):
        variables = {"params": params["model"]}
        if cfg.has_batch_stats:
            variables["batch_stats"] = batch_stats
        kwargs = {}
        if train and cfg.has_dropout:
            kwargs["rngs"] = {"dropout": rng}
        mutable = ["batch_stats"] if (train and cfg.has_batch_stats) else False
        out = model.apply(
            variables,
            batch["uid"], batch["pid"], batch["domain"],
            train=train, mutable=mutable, **kwargs,
        )
        if mutable:
            logits, updated = out
            new_stats = updated.get("batch_stats", batch_stats)
        else:
            logits, new_stats = out, batch_stats

        data_loss = weighted_bce(logits, batch["label"], batch["weight"])
        if cfg.uncertainty_weight:
            var = params["uncertainty"]["log_vars"][batch["domain"][0], 0]
            data_loss = data_loss / jnp.square(var) + jnp.log(var)
        loss = data_loss + _l2_term(params["model"], cfg.l2_emb, cfg.emb_trainable)
        probs = jax.nn.sigmoid(logits)
        return loss, (new_stats, probs, data_loss)

    return loss_fn


class TrainFns(NamedTuple):
    """Bundle of jitted functions over a fixed (model, optimizer, cfg)."""

    train_epoch: Callable    # (state, stacked) -> (state, mean_loss)
    eval_epoch: Callable     # (params, batch_stats, stacked) -> (loss, auc)
    grad_epoch: Callable     # (params, batch_stats, stacked, rng) -> (grads_sum, n_batches)
    init_opt: Callable       # params -> opt_state
    apply_grads: Callable    # (params, opt_state, grads) -> (params, opt_state)


def make_train_step(model, tx: optax.GradientTransformation, cfg: StepConfig):
    """The one train step shared by every execution path (plain, fused,
    sharded): (state, batch) -> (state, data_loss)."""
    loss_fn = make_loss_fn(model, cfg)
    fast = None
    if cfg.fused_kernel:
        from mamdr_tpu.ops.fused_mlp_step import maybe_make_fast_loss_grad

        fast = maybe_make_fast_loss_grad(model, cfg)

    def train_step(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        if fast is not None:
            data_loss, grads = fast(state.params, batch, rng, train=True)
            new_stats = state.batch_stats
        else:
            (loss, (new_stats, _, data_loss)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, batch, rng, True)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # All-padding batches (weight sums to 0 — produced when fused blocks
        # pad short domains to a uniform step count) must be TRUE no-ops:
        # without this, zero-grad Adam steps would still decay moments and
        # advance the slot counter, diverging from the reference's per-domain
        # step counts.
        has_data = jnp.sum(batch["weight"]) > 0.0

        def keep(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(has_data, n, o), new, old
            )

        new_state = state.replace(
            params=keep(new_params, state.params),
            opt_state=keep(new_opt, state.opt_state),
            batch_stats=keep(new_stats, state.batch_stats),
            step=state.step + jnp.where(has_data, 1, 0).astype(state.step.dtype),
        )
        return new_state, data_loss

    return train_step, loss_fn


def make_subset_train_step(model, tx, cfg: StepConfig, frozen_mask, frozen_full):
    """Train step whose carried params hold only the TRAINABLE subset.

    Frozen leaves (frozen_mask True — the pretrained user/item tables when
    emb_trainable is false) are captured once as closure constants and
    replaced by scalar placeholders in the state the step carries. The
    vmapped separate/finetune path (fused.make_fused_separate) then stacks
    ONLY per-domain-varying leaves: without this, a 30-domain Taobao finetune
    stacks 30 copies of ~125MB frozen tables and exhausts HBM (observed:
    RESOURCE_EXHAUSTED at reference scale).

    Returns (train_step, to_sub, combine): to_sub(full)->sub replaces frozen
    leaves with scalar zeros; combine(sub)->full restores the shared frozen
    buffers (one copy for every vmap lane).
    """
    loss_fn = make_loss_fn(model, cfg)
    # No Pallas fast path here: this step runs under vmap (one lane per
    # domain) and pallas_call batching on the tower kernel is unexercised;
    # autodiff vmaps trivially and the separate stage is not the hot path.
    fast = None

    fz = frozen_mask

    def to_sub(full):
        return jax.tree_util.tree_map(
            lambda f, x: jnp.zeros((), x.dtype) if f else x, fz, full
        )

    def combine(sub):
        return jax.tree_util.tree_map(
            lambda f, frozen, s: frozen if f else s, fz, frozen_full, sub
        )

    def loss_sub(sub, batch_stats, batch, rng, train):
        return loss_fn(combine(sub), batch_stats, batch, rng, train)

    def train_step(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        if fast is not None:
            data_loss, grads_full = fast(
                combine(state.params), batch, rng, train=True
            )
            grads = to_sub(grads_full)
            new_stats = state.batch_stats
        else:
            (loss, (new_stats, _, data_loss)), grads = jax.value_and_grad(
                loss_sub, has_aux=True
            )(state.params, state.batch_stats, batch, rng, True)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        has_data = jnp.sum(batch["weight"]) > 0.0

        def keep(new, old):
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(has_data, n, o), new, old
            )

        new_state = state.replace(
            params=keep(new_params, state.params),
            opt_state=keep(new_opt, state.opt_state),
            batch_stats=keep(new_stats, state.batch_stats),
            step=state.step + jnp.where(has_data, 1, 0).astype(state.step.dtype),
        )
        return new_state, data_loss

    return train_step, to_sub, combine


def make_accum_grad_fn(model, cfg: StepConfig):
    """grad_fn(params, batch_stats, batch, rng) -> grads of the total loss at
    fixed params, train=False (the meta-accumulation contract — reference
    maml.py:196-234 runs its accumulate K.function at learning phase 0).
    Uses the fused Pallas kernel when eligible, autodiff otherwise."""
    loss_fn = make_loss_fn(model, cfg)
    fast = None
    if cfg.fused_kernel:
        from mamdr_tpu.ops.fused_mlp_step import maybe_make_fast_loss_grad

        fast = maybe_make_fast_loss_grad(model, cfg)

    def grad_fn(params, batch_stats, batch, rng):
        if fast is not None:
            _, grads = fast(params, batch, rng, train=False)
            return grads
        _, grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, batch, rng, False
        )
        return grads

    return grad_fn


def build_train_fns(model, tx: optax.GradientTransformation, cfg: StepConfig) -> TrainFns:
    train_step, loss_fn = make_train_step(model, tx, cfg)
    accum_grad_fn = make_accum_grad_fn(model, cfg)

    @jax.jit
    def train_epoch(state: TrainState, stacked):
        """stacked: dict of [n_steps, B] arrays. One jit, one scan."""
        new_state, losses = jax.lax.scan(train_step, state, stacked)
        return new_state, jnp.mean(losses)

    @jax.jit
    def eval_epoch(params, batch_stats, stacked):
        """Streaming per-domain eval: scan accumulating loss + AUC confusion counts."""

        def step(carry, batch):
            auc_state, loss_sum, w_sum = carry
            loss, (_, probs, data_loss) = loss_fn(
                params, batch_stats, batch, jax.random.PRNGKey(0), False
            )
            w = jnp.sum(batch["weight"])
            auc_state = auc_update(
                auc_state, batch["label"], probs, batch["weight"], cfg.num_thresholds
            )
            # Keras evaluate averages per-batch losses over steps; padded final
            # batch uses the weighted mean so parity holds.
            return (auc_state, loss_sum + loss, w_sum + 1.0), None

        init = (auc_init(cfg.num_thresholds), jnp.zeros(()), jnp.zeros(()))
        (auc_state, loss_sum, n_batches), _ = jax.lax.scan(step, init, stacked)
        return loss_sum / jnp.maximum(n_batches, 1.0), auc_result(auc_state)

    @jax.jit
    def grad_epoch(params, batch_stats, stacked, rng, acc):
        """Accumulate grads of the loss over all batches into ``acc``
        (MAML/MLDG support/query passes — reference maml.py:196-234
        accumulator variables, which persist across calls until cleared —
        hence acc is threaded in/out).

        Grads are evaluated with train=False: the reference accumulates via a
        K.function at learning phase 0, so dropout is inactive during
        meta-grad computation.
        """

        def step(carry, batch):
            acc, i = carry
            step_rng = jax.random.fold_in(rng, i)
            grads = accum_grad_fn(params, batch_stats, batch, step_rng)
            if cfg.meta_accumulate == "ema":
                acc = jax.tree_util.tree_map(
                    lambda a, g: a * 0.999 + g * 0.001, acc, grads
                )
            elif cfg.meta_accumulate == "drop":
                def drop_leaf(path_g):
                    g, r = path_g
                    if g.ndim == 1:
                        keep = jax.random.bernoulli(r, 0.8, g.shape)
                        return jnp.where(keep, g / 0.8, 0.0)
                    return g
                leaves, treedef = jax.tree_util.tree_flatten(grads)
                rngs = jax.random.split(step_rng, len(leaves))
                dropped = [drop_leaf((g, r)) for g, r in zip(leaves, rngs)]
                grads = jax.tree_util.tree_unflatten(treedef, dropped)
                acc = trees.tree_add(acc, grads)
            else:
                acc = trees.tree_add(acc, grads)
            return (acc, i + 1), None

        (acc, n), _ = jax.lax.scan(step, (acc, jnp.zeros((), jnp.int32)), stacked)
        return acc, n

    @jax.jit
    def apply_grads(params, opt_state, grads):
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    return TrainFns(
        train_epoch=train_epoch,
        eval_epoch=eval_epoch,
        grad_epoch=grad_epoch,
        init_opt=jax.jit(tx.init),
        apply_grads=apply_grads,
    )


def make_optimizer(
    name: str,
    learning_rate: float,
    params,
    emb_trainable: bool = True,
    flat: bool = False,
) -> optax.GradientTransformation:
    """Inner optimizer factory (TF1 AdamOptimizer defaults: b1=.9 b2=.999 eps=1e-8).

    When ``emb_trainable`` is false, user/item tables (incl. the dim-1 linear
    tables, matching deepctr's trainable flag propagation) get zero updates —
    the functional equivalent of Keras ``trainable=False``.

    flat=True (adam only) uses the flat-vector Adam (train/flat_optimizer.py)
    — bit-exact, one fused update kernel instead of one per leaf.
    """

    def frozen(name_: str, x) -> bool:
        return (not emb_trainable) and ("user_emb" in name_ or "item_emb" in name_)

    frozen_mask = trees.named_tree_map(frozen, params)
    trainable_mask = jax.tree_util.tree_map(lambda b: not b, frozen_mask)

    if name == "adam":
        if flat:
            from mamdr_tpu.train.flat_optimizer import flat_adam

            return flat_adam(learning_rate, trainable_mask)
        base = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    elif name == "sgd":
        base = optax.sgd(learning_rate)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if emb_trainable:
        return base
    # Frozen tables: zero updates AND no optimizer slots — masked(adam) keeps
    # moments only for trainable leaves, so a frozen 100k x 128 Taobao table
    # costs zero HBM traffic per step (its dead grad/update work is DCE'd
    # inside the jitted train step).
    return optax.chain(
        optax.masked(optax.set_to_zero(), frozen_mask),
        optax.masked(base, trainable_mask),
    )
