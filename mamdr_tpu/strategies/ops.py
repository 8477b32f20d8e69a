"""On-device weight-space algebra for the strategy control plane.

Every reference strategy is a weight-space program executed in host numpy via
SetVarOp round-trips (reference utils/tool.py:16-45, maml.py:181-194,
reptile.py:127-142, specific_base_model.py:164-172, mamdr.py:168-196) — the
#1 perf sin to eliminate on TPU (SURVEY §3.2 note). Here each op is a pure
pytree map; meta/shared/specific weight sets never leave HBM.

Masks select the strategy's meta parameters (utils.trees.meta_parm_mask).
Mask leaves are python bools and MUST stay static: these functions are plain
(unjitted) so strategies wrap them in jit closures over a fixed mask, e.g.
``jax.jit(lambda p, s: load_masked(p, s, mask))`` — one compile per strategy,
zero cost for non-meta leaves.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

Pytree = Any


def _masked(fn):
    """Lift a leaf-op to a masked tree-op: apply fn on masked leaves, keep
    the first argument's leaf otherwise."""

    def tree_op(mask, a, *rest):
        return jax.tree_util.tree_map(
            lambda m, x, *r: fn(x, *r) if m else x, mask, a, *rest
        )

    return tree_op


def load_masked(params: Pytree, source: Pytree, mask: Pytree) -> Pytree:
    """SetVarOp equivalent: replace masked leaves of params with source's."""
    return jax.tree_util.tree_map(
        lambda m, p, s: s if m else p, mask, params, source
    )


def reptile_update(meta: Pytree, adapted: Pytree, lr, mask: Pytree) -> Pytree:
    """meta += (adapted - meta) * lr on masked leaves
    (reference reptile.py:127-132, domain_negotiation.py:118-123)."""
    return _masked(lambda m_, a_: m_ + (a_ - m_) * lr)(mask, meta, adapted)


def delta_accumulate(acc: Pytree, adapted: Pytree, base: Pytree, mask: Pytree) -> Pytree:
    """acc += adapted - base on masked leaves (reptile batch variant,
    reference reptile.py:134-138)."""
    return _masked(lambda acc_, a_, b_: acc_ + (a_ - b_))(mask, acc, adapted, base)


def scaled_add(target: Pytree, delta: Pytree, scale, mask: Pytree) -> Pytree:
    """target += delta * scale on masked leaves (reptile.py:140-142)."""
    return _masked(lambda t_, d_: t_ + d_ * scale)(mask, target, delta)


def merge_weights(shared: Pytree, specific: Pytree, mask: Pytree, method: str = "plus") -> Pytree:
    """Merged = shared + specific (plus) or shared * specific (times) on
    masked leaves; unmasked leaves carry shared's values
    (reference specific_base_model.py:164-172)."""
    if method == "plus":
        return _masked(lambda s_, p_: s_ + p_)(mask, shared, specific)
    if method == "times":
        return _masked(lambda s_, p_: s_ * p_)(mask, shared, specific)
    raise ValueError(f"unknown merged_method {method!r}")


def specific_from_adapted(adapted: Pytree, merged: Pytree, specific: Pytree, mask: Pytree) -> Pytree:
    """specific = adapted - merged on masked leaves (MAMDR
    finetune_every_epoch update, reference mamdr.py:168-171); unmasked leaves
    keep the old specific values."""
    return jax.tree_util.tree_map(
        lambda m, sp, a, mg: (a - mg) if m else sp, mask, specific, adapted, merged
    )


def dr_accumulate(
    acc: Pytree, adapted: Pytree, merged: Pytree, shared: Pytree, mask: Pytree,
    method: str = "plus",
) -> Pytree:
    """MAMDR batch-variant accumulation (reference mamdr.py:182-190):
    plus:  acc += adapted - merged
    times: acc += (adapted - merged) * shared
    """
    if method == "plus":
        return _masked(lambda acc_, a_, mg_: acc_ + (a_ - mg_))(mask, acc, adapted, merged)
    if method == "times":
        return _masked(lambda acc_, a_, mg_, sh_: acc_ + (a_ - mg_) * sh_)(
            mask, acc, adapted, merged, shared
        )
    raise ValueError(f"unknown merged_method {method!r}")


def tree_where_mask_zero(tree: Pytree, mask: Pytree) -> Pytree:
    """Zero out non-masked leaves (restrict grads to the meta subset)."""
    return jax.tree_util.tree_map(
        lambda m, x: x if m else jnp.zeros_like(x), mask, tree
    )


def ema_accumulate(acc: Pytree, g: Pytree, mask: Pytree, momentum: float = 0.999) -> Pytree:
    """acc = momentum*acc + (1-momentum)*g (average_meta_grad="moving_mean",
    reference maml.py:219-221: K.moving_average_update(ag, g, 0.999))."""
    return _masked(lambda acc_, g_: acc_ * momentum + g_ * (1.0 - momentum))(mask, acc, g)


def pcgrad_project(
    query_grads: Pytree,
    aux_grads: Pytree,
    mode: str = "reference",
) -> Pytree:
    """Project aux grads against query grads, rowwise over the last axis.

    mode="reference" reproduces the reference's exact deviation from the
    published PCGrad (reference pcgrad.py:152-160): project when dot > 0
    (paper: dot < 0) and normalise by ||g_q|| (paper: ||g_q||^2).
    mode="paper" implements the published rule.
    Returns the projected aux grads.
    """

    def leaf(gq, ga):
        dot = jnp.sum(gq * ga, axis=-1, keepdims=True)
        if mode == "reference":
            norm = jnp.sqrt(jnp.sum(gq * gq, axis=-1, keepdims=True))
            coef = jnp.where(norm > 0.0, dot / jnp.maximum(norm, 1e-30), 0.0)
            project = dot > 0.0
        elif mode == "paper":
            norm2 = jnp.sum(gq * gq, axis=-1, keepdims=True)
            coef = jnp.where(norm2 > 0.0, dot / jnp.maximum(norm2, 1e-30), 0.0)
            project = dot < 0.0
        else:
            raise ValueError(f"unknown pcgrad mode {mode!r}")
        return jnp.where(project, ga - coef * gq, ga)

    return jax.tree_util.tree_map(leaf, query_grads, aux_grads)


def tree_add_trees(a: Pytree, b: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.add, a, b)
