"""Pytree path utilities: name-filtered parameter masks and tree algebra.

The reference selects "meta parameters" by substring filters over TF variable
names (``meta_parms: all | all_hidden | [name, ...]``, reference
model_zoo/maml.py:153-179). Here parameters are nested-dict pytrees; the
equivalent is a boolean mask pytree keyed off '/'-joined paths.
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence

import jax
import jax.numpy as jnp

Pytree = Any


def path_str(path) -> str:
    """'/'-joined readable name for a jax tree path."""
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def named_tree_map(fn: Callable[[str, Any], Any], tree: Pytree) -> Pytree:
    """tree_map where fn also receives the '/'-joined leaf path."""
    return jax.tree_util.tree_map_with_path(lambda p, x: fn(path_str(p), x), tree)


def param_names(tree: Pytree) -> List[str]:
    names: List[str] = []
    jax.tree_util.tree_map_with_path(lambda p, x: names.append(path_str(p)), tree)
    return names


def meta_parm_mask(params: Pytree, meta_parms: Sequence[str]) -> Pytree:
    """Boolean mask pytree selecting the strategy's meta parameters.

    Semantics mirror reference maml.py:153-179:
      - ``["all"]``        -> every trainable parameter
      - ``["all_hidden"]`` -> every parameter whose path does NOT contain "emb"
      - explicit list      -> parameters whose path contains ANY listed substring;
                              raises if a listed name matches nothing.
    """
    meta_parms = list(meta_parms)
    if meta_parms == ["all"]:
        return jax.tree_util.tree_map(lambda x: True, params)
    if meta_parms == ["all_hidden"]:
        return named_tree_map(lambda name, x: "emb" not in name, params)

    matched = {m: False for m in meta_parms}

    def select(name: str, x) -> bool:
        hit = False
        for m in meta_parms:
            if m in name:
                matched[m] = True
                hit = True
        return hit

    mask = named_tree_map(select, params)
    missing = [m for m, ok in matched.items() if not ok]
    if missing:
        raise ValueError(
            f"meta_parms {missing} matched no parameter; available: "
            f"{param_names(params)}"
        )
    return mask


def where_mask(mask: Pytree, a: Pytree, b: Pytree) -> Pytree:
    """Per-leaf: a if mask else b. Mask leaves are python bools (static)."""
    return jax.tree_util.tree_map(lambda m, x, y: x if m else y, mask, a, b)


def tree_zeros_like(tree: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


def tree_add(a: Pytree, b: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.add, a, b)


def tree_sub(a: Pytree, b: Pytree) -> Pytree:
    return jax.tree_util.tree_map(jnp.subtract, a, b)


def tree_scale(a: Pytree, s) -> Pytree:
    return jax.tree_util.tree_map(lambda x: x * s, a)


def tree_dot(a: Pytree, b: Pytree):
    """Global inner product over all leaves (f32 accumulate)."""
    leaves = jax.tree_util.tree_map(
        lambda x, y: jnp.sum(x.astype(jnp.float32) * y.astype(jnp.float32)), a, b
    )
    return jax.tree_util.tree_reduce(jnp.add, leaves)
