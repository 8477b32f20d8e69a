"""Flat-vector Adam: one fused optimizer update instead of one per leaf.

optax applies Adam leaf-by-leaf (~20 small kernels per step at CTR model
sizes, where per-op overhead rivals the math). This transform ravels every
TRAINABLE leaf into a single vector once per step, runs Adam's five
elementwise ops on that vector, and slices the updates back — bit-exact to
optax.adam (Adam is elementwise, so packing order cannot change any value)
while giving XLA one fat VPU kernel to fuse.

Frozen leaves (mask False) receive zero updates and carry no slot state,
preserving make_optimizer's frozen-table contract.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

Pytree = Any


class FlatAdamState(NamedTuple):
    count: jax.Array  # int32 scalar
    mu: jax.Array     # [n] flat first moment
    nu: jax.Array     # [n] flat second moment


def flat_adam(
    learning_rate: float,
    trainable_mask: Pytree,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam over the flattened trainable subset (mask leaves: python bools)."""

    def ravel(tree):
        leaves = [
            jnp.ravel(x)
            for m, x in zip(
                jax.tree_util.tree_leaves(trainable_mask),
                jax.tree_util.tree_leaves(tree),
            )
            if m
        ]
        return jnp.concatenate(leaves) if leaves else jnp.zeros((0,))

    def init(params):
        n = int(sum(
            x.size
            for m, x in zip(
                jax.tree_util.tree_leaves(trainable_mask),
                jax.tree_util.tree_leaves(params),
            )
            if m
        ))
        return FlatAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros((n,), jnp.float32),
            nu=jnp.zeros((n,), jnp.float32),
        )

    def update(grads, state, params=None):
        g = ravel(grads)
        count = state.count + 1
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** c)
        nu_hat = nu / (1.0 - b2 ** c)
        step = -learning_rate * mu_hat / (jnp.sqrt(nu_hat) + eps)

        # slice the flat update back into the tree
        flat_leaves = jax.tree_util.tree_leaves(grads)
        mask_leaves = jax.tree_util.tree_leaves(trainable_mask)
        treedef = jax.tree_util.tree_structure(grads)
        out = []
        offset = 0
        for m, leaf in zip(mask_leaves, flat_leaves):
            if m:
                out.append(
                    step[offset : offset + leaf.size].reshape(leaf.shape).astype(leaf.dtype)
                )
                offset += leaf.size
            else:
                out.append(jnp.zeros_like(leaf))
        updates = jax.tree_util.tree_unflatten(treedef, out)
        return updates, FlatAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)
