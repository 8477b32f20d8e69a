"""Functional train state: the entire mutable world of a run, as one pytree.

Replaces the reference's TF1 session state (variables + optimizer slots +
metric accumulators + RNG) with an explicit struct. Reference subtlety kept
(SURVEY §7.1.3): strategies that swap weights in and out (SetVarOp) do NOT
reset optimizer slots — so ``opt_state`` survives param swaps unless a
strategy explicitly re-initialises it (mirroring Keras recompiles).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


class TrainState(flax.struct.PyTreeNode):
    params: Any             # {'model': flax params[, 'uncertainty': {'log_vars'}]}
    opt_state: Any
    batch_stats: Any        # flax mutable collections (PartitionedNorm / BN) or {}
    rng: jax.Array          # PRNG key folded per step for dropout
    step: jax.Array         # int32 global step

    @classmethod
    def create(cls, params, opt_state, batch_stats, rng):
        return cls(
            params=params,
            opt_state=opt_state,
            batch_stats=batch_stats,
            rng=rng,
            step=jnp.zeros((), jnp.int32),
        )
