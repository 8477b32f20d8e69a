"""Sharding the real framework training step over a (data, table) mesh.

Takes the same `make_train_step` the single-chip strategies use (full flax
model zoo, optax chain, weighted BCE + l2 + uncertainty) and jits it with
NamedShardings: batch P(data), user/item embedding tables P(table, None)
(rows padded to the table-axis size by the model builder caller), everything
else replicated — gradients of replicated params get psum'ed by the SPMD
partitioner automatically.

This is the multi-chip growth path of the actual Trainer; the standalone
`sharded_train.py` keeps the hand-optimised shard_map lookup for very large
tables (where XLA's chosen gather strategy may all-gather the table).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mamdr_tpu.parallel.mesh import DATA_AXIS, TABLE_AXIS
from mamdr_tpu.utils import trees


def param_sharding_specs(params, mesh, shard_experts: bool = False) -> Dict:
    """Row-shard big embedding tables; replicate the rest.

    With ``shard_experts``, MMoE/PLE expert-bank leaves additionally shard
    their leading expert axis over the table (model) axis — expert
    parallelism. The expert einsum (``ebi,eio->ebo``, models/mtl.py) then
    runs each device's expert slice locally and XLA SPMD inserts one psum at
    the gate-mixing contraction (``tbe,ebd->tbd``). Gates, towers and
    non-divisible banks (e.g. PLE's single shared expert) stay replicated.
    Reference experts: model_zoo/DeepMTLCTR/deep_mtl_ctr.py:31-48
    (single-GPU, replicated).
    """
    tshards = mesh.shape[TABLE_AXIS]
    _EXPERT = ("expert_kernel", "expert_bias")

    def spec(name: str, x):
        if (
            ("user_emb" in name or "item_emb" in name)
            and getattr(x, "ndim", 0) == 2
            and x.shape[0] % tshards == 0
        ):
            return NamedSharding(mesh, P(TABLE_AXIS, None))
        if (
            shard_experts
            and any(k in name for k in _EXPERT)
            and getattr(x, "ndim", 0) >= 2
            and x.shape[0] % tshards == 0
        ):
            # [E, ...] (MMoE bank) or [T, t, ...] (PLE task experts): shard
            # the leading bank axis
            return NamedSharding(
                mesh, P(TABLE_AXIS, *([None] * (x.ndim - 1)))
            )
        return NamedSharding(mesh, P())

    return trees.named_tree_map(spec, params)


def shard_train_state(state, mesh, shard_experts: bool = False):
    """Distribute a TrainState: params/opt by rule, scalars replicated."""
    p_sh = param_sharding_specs(state.params, mesh, shard_experts=shard_experts)
    params = jax.device_put(state.params, p_sh)
    repl = NamedSharding(mesh, P())
    # optimizer slots follow their params via jit propagation
    opt_state = state.opt_state
    batch_stats = jax.device_put(state.batch_stats, repl) if state.batch_stats else {}
    return state.replace(
        params=params,
        opt_state=opt_state,
        batch_stats=batch_stats,
        rng=jax.device_put(state.rng, repl),
        step=jax.device_put(state.step, repl),
    )


def make_sharded_full_step(mesh, trainer):
    """jit the trainer's real train_step over the mesh.

    Returns (step, sharded_state, batch_sharding). The caller feeds batches
    sharded P(data) on the leading axis.
    """
    from mamdr_tpu.train.steps import make_train_step

    step_fn, _ = make_train_step(trainer.model, trainer.tx, trainer.step_cfg)
    state = shard_train_state(
        trainer.state, mesh,
        shard_experts=getattr(trainer.config.train, "shard_experts", False),
    )
    # re-init optimizer under jit so slots inherit the param shardings
    state = state.replace(opt_state=jax.jit(trainer.tx.init)(state.params))
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    step = jax.jit(step_fn, donate_argnums=())
    return step, state, batch_sharding


def make_sharded_batch(mesh, n_uid, n_pid, n_domain, batch, domain_id=0):
    rng = np.random.default_rng(0)
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return {
        "uid": jax.device_put(rng.integers(0, n_uid, batch).astype(np.int32), sh),
        "pid": jax.device_put(rng.integers(0, n_pid, batch).astype(np.int32), sh),
        "domain": jax.device_put(np.full(batch, domain_id, np.int32), sh),
        "label": jax.device_put(rng.integers(0, 2, batch).astype(np.float32), sh),
        "weight": jax.device_put(np.ones(batch, np.float32), sh),
    }
