"""Multi-chip training step: DP batch + row-sharded tables, one jit.

A self-contained sharded trainer for the flagship MLP CTR tower: embedding
tables laid out P(table, None), dense tower replicated, batch P(data).
Inside the jitted step, table lookups go through the shard_map psum-gather
(embedding_shard.py); everything else is ordinary JAX — the SPMD partitioner
inserts the psum for replicated-parameter gradients automatically.

Used by __graft_entry__.dryrun_multichip and the scale-out bench. The
single-chip Trainer path stays mesh-free; integration of the full strategy
control plane with this mesh is the multi-host growth path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from mamdr_tpu.parallel.embedding_shard import pad_rows, sharded_lookup
from mamdr_tpu.parallel.mesh import DATA_AXIS, TABLE_AXIS


class ShardedState(NamedTuple):
    params: dict
    opt_state: tuple


def _init_params(rng, n_uid, n_pid, n_domain, dim, hidden):
    k = jax.random.split(rng, 8)
    glorot = jax.nn.initializers.glorot_uniform()
    params = {
        "user_emb": jax.random.normal(k[0], (n_uid, dim)) * 1e-4,
        "item_emb": jax.random.normal(k[1], (n_pid, dim)) * 1e-4,
        "domain_emb": jax.random.normal(k[2], (n_domain, dim)) * 1e-4,
        "dense": [],
    }
    in_dim = 3 * dim
    for i, h in enumerate(hidden):
        params["dense"].append(
            {
                "kernel": glorot(k[3 + i % 4], (in_dim, h)),
                "bias": jnp.zeros((h,)),
            }
        )
        in_dim = h
    params["logit"] = {"kernel": glorot(k[7], (in_dim, 1))}
    return params


def _param_spec(params) -> dict:
    """Sharding specs: big tables row-sharded, everything else replicated."""

    def spec_for(path_leaf):
        return path_leaf

    specs = jax.tree_util.tree_map(lambda x: P(), params)
    specs["user_emb"] = P(TABLE_AXIS, None)
    specs["item_emb"] = P(TABLE_AXIS, None)
    # domain table is tiny -> replicated
    return specs


def make_sharded_train_step(
    mesh,
    n_uid: int,
    n_pid: int,
    n_domain: int,
    batch: int,
    hidden: Sequence[int] = (256, 128, 64),
    dim: int = 128,
    learning_rate: float = 1e-3,
):
    """Returns (jitted_step, sharded_state, sharded_example_batch)."""
    tshards = mesh.shape[TABLE_AXIS]
    n_uid_p = pad_rows(n_uid, tshards)
    n_pid_p = pad_rows(n_pid, tshards)

    params = _init_params(
        jax.random.PRNGKey(0), n_uid_p, n_pid_p, n_domain, dim, hidden
    )
    tx = optax.adam(learning_rate)

    param_specs = _param_spec(params)
    param_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), param_specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    params = jax.device_put(params, param_shardings)
    # Adam slots inherit the params' layout via jit sharding propagation —
    # mu/nu of a row-sharded table come out row-sharded, no hand-wiring.
    opt_state = jax.jit(tx.init)(params)
    state = ShardedState(params, opt_state)

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    rng = np.random.default_rng(0)
    example = {
        "uid": jax.device_put(
            rng.integers(0, n_uid, batch).astype(np.int32), batch_sharding
        ),
        "pid": jax.device_put(
            rng.integers(0, n_pid, batch).astype(np.int32), batch_sharding
        ),
        "domain": jax.device_put(
            np.zeros(batch, np.int32), batch_sharding
        ),
        "label": jax.device_put(
            rng.integers(0, 2, batch).astype(np.float32), batch_sharding
        ),
        "weight": jax.device_put(np.ones(batch, np.float32), batch_sharding),
    }

    def forward(params, batch):
        u = sharded_lookup(mesh, params["user_emb"], batch["uid"])
        p = sharded_lookup(mesh, params["item_emb"], batch["pid"])
        d = jnp.take(params["domain_emb"], batch["domain"], axis=0)
        x = jnp.concatenate([u, p, d], axis=-1)
        for layer in params["dense"]:
            x = jax.nn.relu(x @ layer["kernel"] + layer["bias"])
        return (x @ params["logit"]["kernel"])[..., 0]

    def loss_fn(params, batch):
        logits = forward(params, batch)
        bce = optax.sigmoid_binary_cross_entropy(logits, batch["label"])
        w = batch["weight"]
        return jnp.sum(bce * w) / jnp.maximum(jnp.sum(w), 1.0)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: ShardedState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return ShardedState(new_params, new_opt), loss

    return step, state, example
