"""Multi-device sharding tests on the virtual 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mamdr_tpu.parallel.embedding_shard import pad_rows, sharded_lookup
from mamdr_tpu.parallel.mesh import DATA_AXIS, TABLE_AXIS, make_mesh
from mamdr_tpu.parallel.sharded_train import make_sharded_train_step


def test_mesh_factorization():
    mesh = make_mesh(jax.devices()[:8])
    assert mesh.shape[TABLE_AXIS] == 4 and mesh.shape[DATA_AXIS] == 2
    mesh2 = make_mesh(jax.devices()[:8], table_parallelism=2)
    assert mesh2.shape[TABLE_AXIS] == 2 and mesh2.shape[DATA_AXIS] == 4


def test_sharded_lookup_matches_dense():
    mesh = make_mesh(jax.devices()[:8], table_parallelism=4)
    n_rows = pad_rows(100, 4)
    table = jnp.asarray(np.random.default_rng(0).normal(size=(n_rows, 16)), jnp.float32)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 100, 64), jnp.int32)
    table_sh = jax.device_put(table, NamedSharding(mesh, P(TABLE_AXIS, None)))
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P(DATA_AXIS)))
    got = jax.jit(lambda t, i: sharded_lookup(mesh, t, i))(table_sh, ids_sh)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_sharded_lookup_grad_is_scatter_add():
    mesh = make_mesh(jax.devices()[:8], table_parallelism=4)
    n_rows = pad_rows(32, 4)
    table = jnp.ones((n_rows, 8), jnp.float32)
    ids = jnp.asarray([0, 0, 5, 31], jnp.int32)
    table_sh = jax.device_put(table, NamedSharding(mesh, P(TABLE_AXIS, None)))
    ids_sh = jax.device_put(ids, NamedSharding(mesh, P(DATA_AXIS)))

    def loss(t):
        return jnp.sum(sharded_lookup(mesh, t, ids_sh))

    g = jax.jit(jax.grad(loss))(table_sh)
    g = np.asarray(g)
    # duplicate id 0 accumulates twice
    assert g[0, 0] == 2.0 and g[5, 0] == 1.0 and g[31, 0] == 1.0
    assert g.sum() == 4 * 8


def test_sharded_train_step_runs_and_learns():
    mesh = make_mesh(jax.devices()[:8])
    step, state, batch = make_sharded_train_step(
        mesh, n_uid=128, n_pid=128, n_domain=4, batch=64, hidden=(32, 16), dim=16,
        learning_rate=0.05,
    )
    losses = []
    for _ in range(30):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"sharded training not descending: {losses[:3]} -> {losses[-3:]}"


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_multihost_data_feed():
    """Process-local batch assembly into globally sharded arrays (single
    process degenerates to a sharded device_put — same code path as
    multi-host)."""
    from mamdr_tpu.parallel.data_feed import process_local_rows, shard_host_batch

    mesh = make_mesh(jax.devices()[:8], table_parallelism=1)
    rows = process_local_rows(64)
    assert rows == slice(0, 64)  # single process loads everything
    host_batch = {
        "uid": np.arange(64, dtype=np.int32),
        "label": np.ones(64, np.float32),
    }
    global_batch = shard_host_batch(mesh, host_batch)
    assert global_batch["uid"].shape == (64,)
    assert len(global_batch["uid"].sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(global_batch["uid"]), host_batch["uid"])
