"""Worker for the 2-process jax.distributed CPU test (not pytest-collected).

Each process owns 4 virtual CPU devices (8 global). Exercises the real
multi-host stack the framework ships: jax.distributed.initialize, a global
(data, table) mesh spanning both processes, per-process data loading through
parallel.data_feed, the row-sharded shard_map embedding lookup with its
cross-process psum, and one sharded train step — the CPU stand-in for a
multi-host TPU pod (SURVEY §4's recommended simulation).

Usage: python tests/_distributed_worker.py <coordinator> <n_proc> <proc_id>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass  # older/newer flag name; the default may already support it

import numpy as np  # noqa: E402


def main():
    coordinator, n_proc, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=n_proc,
        process_id=proc_id,
    )
    assert jax.process_count() == n_proc
    assert len(jax.devices()) == 4 * n_proc, jax.devices()
    assert len(jax.local_devices()) == 4

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mamdr_tpu.parallel.data_feed import process_local_rows, shard_host_batch
    from mamdr_tpu.parallel.embedding_shard import sharded_lookup
    from mamdr_tpu.parallel.mesh import DATA_AXIS, TABLE_AXIS, make_mesh

    mesh = make_mesh(jax.devices(), table_parallelism=2)
    assert mesh.shape[DATA_AXIS] == 4 * n_proc // 2

    # --- per-process data loading -> one global sharded batch ---
    n_global = 64
    rows = process_local_rows(n_global)
    full_uid = np.arange(n_global, dtype=np.int32)
    full_w = np.linspace(0, 1, n_global).astype(np.float32)
    batch = shard_host_batch(
        mesh, {"uid": full_uid[rows], "w": full_w[rows]}
    )
    assert batch["uid"].shape == (n_global,)

    # global reduction across both processes' shards
    total = float(jax.jit(lambda x: x.sum())(batch["w"]))
    assert abs(total - float(full_w.sum())) < 1e-4, (total, full_w.sum())

    # --- row-sharded lookup: shard_map psum over a table spanning processes ---
    n_rows, dim = 32, 8
    table_host = np.random.default_rng(0).normal(size=(n_rows, dim)).astype(np.float32)
    table = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(TABLE_AXIS, None)), table_host
    )
    got = jax.jit(lambda t, i: sharded_lookup(mesh, t, i))(
        table, jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(DATA_AXIS)),
            (full_uid % n_rows)[rows],
        )
    )
    want = table_host[full_uid % n_rows]
    # each process only holds its addressable shards; check them
    for shard in got.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), want[shard.index], rtol=1e-6
        )

    # --- one real sharded train step across processes ---
    from mamdr_tpu.parallel.sharded_train import make_sharded_train_step

    step, state, example = make_sharded_train_step(
        mesh, n_uid=64, n_pid=64, n_domain=2, batch=32, hidden=(16, 8), dim=8
    )
    state, loss = step(state, example)
    assert np.isfinite(float(loss))

    print(f"OK process {proc_id}", flush=True)


if __name__ == "__main__":
    main()
