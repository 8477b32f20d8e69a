"""Probe: vmapped lanes over a row-sharded TRAINABLE table.

The r2-r4 gate kept parallel-lanes DR and row-sharded trainable tables
mutually exclusive ("lane-stacked sharded tables' scatter-add updates are
unexercised"). This probe exercises exactly that composition in isolation:

  - table [rows, D] row-sharded P(table, None) on a (data, table) mesh
  - L lanes each holding their own table copy -> stacked [L, rows, D]
  - each lane does lookup + loss + grad + SGD update on ITS copy
  - compare against a plain single-device python loop over lanes

If the vmap batching rule for shard_map handles the batched table operand
(forward gather + transpose scatter-add), the numbers must match bitwise-ish.
"""

import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mamdr_tpu.parallel.embedding_shard import sharded_lookup
from mamdr_tpu.parallel.mesh import DATA_AXIS, TABLE_AXIS, make_mesh

ROWS, D, B, L = 64, 8, 16, 4

mesh = make_mesh(jax.devices()[:8], table_parallelism=2)  # data=4, table=2
print("mesh", mesh.shape)

rng = np.random.default_rng(0)
tables = jnp.asarray(rng.normal(size=(L, ROWS, D)).astype(np.float32))
ids = jnp.asarray(rng.integers(0, ROWS, size=(L, B)).astype(np.int32))
targets = jnp.asarray(rng.normal(size=(L, B)).astype(np.float32))


def lane_loss(table, ids_l, tgt):
    emb = sharded_lookup(mesh, table, ids_l)
    pred = emb.sum(axis=1)
    return jnp.mean((pred - tgt) ** 2)


def lane_update(table, ids_l, tgt):
    loss, g = jax.value_and_grad(lane_loss)(table, ids_l, tgt)
    return loss, table - 0.1 * g


# --- reference: python loop, no mesh in the table (plain take) ---
def ref_lane_loss(table, ids_l, tgt):
    emb = jnp.take(table, ids_l, axis=0)
    pred = emb.sum(axis=1)
    return jnp.mean((pred - tgt) ** 2)


ref_losses, ref_tables = [], []
for l in range(L):
    loss, g = jax.value_and_grad(ref_lane_loss)(tables[l], ids[l], targets[l])
    ref_losses.append(np.asarray(loss))
    ref_tables.append(np.asarray(tables[l] - 0.1 * g))

# --- vmapped lanes over the shard_mapped lookup, batched table operand ---
print("plain vmap over batched-table shard_map:")
try:
    vm = jax.jit(jax.vmap(lane_update))
    losses, new_tables = vm(tables, ids, targets)
    losses.block_until_ready()
    print("  ran ok; loss match:",
          np.allclose(np.asarray(losses), np.asarray(ref_losses), rtol=1e-5))
    print("  table match:",
          np.allclose(np.asarray(new_tables), np.stack(ref_tables), rtol=1e-5, atol=1e-6))
except Exception as e:
    print("  FAILED:", type(e).__name__, str(e)[:500])

# --- with the lane axis constrained to the data axis ---
print("lane axis constrained to P(data):")
try:
    lane_tab_sharding = NamedSharding(mesh, P(DATA_AXIS, TABLE_AXIS, None))
    lane_vec_sharding = NamedSharding(mesh, P(DATA_AXIS))

    @jax.jit
    def vm2(tables, ids, targets):
        tables = jax.lax.with_sharding_constraint(tables, lane_tab_sharding)
        ids = jax.lax.with_sharding_constraint(
            ids, NamedSharding(mesh, P(DATA_AXIS, None)))
        return jax.vmap(lane_update)(tables, ids, targets)

    losses2, new_tables2 = vm2(tables, ids, targets)
    losses2.block_until_ready()
    print("  ran ok; loss match:",
          np.allclose(np.asarray(losses2), np.asarray(ref_losses), rtol=1e-5))
    print("  table match:",
          np.allclose(np.asarray(new_tables2), np.stack(ref_tables), rtol=1e-5, atol=1e-6))
    print("  out table sharding:", new_tables2.sharding)
except Exception as e:
    print("  FAILED:", type(e).__name__, str(e)[:500])

# --- spmd_axis_name: native lane sharding through the batching rule ---
print("vmap(spmd_axis_name=data):")
try:
    vm3 = jax.jit(jax.vmap(lane_update, spmd_axis_name=DATA_AXIS))
    losses3, new_tables3 = vm3(tables, ids, targets)
    losses3.block_until_ready()
    print("  ran ok; loss match:",
          np.allclose(np.asarray(losses3), np.asarray(ref_losses), rtol=1e-5))
    print("  table match:",
          np.allclose(np.asarray(new_tables3), np.stack(ref_tables), rtol=1e-5, atol=1e-6))
    print("  out table sharding:", new_tables3.sharding)
except Exception as e:
    print("  FAILED:", type(e).__name__, str(e)[:500])
