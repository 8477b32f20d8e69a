"""Row-sharded embedding lookup over the (data, table) mesh.

Each device holds a contiguous row range of the table (``P(table, None)``)
and a slice of the batch (``P(data)``). Lookup = local masked gather + psum
over the table axis: a device contributes a row only if the id falls in its
range, zeros otherwise — so the collective is one psum of [B_local, D] over
ICI, never an all-gather of the table (the thing XLA's generic gather
sharding can fall back to, ruinous for production-size uid tables).

The backward pass falls out of autodiff: the transpose of (masked gather +
psum) is a masked scatter-add into the local shard — exactly the sparse
update we want.

Reference equivalent: none (single-GPU Keras Embedding, SURVEY §2.3); this is
the TPU-native design BASELINE.json's north star specifies.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from mamdr_tpu.parallel.mesh import DATA_AXIS, TABLE_AXIS


def _local_lookup(table_shard: jax.Array, ids: jax.Array, axis_name: str) -> jax.Array:
    """Inside shard_map: [rows_local, D], [B_local] -> [B_local, D]."""
    rows_local = table_shard.shape[0]
    shard = jax.lax.axis_index(axis_name)
    local = ids - shard * rows_local
    in_range = (local >= 0) & (local < rows_local)
    safe = jnp.clip(local, 0, rows_local - 1)
    gathered = jnp.take(table_shard, safe, axis=0)
    contrib = jnp.where(in_range[:, None], gathered, 0.0)
    return jax.lax.psum(contrib, axis_name)


def sharded_lookup(mesh, table: jax.Array, ids: jax.Array) -> jax.Array:
    """table sharded P(table, None), ids sharded P(data) -> out P(data, None).

    Requires table rows divisible by the table-axis size (pad tables up).
    """
    fn = jax.shard_map(
        partial(_local_lookup, axis_name=TABLE_AXIS),
        mesh=mesh,
        in_specs=(P(TABLE_AXIS, None), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS, None),
    )
    return fn(table, ids)


def pad_rows(n_rows: int, table_parallelism: int) -> int:
    """Rows after padding to a multiple of the table-axis size."""
    return -(-n_rows // table_parallelism) * table_parallelism
