"""Multi-host data feeding: process-local batches -> global sharded arrays.

Each host loads ITS OWN slice of the batch (per-process data loading — the
multi-host replacement for the reference's single-process tf.data readers,
SURVEY §2.3) and assembles the global array with
``jax.make_array_from_process_local_data``: no host ever materialises the
full global batch, and the per-device shards land directly on that host's
devices. Works identically in a single process (where it reduces to a
sharded device_put), which is how the CPU-mesh tests exercise it.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mamdr_tpu.parallel.mesh import DATA_AXIS


def batch_sharding(mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_host_batch(mesh, host_batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
    """host_batch: this process's rows of each column -> global [B] arrays
    sharded over the data axis."""
    sh = batch_sharding(mesh)
    return {
        k: jax.make_array_from_process_local_data(sh, np.asarray(v))
        for k, v in host_batch.items()
    }


def process_local_rows(n_global: int) -> slice:
    """The row range this process should load for a globally [n_global]-row
    batch (contiguous block partitioning by process index)."""
    pc, pi = jax.process_count(), jax.process_index()
    per = n_global // pc
    start = pi * per
    end = n_global if pi == pc - 1 else start + per
    return slice(start, end)
