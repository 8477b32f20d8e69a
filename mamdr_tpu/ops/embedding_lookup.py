"""Embedding lookup: the framework's single hottest memory op.

The reference reaches TF's fused embedding-lookup kernels through Keras
Embedding layers (reference model_zoo/DeepCTR/deepctr.py:104-116). Here the
single-device path is `jnp.take`, which XLA lowers to a dynamic-gather that is
already HBM-bandwidth-bound — the right baseline. The multi-device path
(row-sharded tables + collectives) lives in `mamdr_tpu.parallel.embedding_shard`.

A Pallas double-buffered gather kernel is available for very large tables
where XLA's generic gather leaves bandwidth on the table
(`pallas_gather_rows`); it DMAs rows HBM->VMEM keyed by scalar-prefetched
indices.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Mesh context for model-integrated sharded lookups. When set (Trainer with a
# mesh, or set_lookup_mesh directly), tables big enough and divisible by the
# table axis route through the shard_map masked-gather+psum path
# (parallel/embedding_shard.py); everything else stays a plain gather. Must
# be set BEFORE the train/eval jits trace.
_LOOKUP_MESH: dict = {"mesh": None, "min_rows": 16384}


def set_lookup_mesh(mesh, min_rows: int = 16384) -> None:
    """Route future embedding lookups of large tables through the row-sharded
    path on `mesh`. Pass mesh=None to restore single-device lookups."""
    _LOOKUP_MESH["mesh"] = mesh
    _LOOKUP_MESH["min_rows"] = min_rows


def embedding_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Gather rows: table [N, D], ids [B] -> [B, D].

    mode="clip" matches TF's behavior of clamping out-of-range ids rather than
    producing garbage; in-range ids are the data layer's contract.
    """
    mesh = _LOOKUP_MESH["mesh"]
    if mesh is not None and table.ndim == 2:
        from mamdr_tpu.parallel.mesh import TABLE_AXIS

        tshards = mesh.shape[TABLE_AXIS]
        if table.shape[0] >= _LOOKUP_MESH["min_rows"] and table.shape[0] % tshards == 0:
            from mamdr_tpu.parallel.embedding_shard import sharded_lookup

            return sharded_lookup(mesh, table, ids)
    return jnp.take(table, ids, axis=0, indices_are_sorted=False, unique_indices=False, mode="clip")


def pallas_gather_rows(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Pallas HBM->VMEM row gather with scalar-prefetched indices.

    Keeps the table in HBM and DMAs exactly the requested rows into the output
    block, one grid step per row tile. Useful when D is large and XLA's
    generic gather under-utilises HBM bandwidth. Requires D % 128 == 0.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = table.shape
    b = ids.shape[0]
    tile = 8  # rows per grid step; 8 sublanes of f32

    pad_b = -(-b // tile) * tile
    ids_padded = jnp.pad(ids, (0, pad_b - b))

    def kernel(ids_ref, table_ref, out_ref, sem):
        i = pl.program_id(0)
        for r in range(tile):
            row_id = ids_ref[i * tile + r]
            cp = pltpu.make_async_copy(
                table_ref.at[row_id], out_ref.at[r], sem.at[r]
            )
            cp.start()
        for r in range(tile):
            pltpu.make_async_copy(
                table_ref.at[ids_ref[i * tile + r]], out_ref.at[r], sem.at[r]
            ).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pad_b // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (tile, d), lambda i, ids_ref=None: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((tile,))],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pad_b, d), table.dtype),
    )(ids_padded, table)
    return out[:b]


def pallas_gather_rows_pipelined(
    table: jax.Array, ids: jax.Array, k: int = 32, interpret: bool = False
) -> jax.Array:
    """Row gather as a ring of `k` outstanding HBM->VMEM DMAs.

    Unlike `pallas_gather_rows` (8 DMAs in flight, one output tile per grid
    step), this keeps the whole [B, D] output VMEM-resident in a single grid
    step and pipelines the row DMAs `k` deep: wait(i) immediately re-issues
    start(i+k) on the freed semaphore slot. Probes whether XLA's ~120ns/row
    dynamic-gather wall is DMA-issue cost (this should match it) or gather-op
    overhead (this should beat it).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d = table.shape
    b = ids.shape[0]
    k = min(k, b)

    def kernel(ids_ref, table_ref, out_ref, sems):
        def copy(i, slot):
            return pltpu.make_async_copy(
                table_ref.at[ids_ref[i]], out_ref.at[i], sems.at[slot]
            )

        for j in range(k):
            copy(j, j).start()

        def body(i, carry):
            slot = jax.lax.rem(i, k)
            copy(i, slot).wait()
            copy(i + k, slot).start()
            return carry

        jax.lax.fori_loop(0, b - k, body, 0)
        for j in range(b - k, b):
            copy(j, j % k).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((b, d), lambda i, ids_ref=None: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((k,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, d), table.dtype),
        interpret=interpret,
    )(ids, table)
