"""Device mesh construction: (data, table) axes.

The reference is single-device (SURVEY §2.3); the scale-out design from
BASELINE.json is a 2-axis mesh — batch data-parallel over ``data``, embedding
tables row-sharded over ``table``. Dense towers are replicated (they're tiny);
the only tensors worth sharding are the uid/pid tables.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
TABLE_AXIS = "table"


def make_mesh(
    devices: Optional[Sequence] = None,
    table_parallelism: Optional[int] = None,
) -> Mesh:
    """Factor devices into a (data, table) mesh.

    Default table axis: the largest power-of-two divisor of n_devices capped
    at 4 — embedding gather traffic grows with the table axis, so most chips
    go to data parallelism.
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    n = len(devices)
    if table_parallelism is None:
        table_parallelism = 1
        while table_parallelism < 4 and n % (table_parallelism * 2) == 0:
            table_parallelism *= 2
    if n % table_parallelism != 0:
        raise ValueError(f"{n} devices not divisible by table={table_parallelism}")
    arr = np.array(devices).reshape(n // table_parallelism, table_parallelism)
    return Mesh(arr, (DATA_AXIS, TABLE_AXIS))
