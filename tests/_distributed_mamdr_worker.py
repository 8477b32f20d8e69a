"""Worker for the 2-process fused-MAMDR epoch test (not pytest-collected).

Runs the COMPLETE flagship path across processes: a global (data=4, table=2)
mesh spanning 2 processes x 4 virtual CPU devices, row-sharded FROZEN
user/item tables (shard_map lookups whose psum crosses the process
boundary), the fused DN phase, the lane-sharded parallel DR phase (query
domains distributed over the data axis, hence over processes), and the
merged per-domain eval — one full MAMDR epoch in 2 dispatches, multi-host
(VERDICT r2 item 4; SURVEY §5.8 build spec; reference mamdr.py:41-108
semantics).

Data note: every process loads the SAME synthetic dataset (seeded); the
fused block is replicated by design because DR's support-domain sampling
reads arbitrary domains from every lane — the sharded axes are the table
rows and the query-domain lanes, not the example rows. Per-process
EXAMPLE-sharded loading is exercised by _distributed_worker.py.

Prints the merged val AUC and parameter norms for the parent to compare
against a single-process run of the identical configuration.

Usage: python tests/_distributed_mamdr_worker.py <coordinator> <n_proc> <proc_id>
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
    pass

import numpy as np  # noqa: E402


def main():
    coordinator, n_proc, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    tmpdir = sys.argv[4]
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=n_proc,
        process_id=proc_id,
    )
    assert len(jax.devices()) == 4 * n_proc

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mamdr_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from tests._mamdr_epoch_common import run_fused_mamdr_epoch

    mesh = make_mesh(jax.devices(), table_parallelism=2)
    assert mesh.shape[DATA_AXIS] == 4 * n_proc // 2

    out = run_fused_mamdr_epoch(tmpdir, tag=f"p{proc_id}", mesh=mesh)
    print(
        f"OK process {proc_id} auc={out['auc']:.6f} "
        f"shared_norm={out['shared_norm']:.6f} spec_norm={out['spec_norm']:.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
