"""Weak-scaling evidence on the virtual CPU mesh (VERDICT r3 item 7).

Runs the fused MAMDR epoch — lane-sharded parallel DR + row-sharded frozen
tables — on 1/2/4/8 virtual CPU devices and reports, per mesh size:

  * lanes (query domains) per data shard — the weak-scaling axis: the domain
    count grows with the data axis so per-device work stays constant;
  * per-device train-step counts (DN sequential steps are replicated SPMD
    work; DR lane steps divide over the data axis);
  * collective op counts from the POST-OPTIMIZATION compiled HLO of both
    phases (all-reduce / all-gather / reduce-scatter / collective-permute /
    all-to-all) — the real cost of distribution on ICI.

Real N-chip runs are impossible in this environment (one tunneled TPU chip);
the virtual CPU mesh validates the SPMD lowering shape — XLA partitions the
same way on CPU host devices as on a TPU slice, so the collective COUNTS
(not their latency) are the transferable evidence. Wall-clock on the CPU
mesh is reported but is NOT a throughput claim.

Run:  python scripts/weak_scaling.py          (writes weak_scaling.json)
Test: tests/test_weak_scaling.py pins the collective counts at 8 devices.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import re
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

LANES_PER_SHARD = 4   # weak-scaling constant: query domains per data shard
BATCH = 64
N_PER_DOMAIN = 512

COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)


def count_collectives(hlo: str) -> dict:
    """Instruction counts per collective op in optimized HLO text (counts
    both sync and -start async forms; -done is excluded to avoid double
    counting)."""
    out = {}
    for op in COLLECTIVES:
        out[op] = len(re.findall(rf"\b{op}(?:-start)?\(", hlo))
    return out


def build(n_dev: int, tmp: str, trainable: bool = False):
    from mamdr_tpu.config import ExperimentConfig
    from mamdr_tpu.data.synthetic import make_synthetic_dataset
    from mamdr_tpu.ops.embedding_lookup import set_lookup_mesh
    from mamdr_tpu.parallel.mesh import make_mesh
    from mamdr_tpu.strategies.mamdr import MAMDRStrategy
    from mamdr_tpu.train.trainer import Trainer

    set_lookup_mesh(None)
    table = 2 if n_dev >= 2 else 1
    mesh = make_mesh(jax.devices()[:n_dev], table_parallelism=table)
    data_shards = n_dev // table
    n_domain = LANES_PER_SHARD * data_shards
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp_meta_mamdr", "user_dim": 8, "item_dim": 8,
                       "domain_dim": 8, "hidden_dim": [16, 8], "dropout": 0.0},
            "train": {
                "epoch": 1, "learning_rate": 0.01, "meta_learning_rate": 0.1,
                "patience": 3, "sample_num": 2, "add_query_domain": True,
                "metrics_jsonl": False,
                # frozen regime (Taobao): user/item tables are subset-step
                # closure constants shared across lanes. trainable regime
                # (Amazon, r5): lane-stacked [L, rows, D] copies sharded
                # P(data, table, None). 32: user/item tables (256 rows)
                # shard; the small domain_emb table stays replicated.
                "emb_trainable": trainable,
                "sharded_lookup_min_rows": 32, "dr_parallel": "on",
            },
            "dataset": {"name": "synthetic", "batch_size": BATCH, "seed": 29},
        }
    )
    cfg.train.checkpoint_path = osp.join(tmp, f"c{n_dev}")
    cfg.train.result_save_path = osp.join(tmp, f"r{n_dev}")
    ds = make_synthetic_dataset(
        n_domain=n_domain, n_uid=256, n_pid=256,
        n_per_domain=N_PER_DOMAIN, seed=29, batch_size=BATCH,
    )
    t = Trainer(cfg, ds, verbose=False, mesh=mesh)
    s = MAMDRStrategy(t)
    return mesh, data_shards, t, s


def measure(n_dev: int, tmp: str, trainable: bool = False) -> dict:
    mesh, data_shards, t, s = build(n_dev, tmp, trainable)
    assert s._dr_parallel_eligible(), "lane-parallel DR must be eligible"
    s.prepare_fused()

    seq = s.meta_sequence()
    order = np.asarray(seq, np.int32)
    k = min(s.tc.sample_num, len(seq) - 1) + int(s.tc.add_query_domain)
    aux = np.zeros((len(seq), k), np.int32)
    rng = jax.random.PRNGKey(0)
    lr = float(s.tc.meta_learning_rate)

    dn_hlo = (
        s._dn_phase.lower(t.state, s.shared, s._block, order, rng, lr)
        .compile().as_text()
    )
    dr_hlo = (
        s._dr_phase.lower(t.state, s.shared, s._spec_stack, s._block, order,
                          aux, rng, lr)
        .compile().as_text()
    )

    # one real epoch through the normal path (compiles are cached)
    t0 = time.time()
    s.run_fused_epoch()
    jax.block_until_ready(s.shared)
    epoch_s = time.time() - t0

    steps = t.steps_per_domain()
    n_domain = len(steps)
    lane_steps = max(steps) * k          # each lane trains k aux domains
    from mamdr_tpu.ops.embedding_lookup import set_lookup_mesh

    set_lookup_mesh(None)  # don't leak the process-global mesh to callers
    return {
        "n_devices": n_dev,
        "regime": "trainable" if trainable else "frozen",
        "mesh": {ax: int(n) for ax, n in mesh.shape.items()},
        "n_domain": n_domain,
        "lanes_per_data_shard": n_domain // data_shards,
        "dn_steps_spmd": int(sum(steps)),          # replicated SPMD work
        "dr_lane_steps_per_device": int(
            (n_domain // data_shards) * lane_steps),
        "collectives_dn": count_collectives(dn_hlo),
        "collectives_dr": count_collectives(dr_hlo),
        "epoch_seconds_cpu": round(epoch_s, 2),
    }


def main():
    import tempfile

    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        for n in (1, 2, 4, 8):
            r = measure(n, tmp)
            rows.append(r)
            print(json.dumps(r), flush=True)
        # trainable-table regime (r5 composition) at the full virtual mesh
        r = measure(8, tmp, trainable=True)
        rows.append(r)
        print(json.dumps(r), flush=True)
    out = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                   "weak_scaling.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
        f.write("\n")
    print(f"wrote {out}")

    # markdown table for docs/SCALING.md
    print("\n| devices | mesh (data,table) | domains | lanes/shard | "
          "DR lane steps/device | DN collectives (AR/AG/RS/CP) | "
          "DR collectives (AR/AG/RS/CP) |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        cd, cr = r["collectives_dn"], r["collectives_dr"]

        def fmt(c):
            return (f"{c['all-reduce']}/{c['all-gather']}/"
                    f"{c['reduce-scatter']}/{c['collective-permute']}")

        print(f"| {r['n_devices']} | ({r['mesh'].get('data', 1)},"
              f"{r['mesh'].get('table', 1)}) | {r['n_domain']} "
              f"| {r['lanes_per_data_shard']} "
              f"| {r['dr_lane_steps_per_device']} | {fmt(cd)} | {fmt(cr)} |")


if __name__ == "__main__":
    main()
