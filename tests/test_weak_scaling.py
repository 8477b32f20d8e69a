"""Weak-scaling harness (scripts/weak_scaling.py): pins the collective-op
counts of the sharded fused-MAMDR lowering so regressions in the SPMD
partitioning are caught (VERDICT r3 item 7).

The pinned numbers are the post-optimization HLO instruction counts on the
8-device (data=4, table=2) virtual CPU mesh. If a jax/XLA upgrade shifts
them, re-run ``python scripts/weak_scaling.py``, eyeball that the shape is
still sane (no O(devices) blow-up; data=1 meshes stay distribution-free),
and update the constants together with docs/SCALING.md.
"""

import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__)))))

from scripts.weak_scaling import measure  # noqa: E402


def test_weak_scaling_8dev_collective_counts(tmp_path):
    r = measure(8, str(tmp_path))
    assert r["mesh"] == {"data": 4, "table": 2}
    # weak scaling: 4 lanes per data shard, constant per-device DR steps
    assert r["lanes_per_data_shard"] == 4
    assert r["dr_lane_steps_per_device"] == 60
    # DN phase: dense-grad + sharded-lookup psums only — no gathers/permutes
    assert r["collectives_dn"] == {
        "all-reduce": 3, "all-gather": 0, "reduce-scatter": 0,
        "collective-permute": 0, "all-to-all": 0,
    }, r["collectives_dn"]
    # DR phase: lane distribution costs a BOUNDED set of gather/permute ops
    # (it does not grow with the device count — 4-dev measured AG=22 too)
    assert r["collectives_dr"] == {
        "all-reduce": 8, "all-gather": 22, "reduce-scatter": 0,
        "collective-permute": 10, "all-to-all": 16,
    }, r["collectives_dr"]


def test_weak_scaling_trainable_regime_bounded(tmp_path):
    """r5: the trainable-table lanes composition lowers with a BOUNDED
    collective set too — more gathers than the frozen regime (the
    lane-stacked sharded tables carry grads/updates across the mesh) but
    a fixed per-phase count, not O(devices)·O(tables)."""
    r = measure(8, str(tmp_path), trainable=True)
    assert r["regime"] == "trainable"
    assert r["mesh"] == {"data": 4, "table": 2}
    assert r["lanes_per_data_shard"] == 4
    for phase in ("collectives_dn", "collectives_dr"):
        for op, n in r[phase].items():
            assert n < 120, (phase, op, n)


def test_weak_scaling_single_shard_is_distribution_free(tmp_path):
    """data=1 meshes lower to zero lane-distribution collectives — the only
    collective is the table-axis lookup psum (and XLA folds even that on a
    1-device mesh)."""
    r = measure(2, str(tmp_path))
    assert r["mesh"] == {"data": 1, "table": 2}
    for phase in ("collectives_dn", "collectives_dr"):
        c = r[phase]
        assert c["all-gather"] == 0 and c["collective-permute"] == 0 \
            and c["all-to-all"] == 0, (phase, c)
