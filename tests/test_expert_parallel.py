"""Expert parallelism: MMoE/PLE expert banks sharded over the mesh's model
(table) axis.

The expert einsum (``ebi,eio->ebo``, models/mtl.py) is batched on the expert
axis, so sharding that axis runs each device's expert slice locally; XLA SPMD
inserts one psum at the gate-mixing contraction (``tbe,ebd->tbd``). The
reference replicates its experts on one GPU
(model_zoo/DeepMTLCTR/deep_mtl_ctr.py:31-48); SURVEY §2.3 ranks EP optional
at reference scale (docs/SCALING.md quantifies why), but the capability must
exist for production expert counts. These tests pin:

  - the sharding rule places expert leaves P(table, ...) and leaves gates,
    towers and non-divisible banks replicated
  - a sharded MMoE/PLE train step matches the unsharded trajectory
"""

import jax
import numpy as np
import pytest

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.parallel.mesh import TABLE_AXIS, make_mesh
from mamdr_tpu.parallel.trainer_sharding import (
    make_sharded_batch,
    param_sharding_specs,
)
from mamdr_tpu.train.trainer import Trainer

BATCH = 64


def make_trainer(tmp_path, tag, name, mesh=None, shard_experts=False):
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": name, "user_dim": 8, "item_dim": 8,
                       "domain_dim": 8, "hidden_dim": [16, 8],
                       "tower_hidden_dim": [8], "num_experts": 4,
                       "dropout": 0.0},
            "train": {"epoch": 1, "learning_rate": 0.01, "patience": 1,
                       "metrics_jsonl": False,
                       "shard_experts": shard_experts},
            "dataset": {"name": "synthetic", "batch_size": BATCH, "seed": 7},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / f"c{tag}")
    cfg.train.result_save_path = str(tmp_path / f"r{tag}")
    ds = make_synthetic_dataset(n_domain=4, n_uid=64, n_pid=64,
                                n_per_domain=400, seed=7, batch_size=BATCH)
    return Trainer(cfg, ds, verbose=False, mesh=mesh)


def test_expert_sharding_rule(tmp_path):
    mesh = make_mesh(jax.devices()[:8], table_parallelism=2)
    t = make_trainer(tmp_path, 0, "mmoe")
    specs = param_sharding_specs(t.state.params, mesh, shard_experts=True)

    flat = dict(
        zip(
            [
                "/".join(str(k) for k in p)
                for p, _ in jax.tree_util.tree_flatten_with_path(
                    t.state.params
                )[0]
            ],
            jax.tree_util.tree_leaves(specs),
        )
    )
    expert = {k: v for k, v in flat.items() if "expert_kernel" in k}
    assert expert, "MMoE params must contain expert kernels"
    for k, sh in expert.items():
        assert sh.spec[0] == TABLE_AXIS, f"{k} not expert-sharded: {sh.spec}"
    for k, sh in flat.items():
        if "gate" in k or "tower" in k:
            assert sh.spec == (), f"{k} must stay replicated: {sh.spec}"


@pytest.mark.parametrize("name", ["mmoe", "ple"])
def test_expert_sharded_step_matches_unsharded(tmp_path, name):
    from mamdr_tpu.ops.embedding_lookup import set_lookup_mesh
    from mamdr_tpu.train.steps import make_train_step

    t0 = make_trainer(tmp_path, f"u{name}", name)
    step0, _ = make_train_step(t0.model, t0.tx, t0.step_cfg)
    step0 = jax.jit(step0)

    mesh = make_mesh(jax.devices()[:8], table_parallelism=2)
    # Trainer(mesh=...) sets the process-global lookup mesh; reset it so
    # later tests in this process see single-device lookups again
    try:
        t1 = make_trainer(tmp_path, f"s{name}", name, mesh=mesh,
                          shard_experts=True)
    finally:
        set_lookup_mesh(None)
    # PLE task experts [T, t, ...] shard on T; MMoE bank [E, ...] on E
    leaf_names = [
        "/".join(str(k) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(t1.state.params)[0]
    ]
    sharded = [
        (n, leaf)
        for n, leaf in zip(leaf_names,
                           jax.tree_util.tree_leaves(t1.state.params))
        if "expert_kernel" in n and len(leaf.sharding.device_set) > 1
    ]
    assert sharded, "no expert leaf actually sharded across devices"

    step1, _ = make_train_step(t1.model, t1.tx, t1.step_cfg)
    step1 = jax.jit(step1)

    batch = make_sharded_batch(mesh, 64, 64, 4, BATCH)
    host_batch = {k: np.asarray(v) for k, v in batch.items()}

    s0, s1 = t0.state, t1.state
    for _ in range(3):
        s0, loss0 = step0(s0, host_batch)
        s1, loss1 = step1(s1, batch)
        np.testing.assert_allclose(
            float(loss0), float(loss1), rtol=2e-5, atol=2e-6
        )
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        # the sharded psum reduces in a different order; Adam's sqrt
        # amplifies the last-ulp differences slightly
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
