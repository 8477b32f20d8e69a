"""The flagship fused MAMDR path (2-dispatch DN+DR epoch + merged eval)
under a (data, table) mesh with row-sharded embedding tables.

Extends tests/test_mesh_trainer.py's claim ("mesh-capable Trainer inside the
real model zoo") to the part that matters: the whole-epoch fused dispatches.
Parity is asserted against the single-device fused run — same seeds, same
domain sequence/aux draws, same in-jit shuffles — so the only difference is
the sharded lookup's psum reduction order (hence the small tolerance).
"""

import jax
import numpy as np
import pytest

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.ops.embedding_lookup import set_lookup_mesh
from mamdr_tpu.parallel.mesh import make_mesh
from mamdr_tpu.strategies.mamdr import MAMDRStrategy
from mamdr_tpu.train import fused
from mamdr_tpu.train.trainer import Trainer


@pytest.fixture(autouse=True)
def reset_lookup_mesh():
    yield
    set_lookup_mesh(None)


def make(tmp_path, tag, mesh=None):
    train = {
        "epoch": 1, "learning_rate": 0.01, "meta_learning_rate": 0.1,
        "patience": 3, "sample_num": 2, "add_query_domain": True,
        "metrics_jsonl": False,
        # this test pins mesh-vs-single-device parity of the SEQUENTIAL
        # dr_phase (the mesh-eligible path); the parallel-lanes DR has its
        # own equivalence test in test_fused_loop_equivalence.py
        "dr_parallel": "off",
    }
    if mesh is not None:
        train["sharded_lookup_min_rows"] = 16
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp_meta_mamdr", "user_dim": 8, "item_dim": 8,
                       "domain_dim": 8, "hidden_dim": [16, 8], "dropout": 0.0},
            "train": train,
            "dataset": {"name": "synthetic", "batch_size": 64, "seed": 31},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / f"c{tag}")
    cfg.train.result_save_path = str(tmp_path / f"r{tag}")
    ds = make_synthetic_dataset(n_domain=3, n_uid=64, n_pid=64,
                                n_per_domain=500, seed=31, batch_size=64)
    return Trainer(cfg, ds, verbose=False, mesh=mesh)


def run_fused_epoch_and_eval(t):
    s = MAMDRStrategy(t)
    assert s.use_fused
    s.prepare_fused()
    s.run_fused_epoch()
    s.specific = fused.unstack_specific(s._spec_stack, s.mask, s.n_domain)
    avg_loss, avg_auc, _, domain_auc = s._merged_eval("val", s.shared, s.specific)
    return s, avg_loss, avg_auc, domain_auc


def test_mesh_fused_mamdr_matches_single_device(tmp_path):
    # single-device fused reference first (the mesh Trainer sets the
    # process-wide lookup context)
    t0 = make(tmp_path, 0)
    _, loss0, auc0, dauc0 = run_fused_epoch_and_eval(t0)

    mesh = make_mesh(jax.devices()[:8], table_parallelism=4)
    t1 = make(tmp_path, 1, mesh=mesh)
    s1, loss1, auc1, dauc1 = run_fused_epoch_and_eval(t1)

    assert np.isfinite(loss1) and 0.0 <= auc1 <= 1.0
    # user/item tables really are row-sharded across all 8 devices
    table = t1.state.params["model"]["embedding"]["user_emb"]
    assert len(table.sharding.device_set) == 8
    # same training trajectory modulo psum reduction order
    assert abs(loss0 - loss1) < 1e-4
    assert abs(auc0 - auc1) < 1e-3
    for k in dauc0:
        assert abs(dauc0[k] - dauc1[k]) < 1e-3
    # the specific stack came out of the DR dispatch finite
    for leaf in jax.tree_util.tree_leaves(s1._spec_stack):
        assert np.all(np.isfinite(np.asarray(leaf)))
