"""Lane-sharded parallel DR: the MAMDR DR phase distributed over a mesh.

The vmapped query-domain lanes are embarrassingly parallel, so sharding the
lane axis over the mesh's data axis scales the flagship's dominant phase
across chips with no collectives beyond the output gather
(fused.make_fused_dr_parallel lane_sharding; docs/SCALING.md). This test
runs the same DR phase single-device and lane-sharded over 8 virtual CPU
devices and asserts identical results (same graph, same rng derivation —
only the lane placement differs).
"""

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.parallel.mesh import DATA_AXIS, make_mesh
from mamdr_tpu.strategies.mamdr import MAMDRStrategy
from mamdr_tpu.train import fused
from mamdr_tpu.train.steps import make_subset_train_step
from mamdr_tpu.train.trainer import Trainer
from mamdr_tpu.utils import trees

D, BATCH = 8, 64


def make(tmp_path, tag):
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp_meta_mamdr", "user_dim": 8, "item_dim": 8,
                       "domain_dim": 8, "hidden_dim": [16, 8], "dropout": 0.0},
            "train": {"epoch": 1, "learning_rate": 0.01,
                       "meta_learning_rate": 0.1, "patience": 3,
                       "sample_num": 2, "add_query_domain": True,
                       "metrics_jsonl": False},
            "dataset": {"name": "synthetic", "batch_size": BATCH, "seed": 13},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / f"c{tag}")
    cfg.train.result_save_path = str(tmp_path / f"r{tag}")
    ds = make_synthetic_dataset(n_domain=D, n_uid=64, n_pid=64,
                                n_per_domain=400, seed=13, batch_size=BATCH)
    return Trainer(cfg, ds, verbose=False), ds


def run_dr(t, ds, s, lane_sharding, lane_chunk=0):
    frozen_mask = trees.named_tree_map(lambda n, x: False, t.state.params)
    sub_step, to_sub, combine = make_subset_train_step(
        t.model, t.tx, t.step_cfg, frozen_mask, t.state.params
    )
    block, n_steps = fused.stack_domains_on_device(ds.train, BATCH)
    dr = fused.make_fused_dr_parallel(
        sub_step, to_sub, combine, s.mask, "plus", n_steps, BATCH,
        domain_regulation_step=0, shuffle=True, lane_sharding=lane_sharding,
        lane_chunk=lane_chunk,
    )
    spec = fused.stack_specific(s.specific, s.mask)
    order = np.arange(D, dtype=np.int32)
    aux = np.stack([
        np.r_[(q + 1) % D, (q + 3) % D, q] for q in range(D)
    ]).astype(np.int32)
    st, spec = dr(t.state, t.state.params, spec, block, order, aux,
                  jax.random.PRNGKey(5), 0.1)
    return st, spec


def test_lane_sharded_dr_matches_single_device(tmp_path):
    t0, ds0 = make(tmp_path, 0)
    s0 = MAMDRStrategy(t0)
    st0, spec0 = run_dr(t0, ds0, s0, lane_sharding=None)

    mesh = make_mesh(jax.devices()[:8], table_parallelism=1)
    assert mesh.shape[DATA_AXIS] == 8
    lane_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
    # sanity: the lane axis really factors over 8 devices
    probe = jax.device_put(np.zeros((D, 4), np.float32), lane_sharding)
    assert len(probe.sharding.device_set) == 8

    t1, ds1 = make(tmp_path, 1)
    s1 = MAMDRStrategy(t1)
    st1, spec1 = run_dr(t1, ds1, s1, lane_sharding=lane_sharding)

    for a, b in zip(jax.tree_util.tree_leaves(spec0),
                    jax.tree_util.tree_leaves(spec1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st0.params),
                    jax.tree_util.tree_leaves(st1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_lane_parallel_dr_with_row_sharded_frozen_tables(tmp_path):
    """The round-2 gate made the fastest DR (vmapped lanes) and the
    row-sharded-table path mutually exclusive (VERDICT r2 weak #5). They now
    compose when the sharded tables are FROZEN (the flagship Taobao regime):
    the tables are closure constants of the subset step, so each lane's
    lookup is the same unbatched shard_map masked-gather+psum and
    vmap-of-shard_map batches only the ids. This pins the composed path
    (lanes vmapped + lane-sharded over the data axis, frozen tables
    row-sharded over the table axis) to the single-device trajectory."""
    from mamdr_tpu.ops.embedding_lookup import set_lookup_mesh

    def make_frozen(tag, mesh=None):
        train = {
            "epoch": 1, "learning_rate": 0.01, "meta_learning_rate": 0.1,
            "patience": 3, "sample_num": 2, "add_query_domain": True,
            "metrics_jsonl": False, "emb_trainable": False,
            "dr_parallel": "on",
        }
        if mesh is not None:
            train["sharded_lookup_min_rows"] = 16
        cfg = ExperimentConfig.from_dict(
            {
                "model": {"name": "mlp_meta_mamdr", "user_dim": 8,
                           "item_dim": 8, "domain_dim": 8,
                           "hidden_dim": [16, 8], "dropout": 0.0},
                "train": train,
                "dataset": {"name": "synthetic", "batch_size": BATCH,
                             "seed": 29},
            }
        )
        cfg.train.checkpoint_path = str(tmp_path / f"fc{tag}")
        cfg.train.result_save_path = str(tmp_path / f"fr{tag}")
        ds = make_synthetic_dataset(n_domain=4, n_uid=64, n_pid=64,
                                    n_per_domain=400, seed=29,
                                    batch_size=BATCH)
        return Trainer(cfg, ds, verbose=False, mesh=mesh)

    def run(t):
        s = MAMDRStrategy(t)
        assert s._dr_parallel_eligible()  # dr_parallel="on" raises otherwise
        s.prepare_fused()
        s.run_fused_epoch()
        s.specific = fused.unstack_specific(s._spec_stack, s.mask, s.n_domain)
        _, auc, _, _ = s._merged_eval("val", s.shared, s.specific)
        return s, auc

    try:
        t0 = make_frozen(0)
        s0, auc0 = run(t0)

        mesh = make_mesh(jax.devices()[:8], table_parallelism=2)  # data=4
        t1 = make_frozen(1, mesh=mesh)
        # the frozen user table really is row-sharded across all 8 devices
        table = t1.state.params["model"]["embedding"]["user_emb"]
        assert len(table.sharding.device_set) == 8
        s1, auc1 = run(t1)
    finally:
        set_lookup_mesh(None)

    assert np.isfinite(auc1) and 0.0 <= auc1 <= 1.0
    assert abs(auc0 - auc1) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(s0._spec_stack),
                    jax.tree_util.tree_leaves(s1._spec_stack)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s0.shared),
                    jax.tree_util.tree_leaves(s1.shared)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_chunked_lanes_on_mesh_match_single_device(tmp_path):
    """lane_chunk composes with lane sharding: each scanned chunk's C lanes
    shard over the data axis (C must be a multiple of it — the eligibility
    gate enforces that for the strategy path). 8 lanes, chunks of 4, data
    axis 4: two scanned groups, each lane-sharded, same trajectory as the
    unchunked single-device dispatch."""
    t0, ds0 = make(tmp_path, 0)
    s0 = MAMDRStrategy(t0)
    st0, spec0 = run_dr(t0, ds0, s0, lane_sharding=None)

    mesh = make_mesh(jax.devices()[:8], table_parallelism=2)  # data=4
    lane_sharding = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
    t1, ds1 = make(tmp_path, 1)
    s1 = MAMDRStrategy(t1)
    st1, spec1 = run_dr(t1, ds1, s1, lane_sharding=lane_sharding,
                        lane_chunk=4)

    for a, b in zip(jax.tree_util.tree_leaves(spec0),
                    jax.tree_util.tree_leaves(spec1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st0.params),
                    jax.tree_util.tree_leaves(st1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_lane_parallel_dr_with_row_sharded_trainable_tables(tmp_path):
    """Round-5 (VERDICT r4 item 4): lanes compose with row-sharded TRAINABLE
    tables — the Amazon-style production regime. The lane-stacked table
    copies are [L, rows, D] leaves sharded P(data, table, None); the vmap
    batching rule carries the batched table operand through the shard_map
    masked-gather+psum lookup and its scatter-add transpose
    (scripts/probe_lanes_sharded_trainable.py isolates the op). This pins
    the full fused MAMDR epoch on-mesh to the single-device trajectory."""
    from mamdr_tpu.ops.embedding_lookup import set_lookup_mesh

    def make_trainable(tag, mesh=None):
        train = {
            "epoch": 1, "learning_rate": 0.01, "meta_learning_rate": 0.1,
            "patience": 3, "sample_num": 2, "add_query_domain": True,
            "metrics_jsonl": False, "dr_parallel": "on",
        }
        if mesh is not None:
            train["sharded_lookup_min_rows"] = 16
        cfg = ExperimentConfig.from_dict(
            {
                "model": {"name": "mlp_meta_mamdr", "user_dim": 8,
                           "item_dim": 8, "domain_dim": 8,
                           "hidden_dim": [16, 8], "dropout": 0.0},
                "train": train,
                "dataset": {"name": "synthetic", "batch_size": BATCH,
                             "seed": 31},
            }
        )
        cfg.train.checkpoint_path = str(tmp_path / f"tc{tag}")
        cfg.train.result_save_path = str(tmp_path / f"tr{tag}")
        ds = make_synthetic_dataset(n_domain=4, n_uid=64, n_pid=64,
                                    n_per_domain=400, seed=31,
                                    batch_size=BATCH)
        return Trainer(cfg, ds, verbose=False, mesh=mesh)

    def run(t):
        s = MAMDRStrategy(t)
        assert s._dr_parallel_eligible()  # dr_parallel="on" raises otherwise
        s.prepare_fused()
        s.run_fused_epoch()
        s.specific = fused.unstack_specific(s._spec_stack, s.mask, s.n_domain)
        _, auc, _, _ = s._merged_eval("val", s.shared, s.specific)
        return s, auc

    try:
        t0 = make_trainable(0)
        s0, auc0 = run(t0)

        mesh = make_mesh(jax.devices()[:8], table_parallelism=2)  # data=4
        t1 = make_trainable(1, mesh=mesh)
        # the TRAINABLE user table really is row-sharded across devices
        table = t1.state.params["model"]["embedding"]["user_emb"]
        assert len(table.sharding.device_set) >= 2
        s1, auc1 = run(t1)
    finally:
        set_lookup_mesh(None)

    assert np.isfinite(auc1) and 0.0 <= auc1 <= 1.0
    assert abs(auc0 - auc1) < 1e-3
    for a, b in zip(jax.tree_util.tree_leaves(s0._spec_stack),
                    jax.tree_util.tree_leaves(s1._spec_stack)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s0.shared),
                    jax.tree_util.tree_leaves(s1.shared)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_mesh_trainer_auto_lane_shards(tmp_path):
    """MAMDRStrategy under a data-majority mesh with replicated tables takes
    the lane-sharded parallel DR automatically (the eligibility gate)."""
    mesh = make_mesh(jax.devices()[:8], table_parallelism=1)
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp_meta_mamdr", "user_dim": 8, "item_dim": 8,
                       "domain_dim": 8, "hidden_dim": [16, 8], "dropout": 0.0},
            "train": {"epoch": 1, "learning_rate": 0.01,
                       "meta_learning_rate": 0.1, "patience": 1,
                       "sample_num": 2, "metrics_jsonl": False},
            "dataset": {"name": "synthetic", "batch_size": BATCH, "seed": 13},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / "c")
    cfg.train.result_save_path = str(tmp_path / "r")
    ds = make_synthetic_dataset(n_domain=D, n_uid=64, n_pid=64,
                                n_per_domain=400, seed=13, batch_size=BATCH)
    t = Trainer(cfg, ds, verbose=False, mesh=mesh)
    s = MAMDRStrategy(t)
    assert s._dr_parallel_eligible()
    s.prepare_fused()
    s.run_fused_epoch()
    s.specific = fused.unstack_specific(s._spec_stack, s.mask, D)
    _, avg_auc, _, _ = s._merged_eval("val", s.shared, s.specific)
    assert 0.0 <= avg_auc <= 1.0 and np.isfinite(avg_auc)
