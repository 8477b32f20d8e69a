"""Shared fused-MAMDR-epoch runner for the multi-process parity test.

Used both by the single-process reference (pytest, local 8-device CPU) and
the 2-process distributed worker — identical config, dataset, seeds and
code path, so the only difference is device/process placement.
"""

from __future__ import annotations

import numpy as np

N_DOMAIN = 8
BATCH = 64


def run_fused_mamdr_epoch(tmpdir: str, tag: str, mesh=None) -> dict:
    import jax

    from mamdr_tpu.config import ExperimentConfig
    from mamdr_tpu.data.synthetic import make_synthetic_dataset
    from mamdr_tpu.ops.embedding_lookup import set_lookup_mesh
    from mamdr_tpu.strategies.mamdr import MAMDRStrategy
    from mamdr_tpu.train import fused
    from mamdr_tpu.train.trainer import Trainer

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
            "model": {"name": "mlp_meta_mamdr", "user_dim": 8, "item_dim": 8,
                       "domain_dim": 8, "hidden_dim": [16, 8], "dropout": 0.0},
            "train": train,
            "dataset": {"name": "synthetic", "batch_size": BATCH, "seed": 37},
        }
    )
    cfg.train.checkpoint_path = f"{tmpdir}/c{tag}"
    cfg.train.result_save_path = f"{tmpdir}/r{tag}"
    ds = make_synthetic_dataset(n_domain=N_DOMAIN, n_uid=64, n_pid=64,
                                n_per_domain=400, seed=37, batch_size=BATCH)
    try:
        t = Trainer(cfg, ds, verbose=False, mesh=mesh)
        s = MAMDRStrategy(t)
        assert s._dr_parallel_eligible()
        s.prepare_fused()
        s.run_fused_epoch()
        s.specific = fused.unstack_specific(s._spec_stack, s.mask, s.n_domain)
        _, auc, _, _ = s._merged_eval("val", s.shared, s.specific)
    finally:
        set_lookup_mesh(None)

    def tree_norm(tree):
        return float(
            jax.jit(
                lambda tr: sum(
                    (leaf.astype("float32") ** 2).sum()
                    for leaf in jax.tree_util.tree_leaves(tr)
                )
                ** 0.5
            )(tree)
        )

    return {
        "auc": float(auc),
        "shared_norm": tree_norm(s.shared),
        "spec_norm": tree_norm(s._spec_stack),
    }
