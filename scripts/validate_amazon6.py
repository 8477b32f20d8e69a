"""Benchmark-scale validation: Amazon-6-like synthetic data through the full
stack — ETL build -> joint MLP vs full MAMDR (DN+DR+finetune) on the TPU.

Generates 6 long-tailed "categories" of reviews with latent user/item
structure, runs the real Amazon ETL (id maps, negative sampling at the
seeded per-domain ctr ratio, stratified splits), then trains with the real
benchmark hyperparameters (batch 1024, Adam 1e-3, dropout 0.5, meta-lr 0.1,
sample_num 5, patience 3). Writes VALIDATION.md with test AUCs.

Run: nohup python scripts/validate_amazon6.py > /tmp/validate.log 2>&1 &
"""

from __future__ import annotations

import gzip
import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

ROOT = "/root/repo/validation_data"
EPOCH_CAP = 40
PATIENCE = 10  # synthetic domains are tiny (76 steps/epoch max); the
# reference's patience-3 clock assumes real-scale epochs


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build_raw():
    raw = osp.join(ROOT, "raw")
    os.makedirs(raw, exist_ok=True)
    rng = np.random.default_rng(7)
    # Dense, low-rank, popularity-skewed interactions — the regime real CTR
    # data lives in (and what makes it learnable): ~15 clicks/user, zipfian
    # item exposure, sharp affinity selection.
    n_users, n_items_per_cat, dim = 2500, 600, 8
    u_latent = rng.normal(0, 1, (n_users, dim))
    sizes = [36000, 24000, 16000, 11000, 7500, 5000]
    cats = [f"Cat {i}" for i in range(6)]
    for ci, (cat, n_rows) in enumerate(zip(cats, sizes)):
        v_latent = rng.normal(0, 1, (n_items_per_cat, dim))
        tilt = rng.normal(0, 0.3, dim)
        # zipf-ish exposure over items
        ranks = np.arange(n_items_per_cat)
        item_p = 1.0 / (ranks + 20.0)
        item_p /= item_p.sum()
        path = osp.join(raw, cat.replace(" ", "_") + ".json.gz")
        if osp.exists(path):
            continue
        rows = []
        seen = set()
        while len(rows) < n_rows:
            us = rng.integers(0, n_users, n_rows)
            vs = rng.choice(n_items_per_cat, size=n_rows, p=item_p)
            aff = np.sum(u_latent[us] * (v_latent[vs] + tilt), axis=1) / np.sqrt(dim)
            keep = rng.uniform(0, 1, n_rows) < 1.0 / (1.0 + np.exp(-3.0 * (aff - 0.5)))
            for u, v in zip(us[keep], vs[keep]):
                k = (int(u), int(v))
                if k not in seen:
                    seen.add(k)
                    rows.append(k)
                if len(rows) >= n_rows:
                    break
        with gzip.open(path, "wt") as f:
            for u, v in rows:
                f.write(json.dumps({
                    "reviewerID": f"u{u}",
                    "asin": f"c{ci}-i{v}",
                    "overall": 5.0,
                }) + "\n")
        log(f"built raw {cat}: {len(rows)} reviews")
    return cats, raw


def build_split(cats, raw):
    from mamdr_tpu.data.etl import amazon

    split_path = osp.join(ROOT, "split_by_category_6")
    conf = {
        "categories": cats,
        "raw_data_path": raw,
        "split_save_path": split_path,
        "processed_data_path": "processed_data",
        "split_policy": "split_by_category",
        "ctr_ratio": 0.3,
        "random_range": True,
        "ctr_ratio_range": [0.2, 0.5],
        "train_val_test": [0.6, 0.2, 0.2],
        "seed": 123,
        "rebuild": False,
        "cores": 1,
    }
    if not osp.exists(osp.join(split_path, "domain_5", "train.csv")):
        amazon.split_to_domains(conf)
    return split_path


def run_model(model_name, dataset, results):
    from mamdr_tpu.benchmarks import benchmark_config
    from mamdr_tpu.strategies import build_strategy
    from mamdr_tpu.train.trainer import Trainer

    cfg = benchmark_config("Amazon_6", model_name)
    cfg.train.epoch = EPOCH_CAP
    cfg.train.patience = PATIENCE
    cfg.train.checkpoint_path = osp.join(ROOT, "ckpt")
    cfg.train.result_save_path = osp.join(ROOT, "result")
    cfg.train.metrics_jsonl = True
    t0 = time.time()
    trainer = Trainer(cfg, dataset, verbose=False)
    strategy = build_strategy(trainer)
    avg_loss, avg_auc, domain_loss, domain_auc = strategy.run()
    elapsed = time.time() - t0
    w_auc = trainer.weighted_auc("test", domain_auc)
    log(f"{model_name}: test AUC {avg_auc:.4f} (weighted {w_auc:.4f}) in {elapsed:.0f}s")
    from scripts._validate_common import timing_fields

    results[model_name] = {
        "avg_loss": avg_loss,
        "avg_auc": avg_auc,
        "weighted_auc": w_auc,
        "domain_auc": domain_auc,
        **timing_fields(trainer, t0, elapsed),
    }


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from mamdr_tpu.config import DatasetConfig
    from mamdr_tpu.data.dataset import MultiDomainDataset

    cats, raw = build_raw()
    build_split(cats, raw)
    dataset = MultiDomainDataset.from_disk(
        DatasetConfig(
            name="Amazon", dataset_path=ROOT,
            domain_split_path="split_by_category_6", batch_size=1024, seed=123,
        )
    )
    log(f"dataset: {dataset.n_domain} domains, n_uid={dataset.n_uid}, "
        f"n_pid={dataset.n_pid}, "
        f"sizes={[s.n for s in dataset.train]}")

    results = {}
    for name in ["mlp", "mlp_separate", "mlp_meta_domain_negotiation",
                 "mlp_meta_mamdr_finetune"]:
        try:
            run_model(name, dataset, results)
        except Exception as e:  # keep going; report what we have
            log(f"{name} FAILED: {type(e).__name__}: {e}")
            results[name] = {"error": str(e)}
        with open(osp.join(ROOT, "results.json"), "w") as f:
            json.dump(results, f, indent=2)

    lines = [
        "# VALIDATION — Amazon-6-scale synthetic benchmark (TPU v5e, 1 chip)",
        "",
        "Full-stack run: ETL-built 6-domain dataset (latent-structured reviews,",
        "per-user negative sampling at seeded ctr ratios, stratified 60/20/20),",
        "reference benchmark hyperparameters, early stop patience 10 (synthetic epochs are small), epoch cap "
        f"{EPOCH_CAP}.",
        "",
        "| model | test AUC (macro) | weighted AUC | warmup (first epoch"
        " incl. compile) | steady train+eval | total |",
        "|---|---|---|---|---|---|",
    ]
    from scripts._validate_common import timing_columns

    for name, r in results.items():
        if "error" in r:
            lines.append(
                f"| {name} | FAILED: {r['error'][:60]} | — | — | — | — |"
            )
        else:
            lines.append(
                f"| {name} | {r['avg_auc']:.4f} | {r['weighted_auc']:.4f} | "
                f"{timing_columns(r)} |"
            )
    lines.append("")
    lines.append("Per-domain AUCs in validation_data/results.json.")
    with open("/root/repo/VALIDATION.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    log("wrote VALIDATION.md")


if __name__ == "__main__":
    main()
