"""Taobao-30-scale validation (headline benchmark): frozen pretrained embeddings through the
Taobao ETL + STAR / MMoE / MAMDR on the TPU.

Generates a theme-click log whose click structure lives in the SAME latent
space as the exported "pretrained" user/item embeddings (as with the real
Taobao GNN vectors), builds domains with the Taobao ETL, and trains with the
reference Taobao hyperparameters (load_pretrain_emb, emb_trainable=false).
Appends results to VALIDATION.md.

Run: nohup python scripts/validate_taobao10.py > /tmp/validate_tb.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

ROOT = "/root/repo/validation_data_tb30"
EPOCH_CAP = 40
PATIENCE = 10
EMB_DIM = 128


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build_raw():
    raw = osp.join(ROOT, "raw")
    os.makedirs(raw, exist_ok=True)
    marker = osp.join(raw, "theme_click_log.csv")
    if osp.exists(marker):
        return raw
    rng = np.random.default_rng(11)
    n_users, n_items, n_theme = 5000, 9000, 30
    # latent structure IS the pretrained embedding (rank-8 inside 128 dims)
    u_lat = rng.normal(0, 1, (n_users, 8))
    v_lat = rng.normal(0, 1, (n_items, 8))
    proj = rng.normal(0, 1, (8, EMB_DIM)) / np.sqrt(8)
    u_emb = (u_lat @ proj + rng.normal(0, 0.05, (n_users, EMB_DIM))).astype(np.float32)
    v_emb = (v_lat @ proj + rng.normal(0, 0.05, (n_items, EMB_DIM))).astype(np.float32)

    # themes: each covers an item slice with its own tilt; click when
    # affinity high; zipf item exposure
    sizes = [int(30000 / (1.12 ** i)) for i in range(n_theme)]
    items_per_theme = n_items // n_theme
    rows = []
    for th in range(n_theme):
        lo = th * items_per_theme
        theme_items = np.arange(lo, lo + items_per_theme)
        p = 1.0 / (np.arange(items_per_theme) + 15.0)
        p /= p.sum()
        tilt = rng.normal(0, 0.3, 8)
        need = sizes[th]
        seen = set()
        while need > 0:
            us = rng.integers(0, n_users, 4 * need)
            vs = theme_items[rng.choice(items_per_theme, size=4 * need, p=p)]
            aff = np.sum(u_lat[us] * (v_lat[vs] + tilt), axis=1) / np.sqrt(8)
            keep = rng.uniform(0, 1, 4 * need) < 1.0 / (1.0 + np.exp(-3.0 * (aff - 0.5)))
            for u, v in zip(us[keep], vs[keep]):
                k = (int(u), int(v))
                if k not in seen:
                    seen.add(k)
                    rows.append((f"u{u}", f"i{v}", 1000 + th))
                    need -= 1
                if need <= 0:
                    break
        log(f"theme {th}: done ({sizes[th]} clicks)")

    pd.DataFrame(rows, columns=["user_id", "item_id", "theme_id"]).to_csv(
        osp.join(raw, "theme_click_log.csv"), index=False
    )
    # embeddings as space-separated strings, reference csv format
    pd.DataFrame(
        {"user_id": [f"u{i}" for i in range(n_users)],
         "emb": [" ".join(f"{x:.4f}" for x in u_emb[i]) for i in range(n_users)]}
    ).set_index("user_id").to_csv(osp.join(raw, "user_embedding.csv"))
    pd.DataFrame(
        {"item_id": [f"i{i}" for i in range(n_items)],
         "emb": [" ".join(f"{x:.4f}" for x in v_emb[i]) for i in range(n_items)]}
    ).set_index("item_id").to_csv(osp.join(raw, "item_embedding.csv"))
    return raw


def build_split(raw):
    from mamdr_tpu.data.etl import taobao

    split_path = osp.join(ROOT, "split_by_theme_30")
    if not osp.exists(osp.join(split_path, "domain_29", "train.csv")):
        taobao.split_to_domains(
            {
                "raw_data_path": raw,
                "split_save_path": split_path,
                "processed_data_path": "processed_data",
                "theme_num": 30,
                "ctr_ratio": 0.3,
                "random_range": True,
                "ctr_ratio_range": [0.2, 0.5],
                "train_val_test": [0.6, 0.2, 0.2],
                "seed": 123,
                "rebuild": False,
            }
        )
    return split_path


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    log(f"devices: {jax.devices()}")

    from mamdr_tpu.benchmarks import benchmark_config
    from mamdr_tpu.config import DatasetConfig
    from mamdr_tpu.data.dataset import MultiDomainDataset
    from mamdr_tpu.strategies import build_strategy
    from mamdr_tpu.train.trainer import Trainer

    raw = build_raw()
    build_split(raw)
    dataset = MultiDomainDataset.from_disk(
        DatasetConfig(
            name="Taobao", dataset_path=ROOT,
            domain_split_path="split_by_theme_30", batch_size=1024, seed=123,
        )
    )
    log(f"dataset: {dataset.n_domain} domains, n_uid={dataset.n_uid}, "
        f"n_pid={dataset.n_pid}, sizes={[s.n for s in dataset.train]}, "
        f"user_emb={None if dataset.user_emb is None else dataset.user_emb.shape}")

    results = {}
    for name in ["mlp", "mlp_meta_mamdr_finetune"]:
        cfg = benchmark_config("Taobao_30", name)
        cfg.train.epoch = EPOCH_CAP
        cfg.train.patience = PATIENCE
        cfg.train.checkpoint_path = osp.join(ROOT, "ckpt")
        cfg.train.result_save_path = osp.join(ROOT, "result")
        t0 = time.time()
        try:
            trainer = Trainer(cfg, dataset, verbose=False)
            avg_loss, avg_auc, _, domain_auc = build_strategy(trainer).run()
            w = trainer.weighted_auc("test", domain_auc)
            log(f"{name}: test AUC {avg_auc:.4f} (weighted {w:.4f}) "
                f"in {time.time()-t0:.0f}s")
            from scripts._validate_common import timing_fields

            results[name] = {
                "avg_auc": avg_auc, "weighted_auc": w,
                "domain_auc": domain_auc,
                **timing_fields(trainer, t0, time.time() - t0),
            }
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {e}")
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        with open(osp.join(ROOT, "results.json"), "w") as f:
            json.dump(results, f, indent=2)

    lines = [
        "",
        "## Taobao-30-scale (the headline benchmark config, frozen pretrained 128-d embeddings)",
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
    with open("/root/repo/VALIDATION.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    log("appended to VALIDATION.md")


if __name__ == "__main__":
    main()
