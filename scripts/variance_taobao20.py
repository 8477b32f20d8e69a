"""Seed-variance analysis of the Taobao-20 STAR+MAMDR-vs-STAR margin.

Companion to variance_amazon{6,13}.py: regenerates the Taobao theme-click
log + pretrained embeddings at extra generator seeds (campaign_tb30
build_raw recipe, seeded rng), builds split_by_theme_20 through the real
ETL, and runs star / star_meta_mamdr_finetune with the campaign recipe
(star_taobao.json sample_num=5). TPU single-client: run alone.

Run: nohup python scripts/variance_taobao20.py > /tmp/variance_t20.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

ROOT = "/root/repo/variance_t20"
SEEDS = [12, 13]   # campaign raw uses rng seed 11
EPOCH_CAP = int(os.environ.get("CAMPAIGN_EPOCHS", 50))  # early stop decides
PATIENCE = 3
VARIANTS = ["star", "star_meta_mamdr_finetune",
            # r5: DN>joint is a resolved data-regime FAIL on seed 11 —
            # adjudicate the direction across generator seeds (MLP rows)
            "mlp", "mlp_meta_domain_negotiation_finetune"]

N_USERS, N_ITEMS, EMB_DIM, N_THEME, LARGEST = 197_000, 60_000, 128, 20, 89_000


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build_raw(seed, d):
    import pandas as pd

    raw = osp.join(d, "raw")
    os.makedirs(raw, exist_ok=True)
    marker = osp.join(raw, "theme_click_log.csv")
    if osp.exists(marker):
        return raw
    t0 = time.time()
    rng = np.random.default_rng(seed)
    lat = 16
    u_lat = rng.normal(0, 1, (N_USERS, lat)).astype(np.float32)
    v_lat = rng.normal(0, 1, (N_ITEMS, lat)).astype(np.float32)
    proj = (rng.normal(0, 1, (lat, EMB_DIM)) / np.sqrt(lat)).astype(np.float32)
    u_emb = u_lat @ proj + rng.normal(0, 0.05, (N_USERS, EMB_DIM)).astype(np.float32)
    v_emb = v_lat @ proj + rng.normal(0, 0.05, (N_ITEMS, EMB_DIM)).astype(np.float32)
    sizes = [int(LARGEST / (1.12 ** i)) for i in range(N_THEME)]
    items_per_theme = N_ITEMS // N_THEME
    frames = []
    for th in range(N_THEME):
        lo = th * items_per_theme
        p = 1.0 / (np.arange(items_per_theme) + 15.0)
        p /= p.sum()
        tilt = rng.normal(0, 0.3, lat).astype(np.float32)
        need = sizes[th]
        chosen = np.empty(0, np.int64)
        while chosen.shape[0] < need:
            m = 4 * (need - chosen.shape[0]) + 1000
            us = rng.integers(0, N_USERS, m)
            vs = lo + rng.choice(items_per_theme, size=m, p=p)
            aff = np.sum(u_lat[us] * (v_lat[vs] + tilt), axis=1) / np.sqrt(lat)
            keep = rng.uniform(0, 1, m) < 1.0 / (1.0 + np.exp(-3.0 * (aff - 0.5)))
            new = us[keep].astype(np.int64) * N_ITEMS + vs[keep]
            chosen = np.unique(np.concatenate([chosen, new]))
        chosen = chosen[rng.permutation(chosen.shape[0])[:need]]
        frames.append(pd.DataFrame({
            "user_id": [f"u{u}" for u in chosen // N_ITEMS],
            "item_id": [f"i{v}" for v in chosen % N_ITEMS],
            "theme_id": 1000 + th,
        }))
    pd.concat(frames, ignore_index=True).to_csv(marker, index=False)
    for name, tab, n in (("user", u_emb, N_USERS), ("item", v_emb, N_ITEMS)):
        ids = [f"{name[0]}{i}" for i in range(n)]
        embs = [" ".join(f"{x:.4f}" for x in row) for row in tab]
        pd.DataFrame({f"{name}_id": ids, "emb": embs}).set_index(
            f"{name}_id"
        ).to_csv(osp.join(raw, f"{name}_embedding.csv"))
    log(f"seed {seed}: raw built in {time.time()-t0:.0f}s "
        f"({sum(sizes)} clicks)")
    return raw


def build_split(raw, d):
    from mamdr_tpu.data.etl import taobao

    split = osp.join(d, "split_by_theme_20")
    if not osp.exists(osp.join(split, "domain_19", "train.csv")):
        taobao.split_to_domains({
            "raw_data_path": raw,
            "split_save_path": split,
            "processed_data_path": "processed_data",
            "theme_num": 20,
            "ctr_ratio": 0.3, "random_range": True,
            "ctr_ratio_range": [0.2, 0.5],
            "train_val_test": [0.6, 0.2, 0.2],
            "seed": 123, "rebuild": False,
        })


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    os.makedirs(ROOT, exist_ok=True)
    rp = osp.join(ROOT, "results.json")
    results = json.load(open(rp)) if osp.exists(rp) else {}
    if results.get("_etl_split") != 2:  # pre-split-guard-fix rows are stale
        results = {}
    results["_etl_split"] = 2
    log(f"devices: {jax.devices()}")

    from mamdr_tpu.benchmarks import benchmark_config
    from mamdr_tpu.config import DatasetConfig
    from mamdr_tpu.data.dataset import MultiDomainDataset
    from mamdr_tpu.strategies import build_strategy
    from mamdr_tpu.train.trainer import Trainer

    for seed in SEEDS:
        d = osp.join(ROOT, f"s{seed}")
        build_split(build_raw(seed, d), d)
        dataset = MultiDomainDataset.from_disk(DatasetConfig(
            name="Taobao", dataset_path=d,
            domain_split_path="split_by_theme_20", batch_size=1024, seed=123,
        ))
        for model in VARIANTS:
            key = f"s{seed}/{model}"
            if key in results:
                continue
            cfg = benchmark_config("Taobao_20", model)
            cfg.train.epoch = EPOCH_CAP
            cfg.train.patience = PATIENCE
            cfg.train.checkpoint_path = osp.join(d, "ckpt")
            cfg.train.result_save_path = osp.join(d, "result")
            t0 = time.time()
            trainer = Trainer(cfg, dataset, verbose=False)
            strat = build_strategy(trainer)
            strat.train()
            _, auc, _, dauc = strat.test()
            out = {"test": {"avg_auc": auc,
                            "weighted_auc": trainer.weighted_auc("test", dauc)}}
            if strat.spec.finetune:
                _, ft, _, ftd = strat.finetune()
                out["finetune"] = {
                    "avg_auc": ft,
                    "weighted_auc": trainer.weighted_auc("test", ftd)}
            out["seconds"] = round(time.time() - t0, 1)
            results[key] = out
            log(f"{key}: AUC {auc:.4f} "
                f"(ft {out.get('finetune', {}).get('avg_auc')}) "
                f"in {out['seconds']}s")
            with open(rp, "w") as f:
                json.dump(results, f, indent=2)
                f.write("\n")

    camp = "/root/repo/campaign_others/results.json"
    if osp.exists(camp):
        c = json.load(open(camp))
        for model in VARIANTS:
            k = f"Taobao_20/{model}"
            if k in c and "test" in c[k]:
                results.setdefault(f"s11/{model}", c[k])
    margins = []
    for seed in [11] + SEEDS:
        try:
            j = results[f"s{seed}/star"]["test"]["avg_auc"]
            m = results[f"s{seed}/star_meta_mamdr_finetune"]
            mf = m.get("finetune", m["test"])["avg_auc"]
            margins.append(mf - j)
            log(f"seed {seed}: star_mamdr_ft - star = {mf-j:+.4f}")
        except KeyError:
            pass
    import statistics as st

    if len(margins) >= 2:
        log(f"STAR+MAMDR - STAR margin: mean {st.mean(margins):+.4f} "
            f"std {st.stdev(margins):.4f} over {len(margins)} seeds")
    dn_margins = []
    for seed in [11] + SEEDS:
        try:
            j = results[f"s{seed}/mlp"]["test"]["avg_auc"]
            d = results[f"s{seed}/mlp_meta_domain_negotiation_finetune"]
            df = d.get("finetune", d["test"])["avg_auc"]
            dn_margins.append(df - j)
            log(f"seed {seed}: dn_ft - joint = {df-j:+.4f}")
        except KeyError:
            pass
    if len(dn_margins) >= 2:
        results["_dn_margins"] = {
            "mean": round(st.mean(dn_margins), 4),
            "std": round(st.stdev(dn_margins), 4),
            "n": len(dn_margins),
            "positive": sum(x > 0 for x in dn_margins),
        }
        log(f"DN - joint margin: mean {st.mean(dn_margins):+.4f} "
            f"std {st.stdev(dn_margins):.4f} over {len(dn_margins)} seeds")
    for path in (rp, osp.join("/root/repo/campaign_snapshots",
                              "variance_t20.results.json")):
        with open(path, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
