"""STAR+MAMDR recipe search on a 1/10-scale Taobao-20-like dataset (CPU).

VERDICT r2 item 2: STAR+MAMDR (0.7959/0.8058ft) lost to plain STAR (0.8164)
on Taobao-20. Suspects, in order: (a) the reference's random-offset specific
init polluting kernel_shared/bias_shared/domain_emb (the same effect
measured on Amazon: rand->zeros helped on all 9 search datasets); (b) the
meta recipe (meta_lr, sample_num=19, domain_regulation_step) under the
reference's meta_parms subset (config/Taobao-10/star_taobao.json).

This builds a small 20-theme dataset through the real Taobao ETL (frozen
pretrained 128-d embeddings carrying the latent signal, same structure as
campaign_tb30.build_raw at 1/10 scale) and A/Bs star vs star_meta_mamdr
variants with reference Taobao_20 hyperparameters.

Run: python scripts/search_star_t20.py [variant ...]
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

ROOT = os.environ.get("STAR_ROOT", "/root/repo/search_star_t20")
EPOCH_CAP = 20
PATIENCE = 3
N_THEME, N_USERS, N_ITEMS, EMB_DIM, LARGEST = 20, 20_000, 6_000, 128, 12_000

VARIANTS = [
    "star",
    "star_meta_mamdr_finetune",
    "star_meta_mamdr_finetune:specific_init=zeros",
    "star_meta_mamdr_finetune:specific_init=zeros:sample_num=5",
    "star_meta_mamdr_finetune:specific_init=zeros:meta_learning_rate=0.5",
]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build_raw():
    import pandas as pd

    raw = osp.join(ROOT, "raw")
    os.makedirs(raw, exist_ok=True)
    marker = osp.join(raw, "theme_click_log.csv")
    if osp.exists(marker):
        return raw
    rng = np.random.default_rng(11)
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
        import pandas as pd

        ids = [f"{name[0]}{i}" for i in range(n)]
        embs = [" ".join(f"{x:.4f}" for x in row) for row in tab]
        pd.DataFrame({f"{name}_id": ids, "emb": embs}).set_index(
            f"{name}_id"
        ).to_csv(osp.join(raw, f"{name}_embedding.csv"))
    log(f"raw built: {sum(sizes)} clicks over {N_THEME} themes")
    return raw


def build_split(raw):
    from mamdr_tpu.data.etl import taobao

    split_path = osp.join(ROOT, "split_by_theme_20")
    if not osp.exists(osp.join(split_path, "domain_19", "train.csv")):
        taobao.split_to_domains({
            "raw_data_path": raw,
            "split_save_path": split_path,
            "processed_data_path": "processed_data",
            "theme_num": 20,
            "ctr_ratio": 0.3,
            "random_range": True,
            "ctr_ratio_range": [0.2, 0.5],
            "train_val_test": [0.6, 0.2, 0.2],
            "seed": 123,
            "rebuild": False,
        })
    return split_path


def run_variant(dataset, spec):
    from mamdr_tpu.benchmarks import benchmark_config
    from mamdr_tpu.strategies import build_strategy
    from mamdr_tpu.train.trainer import Trainer

    name, *mods = spec.split(":")
    cfg = benchmark_config("Taobao_20", name)
    cfg.train.epoch = EPOCH_CAP
    cfg.train.patience = PATIENCE
    for m in mods:
        k, v = m.split("=")
        cur = getattr(cfg.train, k)
        setattr(cfg.train, k, type(cur)(v) if cur is not None else v)
    cfg.train.checkpoint_path = osp.join(
        ROOT, "ckpt", spec.replace(":", "_").replace("=", "_"))
    cfg.train.result_save_path = osp.join(ROOT, "result")
    t0 = time.time()
    trainer = Trainer(cfg, dataset, verbose=False)
    strat = build_strategy(trainer)
    strat.train()
    _, auc, _, dauc = strat.test()
    out = {"test": {"avg_auc": auc,
                    "weighted_auc": trainer.weighted_auc("test", dauc)}}
    if strat.spec.finetune:
        _, ft, _, ftd = strat.finetune()
        out["finetune"] = {"avg_auc": ft,
                           "weighted_auc": trainer.weighted_auc("test", ftd)}
    out["seconds"] = round(time.time() - t0, 1)
    return out


def main():
    os.makedirs(ROOT, exist_ok=True)
    raw = build_raw()
    build_split(raw)

    from mamdr_tpu.config import DatasetConfig
    from mamdr_tpu.data.dataset import MultiDomainDataset

    dataset = MultiDomainDataset.from_disk(DatasetConfig(
        name="Taobao", dataset_path=ROOT,
        domain_split_path="split_by_theme_20", batch_size=1024, seed=123,
    ))
    log(f"dataset: {dataset.n_domain} domains, sizes={[s.n for s in dataset.train]}")

    wanted = [a for a in sys.argv[1:] if not a.startswith("-")] or VARIANTS
    rp = osp.join(ROOT, "results.json")
    results = json.load(open(rp)) if osp.exists(rp) else {}
    for spec in wanted:
        if spec in results and "error" not in results[spec]:
            continue
        try:
            results[spec] = run_variant(dataset, spec)
            t = results[spec]["test"]
            ft = results[spec].get("finetune", {}).get("avg_auc")
            log(f"{spec}: AUC {t['avg_auc']:.4f} "
                f"(ft {ft if ft is None else round(ft, 4)}) "
                f"in {results[spec]['seconds']}s")
        except Exception:
            import traceback

            traceback.print_exc()
            results[spec] = {"error": "failed"}
        with open(rp, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
