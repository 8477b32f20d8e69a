"""Seed-variance analysis of the Taobao-10 headline margins (VERDICT r3 #5).

MAMDR(ft) vs joint / MMoE / PLE on three generator seeds. Reuses the
per-seed raw theme-click logs built by variance_taobao30.py (the reference
derives every theme split from ONE raw log — etl/taobao.py takes the first
theme_num themes, preprocess_data.py:26-70 — so the T10 splits here come
from the same seeds' raws as the T30 variance rows). Seed-11 rows come from
campaign_others (same generator seed + ETL knobs).

Run AFTER variance_taobao30.py (raws must exist; builds them via
`campaign_tb30.py --build-only` subprocesses otherwise, before any TPU use):
  nohup python scripts/variance_taobao10.py > /tmp/variance_t10.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import os.path as osp
import statistics as st
import subprocess
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)
T30_ROOT = osp.join(REPO, "variance_t30")
ROOT = osp.join(REPO, "variance_t10")
SEEDS = [12, 13]  # campaign raw uses rng seed 11
VARIANTS = ["mlp", "mlp_meta_mamdr_finetune", "mmoe", "ple",
            # r5: DN>joint is a resolved data-regime FAIL on seed 11 —
            # adjudicate it across generator seeds like A6's MAMDR-vs-DN
            "mlp_meta_domain_negotiation_finetune"]
EPOCH_CAP = int(os.environ.get("CAMPAIGN_EPOCHS", 50))  # early stop decides; cap is a safety bound
PATIENCE = 3


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def seed_root(seed: int) -> str:
    return osp.join(T30_ROOT, f"tb30_s{seed}")


def ensure_raw(seed: int) -> str:
    """Build the seed's raw log via the campaign generator if missing.
    Subprocess so the recipe stamps/wipe logic stay in one place; runs
    before this process touches the TPU (build-only never imports jax)."""
    raw = osp.join(seed_root(seed), "raw")
    if osp.exists(osp.join(raw, "theme_click_log.csv")):
        return raw
    env = dict(os.environ)
    env["CAMPAIGN_ROOT"] = seed_root(seed)
    env["CAMPAIGN_SEED"] = str(seed)
    log(f"seed {seed}: raw missing — building via campaign_tb30 --build-only")
    rc = subprocess.run(
        [sys.executable, osp.join(REPO, "scripts", "campaign_tb30.py"),
         "--build-only"],
        env=env, cwd=REPO, timeout=3600,
    ).returncode
    if rc != 0 or not osp.exists(osp.join(raw, "theme_click_log.csv")):
        raise RuntimeError(f"raw build failed for seed {seed} (rc={rc})")
    return raw


def build_split(seed: int) -> None:
    from mamdr_tpu.data.etl import taobao

    split = osp.join(seed_root(seed), "split_by_theme_10")
    if osp.exists(osp.join(split, "domain_9", "train.csv")):
        return
    t0 = time.time()
    # knobs identical to campaign_others.build_taobao_splits so the s11
    # rows (campaign_others Taobao-10) are comparable
    taobao.split_to_domains({
        "raw_data_path": osp.join(seed_root(seed), "raw"),
        "split_save_path": split,
        "processed_data_path": "processed_data",
        "theme_num": 10,
        "ctr_ratio": 0.3,
        "random_range": True,
        "ctr_ratio_range": [0.2, 0.5],
        "train_val_test": [0.6, 0.2, 0.2],
        "seed": 123,
        "rebuild": False,
    })
    log(f"seed {seed}: split_by_theme_10 built in {time.time()-t0:.0f}s")


def save(results: dict) -> None:
    for path in (osp.join(ROOT, "results.json"),
                 osp.join(REPO, "campaign_snapshots",
                          "variance_t10.results.json")):
        with open(path, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")


def auc(entry: dict | None) -> float | None:
    if not entry or "error" in entry:
        return None
    stage = entry.get("finetune", entry.get("test"))
    return None if stage is None else stage["avg_auc"]


def main():
    os.makedirs(ROOT, exist_ok=True)
    rp = osp.join(ROOT, "results.json")
    results = json.load(open(rp)) if osp.exists(rp) else {}

    # all raw builds BEFORE any TPU use (the chip is single-client)
    for seed in SEEDS:
        ensure_raw(seed)
        build_split(seed)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      osp.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from mamdr_tpu.benchmarks import benchmark_config
    from mamdr_tpu.config import DatasetConfig
    from mamdr_tpu.data.dataset import MultiDomainDataset
    from mamdr_tpu.strategies import build_strategy
    from mamdr_tpu.train.trainer import Trainer

    for seed in SEEDS:
        if all(f"s{seed}/{m}" in results for m in VARIANTS):
            log(f"seed {seed}: all rows present, skip dataset load")
            continue
        t0 = time.time()
        dataset = MultiDomainDataset.from_disk(DatasetConfig(
            name="Taobao", dataset_path=seed_root(seed),
            domain_split_path="split_by_theme_10", batch_size=1024,
            seed=123,
        ))
        log(f"seed {seed}: dataset loaded in {time.time()-t0:.0f}s, "
            f"train sizes {[s.n for s in dataset.train]}")
        for model in VARIANTS:
            key = f"s{seed}/{model}"
            if key in results and "error" not in results[key]:
                log(f"skip {key} (done)")
                continue
            cfg = benchmark_config("Taobao-10", model)
            cfg.train.epoch = EPOCH_CAP
            cfg.train.patience = PATIENCE
            cfg.train.checkpoint_path = osp.join(seed_root(seed), "ckpt10")
            cfg.train.result_save_path = osp.join(seed_root(seed), "result10")
            t0 = time.time()
            entry = {}
            try:
                trainer = Trainer(cfg, dataset, verbose=False)
                strat = build_strategy(trainer)
                strat.train()
                entry["early_stopped"] = bool(trainer.stopper.early_stop)
                entry["epoch_cap"] = EPOCH_CAP
                _, a, _, dauc = strat.test()
                entry["test"] = {
                    "avg_auc": a,
                    "weighted_auc": trainer.weighted_auc("test", dauc),
                }
                if strat.spec.finetune:
                    _, ft, _, ftd = strat.finetune()
                    entry["finetune"] = {
                        "avg_auc": ft,
                        "weighted_auc": trainer.weighted_auc("test", ftd),
                    }
                entry["seconds"] = round(time.time() - t0, 1)
                log(f"{key}: AUC {a:.4f} "
                    f"(ft {entry.get('finetune', {}).get('avg_auc')}) "
                    f"in {entry['seconds']}s")
            except Exception as e:
                import traceback

                traceback.print_exc()
                entry["error"] = f"{type(e).__name__}: {e}"
                log(f"{key} FAILED: {entry['error']}")
            results[key] = entry
            save(results)
            import gc

            gc.collect()
            jax.clear_caches()

    # seed-11 rows from the main campaign
    camp = osp.join(REPO, "campaign_others", "results.json")
    if not osp.exists(camp):
        camp = osp.join(REPO, "campaign_snapshots",
                        "campaign_others.results.json")
    if osp.exists(camp):
        c = json.load(open(camp))
        for model in VARIANTS:
            k = f"Taobao-10/{model}"
            if k in c and "test" in c[k]:
                results.setdefault(f"s11/{model}", c[k])

    for name, num, base in (
        ("mamdr_ft_minus_joint", "mlp_meta_mamdr_finetune", "mlp"),
        ("mamdr_ft_minus_mmoe", "mlp_meta_mamdr_finetune", "mmoe"),
        ("mamdr_ft_minus_ple", "mlp_meta_mamdr_finetune", "ple"),
        ("dn_ft_minus_joint", "mlp_meta_domain_negotiation_finetune", "mlp"),
    ):
        vals = []
        for seed in [11] + SEEDS:
            m = auc(results.get(f"s{seed}/{num}"))
            b = auc(results.get(f"s{seed}/{base}"))
            if m is not None and b is not None:
                vals.append(m - b)
                log(f"seed {seed}: {name} = {m-b:+.4f}")
        if len(vals) >= 2:
            results.setdefault("_margins", {})[name] = {
                "mean": round(st.mean(vals), 4),
                "std": round(st.stdev(vals), 4),
                "n": len(vals),
                "positive": sum(v > 0 for v in vals),
                "values": [round(v, 4) for v in vals],
            }
            log(f"{name}: mean {st.mean(vals):+.4f} std {st.stdev(vals):.4f}"
                f" ({sum(v>0 for v in vals)}/{len(vals)} positive)")
    save(results)


if __name__ == "__main__":
    main()
