"""Taobao-30 reference-scale AUC reproduction campaign (VERDICT item 1).

Builds a Taobao-30 dataset at reference scale/statistics through the repo's
own ETL — 30 long-tailed themes, ~890k clicks over 200k users / 60k items,
frozen pretrained 128-d embeddings whose latent structure generates the
clicks (the real Taobao setup: GNN vectors carry the signal, per-user data
is too sparse to learn embeddings) — then runs the headline model/strategy
matrix with the reference hyperparameters (benchmarks.benchmark_config) and
writes campaign_tb30/results.json + RESULTS.md.

Restartable: variants already in results.json are skipped.

Run (TPU, single-client — nothing else may touch the chip):
    nohup python scripts/campaign_tb30.py > /tmp/campaign_tb30.log 2>&1 &
    echo $! > /tmp/campaign_tb30.pid
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

ROOT = os.environ.get("CAMPAIGN_ROOT", "/root/repo/campaign_tb30")
EPOCH_CAP = int(os.environ.get("CAMPAIGN_EPOCHS", 100))  # early stop decides; cap is a safety bound
PATIENCE = int(os.environ.get("CAMPAIGN_PATIENCE", 3))  # reference patience
EMB_DIM = 128
N_USERS = int(os.environ.get("CAMPAIGN_USERS", 200_000))
N_ITEMS = int(os.environ.get("CAMPAIGN_ITEMS", 60_000))
N_THEME = int(os.environ.get("CAMPAIGN_THEMES", 30))
# clicks in the largest theme; 1.12^-i decay -> ~890k total at default
LARGEST_THEME = int(os.environ.get("CAMPAIGN_LARGEST", 100_000))
SEED = int(os.environ.get("CAMPAIGN_SEED", 11))

# Round-4 tail recipe (VERDICT r3 item 1): themes 20-29 become STARVING
# tails — a few hundred clicks, far below the ~3.7k-click density where a
# [256,128,64] tower on frozen 128-d embeddings still fits per-domain (the
# r1 1.12^-i tail let separate beat joint, RESULTS.md FAIL row). The real
# Taobao tail themes are this sparse; per-domain training collapses there
# while joint/MAMDR transfer. CRITICAL invariant: the generator consumes
# ONE sequential rng, and sizes[0:20] are untouched, so themes 0-19 (hence
# every Taobao-10/20 split row, incl. the STAR+MAMDR pass) stay
# byte-identical — only split_by_theme_30 rebuilds. The reference ETL takes
# the FIRST theme_num themes (preprocess_data.py:26-70; etl/taobao.py:54-56)
# and fits uid2id/pid2id only on those groups, so the tail rows never touch
# the T10/T20 id maps.
TAIL_SIZES = [1200, 950, 750, 600, 480, 390, 310, 250, 200, 160]


def theme_sizes() -> list:
    sizes = [int(LARGEST_THEME / (1.12 ** i)) for i in range(min(N_THEME, 20))]
    scale = LARGEST_THEME / 100_000
    sizes += [max(60, int(s * scale)) for s in TAIL_SIZES[: max(0, N_THEME - 20)]]
    return sizes


def gen_recipe() -> dict:
    # version 3: the ETL m=2 split-guard fix (etl/common.py assign_user_splits
    # — 2-negative users now land 1 train + 1 test as the reference does,
    # instead of both-to-train). The raw log is identical; the SPLITS change,
    # so the version bump wipes split_by_theme_30 and invalidates all rows.
    return {
        "version": 3,
        "seed": SEED,
        "n_users": N_USERS,
        "n_items": N_ITEMS,
        "sizes": theme_sizes(),
    }


VARIANTS = [
    # the joint/separate/MAMDR/DN ordering checks run first so a rebuilt
    # dataset's load-bearing rows land before the long MTL/zoo tail
    "mlp",
    "mlp_separate",
    "mlp_meta_mamdr_finetune",
    "mlp_meta_domain_negotiation_finetune",
    "mlp_meta_reptile_finetune",
    "mlp_meta_maml_finetune",
    "mlp_meta_mldg_finetune",
    "mlp_pcgrad",
    "mlp_uncertainty_weight",
    "deepfm",
    "mmoe",
    "ple",
    "shared_bottom",
    "star",
]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def save_results(results, root):
    """Write results.json in the (untracked) campaign dir AND mirror it into
    the tracked campaign_snapshots/ dir — untracked campaign dirs have been
    wiped by session resets before, losing the raw results."""
    import json as _json
    import os as _os
    import os.path as _osp

    with open(_osp.join(root, "results.json"), "w") as f:
        _json.dump(results, f, indent=2)
        f.write("\n")
    snap_dir = "/root/repo/campaign_snapshots"
    _os.makedirs(snap_dir, exist_ok=True)
    snap = _osp.join(snap_dir, _osp.basename(root.rstrip("/")) + ".results.json")
    with open(snap, "w") as f:
        _json.dump(results, f, indent=2)
        f.write("\n")


def build_raw():
    import shutil

    raw = osp.join(ROOT, "raw")
    os.makedirs(raw, exist_ok=True)
    marker = osp.join(raw, "theme_click_log.csv")
    stamp = osp.join(raw, "gen.json")
    recipe = gen_recipe()
    prev = json.load(open(stamp)) if osp.exists(stamp) else None
    if osp.exists(marker) and prev == recipe:
        return raw
    if osp.exists(marker) and prev != recipe:
        log("generator recipe changed: wiping stale raw + split_by_theme_30")
        shutil.rmtree(raw, ignore_errors=True)
        shutil.rmtree(osp.join(ROOT, "split_by_theme_30"), ignore_errors=True)
        os.makedirs(raw, exist_ok=True)
    rng = np.random.default_rng(SEED)
    lat = 16
    u_lat = rng.normal(0, 1, (N_USERS, lat)).astype(np.float32)
    v_lat = rng.normal(0, 1, (N_ITEMS, lat)).astype(np.float32)
    proj = (rng.normal(0, 1, (lat, EMB_DIM)) / np.sqrt(lat)).astype(np.float32)
    u_emb = u_lat @ proj + rng.normal(0, 0.05, (N_USERS, EMB_DIM)).astype(np.float32)
    v_emb = v_lat @ proj + rng.normal(0, 0.05, (N_ITEMS, EMB_DIM)).astype(np.float32)

    sizes = theme_sizes()
    items_per_theme = N_ITEMS // N_THEME
    frames = []
    for th in range(N_THEME):
        lo = th * items_per_theme
        # zipf item exposure within the theme
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
        frames.append(
            pd.DataFrame(
                {
                    "user_id": [f"u{u}" for u in chosen // N_ITEMS],
                    "item_id": [f"i{v}" for v in chosen % N_ITEMS],
                    "theme_id": 1000 + th,
                }
            )
        )
        log(f"theme {th}: {need} clicks")
    pd.concat(frames, ignore_index=True).to_csv(marker, index=False)

    log("writing pretrained embedding csvs ...")
    for name, tab, n in (("user", u_emb, N_USERS), ("item", v_emb, N_ITEMS)):
        ids = [f"{name[0]}{i}" for i in range(n)]
        embs = [" ".join(f"{x:.4f}" for x in row) for row in tab]
        pd.DataFrame({f"{name}_id": ids, "emb": embs}).set_index(
            f"{name}_id"
        ).to_csv(osp.join(raw, f"{name}_embedding.csv"))
    with open(stamp, "w") as f:
        json.dump(recipe, f)
    return raw


def build_split(raw):
    from mamdr_tpu.data.etl import taobao

    split_path = osp.join(ROOT, "split_by_theme_30")
    if not osp.exists(osp.join(split_path, f"domain_{N_THEME-1}", "train.csv")):
        t0 = time.time()
        taobao.split_to_domains(
            {
                "raw_data_path": raw,
                "split_save_path": split_path,
                "processed_data_path": "processed_data",
                "theme_num": N_THEME,
                "ctr_ratio": 0.3,
                "random_range": True,
                "ctr_ratio_range": [0.2, 0.5],
                "train_val_test": [0.6, 0.2, 0.2],
                "seed": 123,
                "rebuild": False,
            }
        )
        log(f"ETL split built in {time.time()-t0:.0f}s")
    return split_path


def run_variant(name, dataset, results):
    from mamdr_tpu.benchmarks import benchmark_config
    from mamdr_tpu.strategies import build_strategy
    from mamdr_tpu.train.trainer import Trainer

    cfg = benchmark_config("Taobao_30", name)
    cfg.train.epoch = EPOCH_CAP
    cfg.train.patience = PATIENCE
    cfg.train.checkpoint_path = osp.join(ROOT, "ckpt")
    cfg.train.result_save_path = osp.join(ROOT, "result")
    t0 = time.time()
    entry = {}
    try:
        trainer = Trainer(cfg, dataset, verbose=False)
        strat = build_strategy(trainer)
        if strat.spec.strategy == "separate":
            from mamdr_tpu.strategies.separate import separate_train_val_test

            _, avg_auc, _, domain_auc = separate_train_val_test(
                trainer, init_params=True
            )
        else:
            strat.train()
            # reference protocol is early-stop (epoch bound 99999); a row
            # that hits OUR cap instead is undertrained — flag it
            entry["early_stopped"] = bool(trainer.stopper.early_stop)
            entry["epoch_cap"] = EPOCH_CAP
            _, avg_auc, _, domain_auc = strat.test()
        entry["test"] = {
            "avg_auc": avg_auc,
            "weighted_auc": trainer.weighted_auc("test", domain_auc),
            "domain_auc": domain_auc,
        }
        log(f"{name}: test AUC {avg_auc:.4f} "
            f"(weighted {entry['test']['weighted_auc']:.4f})")
        if strat.spec.finetune:
            _, ft_auc, _, ft_domain = strat.finetune()
            entry["finetune"] = {
                "avg_auc": ft_auc,
                "weighted_auc": trainer.weighted_auc("test", ft_domain),
                "domain_auc": ft_domain,
            }
            log(f"{name}: finetune AUC {ft_auc:.4f} "
                f"(weighted {entry['finetune']['weighted_auc']:.4f})")
        entry["seconds"] = round(time.time() - t0, 1)
    except Exception as e:  # keep the campaign going
        import traceback

        traceback.print_exc()
        entry["error"] = f"{type(e).__name__}: {e}"
        log(f"{name} FAILED: {entry['error']}")
    results[name] = entry
    save_results(results, ROOT)
    # Release this variant's HBM (param trees, device-resident data blocks,
    # compiled executables + their captured constants) before the next one —
    # an OOM would otherwise cascade into every later variant.
    import gc

    import jax as _jax

    del entry
    try:
        del strat
    except NameError:
        pass
    try:
        del trainer
    except NameError:
        pass
    gc.collect()
    _jax.clear_caches()


def main():
    os.makedirs(ROOT, exist_ok=True)
    raw = build_raw()
    build_split(raw)
    if "--build-only" in sys.argv:
        log("dataset built; exiting (build-only)")
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from mamdr_tpu.config import DatasetConfig
    from mamdr_tpu.data.dataset import MultiDomainDataset

    t0 = time.time()
    dataset = MultiDomainDataset.from_disk(
        DatasetConfig(
            name="Taobao", dataset_path=ROOT,
            domain_split_path="split_by_theme_30", batch_size=1024, seed=123,
        )
    )
    log(
        f"dataset loaded in {time.time()-t0:.0f}s: {dataset.n_domain} domains, "
        f"n_uid={dataset.n_uid}, n_pid={dataset.n_pid}, "
        f"train sizes={[s.n for s in dataset.train]}"
    )

    results = {}
    rp = osp.join(ROOT, "results.json")
    snap = osp.join("/root/repo/campaign_snapshots",
                    osp.basename(ROOT.rstrip("/")) + ".results.json")
    if not osp.exists(rp) and osp.exists(snap):
        rp_load = snap  # campaign dir wiped; resume from the tracked mirror
    else:
        rp_load = rp
    if osp.exists(rp_load):
        with open(rp_load) as f:
            loaded = json.load(f)
        # rows from a different generator recipe are not comparable — drop
        # them so the campaign re-runs the whole matrix on the new data
        if loaded.get("_taobao_gen") != gen_recipe():
            stale = [k for k in loaded if not k.startswith("_")]
            if stale:
                log(f"generator recipe changed: invalidating {len(stale)} rows")
            loaded = {}
        results = {k: v for k, v in loaded.items() if not k.startswith("_")}
    results["_taobao_gen"] = gen_recipe()
    variants = VARIANTS
    for a in sys.argv[1:]:
        if a.startswith("--variants="):
            variants = a.split("=", 1)[1].split(",")
            unknown = [v for v in variants if v not in VARIANTS]
            if unknown:
                raise SystemExit(f"unknown variants: {unknown}")
    for name in variants:
        if name in results and "error" not in results.get(name, {}):
            log(f"skip {name} (done)")
            continue
        run_variant(name, dataset, results)
    log("campaign complete")


if __name__ == "__main__":
    main()
