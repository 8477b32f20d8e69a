"""Seed-variance analysis of the Amazon-6 ordering margins at FULL scale.

VERDICT r2 item 1's done-criterion: MAMDR>joint and MAMDR>separate "with
margin exceeding seed-to-seed variance (run >=3 seeds to measure it)".
This regenerates the full-scale Amazon-6 dataset (campaign_others.
AMAZON_GEN, first 6 categories) at additional generator seeds, runs the
north-star variants with the campaign recipe, and reports per-seed margins
+ mean/std. Runs on the TPU (single-client: never run concurrently with
another TPU process).

Run: nohup python scripts/variance_amazon6.py > /tmp/variance_a6.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

ROOT = "/root/repo/variance_a6"
SEEDS = [18, 19]
EPOCH_CAP = int(os.environ.get("CAMPAIGN_EPOCHS", 50))  # early stop decides
PATIENCE = 3
VARIANTS = ["mlp", "mlp_separate", "mlp_meta_mamdr_finetune",
            # round 4: the campaign's A6 MAMDR-DN gap is ~-0.002 (DN ahead
            # at seed 17) — adjudicate MAMDR vs DN across seeds like A13
            "mlp_meta_domain_negotiation_finetune"]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def build(seed):
    sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__))))
    import campaign_others as c

    from mamdr_tpu.data.etl import amazon
    from mamdr_tpu.data.synthetic import generate_amazon_reviews

    gen = dict(c.AMAZON_GEN)
    gen["seed"] = seed
    gen["sizes"] = gen["sizes"][:6]
    gen["items"] = gen["items"][:6]
    d = osp.join(ROOT, f"s{seed}")
    split = osp.join(d, "split_by_category_6")
    stamp = osp.join(d, "gen.json")
    prev = json.load(open(stamp)) if osp.exists(stamp) else None
    if not (osp.exists(osp.join(split, "domain_5", "train.csv"))
            and prev == gen):
        import shutil

        shutil.rmtree(d, ignore_errors=True)
        t0 = time.time()
        gen_kwargs = {k: v for k, v in gen.items() if k != "etl_split"}
        generate_amazon_reviews(osp.join(d, "raw"),
                                cat_names=[f"Cat {i}" for i in range(6)],
                                **gen_kwargs)
        amazon.split_to_domains({
            "categories": [f"Cat {i}" for i in range(6)],
            "raw_data_path": osp.join(d, "raw"),
            "split_save_path": split,
            "processed_data_path": "processed_data",
            "split_policy": "split_by_category",
            "ctr_ratio": 0.5, "random_range": True,
            "ctr_ratio_range": [0.2, 0.5],
            "train_val_test": [0.6, 0.2, 0.2],
            "seed": 123, "rebuild": False, "cores": 1,
        })
        with open(stamp, "w") as f:
            json.dump(gen, f)
        log(f"seed {seed}: dataset built in {time.time()-t0:.0f}s")
    return d


def run(seed, d, results):
    from mamdr_tpu.benchmarks import benchmark_config
    from mamdr_tpu.config import DatasetConfig
    from mamdr_tpu.data.dataset import MultiDomainDataset
    from mamdr_tpu.strategies import build_strategy
    from mamdr_tpu.strategies.separate import separate_train_val_test
    from mamdr_tpu.train.trainer import Trainer

    dataset = MultiDomainDataset.from_disk(DatasetConfig(
        name="Amazon", dataset_path=d,
        domain_split_path="split_by_category_6", batch_size=1024, seed=123,
    ))
    for model in VARIANTS:
        key = f"s{seed}/{model}"
        if key in results:
            continue
        cfg = benchmark_config("Amazon_6", model)
        cfg.train.epoch = EPOCH_CAP
        cfg.train.patience = PATIENCE
        # same TPU-incident isolation as the campaign (campaign_others.py)
        cfg.train.dr_parallel = "off"
        cfg.train.separate_fused = False
        cfg.train.checkpoint_path = osp.join(d, "ckpt")
        cfg.train.result_save_path = osp.join(d, "result")
        t0 = time.time()
        trainer = Trainer(cfg, dataset, verbose=False)
        strat = build_strategy(trainer)
        out = {}
        if strat.spec.strategy == "separate":
            _, auc, _, dauc = separate_train_val_test(trainer,
                                                      init_params=True)
        else:
            strat.train()
            _, auc, _, dauc = strat.test()
        out["test"] = {"avg_auc": auc,
                       "weighted_auc": trainer.weighted_auc("test", dauc)}
        if strat.spec.finetune:
            _, ft, _, ftd = strat.finetune()
            out["finetune"] = {
                "avg_auc": ft,
                "weighted_auc": trainer.weighted_auc("test", ftd)}
        out["seconds"] = round(time.time() - t0, 1)
        results[key] = out
        log(f"{key}: AUC {auc:.4f} in {out['seconds']}s")
        with open(osp.join(ROOT, "results.json"), "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")


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
    for seed in SEEDS:
        d = build(seed)
        run(seed, d, results)
    # summary across seeds incl. the campaign's seed-17 rows
    camp = "/root/repo/campaign_others/results.json"
    if osp.exists(camp):
        c = json.load(open(camp))
        for model in VARIANTS:
            k = f"Amazon_6/{model}"
            if k in c and "test" in c[k]:
                results.setdefault(f"s17/{model}", c[k])
    margins_j, margins_s = [], []
    for seed in [17] + SEEDS:
        try:
            j = results[f"s{seed}/mlp"]["test"]["avg_auc"]
            s = results[f"s{seed}/mlp_separate"]["test"]["avg_auc"]
            m = results[f"s{seed}/mlp_meta_mamdr_finetune"]
            mf = m.get("finetune", m["test"])["avg_auc"]
            margins_j.append(mf - j)
            margins_s.append(mf - s)
            log(f"seed {seed}: mamdr_ft-joint={mf-j:+.4f} "
                f"mamdr_ft-separate={mf-s:+.4f}")
        except KeyError:
            pass
    import statistics as st

    if len(margins_j) >= 2:
        log(f"mamdr-joint margin: mean {st.mean(margins_j):+.4f} "
            f"std {st.stdev(margins_j):.4f} over {len(margins_j)} seeds")
        log(f"mamdr-separate margin: mean {st.mean(margins_s):+.4f} "
            f"std {st.stdev(margins_s):.4f}")
    with open(rp, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
