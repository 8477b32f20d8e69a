"""Flagship parallel-lanes DR at full scale on trainable embeddings
(VERDICT r3 #3): Amazon-6 AND Amazon-13 MAMDR with dr_parallel='on'.

The r2 worker crash + HBM corruption at these shapes retested clean in r3
(retest_amazon_lanes, commit 07fa545 — flaky chip). This produces the
durable evidence rows: both Amazon benchmarks trained through
fused.make_fused_dr_parallel (lane budget now derived from
device memory_stats), per-domain AUC sanity asserted, and the delta vs the
sequential campaign rows reported for the parity claim.

Restartable via results.json. TPU single-client: run alone.
  nohup python scripts/campaign_amazon_lanes.py > /tmp/amazon_lanes.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

CAMP = osp.join(REPO, "campaign_others")
ROOT = osp.join(REPO, "campaign_lanes")
EPOCH_CAP = int(os.environ.get("CAMPAIGN_EPOCHS", 50))  # early stop decides; cap is a safety bound
PATIENCE = 3
BENCHES = {
    "Amazon_6": "split_by_category_6",
    "Amazon_13": "split_by_category",
}
MODEL = "mlp_meta_mamdr_finetune"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def save(results):
    for path in (osp.join(ROOT, "results.json"),
                 osp.join(REPO, "campaign_snapshots",
                          "campaign_lanes.results.json")):
        with open(path, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")


def main():
    os.makedirs(ROOT, exist_ok=True)
    rp = osp.join(ROOT, "results.json")
    snap = osp.join(REPO, "campaign_snapshots", "campaign_lanes.results.json")
    src = rp if osp.exists(rp) else snap  # campaign dir wiped: tracked mirror
    results = json.load(open(src)) if osp.exists(src) else {}

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

    for bench, split in BENCHES.items():
        key = f"{bench}/{MODEL}@lanes"
        if key in results and "error" not in results[key]:
            log(f"skip {key} (done)")
            continue
        dataset = MultiDomainDataset.from_disk(DatasetConfig(
            name="Amazon", dataset_path=osp.join(CAMP, "dataset", "Amazon"),
            domain_split_path=split, batch_size=1024, seed=123,
        ))
        cfg = benchmark_config(bench, MODEL)
        cfg.train.epoch = EPOCH_CAP
        cfg.train.patience = PATIENCE
        cfg.train.dr_parallel = "on"  # force the vmapped-lanes DR phase
        # A13's 13 unchunked trainable-table lanes crashed the TPU worker
        # (r2 + r4); LANES_CHUNK_A13=C runs the lanes as ⌈13/C⌉ scanned
        # groups — bitwise-equal, bounded concurrent lane HBM (set from the
        # scripts/bisect_a13_lanes.py verdict).
        if bench == "Amazon_13":
            cfg.train.dr_lane_chunk = int(os.environ.get("LANES_CHUNK_A13", "0"))
        cfg.train.checkpoint_path = osp.join(ROOT, "ckpt", bench)
        cfg.train.result_save_path = osp.join(ROOT, "result", bench)
        t0 = time.time()
        entry = {"dr_parallel": "on",
                 "dr_lane_chunk": cfg.train.dr_lane_chunk}
        try:
            trainer = Trainer(cfg, dataset, verbose=False)
            strat = build_strategy(trainer)
            assert strat._dr_parallel_eligible(), "lane gate refused 'on'?"
            strat.train()
            entry["early_stopped"] = bool(trainer.stopper.early_stop)
            entry["epoch_cap"] = EPOCH_CAP
            _, auc, _, dauc = strat.test()
            entry["test"] = {
                "avg_auc": auc,
                "weighted_auc": trainer.weighted_auc("test", dauc),
                "domain_auc": dauc,
            }
            _, ft, _, ftd = strat.finetune()
            entry["finetune"] = {
                "avg_auc": ft,
                "weighted_auc": trainer.weighted_auc("test", ftd),
                "domain_auc": ftd,
            }
            entry["seconds"] = round(time.time() - t0, 1)
            # r2's corruption signature: one domain's table turns to noise
            # and its AUC collapses to ~0.5 while the others stay healthy.
            low = {k: v for k, v in ftd.items() if v < 0.55}
            entry["suspect_domains"] = low
            log(f"{key}: test {auc:.4f} ft {ft:.4f} in {entry['seconds']}s"
                + (f" SUSPECT {low}" if low else ""))
        except Exception as e:
            import traceback

            traceback.print_exc()
            entry["error"] = f"{type(e).__name__}: {e}"
            log(f"{key} FAILED: {entry['error']}")
        results[key] = entry
        save(results)
        import gc

        del entry
        try:
            del strat
        except NameError:
            pass
        try:
            del trainer
        except NameError:
            pass
        del dataset
        gc.collect()
        jax.clear_caches()

    # parity summary vs the sequential campaign rows
    camp = osp.join(CAMP, "results.json")
    if not osp.exists(camp):
        camp = osp.join(REPO, "campaign_snapshots",
                        "campaign_others.results.json")
    seq = json.load(open(camp)) if osp.exists(camp) else {}
    for bench in BENCHES:
        lane = results.get(f"{bench}/{MODEL}@lanes", {})
        base = seq.get(f"{bench}/{MODEL}", {})
        try:
            lf = lane["finetune"]["avg_auc"]
            bf = base["finetune"]["avg_auc"]
            results.setdefault("_parity", {})[bench] = {
                "lanes_ft": round(lf, 4), "sequential_ft": round(bf, 4),
                "delta": round(lf - bf, 4),
            }
            log(f"{bench}: lanes ft {lf:.4f} vs sequential ft {bf:.4f} "
                f"(delta {lf-bf:+.4f})")
        except KeyError:
            pass
    save(results)


if __name__ == "__main__":
    main()
