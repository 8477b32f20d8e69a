"""Prune campaign_others rows whose training hit the epoch cap instead of
early-stopping (reference protocol: strict-improvement early stop with an
effectively unlimited epoch bound, base_model.py:202-224). Pruned rows are
re-run by the next restartable `campaign_others.py` pass at the raised cap,
landing with the early_stopped/epoch_cap instrumentation.

Detection: the variant's LATEST ckpt metrics.jsonl — capped when the run
used all its epochs AND the best val epoch is within `patience` of the end
(i.e. the stopper never fired). Rows with no surviving metrics (r3-era
ckpts were wiped) are pruned only if listed in STATIC_PRUNE: the Taobao-10
north-star rows, where the 25-epoch cap demonstrably bit their cohort, and
Taobao_20/mlp (same frozen-embedding family, status unknown).

CPU-only, instant. Run ONLY while no campaign process is live (a running
campaign holds results in memory and would write pruned rows back).
"""

from __future__ import annotations

import glob
import json
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
ROOT = osp.join(REPO, "campaign_others")
PATIENCE = 3
OLD_CAP = 25

STATIC_PRUNE = [
    "Taobao-10/mlp",
    "Taobao-10/mlp_meta_mamdr_finetune",
    "Taobao-10/mmoe",
    "Taobao-10/ple",
    "Taobao_20/mlp",
]


def latest_run_capped(bench: str, variant: str):
    dirs = sorted(glob.glob(
        osp.join(ROOT, "ckpt", bench, variant, "*", "*", "*")
    ))
    if not dirs:
        return None  # unknown — r3-era ckpt wiped
    mpath = osp.join(dirs[-1], "metrics.jsonl")
    if not osp.exists(mpath):
        return None
    ve = [json.loads(l) for l in open(mpath)]
    ve = [r for r in ve if r.get("event") == "val_eval"]
    if not ve:
        return None
    best_ep = max(range(len(ve)), key=lambda i: ve[i]["avg_auc"])
    return len(ve) >= OLD_CAP and best_ep > len(ve) - 1 - PATIENCE


def main():
    rp = osp.join(ROOT, "results.json")
    if not osp.exists(rp):
        print("no campaign_others/results.json; nothing to prune")
        return
    with open(rp) as f:
        results = json.load(f)
    pruned = []
    for key in list(results):
        if key.startswith("_"):
            continue
        entry = results[key]
        if entry.get("early_stopped") is not None:
            continue  # instrumented row from the raised-cap era — trust it
        bench, variant = key.split("/", 1)
        capped = latest_run_capped(bench, variant)
        if capped or (capped is None and key in STATIC_PRUNE):
            pruned.append(key)
            del results[key]
    if not pruned:
        print("no capped rows found")
        return
    for path in (rp, osp.join(REPO, "campaign_snapshots",
                              "campaign_others.results.json")):
        with open(path, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")
    print(f"pruned {len(pruned)} capped/unknown rows for rerun:")
    for k in pruned:
        print(f"  {k}")


if __name__ == "__main__":
    sys.exit(main())
