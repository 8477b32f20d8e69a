"""Prune campaign_others rows whose training hit the epoch cap instead of
early-stopping (reference protocol: strict-improvement early stop with an
effectively unlimited epoch bound, base_model.py:202-224). Pruned rows are
re-run by the next restartable `campaign_others.py` pass at the raised cap,
landing with the early_stopped/epoch_cap instrumentation.

Detection: the variant's LATEST ckpt metrics.jsonl — capped when the run
used all its epochs AND the best val epoch is within `patience` of the end
(i.e. the stopper never fired). Rows with no surviving metrics (campaign
ckpt dirs are untracked and get wiped by session resets) are pruned only if
listed in STATIC_PRUNE — the cohort the r4 metrics inspection documented as
still climbing at the 25-epoch cap (CLAUDE.md round-4 notes: T10
DN/MLDG/Reptile/UW/SharedBottom + the T10 north-star rows — MMoE jumped
0.8268->0.8465 at cap 50 — A13 DN, and the T20 frozen-embedding family,
whose per-row status is unknown so the whole bench reruns for a uniform
epoch protocol).

`--recap=N`: additionally requeue INSTRUMENTED rows (early_stopped/
epoch_cap present) that hit a cap below N without early-stopping, so a
raised-cap campaign pass retrains them to convergence. N must equal the
CAMPAIGN_EPOCHS the rerun will use — a recap above the configured cap
would requeue rows into an endless re-cap/re-prune loop.

Reads the live campaign_others/results.json when present, else the tracked
campaign_snapshots mirror; writes the pruned set back to both.

CPU-only, instant. Run ONLY while no campaign process is live (a running
campaign holds results in memory and would write pruned rows back).
"""

from __future__ import annotations

import argparse
import glob
import json
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
ROOT = osp.join(REPO, "campaign_others")
PATIENCE = 3
OLD_CAP = 25

STATIC_PRUNE = [
    # Taobao-10: the r4 metrics inspection found DN/MLDG/Reptile/UW/
    # shared_bottom still climbing at epoch 25; mlp/mamdr/mmoe/ple are the
    # north-star cohort (MMoE 0.8268->0.8465 at cap 50). maml/pcgrad/star
    # early-stopped and are kept.
    "Taobao-10/mlp",
    "Taobao-10/mlp_meta_mamdr_finetune",
    "Taobao-10/mmoe",
    "Taobao-10/ple",
    "Taobao-10/mlp_meta_domain_negotiation_finetune",
    "Taobao-10/mlp_meta_mldg_finetune",
    "Taobao-10/mlp_meta_reptile_finetune",
    "Taobao-10/mlp_uncertainty_weight",
    "Taobao-10/shared_bottom",
    # Taobao_20: "several rows still climbing" — per-row evidence wiped, so
    # the whole bench reruns at the raised cap for a uniform protocol
    # (early-stopped rows reproduce; capped ones retrain to convergence).
    "Taobao_20/mlp",
    "Taobao_20/star",
    "Taobao_20/star_meta_mamdr_finetune",
    "Taobao_20/mlp_meta_mamdr_finetune",
    "Taobao_20/mlp_meta_domain_negotiation_finetune",
    "Taobao_20/mmoe",
    # Amazon_13: DN was the one Amazon row still climbing at the cap.
    "Amazon_13/mlp_meta_domain_negotiation_finetune",
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
    ap = argparse.ArgumentParser(
        description="prune capped campaign_others rows for rerun"
    )
    ap.add_argument(
        "--recap",
        type=int,
        default=None,
        metavar="N",
        help="also requeue instrumented rows that hit a cap < N without "
        "early-stopping; must equal the CAMPAIGN_EPOCHS of the rerun",
    )
    args = ap.parse_args()  # errors out on any unrecognized argv
    recap = args.recap
    print(f"recap threshold: {recap if recap is not None else 'off'}")
    rp = osp.join(ROOT, "results.json")
    snap = osp.join(REPO, "campaign_snapshots", "campaign_others.results.json")
    src = rp if osp.exists(rp) else snap
    if not osp.exists(src):
        print("no campaign_others results (live or snapshot); nothing to prune")
        return
    with open(src) as f:
        results = json.load(f)
    pruned = []
    for key in list(results):
        if key.startswith("_"):
            continue
        entry = results[key]
        if entry.get("early_stopped") is not None:
            # Instrumented row. With --recap=N, prune it anyway when it hit
            # a cap below N without early-stopping (the raised-cap rerun
            # trains it to convergence); otherwise trust it.
            if recap is not None and entry["early_stopped"] is False:
                cap = entry.get("epoch_cap")
                if cap is None:
                    # campaign_others.py always writes both fields; a
                    # missing cap signals a malformed row — don't guess.
                    print(f"  WARN {key}: early_stopped without epoch_cap; "
                          "skipping (malformed row)")
                elif cap < recap:
                    pruned.append(key)
                    del results[key]
            continue
        bench, variant = key.split("/", 1)
        capped = latest_run_capped(bench, variant)
        if capped or (capped is None and key in STATIC_PRUNE):
            pruned.append(key)
            del results[key]
    if not pruned:
        print("no capped rows found")
        return
    import os
    os.makedirs(ROOT, exist_ok=True)
    for path in (rp, snap):
        with open(path, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")
    print(f"pruned {len(pruned)} capped/unknown rows for rerun:")
    for k in pruned:
        print(f"  {k}")


if __name__ == "__main__":
    sys.exit(main())
