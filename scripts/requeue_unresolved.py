"""Requeue ONLY the epoch-capped rows that leave an ordering check
unresolved (VERDICT r4 item 1, surgical version).

Under the one-sided resolution rule (render_results.ordering_checks): a
capped row on the WINNING side of a check cannot flip it (its recorded AUC
is a lower bound under the reference's strict-improvement protocol), so
only capped rows on LOSING sides need more epochs. This script computes
that set from the campaign_others results and deletes exactly those rows so
the next `CAMPAIGN_EPOCHS=<higher cap> python scripts/campaign_others.py`
pass retrains them to convergence — instead of blanket-requeuing every
non-early-stopped row (prune_capped --recap), most of which are winners
that would burn ~10 min of TPU each for no check movement.

CPU-only, instant. Run ONLY while no campaign process is live.
  python scripts/requeue_unresolved.py [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(REPO, "scripts"))

from render_results import ordering_checks  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()
    rp = osp.join(REPO, "campaign_others", "results.json")
    snap = osp.join(REPO, "campaign_snapshots",
                    "campaign_others.results.json")
    src = rp if osp.exists(rp) else snap
    if not osp.exists(src):
        print("no campaign_others results; nothing to do")
        return
    results = json.load(open(src))
    by_bench = {}
    for key, entry in results.items():
        if key.startswith("_") or "/" not in key:
            continue
        bench, name = key.split("/", 1)
        by_bench.setdefault(bench, {})[name] = entry
    requeue = []
    for bench, rows in by_bench.items():
        unresolved = []
        ordering_checks(rows, collect_unresolved=unresolved)
        for name in sorted(set(unresolved)):
            requeue.append(f"{bench}/{name}")
    if not requeue:
        print("all ordering checks resolved; nothing to requeue")
        return
    print("unresolved (capped, losing side) — requeue for uncapped rerun:")
    for k in requeue:
        e = results[k]
        print(f"  {k} (cap {e.get('epoch_cap')}, "
              f"test {e.get('test', {}).get('avg_auc', 0):.4f})")
    if args.dry_run:
        return
    for k in requeue:
        del results[k]
    for path in (rp, snap):
        with open(path, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")
    print(f"requeued {len(requeue)} rows (deleted from results.json); rerun "
          "campaign_others.py with a higher CAMPAIGN_EPOCHS")


if __name__ == "__main__":
    main()
