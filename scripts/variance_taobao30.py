"""Seed-variance analysis of the Taobao-30 headline margins (VERDICT r3 #5).

Re-rolls the campaign_tb30 generator (round-4 starving-tail recipe, themes
20-29 a few hundred clicks) at extra generator seeds and runs the
margin-critical variants — joint, separate, MAMDR(ft) — so the T30
ordering checks (MAMDR > joint > separate, joint > separate) carry a
3-seed variance block like A6/A13/T20 do. (DN is omitted: its margin vs
MAMDR is ~0.045, far beyond seed noise.)

Pure orchestrator: never imports jax. Each seed runs as a fresh
`campaign_tb30.py --variants=...` subprocess with CAMPAIGN_ROOT/SEED env —
this reuses the exact campaign generator + ETL + recipe stamps, keeps the
TPU single-client (one child at a time), and isolates TPU-worker crashes
(the child's results.json makes retries resume mid-matrix).

Run AFTER campaign_tb30 (seed 11 rows come from its results):
  nohup python scripts/variance_taobao30.py > /tmp/variance_t30.log 2>&1 &
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
ROOT = osp.join(REPO, "variance_t30")
SEEDS = [12, 13]  # campaign raw uses rng seed 11
VARIANTS = [
    # DN is deliberately absent: its T30 margin vs MAMDR is huge
    # (~0.02+, far beyond seed noise) — the seeds go to the thin margins.
    # mmoe joined in round 4: the campaign's MAMDR-MMoE gap is +0.0003,
    # the thinnest margin on the board.
    "mlp",
    "mlp_separate",
    "mlp_meta_mamdr_finetune",
    "mmoe",
]
ATTEMPTS = 3
ATTEMPT_TIMEOUT_S = 4 * 3600


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def seed_root(seed: int) -> str:
    return osp.join(ROOT, f"tb30_s{seed}")


def run_seed(seed: int) -> None:
    env = dict(os.environ)
    env["CAMPAIGN_ROOT"] = seed_root(seed)
    env["CAMPAIGN_SEED"] = str(seed)
    cmd = [
        sys.executable,
        osp.join(REPO, "scripts", "campaign_tb30.py"),
        "--variants=" + ",".join(VARIANTS),
    ]
    for attempt in range(1, ATTEMPTS + 1):
        if done(seed):
            return
        log(f"seed {seed}: attempt {attempt}: {' '.join(cmd[1:])}")
        try:
            rc = subprocess.run(
                cmd, env=env, cwd=REPO, timeout=ATTEMPT_TIMEOUT_S
            ).returncode
        except subprocess.TimeoutExpired:
            log(f"seed {seed}: attempt {attempt} timed out "
                f"({ATTEMPT_TIMEOUT_S}s) — child killed, will resume")
            continue
        if rc == 0:
            return
        log(f"seed {seed}: attempt {attempt} exited rc={rc}; retrying "
            "(results.json resumes mid-matrix)")
    log(f"seed {seed}: giving up after {ATTEMPTS} attempts")


def load_rows(path: str) -> dict:
    if not osp.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


GEN_VERSION = 3  # must match campaign_tb30.gen_recipe()["version"]


def done(seed: int) -> bool:
    rows = load_rows(osp.join(seed_root(seed), "results.json"))
    stamp = rows.get("_taobao_gen", {})
    if stamp.get("seed") != seed or stamp.get("version") != GEN_VERSION:
        return False  # stale/missing recipe stamp — let the child sort it out
    return all(
        v in rows and "error" not in rows.get(v, {}) for v in VARIANTS
    )


def auc(rows: dict, variant: str) -> float | None:
    """Ordering-protocol AUC: finetuned when present (reference
    run.py:82-87 records the finetuned AUC for *_finetune variants)."""
    e = rows.get(variant)
    if not e or "error" in e:
        return None
    stage = e.get("finetune", e.get("test"))
    return None if stage is None else stage["avg_auc"]


def summarize() -> dict:
    per_seed = {}
    s11 = load_rows(osp.join(REPO, "campaign_tb30", "results.json")) or (
        load_rows(osp.join(REPO, "campaign_snapshots",
                           "campaign_tb30.results.json")))
    per_seed[11] = s11
    for seed in SEEDS:
        per_seed[seed] = load_rows(osp.join(seed_root(seed), "results.json"))

    margins = {
        "mamdr_ft_minus_joint": ("mlp_meta_mamdr_finetune", "mlp"),
        "mamdr_ft_minus_separate": ("mlp_meta_mamdr_finetune",
                                    "mlp_separate"),
        "mamdr_ft_minus_dn_ft": ("mlp_meta_mamdr_finetune",
                                 "mlp_meta_domain_negotiation_finetune"),
        "mamdr_ft_minus_mmoe": ("mlp_meta_mamdr_finetune", "mmoe"),
        "joint_minus_separate": ("mlp", "mlp_separate"),
    }
    out = {"seeds": {}, "margins": {}}
    for seed, rows in per_seed.items():
        out["seeds"][str(seed)] = {
            v: auc(rows, v) for v in VARIANTS if auc(rows, v) is not None
        }
    for name, (a, b) in margins.items():
        vals = []
        for seed, rows in per_seed.items():
            ma, mb = auc(rows, a), auc(rows, b)
            if ma is not None and mb is not None:
                vals.append(ma - mb)
                log(f"seed {seed}: {name} = {ma - mb:+.4f}")
        if len(vals) >= 2:
            out["margins"][name] = {
                "mean": round(st.mean(vals), 4),
                "std": round(st.stdev(vals), 4),
                "n": len(vals),
                "positive": sum(v > 0 for v in vals),
                "values": [round(v, 4) for v in vals],
            }
            log(f"{name}: mean {st.mean(vals):+.4f} std "
                f"{st.stdev(vals):.4f} ({sum(v>0 for v in vals)}/{len(vals)}"
                " positive)")
    return out


def main():
    os.makedirs(ROOT, exist_ok=True)
    for seed in SEEDS:
        run_seed(seed)
    out = summarize()
    rp = osp.join(ROOT, "results.json")
    with open(rp, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    snap = osp.join(REPO, "campaign_snapshots", "variance_t30.results.json")
    with open(snap, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    log(f"summary written: {rp}")


if __name__ == "__main__":
    main()
