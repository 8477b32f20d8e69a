"""Amazon-13 MAMDR recipe probe (TPU): cap the DR query-regularization.

Per-domain analysis of the full-scale Amazon-13 campaign rows shows MAMDR
matching joint on the 4 big domains and losing 0.006-0.043 AUC on every
small one — the specifics overfit noise-floor tails through the UNCAPPED
query-domain pass of each DR support run (reference mamdr.py:92-99 caps it
at `domain_regulation_step` when >0; the shipped config says 0). This
probes domain_regulation_step (and specific-free DN as the bound) on the
campaign's Amazon_13 dataset.

TPU single-client: run alone. Results: /root/repo/variance_a6/../a13_recipe.json
"""

from __future__ import annotations

import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

ROOT = "/root/repo/campaign_others"
OUT = "/root/repo/a13_recipe.json"
EPOCH_CAP = 25
PATIENCE = 3

VARIANTS = [
    "mlp_meta_mamdr_finetune:domain_regulation_step=2",
    "mlp_meta_mamdr_finetune:domain_regulation_step=8",
    "mlp_meta_domain_negotiation_finetune",
]


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")

    from mamdr_tpu.benchmarks import benchmark_config
    from mamdr_tpu.config import DatasetConfig
    from mamdr_tpu.data.dataset import MultiDomainDataset
    from mamdr_tpu.strategies import build_strategy
    from mamdr_tpu.train.trainer import Trainer

    dataset = MultiDomainDataset.from_disk(DatasetConfig(
        name="Amazon", dataset_path=osp.join(ROOT, "dataset/Amazon"),
        domain_split_path="split_by_category", batch_size=1024, seed=123,
    ))
    results = json.load(open(OUT)) if osp.exists(OUT) else {}
    for spec in [a for a in sys.argv[1:] if not a.startswith("-")] or VARIANTS:
        if spec in results:
            continue
        name, *mods = spec.split(":")
        cfg = benchmark_config("Amazon_13", name)
        cfg.train.epoch = EPOCH_CAP
        cfg.train.patience = PATIENCE
        cfg.train.dr_parallel = "off"
        cfg.train.separate_fused = False
        for m in mods:
            k, v = m.split("=")
            cur = getattr(cfg.train, k)
            setattr(cfg.train, k, type(cur)(v) if cur is not None else v)
        cfg.train.checkpoint_path = osp.join(ROOT, "ckpt_probe")
        cfg.train.result_save_path = osp.join(ROOT, "result_probe")
        t0 = time.time()
        trainer = Trainer(cfg, dataset, verbose=False)
        strat = build_strategy(trainer)
        strat.train()
        _, auc, _, dauc = strat.test()
        out = {"test": {"avg_auc": auc,
                        "weighted_auc": trainer.weighted_auc("test", dauc),
                        "domain_auc": dauc}}
        if strat.spec.finetune:
            _, ft, _, ftd = strat.finetune()
            out["finetune"] = {"avg_auc": ft,
                               "weighted_auc": trainer.weighted_auc("test", ftd),
                               "domain_auc": ftd}
        out["seconds"] = round(time.time() - t0, 1)
        results[spec] = out
        log(f"{spec}: AUC {auc:.4f} "
            f"(ft {out.get('finetune', {}).get('avg_auc')}) "
            f"in {out['seconds']}s")
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")


if __name__ == "__main__":
    main()
