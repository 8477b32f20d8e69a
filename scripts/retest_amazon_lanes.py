"""Retest the r2 TPU incidents: Amazon trainable-table parallel-DR lanes.

r2 observed (a) a reproducible worker crash at Amazon-13 lane shapes and
(b) silent HBM corruption of a finetune lane's item table (CPU repros
clean). If the flagship Amazon_6 MAMDR runs clean with dr_parallel=on and
matches the sequential row's AUC, the isolation can be loosened for A6.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import os.path as osp
from mamdr_tpu.benchmarks import benchmark_config
from mamdr_tpu.config import DatasetConfig
from mamdr_tpu.data.dataset import MultiDomainDataset
from mamdr_tpu.strategies import build_strategy
from mamdr_tpu.train.trainer import Trainer

print("devices:", jax.devices(), flush=True)
dataset = MultiDomainDataset.from_disk(DatasetConfig(
    name="Amazon", dataset_path="/root/repo/campaign_others/dataset/Amazon",
    domain_split_path="split_by_category_6", batch_size=1024, seed=123,
))
cfg = benchmark_config("Amazon_6", "mlp_meta_mamdr_finetune")
cfg.train.epoch = 25
cfg.train.patience = 3
cfg.train.dr_parallel = "on"
cfg.train.checkpoint_path = "/root/repo/campaign_others/ckpt_lanes"
cfg.train.result_save_path = "/root/repo/campaign_others/result_lanes"
t0 = time.time()
trainer = Trainer(cfg, dataset, verbose=False)
strat = build_strategy(trainer)
assert strat._dr_parallel_eligible()
strat.train()
_, auc, _, dauc = strat.test()
_, ft, _, _ = strat.finetune()
print(f"parallel-lanes Amazon_6 MAMDR: test {auc:.4f} ft {ft:.4f} "
      f"in {time.time()-t0:.0f}s (sequential row: 0.7192/0.7190)", flush=True)
import numpy as np
for k, v in dauc.items():
    assert v > 0.5 or float(k) >= 4, f"domain {k} AUC {v} — corruption?"
print("per-domain AUCs sane:", {k: round(v,4) for k,v in dauc.items()}, flush=True)
