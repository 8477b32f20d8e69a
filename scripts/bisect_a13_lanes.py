"""Bisect the Amazon-13 parallel-lanes TPU worker crash (VERDICT r4 item 2).

r2 and r4 both saw "UNAVAILABLE: TPU worker process crashed ... kernel
fault" when the MAMDR DR phase ran 13 vmapped lanes with trainable 128-d
tables (campaign_snapshots/campaign_lanes.results.json); Amazon-6 (6 lanes,
same table construction) runs clean at full scale. Hypotheses: concurrent
lane HBM high-water / fused-graph size scale with lane count.

This driver runs SHORT probes (2 fused epochs) in fresh SUBPROCESSES — a
worker crash kills every later dispatch in its process, so each trial needs
its own — over dr_lane_chunk values: 0 (unchunked 13-lane repro), 7, 4, 2.
lane_chunk=C scans ⌈13/C⌉ groups of C lanes, bitwise-equal to unchunked
(tests/test_fused_loop_equivalence.py), bounding concurrent lane state.

Outcomes land in bisect_a13.json. TPU single-client: run alone.
  nohup python scripts/bisect_a13_lanes.py > /tmp/bisect_a13.log 2>&1 &
"""

from __future__ import annotations

import json
import os.path as osp
import subprocess
import sys
import time

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
OUT = osp.join(REPO, "bisect_a13.json")

PROBE = r"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from mamdr_tpu.benchmarks import benchmark_config
from mamdr_tpu.config import DatasetConfig
from mamdr_tpu.data.dataset import MultiDomainDataset
from mamdr_tpu.strategies import build_strategy
from mamdr_tpu.train.trainer import Trainer

chunk = int(sys.argv[1])
dataset = MultiDomainDataset.from_disk(DatasetConfig(
    name="Amazon", dataset_path="/root/repo/campaign_others/dataset/Amazon",
    domain_split_path="split_by_category", batch_size=1024, seed=123,
))
cfg = benchmark_config("Amazon_13", "mlp_meta_mamdr_finetune")
cfg.train.epoch = 2
cfg.train.patience = 99
cfg.train.dr_parallel = "on"
cfg.train.dr_lane_chunk = chunk
cfg.train.checkpoint_path = "/tmp/bisect_a13/ckpt"
cfg.train.result_save_path = "/tmp/bisect_a13/result"
t0 = time.time()
trainer = Trainer(cfg, dataset, verbose=False)
strat = build_strategy(trainer)
assert strat._dr_parallel_eligible(), "gate refused"
strat.train()
_, auc, _, dauc = strat.test()
low = {k: round(v, 4) for k, v in dauc.items() if v < 0.52}
print(f"PROBE_OK chunk={chunk} auc={auc:.4f} secs={time.time()-t0:.0f} "
      f"low_domains={low}", flush=True)
"""


def main():
    results = json.load(open(OUT)) if osp.exists(OUT) else {}
    for chunk in (0, 7, 4, 2):
        key = f"chunk_{chunk}"
        if key in results:
            print(f"skip {key}: {results[key].get('status')}", flush=True)
            continue
        print(f"[{time.strftime('%H:%M:%S')}] probing dr_lane_chunk={chunk} "
              "(fresh process)", flush=True)
        t0 = time.time()
        # generous timeout: remote compile of the lane graph can take
        # minutes cold; the scan graph compiles once per chunk shape
        p = subprocess.run(
            [sys.executable, "-c", PROBE, str(chunk)],
            capture_output=True, text=True, timeout=3600, cwd=REPO,
        )
        ok = p.returncode == 0 and "PROBE_OK" in p.stdout
        tail = (p.stdout + p.stderr)[-2000:]
        results[key] = {
            "status": "ok" if ok else "crash_or_error",
            "returncode": p.returncode,
            "seconds": round(time.time() - t0, 1),
            "tail": tail,
        }
        print(tail[-600:], flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
            f.write("\n")
    print("bisect done:", {k: v["status"] for k, v in results.items()},
          flush=True)


if __name__ == "__main__":
    main()
