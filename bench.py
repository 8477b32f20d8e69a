"""Throughput benchmark: full MAMDR (DN+DR) training epoch, Taobao-30 shapes.

Runs the flagship MLP+DN+DR strategy on the one real TPU chip with the
Taobao-30 benchmark's shapes (30 domains, 128-d frozen pretrained user/item
embeddings, batch 1024, hidden [256,128,64] — config/Taobao-10/
deepctr_DN+DR.json hparams) over synthetic data, and measures end-to-end
training examples/sec for one full MAMDR epoch: DN phase (sequential pass
over all domains) + DR phase (sample_num+1 support/query runs per domain),
including all weight-space merge/outer-update ops and host-side batch
stacking — i.e. the same work the reference does per epoch in
model_zoo/mamdr.py:41-108.

Baseline: the reference publishes no throughput (BASELINE.md); the TF1-GPU
estimate used for vs_baseline is 200k examples/s — one sess.run per 1024
batch at ~5ms on an RTX 2080 (graph dispatch dominates at this model size;
reference prints wall-clock only, maml.py:101-103). The BASELINE.json target
is >=5x this.

Prints ONE JSON line on stdout; progress goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_EXAMPLES_PER_SEC = 200_000.0  # estimated TF1-GPU reference (see above)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def enable_compile_cache():
    """First XLA compile through the axon tunnel can take minutes; the
    persistent cache cuts warmup ~2x on later runs (deserializing the
    602MB lanes executable through the tunnel still costs ~4 min)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_bench_strategy():
    """The flagship bench workload, shared with scripts/prewarm_bench.py —
    the prewarm stage must trace IDENTICAL HLO so its persistent-cache
    entries hit here (axon deserializes the cache across processes; keys
    are process-stable, PERF.md round-3 finding).

    Returns (trainer, strat, meta) with meta holding the shape constants.
    """
    import os as _os

    import jax

    from mamdr_tpu.config import ExperimentConfig
    from mamdr_tpu.data.synthetic import make_synthetic_dataset
    from mamdr_tpu.strategies.mamdr import MAMDRStrategy
    from mamdr_tpu.train.trainer import Trainer

    n_domain = 30
    n_uid = 100_000
    n_pid = 100_000
    n_per_domain = 20_000
    batch_size = 1024

    cfg = ExperimentConfig.from_dict(
        {
            "model": {
                "name": "mlp_meta_mamdr_finetune",
                "user_dim": 128,
                "item_dim": 128,
                "domain_dim": 128,
                "hidden_dim": [256, 128, 64],
                "dropout": 0.5,
                # BENCH_COMPUTE_DTYPE=bfloat16 measures the mixed-precision
                # tower (f32 default = reference numerics)
                "compute_dtype": _os.environ.get(
                    "BENCH_COMPUTE_DTYPE", "float32"
                ),
            },
            "train": {
                "load_pretrain_emb": True,
                "emb_trainable": False,
                "learning_rate": 1e-3,
                "meta_learning_rate": 0.1,
                "merged_method": "plus",
                "sample_num": 5,
                "add_query_domain": True,
                "shuffle_sequence": True,
                "epoch": 1,
            },
            "dataset": {"name": "synthetic", "batch_size": batch_size, "seed": 123},
        }
    )

    log(f"devices: {jax.devices()}")
    ds = make_synthetic_dataset(
        n_domain=n_domain,
        n_uid=n_uid,
        n_pid=n_pid,
        n_per_domain=n_per_domain,
        seed=123,
        long_tail=False,
        batch_size=batch_size,
    )
    # Frozen pretrained 128-d tables (Taobao recipe).
    rng = np.random.default_rng(0)
    ds.user_emb = rng.normal(0, 0.1, (n_uid, 128)).astype(np.float32)
    ds.item_emb = rng.normal(0, 0.1, (n_pid, 128)).astype(np.float32)

    trainer = Trainer(cfg, ds, verbose=False)
    strat = MAMDRStrategy(trainer)
    meta = dict(
        n_domain=n_domain, n_uid=n_uid, n_pid=n_pid,
        n_per_domain=n_per_domain, batch_size=batch_size,
    )
    return trainer, strat, meta


def main():
    import jax

    _bench_start = time.time()
    enable_compile_cache()

    import os as _os

    trainer, strat, meta = build_bench_strategy()
    cfg, ds = trainer.config, trainer.dataset
    n_domain, batch_size = meta["n_domain"], meta["batch_size"]

    # The flat-vector Adam (one fused update kernel) must be active — its
    # absence was the suspected cause of the r01 8.65M-vs-10.4M gap.
    assert cfg.train.flat_optimizer, "flat_optimizer must be on for the bench"
    log(f"flat_optimizer={cfg.train.flat_optimizer} "
        f"emb_trainable={cfg.train.emb_trainable} dropout=0.5 hash-PRNG")

    steps_per_domain = -(-int(ds.train[0].n) // batch_size)
    # One MAMDR epoch trains: DN = n_domain epochs; DR = n_domain *
    # (sample_num + add_query) * (support epoch + query epoch).
    runs_per_epoch = n_domain + n_domain * (cfg.train.sample_num + 1) * 2
    examples_per_epoch = runs_per_epoch * ds.train[0].n

    def sync():
        # NOTE: jax.block_until_ready is unreliable on the axon platform —
        # force completion with a device->host scalar readback instead. ONE
        # readback of a DR output fences the whole epoch chain: the DR
        # dispatch consumes the DN phase's outputs (state, shared), so its
        # completion implies every queued dispatch completed. Each readback
        # costs ~2 tunnel RTTs (~66ms) — measure GROUPS of epochs per sync
        # so the measurement isn't dominated by the readback tail.
        float(jax.tree_util.tree_leaves(strat._spec_stack)[3].sum())

    # BENCH_PARALLEL_COMPILE=1 AOT-compiles the DN and DR graphs on two
    # threads (VERDICT item 6 measurement hook; the remote compile service
    # is believed to serialize — this flag lets us verify).
    import os

    parallel = os.environ.get("BENCH_PARALLEL_COMPILE", "") == "1"
    log(f"warmup epoch (compiles fused DN+DR phases, parallel={parallel})...")
    strat.prepare_fused(parallel_compile=parallel)
    t0 = time.time()
    strat.run_fused_epoch()
    sync()
    log(f"warmup: {time.time() - t0:.1f}s")

    # Async dispatches pipeline through the tunnel; syncing once per GROUP
    # of epochs keeps the ~66ms readback tail out of the per-epoch number
    # (it was ~30% of the measurement once the parallel-lanes DR cut epoch
    # compute to ~0.25s).
    group, n_groups = 5, 3
    # Warmup variance foot-gun (VERDICT r2 item 6): the remote compile
    # service has compiled identical HLO in 120s and 396s twenty minutes
    # apart. If warmup ate most of the BENCH_DEADLINE budget (the driver's
    # conventional `timeout 590`), shrink the measurement so the JSON line
    # still gets out — a slightly noisier number beats a killed run.
    deadline = float(_os.environ.get("BENCH_DEADLINE", "570"))
    remaining = deadline - (time.time() - _bench_start)
    if remaining < 90:
        group, n_groups = 2, 1
        log(f"warmup consumed the budget ({remaining:.0f}s left) — "
            f"shrinking to {n_groups}x{group} epochs")
    elif remaining < 180:
        group, n_groups = 5, 1
        log(f"tight budget ({remaining:.0f}s left) — one 5-epoch group")
    log(f"measuring {n_groups} groups of {group} epochs (2 dispatches each)...")
    times = []
    for _ in range(n_groups):
        t0 = time.time()
        for _ in range(group):
            strat.run_fused_epoch()
        sync()
        times.append((time.time() - t0) / group)
    elapsed = float(np.median(times))
    throughput = examples_per_epoch / elapsed
    log(
        f"per-epoch times (group medians): {[f'{t:.3f}' for t in times]}s "
        f"(median {elapsed:.3f}, best {min(times):.3f}); "
        f"{examples_per_epoch} examples/epoch "
        f"({runs_per_epoch} domain-epochs x {steps_per_domain} steps) "
        f"-> {throughput:,.0f} ex/s median, "
        f"{examples_per_epoch / min(times):,.0f} best"
    )

    # MFU estimate: MLP tower fwd = 384*256+256*128+128*64+64 ~ 139k MACs
    # per example; train ~ 3x fwd (dense bwd; tables frozen). v5e bf16 peak
    # ~394 TFLOP/s. This workload is dispatch/gather-bound, not MXU-bound —
    # low MFU is expected at this model size (see PERF.md).
    train_flops_per_example = 3 * 2 * 139_392
    mfu = throughput * train_flops_per_example / 394e12
    log(f"MFU estimate: {mfu * 100:.2f}% of v5e bf16 peak")

    # Print the one JSON line FIRST: warmup consumes most of the driver's
    # timeout budget, and the secondary surfaces below must never cost us
    # the headline record.
    print(
        json.dumps(
            {
                "metric": "mamdr_dn_dr_train_examples_per_sec_per_chip",
                "value": round(throughput, 1),
                "unit": "examples/s",
                "vs_baseline": round(throughput / BASELINE_EXAMPLES_PER_SEC, 2),
                "mfu_bf16_est": round(mfu, 4),
                "epoch_seconds_median": round(elapsed, 3),
                "dr_parallel": strat._dr_parallel_eligible(),
            }
        ),
        flush=True,
    )

    # Secondary surfaces (stderr only), opt-in: BENCH_EVAL=1.
    import os

    if os.environ.get("BENCH_EVAL", "") == "1":
        try:
            eval_block = trainer.eval_block("val")
            trainer.val_and_test("val")  # compile
            t0 = time.time()
            trainer.val_and_test("val")
            n_eval = sum(s.n for s in ds.val)
            ev = time.time() - t0
            pad_eval = (
                eval_block["uid"].shape[0]
                * eval_block["uid"].shape[1]
                * eval_block["uid"].shape[2]
            )
            log(f"fused all-domain eval: {ev:.2f}s for {n_eval} real "
                f"({pad_eval} padded) examples -> {n_eval/ev:,.0f} ex/s")
        except Exception as e:
            log(f"eval bench skipped: {e}")


if __name__ == "__main__":
    main()
