"""Second TPU bench surface (VERDICT r4 item 6): fused-epoch throughput for
the MTL (MMoE) and STAR families at Taobao-10 benchmark shapes.

bench.py's headline stays the flagship MAMDR DN+DR epoch; this records that
the fused execution engine's throughput generalises beyond the MLP tower:
one fused dispatch per joint epoch (lax.scan over domains over steps,
fused.make_fused_passes) for MMoE (batched expert einsums + per-task
towers) and STAR (partitioned normalisation + star-dense towers, stat-
carrying). Numbers land in PERF_MTL.json and the PERF.md table.

Shapes: 10 domains x 20k examples, frozen pretrained 128-d user/item
tables, batch 1024 — the Taobao-10 reference recipe via
mamdr_tpu.benchmarks (reference config/Taobao-10/{mmoe,star}.json hparams).

TPU single-client: run alone.
  timeout 1800 python scripts/bench_mtl_star.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


N_DOMAIN, N_UID, N_PID, N_PER, BATCH = 10, 100_000, 100_000, 20_000, 1024


def bench_model(model_name, jax):
    from mamdr_tpu.benchmarks import benchmark_config
    from mamdr_tpu.data.synthetic import make_synthetic_dataset
    from mamdr_tpu.train import fused
    from mamdr_tpu.train.trainer import Trainer

    cfg = benchmark_config("Taobao-10", model_name)
    cfg.train.epoch = 1
    cfg.train.metrics_jsonl = False
    cfg.train.checkpoint_path = "/tmp/bench_mtl/ckpt"
    cfg.train.result_save_path = "/tmp/bench_mtl/result"
    ds = make_synthetic_dataset(
        n_domain=N_DOMAIN, n_uid=N_UID, n_pid=N_PID, n_per_domain=N_PER,
        seed=123, long_tail=False, batch_size=BATCH,
    )
    rng = np.random.default_rng(0)
    ds.user_emb = rng.normal(0, 0.1, (N_UID, 128)).astype(np.float32)
    ds.item_emb = rng.normal(0, 0.1, (N_PID, 128)).astype(np.float32)

    t = Trainer(cfg, ds, verbose=False)
    assert t.fused_padding_ok(ragged=True)
    block, n_steps = t.train_block()
    sequential_pass = fused.make_fused_passes(
        t.train_step_fn(), n_steps, BATCH, steps_list=t.steps_per_domain(),
    )
    order = np.arange(N_DOMAIN, dtype=np.int32)

    def epoch():
        t.rng, sub = jax.random.split(t.rng)
        t.state, _ = sequential_pass(t.state, block, order, sub)

    def sync():
        # axon: block_until_ready unreliable — scalar readback fences
        float(jax.tree_util.tree_leaves(t.state.params)[-1].sum())

    t0 = time.time()
    epoch()
    sync()
    warmup = time.time() - t0
    log(f"{model_name}: warmup (compile) {warmup:.1f}s")

    group, n_groups = 5, 2
    times = []
    for _ in range(n_groups):
        t0 = time.time()
        for _ in range(group):
            epoch()
        sync()
        times.append((time.time() - t0) / group)
    epoch_s = float(np.median(times))
    examples = N_DOMAIN * N_PER
    row = {
        "model": model_name,
        "examples_per_sec": round(examples / epoch_s, 1),
        "epoch_seconds_median": round(epoch_s, 4),
        "dispatches_per_epoch": 1,
        "warmup_seconds": round(warmup, 1),
        "examples_per_epoch": examples,
    }
    log(f"{model_name}: {row['examples_per_sec']:,.0f} ex/s "
        f"(epoch {epoch_s:.3f}s, 1 dispatch)")
    # free HBM before the next model
    del t, block, sequential_pass, ds
    import gc

    gc.collect()
    jax.clear_caches()
    return row


def bench_separate(jax):
    """Third fused engine: the vmapped separate lanes (one dispatch trains
    all D per-domain models — fused.make_fused_separate, the path the
    separate/finetune stages run in production)."""
    import jax.numpy as jnp

    from mamdr_tpu.benchmarks import benchmark_config
    from mamdr_tpu.data.synthetic import make_synthetic_dataset
    from mamdr_tpu.train import fused
    from mamdr_tpu.train.steps import make_subset_train_step
    from mamdr_tpu.train.trainer import Trainer
    from mamdr_tpu.utils import trees

    cfg = benchmark_config("Taobao-10", "mlp")
    cfg.train.epoch = 1
    cfg.train.metrics_jsonl = False
    cfg.train.checkpoint_path = "/tmp/bench_mtl/ckpt"
    cfg.train.result_save_path = "/tmp/bench_mtl/result"
    ds = make_synthetic_dataset(
        n_domain=N_DOMAIN, n_uid=N_UID, n_pid=N_PID, n_per_domain=N_PER,
        seed=123, long_tail=False, batch_size=BATCH,
    )
    rng = np.random.default_rng(0)
    ds.user_emb = rng.normal(0, 0.1, (N_UID, 128)).astype(np.float32)
    ds.item_emb = rng.normal(0, 0.1, (N_PID, 128)).astype(np.float32)
    t = Trainer(cfg, ds, verbose=False)
    tc = t.config.train
    frozen_mask = trees.named_tree_map(
        lambda n, x: (not tc.emb_trainable)
        and ("user_emb" in n or "item_emb" in n),
        t.state.params,
    )
    train_step, to_sub, combine = make_subset_train_step(
        t.model, t.tx, t.step_cfg, frozen_mask, t.state.params
    )

    def loss_fn_sub(p, stats, batch, rng_, train):
        return t.loss_fn(combine(p), stats, batch, rng_, train)

    block, n_steps = t.train_block()
    epoch_all, _, _ = fused.make_fused_separate(
        train_step, loss_fn_sub, n_steps, BATCH
    )
    sub0 = to_sub(t.state.params)
    params_stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (N_DOMAIN,) + x.shape), sub0
    )
    t.rng, sub = jax.random.split(t.rng)
    states = t.state.replace(
        params=params_stacked,
        batch_stats={},
        opt_state=jax.jit(jax.vmap(t.tx.init))(params_stacked),
        rng=jax.random.split(sub, N_DOMAIN),
        step=jnp.zeros((N_DOMAIN,), jnp.int32),
    )

    def epoch():
        nonlocal states
        t.rng, s = jax.random.split(t.rng)
        states, _ = epoch_all(states, block, s)

    def sync():
        float(jax.tree_util.tree_leaves(states.params)[-1].sum())

    t0 = time.time()
    epoch()
    sync()
    warmup = time.time() - t0
    log(f"separate_lanes: warmup (compile) {warmup:.1f}s")
    group, n_groups = 5, 2
    times = []
    for _ in range(n_groups):
        t0 = time.time()
        for _ in range(group):
            epoch()
        sync()
        times.append((time.time() - t0) / group)
    epoch_s = float(np.median(times))
    examples = N_DOMAIN * N_PER
    row = {
        "model": "mlp_separate_lanes",
        "examples_per_sec": round(examples / epoch_s, 1),
        "epoch_seconds_median": round(epoch_s, 4),
        "dispatches_per_epoch": 1,
        "warmup_seconds": round(warmup, 1),
        "examples_per_epoch": examples,
    }
    log(f"separate_lanes: {row['examples_per_sec']:,.0f} ex/s "
        f"(epoch {epoch_s:.3f}s, 1 dispatch trains all {N_DOMAIN} lanes)")
    del t, block, states, epoch_all, ds
    import gc

    gc.collect()
    jax.clear_caches()
    return row


def main():
    global N_UID, N_PID, N_PER
    import os

    import jax

    if os.environ.get("BENCH_MTL_CPU") == "1":
        # smoke mode: CPU + small shapes (correctness of the harness only)
        jax.config.update("jax_platforms", "cpu")
        N_UID = N_PID = 2_000
        N_PER = 2_000
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")
    rows = []

    def flush():
        with open("/root/repo/PERF_MTL.json", "w") as f:
            json.dump(rows, f, indent=2)
            f.write("\n")

    for model_name in ("mmoe", "star"):
        rows.append(bench_model(model_name, jax))
        flush()
    rows.append(bench_separate(jax))
    flush()
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
