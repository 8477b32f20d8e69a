"""Long-tail fused MAMDR: padded scan vs ragged/dynamic-bound execution.

The padded fused paths run every domain-epoch to the GLOBAL max step count
(weight-0 no-op steps); on long-tailed datasets most steps are pads
(Amazon-13: ~3.7x). The ragged DN pass + dynamically-bounded DR epochs run
only real steps. This probe builds an Amazon-13-shaped long-tail synthetic
(13 domains, ~360k head -> ~2.8k tail, batch 1024) and times one full fused
DN+DR epoch each way on the real chip.

Run: timeout 1800 python scripts/probe_ragged.py  (TPU, single-client!)
"""

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from mamdr_tpu.config import ExperimentConfig
    from mamdr_tpu.data.synthetic import make_synthetic_dataset
    from mamdr_tpu.strategies.mamdr import MAMDRStrategy
    from mamdr_tpu.train import fused
    from mamdr_tpu.train.trainer import Trainer

    batch = 1024
    cfg = ExperimentConfig.from_dict(
        {
            "model": {
                "name": "mlp_meta_mamdr_finetune",
                "user_dim": 128, "item_dim": 128, "domain_dim": 128,
                "hidden_dim": [256, 128, 64], "dropout": 0.5,
            },
            "train": {
                "load_pretrain_emb": True, "emb_trainable": False,
                "learning_rate": 1e-3, "meta_learning_rate": 0.1,
                "merged_method": "plus", "sample_num": 5,
                "add_query_domain": True, "shuffle_sequence": True,
                "epoch": 1,
            },
            "dataset": {"name": "synthetic", "batch_size": batch, "seed": 123},
        }
    )
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    ds = make_synthetic_dataset(
        n_domain=13, n_uid=100_000, n_pid=100_000, n_per_domain=360_000,
        seed=123, long_tail=True, batch_size=batch,
    )
    rng = np.random.default_rng(0)
    ds.user_emb = rng.normal(0, 0.1, (100_000, 128)).astype(np.float32)
    ds.item_emb = rng.normal(0, 0.1, (100_000, 128)).astype(np.float32)

    sizes = [s.n for s in ds.train]
    steps = [-(-n // batch) for n in sizes]
    print(
        f"sizes {sizes}\nsteps {steps}: sum {sum(steps)} vs padded "
        f"{len(steps) * max(steps)} ({len(steps) * max(steps) / sum(steps):.2f}x waste)",
        file=sys.stderr, flush=True,
    )

    trainer = Trainer(cfg, ds, verbose=False)
    strat = MAMDRStrategy(trainer)
    assert strat.use_fused

    def sync():
        for leaf in (
            jax.tree_util.tree_leaves(trainer.state.params)[:1]
            + jax.tree_util.tree_leaves(strat.shared)[:1]
        ):
            float(leaf.sum())

    results = {}
    for label, steps_list in (("ragged", trainer.steps_per_domain()), ("padded", None)):
        strat.prepare_fused()
        if steps_list is None:
            train_step_fn = trainer.train_step_fn()
            strat._dn_phase, strat._dr_phase = fused.make_fused_mamdr(
                train_step_fn, strat.mask, strat.tc.merged_method,
                strat._fused_steps_per_domain, batch,
                strat.tc.domain_regulation_step, steps_list=None,
            )
            strat._dn_compiled = strat._dr_compiled = None
        t0 = time.time()
        strat.run_fused_epoch()
        sync()
        print(f"{label}: warmup(+compile) {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        times = []
        for _ in range(3):
            t0 = time.time()
            strat.run_fused_epoch()
            sync()
            times.append(time.time() - t0)
        med = float(np.median(times))
        results[label] = med
        # real examples: DN trains every domain once; DR per query q runs
        # sample_num+1 support epochs + capped query epochs
        k = strat.tc.sample_num + int(strat.tc.add_query_domain)
        cap = strat.tc.domain_regulation_step
        dn_ex = sum(sizes)
        dr_ex = 0
        for q, nq in enumerate(sizes):
            q_ex = nq if cap <= 0 else min(nq, cap * batch)
            dr_ex += k * (int(np.mean(sizes)) + q_ex)  # aux sampled ~uniform
        print(
            f"{label}: epoch {med:.2f}s (times {[f'{t:.2f}' for t in times]}), "
            f"~{(dn_ex + dr_ex) / med / 1e6:.2f}M real ex/s",
            file=sys.stderr, flush=True,
        )
    print(
        f"SPEEDUP ragged vs padded: {results['padded'] / results['ragged']:.2f}x "
        f"({results['padded']:.2f}s -> {results['ragged']:.2f}s)",
        file=sys.stderr, flush=True,
    )


if __name__ == "__main__":
    main()
