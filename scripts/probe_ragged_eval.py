"""Ragged vs padded fused eval on a long-tail split (Amazon-13 shape).

Run: timeout 900 python scripts/probe_ragged_eval.py  (TPU, single-client)
"""

import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    import jax

    from mamdr_tpu.config import ExperimentConfig
    from mamdr_tpu.data.synthetic import make_synthetic_dataset
    from mamdr_tpu.train import fused
    from mamdr_tpu.train.trainer import Trainer

    batch = 1024
    cfg = ExperimentConfig.from_dict(
        {
            "model": {
                "name": "mlp", "user_dim": 128, "item_dim": 128,
                "domain_dim": 128, "hidden_dim": [256, 128, 64], "dropout": 0.5,
            },
            "train": {"load_pretrain_emb": True, "emb_trainable": False},
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
    t = Trainer(cfg, ds, verbose=False)

    steps = t.eval_steps_per_domain("val")
    block = t.eval_block("val")
    print(
        f"eval steps {steps}: sum {sum(steps)} vs padded "
        f"{len(steps) * max(steps)}", file=sys.stderr, flush=True,
    )

    for label, sl in (("ragged", steps), ("padded", None)):
        fn = fused.make_fused_eval(t.loss_fn, 500, steps_list=sl)
        t0 = time.time()
        losses, aucs = fn(t.state.params, t.state.batch_stats, block)
        float(np.asarray(aucs).sum())
        print(f"{label}: warmup {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        times = []
        for _ in range(5):
            t0 = time.time()
            losses, aucs = fn(t.state.params, t.state.batch_stats, block)
            a = float(np.asarray(aucs).sum())
            times.append(time.time() - t0)
        print(
            f"{label}: eval {np.median(times) * 1e3:.1f}ms "
            f"(times {[f'{x * 1e3:.0f}' for x in times]}) auc_sum {a:.4f}",
            file=sys.stderr, flush=True,
        )


if __name__ == "__main__":
    main()
