"""CLI experiment driver: ``python -m mamdr_tpu.run --config <file.json>``.

Mirrors the reference driver (run.py:25-99): load config, seed, load the
multi-domain dataset, build the base model + strategy by name substrings,
train / test / optional finetune, save result artifacts.
"""

from __future__ import annotations

import argparse
import json

from mamdr_tpu.config import ExperimentConfig, load_config
from mamdr_tpu.data.dataset import MultiDomainDataset
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.strategies import build_strategy
from mamdr_tpu.train.trainer import Trainer


def main(config: ExperimentConfig, verbose: bool = True):
    dc = config.dataset
    if dc.name == "synthetic":
        dataset = make_synthetic_dataset(
            n_domain=dc.n_domain,
            n_uid=dc.n_uid,
            n_pid=dc.n_pid,
            n_per_domain=dc.n_per_domain,
            seed=dc.seed,
            batch_size=dc.batch_size,
        )
    else:
        dataset = MultiDomainDataset.from_disk(dc)

    trainer = Trainer(config, dataset, verbose=verbose)
    strategy = build_strategy(trainer)
    avg_loss, avg_auc, domain_loss, domain_auc = strategy.run()
    trainer.save_result(avg_loss, avg_auc, domain_loss, domain_auc)
    return avg_loss, avg_auc, domain_loss, domain_auc


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, help="Train config JSON file")
    parser.add_argument(
        "--benchmark",
        type=str,
        help="Named benchmark config, e.g. Taobao-10/mlp_meta_mamdr_finetune "
        "(see mamdr_tpu.benchmarks.list_configs)",
    )
    parser.add_argument(
        "--list-benchmarks", action="store_true", help="List benchmark configs"
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="Resume from the config's restart-safe snapshot (train.resume)",
    )
    parser.add_argument(
        "--platform", type=str, default=None,
        help="Force a JAX platform (e.g. 'cpu'). Needed under environments "
        "whose sitecustomize pins JAX_PLATFORMS before the interpreter "
        "starts — jax.config.update after import is the only override "
        "that sticks (tests/conftest.py uses the same mechanism)",
    )
    args = parser.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.list_benchmarks:
        from mamdr_tpu.benchmarks import list_configs

        print("\n".join(list_configs()))
    elif args.benchmark:
        from mamdr_tpu.benchmarks import benchmark_config

        bench, _, model_name = args.benchmark.partition("/")
        cfg = benchmark_config(bench, model_name)
        if args.resume:
            cfg.train.resume = True
            cfg.train.resume_every = cfg.train.resume_every or 1
        main(cfg)
    elif args.config:
        cfg = load_config(args.config)
        if args.resume:
            cfg.train.resume = True
            cfg.train.resume_every = cfg.train.resume_every or 1
        main(cfg)
    else:
        parser.error("one of --config / --benchmark / --list-benchmarks required")
