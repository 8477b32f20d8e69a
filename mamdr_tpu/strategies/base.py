"""Strategy base class and substring dispatch (reference run.py:37-65).

A strategy is a host-side schedule over the trainer's jitted primitives plus
on-device weight-space ops (mamdr_tpu.strategies.ops). ``run()`` reproduces
the reference main() flow for that strategy: train with early stopping, test
with best weights, optional per-domain finetune stage.
"""

from __future__ import annotations

from typing import Dict, Tuple

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.train.trainer import Trainer

Result = Tuple[float, float, Dict, Dict]


class Strategy:
    def __init__(self, trainer: Trainer):
        self.trainer = trainer
        self.config: ExperimentConfig = trainer.config
        self.spec = trainer.spec
        self.tc = trainer.config.train
        self.n_domain = trainer.dataset.n_domain

    # Subclasses implement train(); test() defaults to best-checkpoint eval.
    def train(self) -> None:
        raise NotImplementedError

    def test(self) -> Result:
        """Test with best weights (reference base_model.py:121: test reloads)."""
        t = self.trainer
        best = t.best_params if t.best_params is not None else t.load_checkpoint()
        return t.val_and_test("test", params=best)

    def finetune(self) -> Result:
        """Post-hoc per-domain finetune from best weights (run.py:82-85)."""
        from mamdr_tpu.strategies.separate import separate_train_val_test

        t = self.trainer
        best = t.load_checkpoint()
        t.state = t.state.replace(params=best)
        return separate_train_val_test(t, init_params=False)

    def run(self) -> Result:
        """Reference main() flow (run.py:67-89)."""
        if self.spec.strategy == "separate":
            from mamdr_tpu.strategies.separate import separate_train_val_test

            result = separate_train_val_test(self.trainer, init_params=True)
        else:
            self.train()
            if self.trainer.verbose:
                print("Test Result: ")
            result = self.test()
        if self.spec.finetune:
            if self.trainer.verbose:
                print("Finetune: ")
            result = self.finetune()
        return result


def build_strategy(trainer: Trainer) -> Strategy:
    spec = trainer.spec
    # PCGrad replaces the joint loop (reference wraps the base model before
    # meta wrappers; shipped configs use it standalone — pcgrad.py:16).
    if spec.strategy in ("joint", "separate"):
        if spec.pcgrad:
            from mamdr_tpu.strategies.pcgrad import PCGradStrategy

            return PCGradStrategy(trainer)
        from mamdr_tpu.strategies.joint import JointStrategy

        return JointStrategy(trainer)
    if spec.strategy == "maml":
        from mamdr_tpu.strategies.maml import MAMLStrategy

        return MAMLStrategy(trainer)
    if spec.strategy == "mldg":
        from mamdr_tpu.strategies.mldg import MLDGStrategy

        return MLDGStrategy(trainer)
    if spec.strategy == "reptile":
        from mamdr_tpu.strategies.reptile import ReptileStrategy

        return ReptileStrategy(trainer)
    if spec.strategy == "domain_negotiation":
        from mamdr_tpu.strategies.domain_negotiation import DomainNegotiationStrategy

        return DomainNegotiationStrategy(trainer)
    if spec.strategy == "mamdr":
        from mamdr_tpu.strategies.mamdr import MAMDRStrategy

        return MAMDRStrategy(trainer)
    raise ValueError(f"unknown strategy {spec.strategy!r}")
