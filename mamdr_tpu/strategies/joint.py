"""Joint training: sequential shuffled per-domain epochs with early stopping.

Reference loop: model_zoo/DeepCTR/deepctr.py:63-93 (also Star star.py:35-68,
DeepMTLCTR deep_mtl_ctr.py:68-98, UncertaintyWeight uncertainty_weight.py:60-94
— all the same schedule). Per epoch: shuffle domain order, fit one epoch per
domain sequentially, validate all domains, early-stop on macro val AUC (saving
best weights), print test metrics.

Execution: one fused dispatch per epoch (lax.scan over domains over steps,
mamdr_tpu.train.fused.make_fused_passes) when padding waste allows; otherwise
one dispatch per domain.
"""

from __future__ import annotations

import numpy as np

import jax

from mamdr_tpu.strategies.base import Strategy


class JointStrategy(Strategy):
    def train(self) -> None:
        t = self.trainer
        use_fused = t.fused_padding_ok(ragged=True)
        if use_fused:
            from mamdr_tpu.train import fused

            block, n_steps = t.train_block()
            sequential_pass = fused.make_fused_passes(
                t.train_step_fn(), n_steps, t.dataset.batch_size,
                steps_list=t.steps_per_domain(),
            )

        sequence = list(range(self.n_domain))
        start_epoch = 0
        resumed = t.try_resume({"best_params": t.state.params})
        if resumed is not None:
            start_epoch = resumed[0]
            t.best_params = resumed[1].get("best_params", t.state.params)
        for epoch in range(start_epoch, self.tc.epoch):
            if t.verbose:
                print(f"Epoch: {epoch}", "-" * 30)
            t.np_rng.shuffle(sequence)
            if use_fused:
                t.rng, sub = jax.random.split(t.rng)
                t.state, losses = sequential_pass(
                    t.state, block, np.asarray(sequence, np.int32), sub
                )
                t.metrics.log(
                    "train_epoch",
                    epoch=epoch,
                    domain_loss={
                        str(sequence[i]): float(l)
                        for i, l in enumerate(np.asarray(losses))
                    },
                )
            else:
                for idx in sequence:
                    if t.verbose:
                        print(f"Train on: Domain {idx}")
                    t.state, loss = t.fit_domain(t.state, idx)
            if t.verbose:
                print("Val Result: ")
            _, avg_auc, _, _ = t.val_and_test("val")
            if t.stopper.step(avg_auc):
                break
            if t.stopper.improved:
                t.save_checkpoint()
            if self.tc.resume_every > 0 and (epoch + 1) % self.tc.resume_every == 0:
                t.save_resume_state(
                    epoch,
                    extra_trees={
                        "best_params": t.best_params
                        if t.best_params is not None
                        else t.state.params
                    },
                )
            if t.verbose:
                # In-training test report uses the best checkpoint, like the
                # reference's val_and_test("test") reload (base_model.py:121).
                print("Test Result: ")
                self.test()
