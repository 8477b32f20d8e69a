"""Reptile: per-domain inner adaptation + first-order meta interpolation.

Reference model_zoo/reptile.py:14-155. Per epoch, per (shuffled) domain:
load meta weights, run a capped inner epoch with the model's own Adam
(optimizer slots persist across domains — SetVarOp only assigns weights),
then meta += (adapted - meta) * meta_lr. "batch" variant accumulates deltas
across domains and applies once per epoch scaled by meta_lr (no averaging).
"""

from __future__ import annotations

from mamdr_tpu.strategies.meta_base import MetaStrategy
from mamdr_tpu.utils import trees


class ReptileStrategy(MetaStrategy):
    def train(self) -> None:
        t = self.trainer
        if self.target_domain < 0 and t.fused_padding_ok(ragged=True):
            self._train_fused()
            return
        self._train_loop()

    def _train_fused(self) -> None:
        """One dispatch per Reptile epoch (mamdr_tpu.train.fused)."""
        import jax
        import numpy as np

        from mamdr_tpu.train import fused

        t = self.trainer
        block, n_steps = t.train_block()
        reptile_epoch = fused.make_fused_reptile(
            t.train_step_fn(), self.mask, n_steps, t.dataset.batch_size,
            batch_mode=self.spec.batch_update, cap_steps=self.tc.meta_train_step,
            steps_list=t.steps_per_domain(),
        )
        meta = t.state.params
        sequence = self.domain_sequence()
        start_epoch, ex = self.try_resume_meta({"meta": meta})
        meta = ex["meta"]
        for epoch in range(start_epoch, self.tc.epoch):
            if t.verbose:
                print(f"Epoch: {epoch}", "-" * 30)
            t.np_rng.shuffle(sequence)
            t.rng, sub = jax.random.split(t.rng)
            t.state, meta, _losses = reptile_epoch(
                t.state, meta, block, np.asarray(sequence, np.int32), sub,
                self.tc.meta_learning_rate,
            )
            if self.epoch_tail(epoch):
                break
            self.maybe_snapshot(epoch, {"meta": meta})

    def _train_loop(self) -> None:
        t = self.trainer
        meta = t.state.params  # meta weights live on device
        sequence = self.domain_sequence()
        batch_mode = self.spec.batch_update

        for epoch in range(self.tc.epoch):
            if t.verbose:
                print(f"Epoch: {epoch}", "-" * 30)
            t.np_rng.shuffle(sequence)
            acc = trees.tree_zeros_like(meta) if batch_mode else None
            for idx in sequence:
                t.state = t.state.replace(
                    params=self.load_meta(t.state.params, meta)
                )
                # Reptile uses the domain's FULL train split (its
                # build_meta_data_split override, reference reptile.py:144-155),
                # capped by meta_train_step.
                t.state, loss = t.fit_domain(
                    t.state, idx, max_steps=self.tc.meta_train_step
                )
                if t.verbose:
                    print(f"Train on: Domain {idx}, Loss: {loss:.4f}")
                if self.target_domain >= 0:
                    # one-step nudge on the target inside the domain loop
                    # (reference reptile.py:83-87, steps_per_epoch=1)
                    t.state, _ = t.fit_domain(
                        t.state, self.target_domain, max_steps=1
                    )
                if batch_mode:
                    acc = self.delta_acc(acc, t.state.params, meta)
                else:
                    meta = self.reptile_step(
                        meta, t.state.params, self.tc.meta_learning_rate
                    )
            if batch_mode:
                meta = self.scaled_add(meta, acc, self.tc.meta_learning_rate)
            t.state = t.state.replace(params=self.load_meta(t.state.params, meta))
            t.state = self.fit_target_domain(t.state)
            if self.epoch_tail(epoch):
                break
        # leave the model holding the best-era params; test() reloads ckpt
