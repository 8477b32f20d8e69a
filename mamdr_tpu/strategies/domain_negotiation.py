"""Domain Negotiation (DN): sequential cross-domain inner pass + Reptile outer.

Reference model_zoo/domain_negotiation.py:14-147. Per epoch: (optionally)
shuffle the domain sequence (or use a fixed ``meta_sequence`` list), load
meta weights ONCE, then train sequentially through every domain WITHOUT
resetting between domains — each domain continues from the previous domain's
adapted weights, with optimizer slots carried throughout. After the full
pass, one outer update: meta += (θ_final - meta) * meta_lr. A target domain
is appended to the end of the sequence (uncapped) and also fitted after the
outer update.
"""

from __future__ import annotations

import jax

from mamdr_tpu.strategies.meta_base import MetaStrategy


class DomainNegotiationStrategy(MetaStrategy):
    def train(self) -> None:
        t = self.trainer
        # Fused: one dispatch per DN epoch for the common recipe. The inner
        # pass is ragged (real steps only), so padding costs memory, not
        # compute — the gate is only the block's HBM budget.
        if self.target_domain < 0 and t.fused_padding_ok(ragged=True):
            self._train_fused()
            return
        self._train_loop()

    def _train_fused(self) -> None:
        import numpy as np

        from mamdr_tpu.train import fused

        t = self.trainer
        block, n_steps = t.train_block()
        dn_epoch = fused.make_fused_dn(
            t.train_step_fn(), self.mask, n_steps, t.dataset.batch_size,
            cap_steps=self.tc.meta_train_step,
            steps_list=t.steps_per_domain(),
        )
        meta = t.state.params
        sequence = self.meta_sequence()
        start_epoch, ex = self.try_resume_meta({"meta": meta})
        meta = ex["meta"]
        for epoch in range(start_epoch, self.tc.epoch):
            if t.verbose:
                print(f"Epoch: {epoch}", "-" * 30)
            if self.tc.shuffle_sequence:
                t.np_rng.shuffle(sequence)
            t.rng, sub = jax.random.split(t.rng)
            t.state, meta, _losses = dn_epoch(
                t.state, meta, block, np.asarray(sequence, np.int32), sub,
                self.tc.meta_learning_rate,
            )
            if self.epoch_tail(epoch):
                break
            self.maybe_snapshot(epoch, {"meta": meta})

    def _train_loop(self) -> None:
        t = self.trainer
        meta = t.state.params
        sequence = self.meta_sequence()

        for epoch in range(self.tc.epoch):
            if t.verbose:
                print(f"Epoch: {epoch}", "-" * 30)
            if self.tc.shuffle_sequence:
                t.np_rng.shuffle(sequence)
            train_sequence = list(sequence)
            if self.target_domain >= 0:
                train_sequence = train_sequence + [self.target_domain]

            # Load meta ONCE per epoch; domains chain without reset.
            t.state = t.state.replace(params=self.load_meta(t.state.params, meta))
            for idx in train_sequence:
                cap = (
                    self.tc.meta_train_step
                    if idx != self.target_domain
                    else 0
                )
                t.state, loss = t.fit_domain(t.state, idx, max_steps=cap)
                if t.verbose:
                    print(f"Train on: Domain {idx}, Loss: {loss:.4f}")

            meta = self.reptile_step(
                meta, t.state.params, self.tc.meta_learning_rate
            )
            t.state = t.state.replace(params=self.load_meta(t.state.params, meta))
            t.state = self.fit_target_domain(t.state)
            if self.epoch_tail(epoch):
                break
