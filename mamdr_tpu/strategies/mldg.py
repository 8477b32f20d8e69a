"""MLDG: Meta-Learning Domain Generalization.

Reference model_zoo/mldg.py:16-366 (scaffolding duplicated from MAML; the
delta is the inner loop, mldg.py:92-119). Per domain:

  1. load meta θ; accumulate SUPPORT grads at fixed θ (no inner Adam —
     the support pass also goes through the accumulate function);
  2. apply the accumulator with the meta-Adam -> adapted θ' (mid-stream
     apply, WITHOUT clearing the accumulator);
  3. accumulate QUERY grads at θ' into the same accumulator
     (acc = g_support(θ) + g_query(θ'));
  4. restore meta, apply the accumulator with the meta-Adam, clear.

Net effect: θ <- AdamUpdate(θ, ∇F(θ) + ∇G(θ - α∇F)) — MLDG's objective with
Adam in place of the paper's SGD, including the reference's double
meta-Adam-moment update per domain.
"""

from __future__ import annotations

from mamdr_tpu.strategies.maml import MAMLStrategy
from mamdr_tpu.utils import trees


class MLDGStrategy(MAMLStrategy):
    _mldg = True  # fused path switches to the MLDG inner-loop shape

    def _train_loop(self) -> None:
        t = self.trainer
        meta = t.state.params
        sequence = self.domain_sequence()
        batch_mode = self.spec.batch_update

        # build-once splits (reference build_meta_data_split semantics)
        splits = {idx: self.support_query(idx) for idx in sequence}
        acc = trees.tree_zeros_like(meta)
        for epoch in range(self.tc.epoch):
            if t.verbose:
                print(f"Epoch: {epoch}", "-" * 30)
            t.np_rng.shuffle(sequence)
            for idx in sequence:
                support, query = splits[idx]
                # support grads at meta θ (accumulate-only inner pass)
                t.state = t.state.replace(
                    params=self.load_meta(t.state.params, meta)
                )
                acc = self.accumulate_split(
                    t.state.params, t.state.batch_stats, support, acc
                )
                # mid-stream apply -> adapted θ' (accumulator NOT cleared,
                # meta-Adam moments advance — reference mldg.py:105-106)
                adapted, self.meta_opt_state = self._meta_apply(
                    t.state.params, self.meta_opt_state, acc, self.grad_scale()
                )
                t.state = t.state.replace(params=adapted)
                # query grads at θ' into the same accumulator
                acc = self.accumulate_split(
                    t.state.params, t.state.batch_stats, query, acc
                )
                if not batch_mode:
                    meta = self.meta_apply(meta, acc)
                    acc = trees.tree_zeros_like(meta)
            if batch_mode:
                meta = self.meta_apply(meta, acc)
                acc = trees.tree_zeros_like(meta)
            t.state = t.state.replace(params=self.load_meta(t.state.params, meta))
            t.state = self.fit_target_domain(t.state)
            if self.epoch_tail(epoch):
                break
