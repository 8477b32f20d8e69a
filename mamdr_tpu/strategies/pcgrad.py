"""PCGrad: cross-domain gradient surgery.

Reference model_zoo/pcgrad.py:16-332. Per epoch, per (shuffled) query domain:
accumulate the query domain's grads at the current weights (capped by
meta_train_step), then for each of `sample_num` sampled aux domains
accumulate a full-epoch grad and project it before summing; apply the final
sum with a meta-Adam(meta_lr). The model's own optimizer is never used.

Two documented quirks reproduced in mode="reference"
(train.pcgrad_mode; SURVEY §7.3.5):
  1. projection fires on dot>0 and normalises by ||g|| (pcgrad.py:152-160) —
     the published PCGrad projects on dot<0 with ||g||²;
  2. `final_grads = current_grads` aliases the SAME arrays (pcgrad.py:102-103)
     and the projection mutates them in place — so each aux grad is projected
     against the RUNNING SUM of query+previously-projected grads, not the
     original query grad.
mode="paper" implements the published rule (project vs the original query
grads, dot<0, ||g||²).
"""

from __future__ import annotations

import jax

from mamdr_tpu.strategies import ops
from mamdr_tpu.strategies.maml import MAMLStrategy
from mamdr_tpu.utils import trees


class PCGradStrategy(MAMLStrategy):
    def __init__(self, trainer):
        super().__init__(trainer)
        self._project = jax.jit(
            lambda gq, ga: ops.pcgrad_project(gq, ga, self.tc.pcgrad_mode)
        )
        self._add = jax.jit(ops.tree_add_trees)

    def train(self) -> None:
        t = self.trainer
        if self.target_domain < 0 and t.fused_padding_ok(ragged=True):
            self._train_fused()
            return
        self._train_loop()

    def _train_fused(self) -> None:
        """One dispatch per PCGrad epoch (mamdr_tpu.train.fused)."""
        import numpy as np

        from mamdr_tpu.train import fused

        t = self.trainer
        # Both query and aux grads come from the meta-split's support set
        # (reference pcgrad.py uses meta_data_split train_iters for both);
        # train-train makes that the full train set.
        if self.tc.meta_split == "train-train":
            block, n_steps = t.train_block()
            steps_list = t.steps_per_domain()
        else:
            supports = [
                self.support_query(i)[0] for i in range(self.n_domain)
            ]
            block, n_steps = fused.stack_domains_on_device(
                supports, t.dataset.batch_size
            )
            steps_list = fused.domain_step_counts(
                supports, t.dataset.batch_size
            )
        epoch_fn = fused.make_fused_pcgrad(
            t.accum_grad_fn, self.mask, self.meta_tx, n_steps, t.dataset.batch_size,
            cap_steps=self.tc.meta_train_step, mode=self.tc.pcgrad_mode,
            steps_list=steps_list,
        )
        sequence = self.domain_sequence()
        k = min(self.tc.sample_num, len(sequence) - 1)
        for epoch in range(self.tc.epoch):
            if t.verbose:
                print(f"Epoch: {epoch}", "-" * 30)
            t.np_rng.shuffle(sequence)
            aux = np.stack(
                [
                    t.np_rng.choice([d for d in sequence if d != q], size=k, replace=False)
                    for q in sequence
                ]
            ).astype(np.int32)
            t.rng, sub = jax.random.split(t.rng)
            t.state, self.meta_opt_state = epoch_fn(
                t.state, self.meta_opt_state, block,
                np.asarray(sequence, np.int32), aux, sub, self.grad_scale(),
            )
            if self.epoch_tail(epoch):
                break

    def _train_loop(self) -> None:
        t = self.trainer
        sequence = self.domain_sequence()
        mode = self.tc.pcgrad_mode
        # build-once splits (reference build_meta_data_split semantics)
        splits = {idx: self.support_query(idx)[0] for idx in sequence}

        for epoch in range(self.tc.epoch):
            if t.verbose:
                print(f"Epoch: {epoch}", "-" * 30)
            t.np_rng.shuffle(sequence)
            for idx in sequence:
                support = splits[idx]
                zero = trees.tree_zeros_like(t.state.params)
                query_grads = self.accumulate_split(
                    t.state.params, t.state.batch_stats, support, zero, cap=True
                )
                running = query_grads
                candidates = [d for d in sequence if d != idx]
                aux_idxs = t.np_rng.choice(
                    candidates,
                    size=min(self.tc.sample_num, len(candidates)),
                    replace=False,
                )
                for aux_idx in aux_idxs:
                    if t.verbose:
                        print(f"Support Domain: {aux_idx}, Query Domain: {idx}")
                    aux_grads = self.accumulate_split(
                        t.state.params,
                        t.state.batch_stats,
                        splits[int(aux_idx)],  # aux's support split, like query
                        trees.tree_zeros_like(t.state.params),
                        cap=False,  # aux epochs are uncapped (pcgrad.py:116-120)
                    )
                    base = running if mode == "reference" else query_grads
                    projected = self._project(base, aux_grads)
                    running = self._add(running, projected)
                new_params = self.meta_apply(t.state.params, running)
                t.state = t.state.replace(params=new_params)
            if self.epoch_tail(epoch):
                break

    def val_params_fn(self, idx: int):
        t = self.trainer
        return t.state.params, t.state.batch_stats
