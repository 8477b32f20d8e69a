"""First-order MAML over domains.

Reference model_zoo/maml.py:16-363. Per (shuffled) domain: load meta weights,
adapt with the model's OWN Adam on the support split (optimizer slots persist
across domains), accumulate query-split gradients evaluated at the adapted
weights, then restore meta weights and apply the accumulated grads with a
separate meta-Adam(meta_lr) restricted to the meta-parameter subset. "batch"
defers the apply to once per epoch. No second-order term anywhere.

average_meta_grad: none = plain sum; mean = divide by
n_domain*meta_train_step at apply (only when meta_train_step>0,
maml.py:206-211); moving_mean/drop handled in the accumulation scan
(steps.py grad_epoch).
"""

from __future__ import annotations

import jax
import optax

from mamdr_tpu.data.dataset import stack_batches
from mamdr_tpu.strategies.meta_base import MetaStrategy
from mamdr_tpu.utils import trees


class MAMLStrategy(MetaStrategy):
    def __init__(self, trainer):
        super().__init__(trainer)
        m = self.mask
        not_meta = jax.tree_util.tree_map(lambda b: not b, m)
        # Meta optimizer: Adam(meta_lr) over the meta subset only.
        self.meta_tx = optax.chain(
            optax.masked(optax.set_to_zero(), not_meta),
            optax.adam(self.tc.meta_learning_rate, b1=0.9, b2=0.999, eps=1e-8),
        )
        self.meta_opt_state = jax.jit(self.meta_tx.init)(trainer.state.params)

        def apply(meta, opt_state, grads, scale):
            grads = jax.tree_util.tree_map(
                lambda mm, g: g * scale if mm else g, m, grads
            )
            updates, new_opt = self.meta_tx.update(grads, opt_state, meta)
            return optax.apply_updates(meta, updates), new_opt

        self._meta_apply = jax.jit(apply)

    def grad_scale(self) -> float:
        """'mean' divides by n_domain*meta_train_step iff meta_train_step>0."""
        if self.tc.average_meta_grad == "mean" and self.tc.meta_train_step > 0:
            return 1.0 / (self.n_domain * self.tc.meta_train_step)
        return 1.0

    def accumulate_split(self, params, batch_stats, split, acc, cap=True):
        """Accumulate grads over a (stacked) split at fixed params."""
        t = self.trainer
        stacked = stack_batches(split, t.dataset.batch_size, shuffle=True, rng=t.np_rng)
        if cap and self.tc.meta_train_step > 0:
            stacked = {k: v[: self.tc.meta_train_step] for k, v in stacked.items()}
        stacked = jax.device_put(stacked)
        t.rng, sub = jax.random.split(t.rng)
        acc, _ = t.fns.grad_epoch(params, batch_stats, stacked, sub, acc)
        return acc

    def meta_apply(self, meta, grads):
        new_meta, self.meta_opt_state = self._meta_apply(
            meta, self.meta_opt_state, grads, self.grad_scale()
        )
        return new_meta

    _mldg = False

    def train(self) -> None:
        t = self.trainer
        if (
            self.target_domain < 0
            and self.tc.average_meta_grad != "drop"
            and t.fused_padding_ok(ragged=True)
        ):
            self._train_fused()
            return
        self._train_loop()

    def _train_fused(self) -> None:
        """One dispatch per MAML/MLDG epoch (mamdr_tpu.train.fused).

        Support/query splits are drawn once (mirroring the reference's
        build-once take/skip split, maml.py:294-341) and live on device;
        the inner-epoch shuffles happen inside the jit.
        """
        import numpy as np

        from mamdr_tpu.data.dataset import split_support_query
        from mamdr_tpu.train import fused

        t = self.trainer
        supports, queries = [], []
        for idx in range(self.n_domain):
            s, q = split_support_query(
                t.dataset.train[idx], self.tc.meta_split,
                self.tc.meta_split_ratio, t.np_rng,
            )
            supports.append(s)
            queries.append(q)
        sup_block, n_steps_s = fused.stack_domains_on_device(
            supports, t.dataset.batch_size
        )
        sup_steps = fused.domain_step_counts(supports, t.dataset.batch_size)
        if self.tc.meta_split == "train-train":
            q_block, n_steps_q = sup_block, n_steps_s
            q_steps = sup_steps
        else:
            q_block, n_steps_q = fused.stack_domains_on_device(
                queries, t.dataset.batch_size
            )
            q_steps = fused.domain_step_counts(queries, t.dataset.batch_size)
        epoch_fn = fused.make_fused_maml(
            t.train_step_fn(), t.accum_grad_fn, self.mask, self.meta_tx,
            n_steps_s, n_steps_q, t.dataset.batch_size,
            batch_mode=self.spec.batch_update,
            cap_steps=self.tc.meta_train_step,
            accumulate="ema" if self.tc.average_meta_grad == "moving_mean" else "sum",
            mldg=self._mldg,
            steps_list_support=sup_steps,
            steps_list_query=q_steps,
        )
        meta = t.state.params
        sequence = self.domain_sequence()
        start_epoch, ex = self.try_resume_meta(
            {"meta": meta, "meta_opt": self.meta_opt_state}
        )
        meta, self.meta_opt_state = ex["meta"], ex["meta_opt"]
        for epoch in range(start_epoch, self.tc.epoch):
            if t.verbose:
                print(f"Epoch: {epoch}", "-" * 30)
            t.np_rng.shuffle(sequence)
            t.rng, sub = jax.random.split(t.rng)
            t.state, meta, self.meta_opt_state = epoch_fn(
                t.state, meta, self.meta_opt_state, sup_block, q_block,
                np.asarray(sequence, np.int32), sub, self.grad_scale(),
            )
            if self.epoch_tail(epoch):
                break
            self.maybe_snapshot(
                epoch, {"meta": meta, "meta_opt": self.meta_opt_state}
            )

    def _train_loop(self) -> None:
        t = self.trainer
        meta = t.state.params
        sequence = self.domain_sequence()
        batch_mode = self.spec.batch_update
        # Splits are drawn ONCE before training (reference
        # build_meta_data_split, maml.py:294-341) — same protocol as the
        # fused path; per-epoch redraws would leak query rows into support.
        splits = {idx: self.support_query(idx) for idx in sequence}

        acc = trees.tree_zeros_like(meta)
        for epoch in range(self.tc.epoch):
            if t.verbose:
                print(f"Epoch: {epoch}", "-" * 30)
            t.np_rng.shuffle(sequence)
            for idx in sequence:
                support, query = splits[idx]
                # inner adaptation from meta, model's own Adam
                t.state = t.state.replace(
                    params=self.load_meta(t.state.params, meta)
                )
                t.state, loss = t.fit_domain(
                    t.state, idx, split=support, max_steps=self.tc.meta_train_step
                )
                if t.verbose:
                    print(f"Train on: Domain {idx}, Loss: {loss:.4f}")
                # query grads at adapted weights
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
