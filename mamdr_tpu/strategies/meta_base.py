"""Shared machinery for the meta strategies (MAML family).

Holds the meta-parameter mask, jitted masked-op closures, the support/query
data split (reference maml.py:294-341), target-domain handling, the
meta-finetune validation protocol (maml.py:245-287), and the meta-epoch
early-stop/test loop shared verbatim by MAML/Reptile/DN/MAMDR/MLDG
(maml.py:124-150 and duplicates).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from mamdr_tpu.data.dataset import split_support_query
from mamdr_tpu.strategies import ops
from mamdr_tpu.strategies.base import Strategy
from mamdr_tpu.train.trainer import Trainer
from mamdr_tpu.utils import trees


class MetaStrategy(Strategy):
    def __init__(self, trainer: Trainer):
        super().__init__(trainer)
        self.mask = trees.meta_parm_mask(
            trainer.state.params, self.tc.meta_parms
        )
        # Meta params are drawn from TRAINABLE weights only (reference
        # maml.py:159 iterates model.trainable_weights): frozen user/item
        # tables are never meta parameters even under meta_parms=["all"].
        if not self.tc.emb_trainable:
            frozen = trees.named_tree_map(
                lambda n, x: "user_emb" in n or "item_emb" in n,
                trainer.state.params,
            )
            self.mask = jax.tree_util.tree_map(
                lambda m, f: bool(m) and not f, self.mask, frozen
            )
        # Jitted masked-op closures (mask is static inside the closure).
        m = self.mask
        self.load_meta = jax.jit(lambda p, s: ops.load_masked(p, s, m))
        self.reptile_step = jax.jit(
            lambda meta, adapted, lr: ops.reptile_update(meta, adapted, lr, m)
        )
        self.delta_acc = jax.jit(
            lambda acc, adapted, base: ops.delta_accumulate(acc, adapted, base, m)
        )
        self.scaled_add = jax.jit(
            lambda t, d, s: ops.scaled_add(t, d, s, m)
        )
        self.mask_grads = jax.jit(lambda g: ops.tree_where_mask_zero(g, m))
        self.target_domain: int = self.tc.target_domain

    # ---------------- sequences / data ----------------

    def domain_sequence(self) -> List[int]:
        """All domains minus the target (reference maml.py:67-68)."""
        return [
            i for i in range(self.n_domain)
            if not (self.target_domain >= 0 and i == self.target_domain)
        ]

    def meta_sequence(self) -> List[int]:
        """DN/MAMDR sequence: explicit list config or domain order
        (reference domain_negotiation.py:125-146)."""
        seq = self.domain_sequence()
        ms = self.tc.meta_sequence
        if isinstance(ms, list):
            if len(ms) != len(seq):
                raise ValueError("All the domains must be given in the sequence")
            return list(ms)
        return seq

    def support_query(self, idx: int):
        """Per-domain support/query split; target_domain redirects the query
        set to the target's train split (reference maml.py:335-337)."""
        support, query = split_support_query(
            self.trainer.dataset.train[idx],
            self.tc.meta_split,
            self.tc.meta_split_ratio,
            self.trainer.np_rng,
        )
        if self.target_domain >= 0:
            query = self.trainer.dataset.train[self.target_domain]
        return support, query

    def cap_steps(self, n_batches: int) -> int:
        if self.tc.meta_train_step > 0:
            return min(n_batches, self.tc.meta_train_step)
        return n_batches

    # ---------------- validation / early stop ----------------

    def val_params_fn(self, idx: int):
        t = self.trainer
        return t.state.params, t.state.batch_stats

    def meta_finetune_val(self) -> Tuple[float, float, Dict, Dict]:
        """Finetune meta_finetune_step epochs per domain, then val
        (reference maml.py:245-287); weights restored afterwards.

        The sequential form is D x (meta_finetune_step + 1) dispatches per
        validation — a cliff on a tunneled/production TPU (~33ms each). When
        the padding cost model allows, the domains (independent by
        construction) run as one vmapped batch instead:
        meta_finetune_step + 1 dispatches total."""
        t = self.trainer
        # ragged gate: even with long-tail lane padding, the vmapped batch
        # beats D x (meta_finetune_step+1) sequential dispatches at ~33ms
        # each — the padded-lane compute waste is the smaller cost here
        if t.fused_padding_ok(ragged=True):
            return self._meta_finetune_val_fused()
        base_state = t.state
        domain_loss, domain_auc = {}, {}
        for idx in range(self.n_domain):
            state = base_state
            for _ in range(self.tc.meta_finetune_step):
                state, _ = t.fit_domain(state, idx)
            l, a = t.evaluate_domain("val", idx, state.params, state.batch_stats)
            domain_loss[str(idx)] = l
            domain_auc[str(idx)] = a
        return self._finish_meta_finetune_val(domain_loss, domain_auc)

    def _finish_meta_finetune_val(self, domain_loss, domain_auc):
        t = self.trainer
        avg_loss = sum(domain_loss.values()) / len(domain_loss)
        avg_auc = sum(domain_auc.values()) / len(domain_auc)
        if t.verbose:
            print("Loss: ", domain_loss)
            print("AUC: ", domain_auc)
            print(f"Overall val Loss: {avg_loss}, AUC: {avg_auc}")
        return avg_loss, avg_auc, domain_loss, domain_auc

    def _meta_finetune_val_fused(self) -> Tuple[float, float, Dict, Dict]:
        """All domains finetune simultaneously from the current meta weights
        (vmapped lanes, frozen tables shared via the subset step), then one
        vmapped all-domain val eval. Matches the loop path's semantics: every
        lane starts from t.state — params, batch_stats, optimizer slots (the
        reference finetunes with the model's live Adam, maml.py:252), step
        counter — and trains exactly meta_finetune_step epochs on its own
        domain. Only the shuffle RNG stream differs (in-jit vs host)."""
        import jax.numpy as jnp

        from mamdr_tpu.train import fused as fused_mod
        from mamdr_tpu.train.steps import make_subset_train_step
        from mamdr_tpu.utils import trees as trees_mod

        t = self.trainer
        tc = self.tc
        d = self.n_domain
        if not hasattr(self, "_mfv_fns"):
            frozen_mask = trees_mod.named_tree_map(
                lambda n, x: (not tc.emb_trainable)
                and ("user_emb" in n or "item_emb" in n),
                t.state.params,
            )
            train_step, to_sub, combine = make_subset_train_step(
                t.model, t.tx, t.step_cfg, frozen_mask, t.state.params
            )

            def loss_fn_sub(p, stats, batch, rng, train):
                return t.loss_fn(combine(p), stats, batch, rng, train)

            _, n_steps = t.train_block()
            epoch_all, eval_all, _ = fused_mod.make_fused_separate(
                train_step, loss_fn_sub, n_steps, t.dataset.batch_size
            )
            self._mfv_fns = (epoch_all, eval_all, to_sub)
        epoch_all, eval_all, to_sub = self._mfv_fns

        block, _ = t.train_block()
        base = t.state
        stack_d = lambda x: jnp.stack([jnp.asarray(x)] * d)
        t.rng, sub = jax.random.split(t.rng)
        states = base.replace(
            params=jax.tree_util.tree_map(stack_d, to_sub(base.params)),
            batch_stats=(
                jax.tree_util.tree_map(stack_d, base.batch_stats)
                if base.batch_stats
                else {}
            ),
            opt_state=jax.tree_util.tree_map(stack_d, base.opt_state),
            rng=jax.random.split(sub, d),
            step=jnp.full((d,), base.step, jnp.int32),
        )
        for i in range(tc.meta_finetune_step):
            states, _ = epoch_all(states, block, jax.random.fold_in(sub, i))
        losses, aucs = eval_all(
            states.params, states.batch_stats, t.eval_block("val")
        )
        import numpy as np

        losses, aucs = np.asarray(losses), np.asarray(aucs)
        domain_loss = {str(i): float(losses[i]) for i in range(d)}
        domain_auc = {str(i): float(aucs[i]) for i in range(d)}
        return self._finish_meta_finetune_val(domain_loss, domain_auc)

    def validate(self) -> Tuple[float, float, Dict, Dict]:
        if self.trainer.verbose:
            print("Val Result: ")
        if self.tc.meta_finetune_step > 0:
            return self.meta_finetune_val()
        return self.trainer.val_and_test("val", params_fn=self.val_params_fn)

    def epoch_tail(self, epoch: int) -> bool:
        """Val / early-stop / test tail of every meta epoch
        (reference maml.py:124-150). Returns True to stop training."""
        t = self.trainer
        if epoch % self.tc.val_every_step != 0:
            return False
        _, avg_auc, _, domain_auc = self.validate()
        metric = (
            domain_auc[str(self.target_domain)]
            if self.target_domain >= 0
            else avg_auc
        )
        if t.stopper.step(metric):
            return True
        if t.stopper.improved:
            self.save_best()
        if t.verbose:
            # Best-checkpoint test report (reference reloads before test eval).
            print("Test Result: ")
            self.test()
        return False

    def save_best(self) -> None:
        self.trainer.save_checkpoint()

    # ---------------- crash/restart resume (fused loops) ----------------

    def try_resume_meta(self, extra: Dict) -> Tuple[int, Dict]:
        """Resume a meta training loop from the variant's resume snapshot
        (train.resume; written by maybe_snapshot). Restores the trainer
        state, stopper, rng streams, and the strategy's extra trees (meta
        weights, meta-optimizer slots). Returns (start_epoch, extras)."""
        resumed = self.trainer.try_resume(extra)
        if resumed is None:
            return 0, extra
        start, ex = resumed
        return start, {k: ex.get(k, v) for k, v in extra.items()}

    def maybe_snapshot(self, epoch: int, extra: Dict) -> None:
        """Atomic full-state snapshot every resume_every epochs — long
        uncapped runs survive TPU worker crashes and session restarts
        (reference has nothing comparable: its MAMDR cannot even resume
        across processes, SURVEY §5.4)."""
        if self.tc.resume_every > 0 and (epoch + 1) % self.tc.resume_every == 0:
            self.trainer.save_resume_state(epoch, extra_trees=extra)

    def fit_target_domain(self, state):
        """Full-epoch pass on the held-out target domain after the outer
        update (reference maml.py:125-128, domain_negotiation.py:90-94)."""
        if self.target_domain >= 0:
            if self.trainer.verbose:
                print(f"Train on target domain: {self.target_domain}")
            state, _ = self.trainer.fit_domain(state, self.target_domain)
        return state
