"""MAMDR = Domain Negotiation + Domain Regularization (the flagship).

Reference model_zoo/mamdr.py:14-196 + specific_base_model.py:16-178. State:
shared weights (meta) + per-domain specific deltas, merged as
shared+specific (plus) or shared*specific (times) on the meta-param subset.

Per epoch:
  Phase 1 (DN, shared): load shared, sequential full-epoch pass through the
    shuffled domain sequence, then shared += (θ_final - shared)*meta_lr.
  Phase 2 (DR, specific): for each query domain i — sample `sample_num`
    support domains from the others (+ i itself iff add_query_domain); for
    each support j: load merge(shared, specific_i), train one full epoch on
    j, then ≤domain_regulation_step steps on i, then
    specific_i += (θ - merged)*meta_lr and re-merge. "batch" variant
    accumulates (θ - merged) [times: ×shared] and applies
    specific_i += Σ/sample_num·meta_lr once.
  Optional finetune_every_epoch: extra pass on i updating specific only:
    specific_i = θ - merged.

Early stop snapshots (best_shared, best_specific[i]) ON DEVICE and writes the
decomposition checkpoint — which the reference never serialises (SURVEY §5.4
gap): reference MAMDR cannot resume across processes; this one can.
Evaluation merges shared+specific per domain (specific_base_model.py:64-97).
"""

from __future__ import annotations

from typing import List, Tuple

import jax

from mamdr_tpu.strategies import ops
from mamdr_tpu.strategies.meta_base import MetaStrategy
from mamdr_tpu.strategies.separate import separate_train_val_test
from mamdr_tpu.train import checkpoints
from mamdr_tpu.utils import trees


def _device_free_bytes() -> float:
    """Free HBM on device 0 via memory_stats(); falls back to a
    conservative 8GB-chip estimate (v5e-class) when the backend doesn't
    report stats (CPU, some tunnels)."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        in_use = stats.get("bytes_in_use", 0)
        if limit:
            return float(limit - in_use)
    except Exception:
        pass
    return 8e9 - 2e9  # assume ~2GB already resident


class MAMDRStrategy(MetaStrategy):
    def __init__(self, trainer):
        super().__init__(trainer)
        method = self.tc.merged_method
        m = self.mask
        self.merge = jax.jit(
            lambda sh, sp: ops.merge_weights(sh, sp, m, method)
        )
        self.dr_acc = jax.jit(
            lambda acc, adapted, merged, sh: ops.dr_accumulate(
                acc, adapted, merged, sh, m, method
            )
        )
        self.spec_from_adapted = jax.jit(
            lambda adapted, merged, sp: ops.specific_from_adapted(adapted, merged, sp, m)
        )
        self.shared = trainer.state.params
        # Only MASKED (meta-subset) leaves of a specific tree are ever read
        # (merge/load/stack are all mask-gated), so unmasked leaves alias the
        # shared tree instead of holding their own buffers. Without this,
        # n_domain fresh full trees pin n_domain copies of the (potentially
        # ~125MB frozen pretrained) tables in HBM — observed OOM at
        # reference Taobao-30 scale.
        # NOTE: deliberately NOT jitted — a jitted select would copy the
        # aliased leaves into fresh output buffers; the python tree_map keeps
        # the very same shared arrays.
        def strip(fresh, shared):
            return jax.tree_util.tree_map(
                lambda mm, f, s: f if mm else s, m, fresh, shared
            )
        if self.tc.specific_init == "zeros":
            zeros = strip(trees.tree_zeros_like(self.shared), self.shared)
            self.specific: List = [zeros for _ in range(self.n_domain)]
        else:
            self.specific = [
                strip(
                    trainer.fresh_params(seed=trainer.dataset.seed + 1 + i),
                    self.shared,
                )
                for i in range(self.n_domain)
            ]
        self.best_shared = self.shared
        self.best_specific = list(self.specific)
        # The fused path (whole DN / DR phase per dispatch) covers the shipped
        # DN+DR recipe; exotic variants fall back to the per-call loop, as do
        # fixed_train and pathological padding (same gate as every strategy).
        self.use_fused = (
            not self.spec.batch_update
            and not self.tc.finetune_every_epoch
            and self.target_domain < 0
            and trainer.fused_padding_ok(ragged=True)
        )

    def _row_sharded_table_mask(self):
        """Bool tree over params: 2-D embedding tables the mesh lookup
        row-shards (mirrors embedding_lookup's own predicate on the ACTUAL,
        possibly padded, table shapes — raw dataset row counts can disagree
        with what the lookup shards). TRAINABLE sharded tables included."""
        t = self.trainer
        from mamdr_tpu.parallel.mesh import TABLE_AXIS

        tshards = t.mesh.shape[TABLE_AXIS]
        min_rows = self.tc.sharded_lookup_min_rows
        return trees.named_tree_map(
            lambda n, x: "emb" in n and getattr(x, "ndim", 0) == 2
            and x.shape[0] >= min_rows and x.shape[0] % tshards == 0,
            t.state.params,
        )

    def _dr_parallel_eligible(self) -> bool:
        """Gate for the vmapped-lanes DR phase (fused.make_fused_dr_parallel).

        Requires (a) the meta mask to cover EVERY trainable leaf — otherwise
        non-meta trainable weights would need the sequential chained lineage
        (e.g. STAR's specific kernels under meta_parms=["emb","kernel_shared",
        "bias_shared"]); and (b) the stacked lane states (params + 2 Adam
        slots per trainable leaf x n_domain) to fit comfortably in HBM —
        with trainable embeddings (Amazon) the lanes stack full tables.
        """
        mode = getattr(self.tc, "dr_parallel", "auto")
        if mode == "off":
            return False
        t = self.trainer

        def ineligible(reason: str) -> bool:
            if mode == "on":
                raise ValueError(f"dr_parallel='on' but {reason}")
            return False

        # Moving statistics (STAR PartitionedNorm) chain through query epochs
        # in the sequential dr_phase; parallel lanes would keep only the last
        # lane's updates — keep stat-carrying models sequential.
        if t.state.batch_stats:
            return ineligible(
                "the model carries batch statistics (e.g. PartitionedNorm), "
                "whose cross-query lineage needs the sequential dr_phase"
            )
        # Under a device mesh, lanes SHARD over the data axis (each device
        # trains n_domain/n_data query domains — embarrassingly parallel,
        # docs/SCALING.md) and requires a divisible lane count. Row-sharded
        # tables compose with the lanes in both regimes: FROZEN tables are
        # closure constants of the subset step, so every lane's lookup is the
        # same unbatched shard_map masked-gather+psum under vmap; TRAINABLE
        # tables are lane-stacked [L, rows, D] leaves sharded
        # P(data, table, None) — the vmap batching rule handles the batched
        # table operand through the shard_map lookup and its scatter-add
        # transpose (tests/test_mesh_dr_parallel.py pins both compositions
        # to the single-device trajectory).
        if t.mesh is not None:
            from mamdr_tpu.parallel.mesh import DATA_AXIS

            if self.n_domain % t.mesh.shape[DATA_AXIS] != 0:
                return ineligible(
                    f"n_domain {self.n_domain} does not divide the mesh data "
                    f"axis {t.mesh.shape[DATA_AXIS]}"
                )
            if (
                0 < self.tc.dr_lane_chunk
                and self.tc.dr_lane_chunk % t.mesh.shape[DATA_AXIS] != 0
            ):
                return ineligible(
                    f"dr_lane_chunk {self.tc.dr_lane_chunk} does not divide "
                    f"the mesh data axis {t.mesh.shape[DATA_AXIS]} (each "
                    "scanned chunk shards its lanes over that axis)"
                )
        frozen = trees.named_tree_map(
            lambda n, x: (not self.tc.emb_trainable)
            and ("user_emb" in n or "item_emb" in n),
            t.state.params,
        )
        covered = jax.tree_util.tree_all(
            jax.tree_util.tree_map(
                lambda m, f: bool(m) or bool(f), self.mask, frozen
            )
        )
        if not covered:
            return ineligible(
                "the meta mask does not cover every trainable leaf (non-meta "
                "trainables need the sequential chained lineage)"
            )
        if mode == "on":
            return True
        trainable_bytes = sum(
            leaf.size * leaf.dtype.itemsize
            for leaf, fz in zip(
                jax.tree_util.tree_leaves(t.state.params),
                jax.tree_util.tree_leaves(frozen),
            )
            if not fz
        )
        # params + 2 Adam slots per CONCURRENT lane; dr_lane_chunk bounds
        # concurrency to C lanes (fused lane_chunk scan)
        concurrent = self.n_domain
        if self.tc.dr_lane_chunk > 0:
            concurrent = min(concurrent, self.tc.dr_lane_chunk)
        lane_bytes = 3 * concurrent * trainable_bytes
        # Under a mesh every lane leaf shards over the data axis (tables
        # additionally over the table axis — ignored here, conservative), so
        # the per-DEVICE lane state is what competes for HBM.
        if t.mesh is not None:
            from mamdr_tpu.parallel.mesh import DATA_AXIS

            lane_bytes /= t.mesh.shape[DATA_AXIS]
        # Budget: the device's actual free HBM with headroom, not a magic
        # constant (VERDICT r3 item 3). Lane state competes with the resident
        # data blocks, the base params/opt tree, and XLA scratch for the
        # batched per-step scatter grads — keep lanes under 40% of free HBM.
        # The r2 "kernel fault" crash at Amazon-13 shapes retested clean
        # (retest_amazon_lanes, commit 07fa545 — flaky chip); sequential DR
        # remains the fallback, not a failure.
        budget = 0.4 * _device_free_bytes()
        return lane_bytes < budget

    # ---------------- eval plumbing ----------------

    def val_params_fn(self, idx: int):
        t = self.trainer
        merged = self.merge(self.shared, self.specific[idx])
        return (
            self.load_meta(t.state.params, merged),
            t.state.batch_stats,
        )

    def _best_params_fn(self, idx: int):
        t = self.trainer
        merged = self.merge(self.best_shared, self.best_specific[idx])
        return (self.load_meta(t.state.params, merged), t.state.batch_stats)

    def _merged_eval(self, mode: str, shared, specific_list):
        """All domains in one dispatch with per-domain merged weights."""
        import numpy as np

        from mamdr_tpu.train import fused

        t = self.trainer
        if not hasattr(self, "_eval_merged"):
            self._eval_merged = {}
        if mode not in self._eval_merged:
            self._eval_merged[mode] = fused.make_fused_eval_merged(
                t.loss_fn, self.mask, self.tc.merged_method,
                steps_list=t.eval_steps_per_domain(mode),
            )
        spec_stack = fused.stack_specific(specific_list, self.mask)
        losses, aucs = self._eval_merged[mode](
            t.state.params, t.state.batch_stats, shared, spec_stack,
            t.eval_block(mode),
        )
        losses, aucs = np.asarray(losses), np.asarray(aucs)
        domain_loss = {str(i): float(losses[i]) for i in range(len(losses))}
        domain_auc = {str(i): float(aucs[i]) for i in range(len(aucs))}
        return t.summarize(mode, domain_loss, domain_auc)

    def validate(self):
        if self.tc.meta_finetune_step > 0:
            return super().validate()
        if self.trainer.verbose:
            print("Val Result: ")
        return self._merged_eval("val", self.shared, self.specific)

    def save_best(self) -> None:
        self.best_shared = self.shared
        self.best_specific = list(self.specific)
        self.trainer.save_checkpoint()  # merged-agnostic full params (ref parity)
        checkpoints.save_decomposition(
            self.trainer.checkpoint_dir + "/decomposition",
            self.best_shared,
            self.best_specific,
            extra={"merged_method": self.tc.merged_method},
            # specifics' unmasked leaves alias shared (strip()) — writing
            # them per domain made a 3.8GB checkpoint per improving epoch
            # at Taobao-30 scale (the campaign's epoch-time bottleneck)
            mask=self.mask,
        )

    def test(self):
        return self._merged_eval("test", self.best_shared, self.best_specific)

    def finetune(self):
        """Per-domain SGD finetune from merge(best_shared, best_specific_i)
        (reference specific_base_model.py:99-162, SGD lr 0.001 hardcoded)."""
        t = self.trainer
        return separate_train_val_test(
            t, init_params=False, params_fn=self._best_params_fn
        )

    # ---------------- training ----------------

    def train(self) -> None:
        if self.use_fused:
            self._train_fused()
        else:
            self._train_loop()

    def prepare_fused(self, parallel_compile: bool = False) -> None:
        """Build the device-resident data block and the 2 fused phase fns.

        parallel_compile AOT-compiles the DN and DR phase graphs on two
        threads. Off by default: this environment's remote compile service
        serializes compilations, so threading only adds overhead — flip on
        for local/backend-parallel compilers.
        """
        import numpy as np

        from mamdr_tpu.train import fused
        from mamdr_tpu.train.steps import make_train_step

        t = self.trainer
        train_step, _ = make_train_step(t.model, t.tx, t.step_cfg)
        # reuse the trainer's cached block (the finetune stage shares it)
        self._block, n_steps = t.train_block()
        self._fused_steps_per_domain = n_steps
        self._dn_phase, self._dr_phase = fused.make_fused_mamdr(
            train_step,
            self.mask,
            self.tc.merged_method,
            n_steps,
            t.dataset.batch_size,
            self.tc.domain_regulation_step,
            steps_list=t.steps_per_domain(),
        )
        if self._dr_parallel_eligible():
            from mamdr_tpu.train.steps import make_subset_train_step
            from mamdr_tpu.utils import trees as trees_mod

            frozen_mask = trees_mod.named_tree_map(
                lambda n, x: (not self.tc.emb_trainable)
                and ("user_emb" in n or "item_emb" in n),
                t.state.params,
            )
            sub_step, to_sub, combine = make_subset_train_step(
                t.model, t.tx, t.step_cfg, frozen_mask, t.state.params
            )
            lane_sharding = table_lane_sharding = None
            row_sharded_shapes = ()
            if t.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                from mamdr_tpu.parallel.mesh import DATA_AXIS, TABLE_AXIS

                lane_sharding = NamedSharding(t.mesh, PartitionSpec(DATA_AXIS))
                # lane-stacked copies of row-sharded TRAINABLE tables keep
                # their row sharding: lane axis on data, rows on table
                sharded_tbl = self._row_sharded_table_mask()
                row_sharded_shapes = {
                    leaf.shape
                    for tbl, fz, leaf in zip(
                        jax.tree_util.tree_leaves(sharded_tbl),
                        jax.tree_util.tree_leaves(frozen_mask),
                        jax.tree_util.tree_leaves(t.state.params),
                    )
                    if tbl and not fz
                }
                if row_sharded_shapes:
                    table_lane_sharding = NamedSharding(
                        t.mesh, PartitionSpec(DATA_AXIS, TABLE_AXIS, None)
                    )
            lane_chunk = self.tc.dr_lane_chunk
            if lane_chunk == 0:
                # Auto-chunk wide TRAINABLE-table lane fans: 13 unchunked
                # lanes at Amazon-13 shapes crash the TPU worker
                # deterministically while 7-lane chunks run clean
                # (bisect_a13.json — width-triggered, threshold in (7, 13]).
                # Frozen-table lanes (Taobao, 10-30 domains) have run whole
                # campaigns unchunked and stay that way.
                # the crash driver is the BIG lane-stacked user/item tables;
                # the tiny always-trainable domain table is not it (frozen-
                # table Taobao fans up to 30 lanes ran whole campaigns clean)
                any_trainable_table = any(
                    tbl and not fz
                    for tbl, fz in zip(
                        jax.tree_util.tree_leaves(
                            trees.named_tree_map(
                                lambda n, x: ("user_emb" in n
                                              or "item_emb" in n)
                                and getattr(x, "ndim", 0) == 2,
                                t.state.params,
                            )
                        ),
                        jax.tree_util.tree_leaves(frozen_mask),
                    )
                )
                if any_trainable_table and self.n_domain > 7:
                    lane_chunk = 7
                    if t.mesh is not None:
                        from mamdr_tpu.parallel.mesh import DATA_AXIS

                        data = t.mesh.shape[DATA_AXIS]
                        lane_chunk = max((7 // data) * data, data)
            self._dr_lane_chunk_effective = lane_chunk
            self._dr_phase = fused.make_fused_dr_parallel(
                sub_step,
                to_sub,
                combine,
                self.mask,
                self.tc.merged_method,
                n_steps,
                t.dataset.batch_size,
                self.tc.domain_regulation_step,
                steps_list=t.steps_per_domain(),
                lane_sharding=lane_sharding,
                table_lane_sharding=table_lane_sharding,
                row_sharded_shapes=row_sharded_shapes,
                lane_chunk=lane_chunk,
            )
        self._spec_stack = fused.stack_specific(self.specific, self.mask)
        self._dn_compiled = self._dr_compiled = None
        if parallel_compile:
            import concurrent.futures

            seq = self.meta_sequence()
            order = np.asarray(seq, np.int32)
            k = min(self.tc.sample_num, len(seq) - 1) + int(self.tc.add_query_domain)
            aux = np.zeros((len(seq), k), np.int32)
            rng = jax.random.PRNGKey(0)
            lr = float(self.tc.meta_learning_rate)
            dn_low = self._dn_phase.lower(
                t.state, self.shared, self._block, order, rng, lr
            )
            dr_low = self._dr_phase.lower(
                t.state, self.shared, self._spec_stack, self._block, order, aux,
                rng, lr,
            )
            with concurrent.futures.ThreadPoolExecutor(2) as ex:
                dn_f = ex.submit(dn_low.compile)
                dr_f = ex.submit(dr_low.compile)
                self._dn_compiled = dn_f.result()
                self._dr_compiled = dr_f.result()

    def run_fused_epoch(self) -> None:
        """One DN+DR epoch in exactly 2 device dispatches."""
        import numpy as np

        t = self.trainer
        sequence = self.meta_sequence()
        if self.tc.shuffle_sequence:
            t.np_rng.shuffle(sequence)
        order = np.asarray(sequence, np.int32)
        k = self.tc.sample_num
        aux_rows = []
        for q in sequence:
            cand = [d for d in sequence if d != q]
            row = list(t.np_rng.choice(cand, size=min(k, len(cand)), replace=False))
            if self.tc.add_query_domain:
                row.append(q)
            aux_rows.append(row)
        aux = np.asarray(aux_rows, np.int32)

        t.rng, r1, r2 = jax.random.split(t.rng, 3)
        dn = self._dn_compiled or self._dn_phase
        dr = self._dr_compiled or self._dr_phase
        lr = float(self.tc.meta_learning_rate)
        t.state, self.shared, _losses = dn(
            t.state, self.shared, self._block, order, r1, lr
        )
        t.state, self._spec_stack = dr(
            t.state, self.shared, self._spec_stack, self._block, order, aux, r2, lr
        )

    def _train_fused(self) -> None:
        """Fused training loop: 2 dispatches per epoch (mamdr_tpu.train.fused).
        Semantics identical to _train_loop for the shipped non-batch DN+DR
        recipe."""
        from mamdr_tpu.train import fused

        t = self.trainer
        self.prepare_fused()
        start_epoch = 0
        templates = {
            "shared": self.shared,
            "spec_stack": self._spec_stack,
            "best_shared": self.best_shared,
            "best_spec_stack": self._spec_stack,
        }
        resumed = t.try_resume(templates)
        if resumed is not None:
            start_epoch = resumed[0]
            ex = resumed[1]
            self.shared = ex.get("shared", self.shared)
            self._spec_stack = ex.get("spec_stack", self._spec_stack)
            self.best_shared = ex.get("best_shared", self.best_shared)
            if "best_spec_stack" in ex:
                self.best_specific = fused.unstack_specific(
                    ex["best_spec_stack"], self.mask, self.n_domain
                )
            self.specific = fused.unstack_specific(
                self._spec_stack, self.mask, self.n_domain
            )
        for epoch in range(start_epoch, self.tc.epoch):
            if t.verbose:
                print(f"Epoch: {epoch}", "-" * 30)
            self.run_fused_epoch()
            self.specific = fused.unstack_specific(
                self._spec_stack, self.mask, self.n_domain
            )
            if self.epoch_tail(epoch):
                break
            if self.tc.resume_every > 0 and (epoch + 1) % self.tc.resume_every == 0:
                t.save_resume_state(
                    epoch,
                    extra_trees={
                        "shared": self.shared,
                        "spec_stack": self._spec_stack,
                        "best_shared": self.best_shared,
                        "best_spec_stack": fused.stack_specific(
                            self.best_specific, self.mask
                        ),
                    },
                )

    def _train_loop(self) -> None:
        t = self.trainer
        sequence = self.meta_sequence()
        meta_lr = self.tc.meta_learning_rate
        batch_mode = self.spec.batch_update

        for epoch in range(self.tc.epoch):
            if t.verbose:
                print(f"Epoch: {epoch}", "-" * 30)
            if self.tc.shuffle_sequence:
                t.np_rng.shuffle(sequence)

            # ---- Phase 1: DN on shared ----
            t.state = t.state.replace(
                params=self.load_meta(t.state.params, self.shared)
            )
            for idx in sequence:
                t.state, _ = t.fit_domain(t.state, idx)
            self.shared = self.reptile_step(self.shared, t.state.params, meta_lr)

            # ---- Phase 2: DR on specific ----
            for idx in sequence:
                candidates = [d for d in sequence if d != idx]
                aux_idxs = list(
                    t.np_rng.choice(
                        candidates,
                        size=min(self.tc.sample_num, len(candidates)),
                        replace=False,
                    )
                )
                if self.tc.add_query_domain:
                    aux_idxs.append(idx)

                merged = self.merge(self.shared, self.specific[idx])
                acc = trees.tree_zeros_like(self.shared) if batch_mode else None

                for aux_idx in aux_idxs:
                    if t.verbose:
                        print(f"Support Domain: {aux_idx}, Query Domain: {idx}")
                    t.state = t.state.replace(
                        params=self.load_meta(t.state.params, merged)
                    )
                    # full epoch on the support domain
                    t.state, _ = t.fit_domain(t.state, int(aux_idx))
                    # regularize on the query domain (capped steps)
                    t.state, _ = t.fit_domain(
                        t.state, idx, max_steps=self.tc.domain_regulation_step
                    )
                    if batch_mode:
                        acc = self.dr_acc(acc, t.state.params, merged, self.shared)
                    else:
                        self.specific[idx] = self.scaled_add_from(
                            self.specific[idx], t.state.params, merged, meta_lr
                        )
                        merged = self.merge(self.shared, self.specific[idx])

                if batch_mode:
                    self.specific[idx] = self.scaled_add(
                        self.specific[idx], acc, meta_lr / self.tc.sample_num
                    )

                if self.tc.finetune_every_epoch:
                    merged = self.merge(self.shared, self.specific[idx])
                    t.state = t.state.replace(
                        params=self.load_meta(t.state.params, merged)
                    )
                    t.state, loss = t.fit_domain(t.state, idx)
                    if t.verbose:
                        print(f"Train on: Domain {idx}, Loss: {loss:.4f}")
                    self.specific[idx] = self.spec_from_adapted(
                        t.state.params, merged, self.specific[idx]
                    )

            if self.epoch_tail(epoch):
                break

    def scaled_add_from(self, specific, adapted, merged, lr):
        """specific += (adapted - merged) * lr on masked leaves
        (reference mamdr.py:173-180 with merged as the base)."""
        return self.delta_scaled(specific, adapted, merged, lr)

    @property
    def delta_scaled(self):
        if not hasattr(self, "_delta_scaled"):
            m = self.mask
            self._delta_scaled = jax.jit(
                lambda sp, a, mg, lr: jax.tree_util.tree_map(
                    lambda mm, sp_, a_, mg_: sp_ + (a_ - mg_) * lr if mm else sp_,
                    m, sp, a, mg,
                )
            )
        return self._delta_scaled
