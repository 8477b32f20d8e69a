"""Trainer: model/optimizer/data wiring + per-domain fit/eval machinery.

The per-strategy control planes (mamdr_tpu.strategies) drive this object.
It mirrors the reference BaseModel surface — per-domain evaluation with
macro/weighted AUC (base_model.py:111-175), the strict-improvement early-stop
state machine (base_model.py:202-224), best-checkpoint reload for test, and
result artifacts (base_model.py:183-200) — while keeping all parameter state
as on-device pytrees.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.dataset import DomainSplit, MultiDomainDataset, stack_batches
from mamdr_tpu.models.zoo import build_model
from mamdr_tpu.train import checkpoints
from mamdr_tpu.train.state import TrainState
from mamdr_tpu.train.steps import StepConfig, TrainFns, build_train_fns, make_optimizer


class EarlyStopper:
    """Strict-improvement early stop (reference base_model.py:202-224)."""

    def __init__(self, patience: int):
        self.patience = patience
        self.counter = 0
        self.best_metric: Optional[float] = None
        self.early_stop = False

    def step(self, metric: float) -> bool:
        """Returns True when training should stop. improved() tells callers to save."""
        self.improved = False
        if self.best_metric is None or metric > self.best_metric:
            self.best_metric = metric
            self.counter = 0
            self.improved = True
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        return self.early_stop


class Trainer:
    def __init__(
        self,
        config: ExperimentConfig,
        dataset: MultiDomainDataset,
        verbose: bool = True,
        mesh=None,
    ):
        """mesh: optional (data, table) jax Mesh. When given, user/item
        tables are padded to the table-axis size, laid out P(table, None),
        and every lookup in the model zoo routes through the shard_map
        masked-gather+psum path (ops.embedding_lookup context — process-wide,
        so one mesh per process)."""
        self.config = config
        self.dataset = dataset
        self.verbose = verbose
        self.spec = config.spec
        self.mesh = mesh
        tc, mc = config.train, config.model

        n_uid, n_pid = dataset.n_uid, dataset.n_pid
        pretrained_user, pretrained_item = dataset.user_emb, dataset.item_emb
        if mesh is not None:
            from mamdr_tpu.ops.embedding_lookup import set_lookup_mesh
            from mamdr_tpu.parallel.embedding_shard import pad_rows
            from mamdr_tpu.parallel.mesh import TABLE_AXIS

            tshards = mesh.shape[TABLE_AXIS]
            n_uid = pad_rows(n_uid, tshards)
            n_pid = pad_rows(n_pid, tshards)

            def pad_table(t, n):
                if t is None or t.shape[0] == n:
                    return t
                out = np.zeros((n, t.shape[1]), t.dtype)
                out[: t.shape[0]] = t
                return out

            pretrained_user = pad_table(pretrained_user, n_uid)
            pretrained_item = pad_table(pretrained_item, n_pid)
            set_lookup_mesh(mesh, tc.sharded_lookup_min_rows)

        self.model = build_model(
            config,
            n_uid=n_uid,
            n_pid=n_pid,
            n_domain=dataset.n_domain,
            pretrained_user=pretrained_user,
            pretrained_item=pretrained_item,
        )

        self.np_rng = np.random.default_rng(dataset.seed)
        self.rng = jax.random.PRNGKey(dataset.seed)
        self.rng, init_rng = jax.random.split(self.rng)

        sample = self._sample_batch()
        variables = self.model.init(
            {"params": init_rng, "dropout": init_rng},
            sample["uid"], sample["pid"], sample["domain"], train=False,
        )
        model_params = variables["params"]
        batch_stats = dict(variables.get("batch_stats", {}))

        params = {"model": model_params}
        if self.spec.uncertainty_weight:
            # WeightedLoss log_vars init 1.0 (weighted_loss.py:15-27).
            params["uncertainty"] = {
                "log_vars": jnp.ones((dataset.n_domain, 1), jnp.float32)
            }
        self.step_cfg = StepConfig(
            uncertainty_weight=self.spec.uncertainty_weight,
            l2_emb=1e-5,
            emb_trainable=tc.emb_trainable,
            has_batch_stats=bool(batch_stats),
            has_dropout=mc.dropout > 0.0,
            meta_accumulate={"moving_mean": "ema", "drop": "drop"}.get(
                tc.average_meta_grad, "sum"
            ),
        )
        self.tx = make_optimizer(
            tc.optimizer, tc.learning_rate, params, tc.emb_trainable,
            flat=tc.flat_optimizer,
        )
        self.fns: TrainFns = build_train_fns(self.model, self.tx, self.step_cfg)
        if mesh is not None:
            # Lay the big tables out row-sharded; optimizer slots inherit the
            # layout through the jitted init.
            from mamdr_tpu.parallel.trainer_sharding import param_sharding_specs

            params = jax.device_put(
                params,
                param_sharding_specs(
                    params, mesh, shard_experts=tc.shard_experts
                ),
            )
        self.state = TrainState.create(
            params=params,
            opt_state=self.fns.init_opt(params),
            batch_stats=batch_stats,
            rng=self.rng,
        )

        # Finetune-stage fns (SGD lr=0.001 hardcoded in the reference,
        # base_model.py:69 / specific_base_model.py:120).
        self.finetune_tx = make_optimizer(
            tc.finetune_optimizer, tc.finetune_learning_rate, params, tc.emb_trainable
        )
        self.finetune_fns = build_train_fns(self.model, self.finetune_tx, self.step_cfg)

        self._eval_cache: Dict[Tuple[str, int], Dict] = {}
        self.stopper = EarlyStopper(tc.patience)
        self.best_params = None  # on-device mirror of the best checkpoint

        from mamdr_tpu.train.steps import make_accum_grad_fn, make_loss_fn

        self.loss_fn = make_loss_fn(self.model, self.step_cfg)
        # grads-at-fixed-params for the meta accumulation paths (fused
        # kernel when eligible, autodiff otherwise)
        self.accum_grad_fn = make_accum_grad_fn(self.model, self.step_cfg)
        self._fused_eval_fns: Dict[str, Callable] = {}
        self._train_block = None

        ts = time.strftime("%Y%m%d-%H%M%S")
        self.checkpoint_dir = osp.join(
            tc.checkpoint_path, mc.name, config.dataset.name,
            config.dataset.domain_split_path, ts,
        )
        self.checkpoint_path = osp.join(self.checkpoint_dir, "model_parameters.npz")
        # Resume dir is timestamp-free so a restarted process finds it.
        self.resume_dir = osp.join(
            tc.checkpoint_path, mc.name, config.dataset.name,
            config.dataset.domain_split_path, "resume",
        )
        self.result_dir = osp.join(
            tc.result_save_path, mc.name, config.dataset.name,
            config.dataset.domain_split_path,
        )
        from mamdr_tpu.utils.logging import MetricsLogger

        self.metrics = MetricsLogger(
            osp.join(self.checkpoint_dir, "metrics.jsonl")
            if tc.metrics_jsonl
            else None
        )
        from mamdr_tpu.utils.logging import TensorBoardLogger

        # Reference parity: Keras TensorBoard at dirname(checkpoint_path)
        # (maml.py:21-23); histogram_freq>0 implies the writer.
        self.tb = TensorBoardLogger(
            osp.join(self.checkpoint_dir, "tensorboard"),
            histogram_freq=tc.histogram_freq,
            enabled=tc.tensorboard,
            write_grads=tc.write_grads,
        )
        self._eval_epoch_counter = 0

    # ---------------- fused helpers ----------------

    def train_block(self):
        """Device-resident [D, N_pad] train block for fused phase execution."""
        from mamdr_tpu.train import fused as fused_mod

        if self._train_block is None:
            self._train_block = fused_mod.stack_domains_on_device(
                self.dataset.train, self.dataset.batch_size
            )
        return self._train_block

    def steps_per_domain(self):
        """Static per-domain real step counts ceil(n_d / B) (ragged fused
        execution: mamdr_tpu.train.fused._ragged_batches)."""
        return [
            -(-s.n // self.dataset.batch_size) for s in self.dataset.train
        ]

    def fused_padding_ok(
        self,
        max_waste_ratio: float = 4.0,
        steps_per_dispatch: float = 250.0,
        ragged: bool = False,
        max_block_gb: float = 4.0,
    ) -> bool:
        """Fused passes pad every domain to the largest domain's step count.

        Cost model (padded scan): a padded (no-op) step costs ~100-150us of
        wasted compute while each dispatch the fusion saves costs ~30ms on a
        tunneled / production TPU — so padding pays for itself up to ~250
        wasted steps per saved dispatch. Fuse when EITHER the waste ratio is
        small or the absolute waste stays under that break-even.

        `ragged=True` (strategies whose fused paths run only real steps —
        dynamically-bounded epochs / the ragged flattened pass): padding
        wastes MEMORY, not compute, so the only gate is the [D, N_pad] block
        staying within a sane HBM budget.

        fixed_train routes to the loop path (fused epochs shuffle in-device;
        the reference knob demands a stable batch order)."""
        if getattr(self.dataset, "fixed_train", False):
            return False
        sizes = [s.n for s in self.dataset.train]
        steps = [-(-n // self.dataset.batch_size) for n in sizes]
        d = len(steps)
        total_padded = max(steps) * d
        if ragged:
            block_bytes = total_padded * self.dataset.batch_size * 5 * 4
            return block_bytes <= max_block_gb * 2**30
        if total_padded <= max_waste_ratio * sum(steps):
            return True
        return (total_padded - sum(steps)) <= steps_per_dispatch * d

    def train_step_fn(self):
        from mamdr_tpu.train.steps import make_train_step

        step, _ = make_train_step(self.model, self.tx, self.step_cfg)
        return step

    # ---------------- params ----------------

    def fresh_params(self, seed: int):
        """A fresh random draw of the full parameter tree (same structure).

        Used for MAMDR's per-domain specific-weight init, which re-runs the
        initialisers per domain (reference mamdr.py:30-33, init_layer at
        specific_base_model.py:174-178).
        """
        sample = self._sample_batch()
        variables = self.model.init(
            {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed)},
            sample["uid"], sample["pid"], sample["domain"], train=False,
        )
        params = {"model": variables["params"]}
        if self.spec.uncertainty_weight:
            params["uncertainty"] = {
                "log_vars": jnp.ones((self.dataset.n_domain, 1), jnp.float32)
            }
        return params

    # ---------------- data ----------------

    def _sample_batch(self):
        d0 = self.dataset.train[0]
        n = min(2, d0.n)
        if self.mesh is not None:
            # sharded lookups split ids over the mesh data axis; the init
            # trace's sample batch must divide it
            from mamdr_tpu.parallel.mesh import DATA_AXIS

            shards = self.mesh.shape[DATA_AXIS]
            if d0.n < shards:
                raise ValueError(
                    f"domain 0 has {d0.n} train rows but the mesh data axis "
                    f"has {shards} shards; the init-trace sample batch must "
                    "divide the data axis — use a smaller mesh or more data"
                )
            n = max(n, shards)
        return {
            "uid": jnp.asarray(d0.uid[:n]),
            "pid": jnp.asarray(d0.pid[:n]),
            "domain": jnp.asarray(d0.domain[:n]),
            "label": jnp.asarray(d0.label[:n]),
            "weight": jnp.ones((n,), jnp.float32),
        }

    def _sample_grads(self):
        """Loss gradients on a sample batch, for write_grads histograms
        (reference maml.py:42-45 Keras write_grads=True semantics)."""
        import jax

        batch = self._sample_batch()
        grad_fn = jax.grad(
            lambda p: self.loss_fn(
                p, self.state.batch_stats, batch, jax.random.PRNGKey(0), False
            )[0]
        )
        return grad_fn(self.state.params)

    def stack_train_epoch(
        self, domain_idx: int, split: Optional[DomainSplit] = None,
        max_steps: int = 0,
    ) -> Dict:
        """Shuffle + stack one domain-epoch; optionally cap steps
        (meta_train_step / domain_regulation_step semantics, maml.py:92-99)."""
        split = split if split is not None else self.dataset.train[domain_idx]
        stacked = stack_batches(
            split, self.dataset.batch_size,
            shuffle=not getattr(self.dataset, "fixed_train", False),
            rng=self.np_rng,
        )
        if max_steps and max_steps > 0:
            stacked = {k: v[:max_steps] for k, v in stacked.items()}
        return jax.device_put(stacked)

    def eval_stack(self, mode: str, domain_idx: int) -> Dict:
        key = (mode, domain_idx)
        if key not in self._eval_cache:
            split = {"val": self.dataset.val, "test": self.dataset.test}[mode][domain_idx]
            self._eval_cache[key] = jax.device_put(
                stack_batches(split, self.dataset.batch_size, shuffle=False)
            )
        return self._eval_cache[key]

    def eval_block(self, mode: str):
        """Device-resident [D, S, B] eval block for fused all-domain eval."""
        from mamdr_tpu.train import fused as fused_mod

        key = (mode, "__block__")
        if key not in self._eval_cache:
            splits = {"val": self.dataset.val, "test": self.dataset.test}[mode]
            self._eval_cache[key] = fused_mod.stack_domains_eval(
                splits, self.dataset.batch_size
            )
        return self._eval_cache[key]

    def eval_steps_per_domain(self, mode: str):
        """Static per-domain real eval step counts (ragged fused eval)."""
        splits = {"val": self.dataset.val, "test": self.dataset.test}[mode]
        return [-(-s.n // self.dataset.batch_size) for s in splits]

    def fused_eval_fn(self, mode: str):
        """Per-mode fused all-domain eval (ragged on long-tailed splits)."""
        if mode not in self._fused_eval_fns:
            from mamdr_tpu.train.fused import make_fused_eval

            self._fused_eval_fns[mode] = make_fused_eval(
                self.loss_fn, 500, steps_list=self.eval_steps_per_domain(mode)
            )
        return self._fused_eval_fns[mode]

    # ---------------- fit / eval ----------------

    def fit_domain(
        self,
        state: TrainState,
        domain_idx: int,
        split: Optional[DomainSplit] = None,
        max_steps: int = 0,
        finetune: bool = False,
    ) -> Tuple[TrainState, float]:
        """One epoch over one domain, scan-fused under a single jit."""
        stacked = self.stack_train_epoch(domain_idx, split, max_steps)
        fns = self.finetune_fns if finetune else self.fns
        state, loss = fns.train_epoch(state, stacked)
        return state, float(loss)

    def evaluate_domain(
        self, mode: str, domain_idx: int, params, batch_stats
    ) -> Tuple[float, float]:
        stacked = self.eval_stack(mode, domain_idx)
        loss, auc = self.fns.eval_epoch(params, batch_stats, stacked)
        return float(loss), float(auc)

    def val_and_test(
        self,
        mode: str,
        params_fn: Optional[Callable[[int], Tuple]] = None,
        params=None,
    ) -> Tuple[float, float, Dict, Dict]:
        """Per-domain eval -> (macro loss, macro AUC, per-domain dicts).

        ``params_fn(domain_idx) -> (params, batch_stats)`` lets strategy
        wrappers evaluate per-domain merged weights (SpecificBase semantics,
        specific_base_model.py:64-97). Default: current state.
        NOTE: unlike reference val_and_test, test-time best-checkpoint reload
        is the caller's job (strategies own their best-weight snapshots).
        """
        if mode not in ("val", "test"):
            raise ValueError(f"mode must be val or test, not {mode!r}")
        if params_fn is None:
            # fused fast path: all domains in one dispatch
            losses, aucs = self.fused_eval_fn(mode)(
                params if params is not None else self.state.params,
                self.state.batch_stats,
                self.eval_block(mode),
            )
            losses, aucs = np.asarray(losses), np.asarray(aucs)
            domain_loss = {str(i): float(losses[i]) for i in range(len(losses))}
            domain_auc = {str(i): float(aucs[i]) for i in range(len(aucs))}
        else:
            domain_loss, domain_auc = {}, {}
            for idx in range(self.dataset.n_domain):
                params, stats = params_fn(idx)
                l, a = self.evaluate_domain(mode, idx, params, stats)
                domain_loss[str(idx)] = l
                domain_auc[str(idx)] = a
        return self.summarize(mode, domain_loss, domain_auc)

    def summarize(self, mode: str, domain_loss: Dict, domain_auc: Dict):
        avg_loss = sum(domain_loss.values()) / len(domain_loss)
        avg_auc = sum(domain_auc.values()) / len(domain_auc)
        self.metrics.log_eval(
            mode, self._eval_epoch_counter, avg_loss, avg_auc, domain_auc
        )
        if self.tb.enabled:  # don't pay weighted_auc when TB is off (advisor r3)
            self.tb.log_eval(
                mode, self._eval_epoch_counter, avg_loss, avg_auc, domain_auc,
                weighted_auc=self.weighted_auc(mode, domain_auc),
            )
        if mode == "val":
            self.tb.log_histograms(self._eval_epoch_counter, self.state.params)
            if self.tb.write_grads:
                self.tb.log_grad_histograms(
                    self._eval_epoch_counter, self._sample_grads()
                )
            self._eval_epoch_counter += 1
        if self.verbose:
            print(f"Loss: {domain_loss}")
            print("AUC: ")
            for k, v in domain_auc.items():
                print(f"{k}: {v}")
            w_auc = self.weighted_auc(mode, domain_auc)
            print(
                f"Overall {mode} Loss: {avg_loss}, AUC: {avg_auc}, "
                f"Weighted AUC: {w_auc}"
            )
        return avg_loss, avg_auc, domain_loss, domain_auc

    def weighted_auc(self, mode: str, domain_auc: Dict[str, float]) -> float:
        """Example-weighted AUC (base_model.py:157-175)."""
        info = self.dataset.dataset_info
        tag = "n_val" if "val" in mode else ("n_test" if "test" in mode else "n_train")
        num = sum(info[k][tag] * v for k, v in domain_auc.items())
        den = sum(info[k][tag] for k in domain_auc)
        return num / den

    # ---------------- checkpoints / results ----------------

    def save_resume_state(self, epoch: int, extra_trees=None, extra_meta=None) -> None:
        checkpoints.save_train_state(
            self.resume_dir, self.state, epoch, self.stopper, self.np_rng,
            extra_trees, extra_meta, host_rng=self.rng,
        )

    def try_resume(self, extra_templates=None):
        """Restore full train state; returns (next_epoch, extra_trees) or None."""
        if not (self.config.train.resume and checkpoints.has_train_state(self.resume_dir)):
            return None
        state, epoch, st, np_state, extras = checkpoints.load_train_state(
            self.resume_dir, self.state, extra_templates
        )
        self.state = state
        self.rng = jnp.asarray(extras.pop("host_rng"))
        self.stopper.patience = st["patience"]
        self.stopper.counter = st["counter"]
        self.stopper.best_metric = st["best_metric"]
        self.stopper.early_stop = st["early_stop"]
        self.np_rng.bit_generator.state = np_state
        if self.verbose:
            print(f"Resumed from {self.resume_dir} at epoch {epoch + 1}")
        return epoch + 1, extras

    def save_checkpoint(self, params=None) -> None:
        params = params if params is not None else self.state.params
        self.best_params = params  # keep on device; disk write is the backup
        checkpoints.save_pytree(self.checkpoint_path, params)

    def load_checkpoint(self):
        return checkpoints.load_pytree(self.checkpoint_path, self.state.params)

    def save_result(self, avg_loss, avg_auc, domain_loss, domain_auc) -> str:
        folder = "loss_{:.3f}_auc_{:.3f}_{}".format(
            avg_loss, avg_auc, time.strftime("%a-%b-%d-%H-%M-%S")
        )
        result_path = osp.join(self.result_dir, folder)
        os.makedirs(result_path, exist_ok=True)
        with open(osp.join(result_path, "dataset_info.json"), "w") as f:
            json.dump(self.dataset.dataset_info, f)
        with open(osp.join(result_path, "config.json.example"), "w") as f:
            json.dump(self.config.to_dict(), f)
        with open(osp.join(result_path, "result.json"), "w") as f:
            json.dump(
                {
                    "avg_loss": avg_loss,
                    "avg_auc": avg_auc,
                    "domain_loss": domain_loss,
                    "domain_auc": domain_auc,
                },
                f,
            )
        # The reference's save_result runs after test's best-checkpoint reload
        # (base_model.py:121), so the artifact holds the BEST weights — the
        # ones that produced the recorded metrics — not the last-epoch state.
        checkpoints.save_pytree(
            osp.join(result_path, "model_parameters.npz"),
            self.best_params if self.best_params is not None else self.state.params,
        )
        return result_path
