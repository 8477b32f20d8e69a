"""Structured observability: JSONL metrics events + profiler hook.

Replaces the reference's stdout prints + Keras TensorBoard callback
(SURVEY §5.1, maml.py:42-45) with an append-only JSONL event stream that
downstream dashboards/TensorBoard exporters can tail, plus an optional
jax.profiler trace per epoch (reference has no profiler integration).
"""

from __future__ import annotations

import contextlib
import json
import os
import os.path as osp
import time
from typing import Dict, Optional


class MetricsLogger:
    """Append-only JSONL event log; no-op when path is falsy."""

    def __init__(self, path: Optional[str]):
        self.path = path
        if path:
            os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)

    def log(self, event: str, **fields) -> None:
        if not self.path:
            return
        rec = {"ts": round(time.time(), 3), "event": event}
        rec.update(fields)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def log_eval(self, mode: str, epoch, avg_loss, avg_auc, domain_auc: Dict) -> None:
        self.log(
            f"{mode}_eval",
            epoch=epoch,
            avg_loss=float(avg_loss),
            avg_auc=float(avg_auc),
            domain_auc={k: float(v) for k, v in domain_auc.items()},
        )


class TensorBoardLogger:
    """Per-epoch TensorBoard scalars + weight histograms.

    Mirrors the reference's Keras TensorBoard callback surface
    (reference model_zoo/maml.py:42-45 emits per-batch domain AUC/loss and
    per-epoch val scalars; ``histogram_freq`` is the Keras knob: weight
    histograms every N epochs, 0 = off). Scalars are written per EVAL here —
    the fused executor runs a whole epoch as 1-2 dispatches, so per-batch
    host callbacks would serialize the device pipeline; the per-epoch
    per-domain scalars carry the same curves at the granularity the
    reference actually plots.

    No-op unless enabled; the torch SummaryWriter import is lazy so
    disabled runs never pay it.
    """

    def __init__(self, logdir: Optional[str], histogram_freq: int = 0,
                 enabled: bool = False, write_grads: bool = False):
        self.histogram_freq = int(histogram_freq)
        self.enabled = bool(enabled) or self.histogram_freq > 0
        self.write_grads = bool(write_grads) and self.histogram_freq > 0
        self.logdir = logdir
        self._writer = None
        if self.enabled and not logdir:
            raise ValueError("TensorBoardLogger enabled without a logdir")
        if self.enabled:
            # fail fast at config time, not at the first log_eval deep in a
            # run after the expensive warmup/compile (advisor r3)
            import importlib.util

            if importlib.util.find_spec("torch") is None:
                raise ImportError(
                    "train.tensorboard/histogram_freq requires torch "
                    "(torch.utils.tensorboard.SummaryWriter) which is not "
                    "installed"
                )

    @property
    def writer(self):
        if self._writer is None:
            from torch.utils.tensorboard import SummaryWriter

            os.makedirs(self.logdir, exist_ok=True)
            self._writer = SummaryWriter(log_dir=self.logdir)
        return self._writer

    def log_eval(self, mode: str, epoch: int, avg_loss, avg_auc,
                 domain_auc: Dict, weighted_auc=None) -> None:
        if not self.enabled:
            return
        w = self.writer
        w.add_scalar(f"{mode}/avg_loss", float(avg_loss), epoch)
        w.add_scalar(f"{mode}/avg_auc", float(avg_auc), epoch)
        if weighted_auc is not None:
            w.add_scalar(f"{mode}/weighted_auc", float(weighted_auc), epoch)
        for k, v in domain_auc.items():
            w.add_scalar(f"{mode}/domain_{k}_AUC", float(v), epoch)
        w.flush()

    def log_histograms(self, epoch: int, params) -> None:
        """Weight histograms every ``histogram_freq`` val epochs (Keras
        TensorBoard semantics). `params` is a pytree of arrays."""
        if self.histogram_freq <= 0 or epoch % self.histogram_freq != 0:
            return
        import jax
        import numpy as np

        w = self.writer
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for path, leaf in flat:
            name = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            w.add_histogram(name, np.asarray(leaf), epoch)
        w.flush()

    def log_grad_histograms(self, epoch: int, grads) -> None:
        """Gradient histograms every ``histogram_freq`` val epochs —
        reference maml.py:42-45 passes write_grads=True to the Keras
        TensorBoard callback. ``grads`` is a pytree of arrays (the loss
        gradient on a sample batch); leaves log as ``grad/<param path>``."""
        if not self.write_grads or epoch % self.histogram_freq != 0:
            return
        import jax
        import numpy as np

        w = self.writer
        flat = jax.tree_util.tree_flatten_with_path(grads)[0]
        for path, leaf in flat:
            name = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            w.add_histogram(f"grad/{name}", np.asarray(leaf), epoch)
        w.flush()

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()
            self._writer = None


@contextlib.contextmanager
def maybe_profile(profile_dir: Optional[str], tag: str):
    """jax.profiler trace of the wrapped block when profile_dir is set
    (view with TensorBoard / Perfetto)."""
    if not profile_dir:
        yield
        return
    import jax

    path = osp.join(profile_dir, tag)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield
