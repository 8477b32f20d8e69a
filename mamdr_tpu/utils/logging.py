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
