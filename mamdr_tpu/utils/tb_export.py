"""Export a metrics.jsonl event stream to TensorBoard scalar logs.

The Trainer's live path (`train.tensorboard` / `train.histogram_freq`)
writes TensorBoard directly; this module converts PAST runs' metrics.jsonl
(always written unless `train.metrics_jsonl=false`) so any recorded
training curve is TensorBoard-viewable after the fact — the reference's
equivalent surface is the Keras TensorBoard callback it always registers
(reference model_zoo/maml.py:21-23,42-45).

Usage:
    python -m mamdr_tpu.utils.tb_export <metrics.jsonl> [--out LOGDIR]

Default LOGDIR is `tensorboard/` next to the metrics file.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp


def export(metrics_path: str, out_dir: str | None = None) -> str:
    from torch.utils.tensorboard import SummaryWriter

    out_dir = out_dir or osp.join(osp.dirname(osp.abspath(metrics_path)),
                                  "tensorboard")
    writer = SummaryWriter(log_dir=out_dir)
    n = 0
    with open(metrics_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            event = rec.get("event", "")
            if not event.endswith("_eval"):
                continue
            mode = event[: -len("_eval")]
            step = int(rec.get("epoch") or 0)
            wall = rec.get("ts")
            for key in ("avg_loss", "avg_auc"):
                if key in rec:
                    writer.add_scalar(f"{mode}/{key}", float(rec[key]),
                                      step, walltime=wall)
                    n += 1
            for k, v in (rec.get("domain_auc") or {}).items():
                writer.add_scalar(f"{mode}/domain_{k}_AUC", float(v), step,
                                  walltime=wall)
                n += 1
    writer.close()
    print(f"wrote {n} scalars -> {out_dir}")
    return out_dir


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("metrics", help="path to a metrics.jsonl file")
    p.add_argument("--out", default=None, help="TensorBoard logdir")
    args = p.parse_args()
    export(args.metrics, args.out)


if __name__ == "__main__":
    main()
