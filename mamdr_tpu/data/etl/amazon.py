"""Amazon MDR dataset builder (reference dataset/Amazon/*).

Parses 5-core category review files (gzipped JSON-lines with
reviewerID/asin/overall — reference preprocess_data.py:14-24), remaps ids
through persistent RawId2Id maps shared across categories, and splits each
category into a domain with the common negative-sampling recipe.

Zero-egress note: the reference downloads the raw files from the UCSD
endpoint (get_raw_data.py:7-41); this builder expects them already on disk
under ``<raw_data_path>/<Category_Name>.json.gz`` (or ``.jsonl``/``.csv``
with uid,pid,score columns) and says so if they're missing.

CLI: ``python -m mamdr_tpu.data.etl.amazon --config config.json`` with the
reference's split-config schema (categories, ctr_ratio / ctr_ratio_range +
random_range, train_val_test, seed, rebuild, *_path).
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import os.path as osp
import random
from typing import List

import pandas as pd

from mamdr_tpu.data.etl.common import RawId2Id, split_domains


def _category_filename(category: str) -> str:
    return category.replace(", ", "_").replace(" ", "_")


def _raw_path(
    category: str,
    raw_data_path: str,
    redownload: bool = False,
    mirror_path=None,
    base_url=None,
) -> str:
    base = _category_filename(category)
    # reference layout first ({Category}_5.json.gz, get_raw_data.py:10-11),
    # then bare extensions
    for suffix in ("_5.json.gz", ".json.gz", ".jsonl", ".json", ".csv"):
        p = osp.join(raw_data_path, base + suffix)
        if osp.exists(p) and not redownload:
            return p
    # fetch shim: local mirror / overridden URL / reference UCSD endpoint
    from mamdr_tpu.data.etl.get_raw_data import get_raw_data_path

    try:
        return get_raw_data_path(
            category, raw_data_path, redownload=redownload,
            base_url=base_url, mirror_path=mirror_path,
        )
    except Exception as e:
        raise FileNotFoundError(
            f"raw reviews for {category!r} not found under {raw_data_path} "
            f"and could not be fetched ({e}) — place the 5-core category "
            f"file there, or set mirror_path/MAMDR_AMAZON_MIRROR to a local "
            f"mirror directory"
        ) from e


def load_reviews(path: str) -> pd.DataFrame:
    """-> DataFrame[uid, pid, score] (raw string ids)."""
    if path.endswith(".csv"):
        df = pd.read_csv(path)
        assert {"uid", "pid", "score"} <= set(df.columns)
        return df[["uid", "pid", "score"]]
    opener = gzip.open if path.endswith(".gz") else open
    rows = []
    with opener(path, "rb") as f:
        for line in f:
            d = json.loads(line)
            rows.append([d["reviewerID"], d["asin"], d["overall"]])
    return pd.DataFrame(rows, columns=["uid", "pid", "score"])


def preprocess(
    categories: List[str],
    processed_data_path: str,
    raw_data_path: str,
    rebuild: bool = False,
    redownload: bool = False,
    mirror_path=None,
    base_url=None,
) -> List[str]:
    """Reviews -> per-category processed csv with persistent id maps
    (reference preprocess_data.py:27-63)."""
    uid2id_path = osp.join(processed_data_path, "uid2id.json")
    pid2id_path = osp.join(processed_data_path, "pid2id.json")
    uid2id = RawId2Id(uid2id_path, rebuild)
    pid2id = RawId2Id(pid2id_path, rebuild)
    old_u, old_p = uid2id.content_hash(), pid2id.content_hash()

    os.makedirs(processed_data_path, exist_ok=True)
    out = []
    for c in categories:
        processed = osp.join(processed_data_path, _category_filename(c) + ".csv")
        if not rebuild and osp.exists(processed):
            out.append(processed)
            continue
        df = load_reviews(
            _raw_path(c, raw_data_path, redownload, mirror_path, base_url)
        )
        df["uid"] = df["uid"].map(uid2id.fit_transform)
        df["pid"] = df["pid"].map(pid2id.fit_transform)
        df.to_csv(processed, index=False, columns=["uid", "pid", "score"])
        out.append(processed)

    if uid2id.content_hash() != old_u:
        uid2id.export(uid2id_path)
    if pid2id.content_hash() != old_p:
        pid2id.export(pid2id_path)
    return out


def split_to_domains(conf: dict) -> int:
    split_save_path = conf["split_save_path"]
    processed_data_path = osp.join(split_save_path, conf["processed_data_path"])
    files = preprocess(
        conf["categories"],
        processed_data_path,
        conf["raw_data_path"],
        rebuild=conf.get("rebuild", False),
        redownload=conf.get("redownload", False),
        mirror_path=conf.get("mirror_path"),
        base_url=conf.get("base_url"),
    )
    n = split_domains(
        files, split_save_path, conf,
        rename_cols={"score": "score"},
    )
    print(f"Split {n} domains at: {split_save_path}")
    return n


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args()
    with open(args.config) as f:
        conf = json.load(f)
    random.seed(conf["seed"])
    split_to_domains(conf)
