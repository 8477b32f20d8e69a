"""Shared ETL machinery: id remapping, negative sampling, stratified splits.

Reproduces the reference dataset-builder recipe exactly
(dataset/Amazon/split.py, dataset/Taobao/split.py, utils/tool.py:48-171):

  per domain: dedup -> positives = all interactions (label 1) split
  stratified 60/20/20 -> per-user negative sampling at
  n_clicked/ctr_ratio from the domain's item pool excluding the user's
  clicked items, each user's negatives split 60/20/20 -> on-disk shuffle
  with the seed -> domain_property.json; ctr_ratio fixed or drawn
  uniformly from ctr_ratio_range per domain.

Design delta: negative sampling is vectorised numpy per user instead of a
multiprocessing.Pool of per-user python list scans (split.py:131-137) —
same distribution, deterministic order, orders of magnitude faster.
"""

from __future__ import annotations

import csv
import json
import os
import os.path as osp
import random
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
from sklearn.model_selection import train_test_split
from sklearn.utils import shuffle as sk_shuffle

HEADER = ["uid", "pid", "domain", "label"]


class RawId2Id:
    """Persistent string->int id map shared across domains
    (reference utils/tool.py:48-95), with content-hash-guarded export."""

    def __init__(self, path: str = "", rebuild: bool = False):
        self.raw_id2id: Dict[str, int] = {}
        self.id = 0
        if path and osp.exists(path) and not rebuild:
            self.load(path)

    def content_hash(self) -> int:
        return hash(json.dumps({"id": self.id, "raw_id2id": self.raw_id2id}))

    def fit_transform(self, x) -> int:
        x = str(x)
        if x in self.raw_id2id:
            return self.raw_id2id[x]
        self.raw_id2id[x] = self.id
        self.id += 1
        return self.id - 1

    def export(self, path: str) -> None:
        os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump({"id": self.id, "raw_id2id": self.raw_id2id}, f)

    def load(self, path: str) -> None:
        with open(path) as f:
            d = json.load(f)
        self.id = d["id"]
        self.raw_id2id = d["raw_id2id"]


def split_stratified_into_train_val_test(
    df: pd.DataFrame,
    stratify_colname: str = "label",
    frac_train: float = 0.6,
    frac_val: float = 0.2,
    frac_test: float = 0.2,
    random_state=None,
):
    """Two-stage stratified split (reference utils/tool.py:96-159)."""
    if abs(frac_train + frac_val + frac_test - 1.0) > 1e-9:
        raise ValueError(
            f"fractions {frac_train}, {frac_val}, {frac_test} do not add up to 1.0"
        )
    if stratify_colname not in df.columns:
        raise ValueError(f"{stratify_colname} is not a column in the dataframe")
    y = df[[stratify_colname]]
    stratify = y if y[stratify_colname].nunique() > 1 else None
    df_train, df_temp, y_train, y_temp = train_test_split(
        df, y, stratify=stratify, test_size=(1.0 - frac_train),
        random_state=random_state,
    )
    if len(df_temp) > 1:
        rel_test = frac_test / (frac_val + frac_test)
        strat2 = y_temp if stratify is not None and y_temp[stratify_colname].nunique() > 1 else None
        df_val, df_test, _, _ = train_test_split(
            df_temp, y_temp, stratify=strat2, test_size=rel_test,
            random_state=random_state,
        )
    else:
        df_test = df_temp
        df_val = df_temp.drop(index=df_temp.index)
    return df_train, df_val, df_test


def shuffle_csv_file(filename: str, seed: int = 123) -> None:
    df = pd.read_csv(filename)
    sk_shuffle(df, random_state=seed).to_csv(filename, index=False)


def sample_negatives_for_domain(
    df: pd.DataFrame,
    pid_range: Sequence[int],
    ctr_ratio: float,
    domain: int,
    rng: random.Random,
) -> pd.DataFrame:
    """Per-user negatives: n_clicked/ctr_ratio items drawn without
    replacement from the domain pool minus the user's clicked items
    (reference split.py:46-70). Vectorised; deterministic given rng."""
    pool = np.asarray(sorted(set(int(p) for p in pid_range)))
    frames = []
    for uid, g in df.groupby("uid"):
        clicked = set(int(p) for p in g["pid"].unique())
        negative_num = int(len(g["pid"]) / ctr_ratio)
        candidates = pool[~np.isin(pool, list(clicked))]
        if negative_num >= len(candidates):
            sampled = candidates
        else:
            idx = rng.sample(range(len(candidates)), negative_num)
            sampled = candidates[np.asarray(idx)]
        if len(sampled) == 0:
            continue
        frames.append(
            pd.DataFrame(
                {
                    "uid": int(uid),
                    "pid": sampled,
                    "domain": domain,
                    "label": 0,
                }
            )
        )
    if not frames:
        return pd.DataFrame(columns=HEADER)
    return pd.concat(frames, ignore_index=True)


def _write_header(domain_save_path: str) -> None:
    for name in ("train.csv", "val.csv", "test.csv"):
        with open(osp.join(domain_save_path, name), "w", newline="") as f:
            csv.writer(f).writerow(HEADER)


def _append_split(domain_save_path: str, df: pd.DataFrame, conf: dict) -> None:
    # Frames too small to three-way split (a user with a near-exhausted
    # negative pool can contribute 1-2 rows; sklearn would raise on an empty
    # train side — the reference crashes here) go entirely to train.
    if len(df) < 3:
        with open(osp.join(domain_save_path, "train.csv"), "a", newline="") as f:
            csv.writer(f).writerows(df[HEADER].values.tolist())
        return
    tr, va, te = split_stratified_into_train_val_test(
        df,
        stratify_colname="label",
        frac_train=conf["train_val_test"][0],
        frac_val=conf["train_val_test"][1],
        frac_test=conf["train_val_test"][2],
        random_state=conf["seed"],
    )
    for name, part in (("train.csv", tr), ("val.csv", va), ("test.csv", te)):
        with open(osp.join(domain_save_path, name), "a", newline="") as f:
            csv.writer(f).writerows(part[HEADER].values.tolist())


def split_domains(
    processed_file_list: List[str],
    split_save_path: str,
    conf: dict,
    rename_cols: Optional[Dict[str, str]] = None,
) -> int:
    """The domain split driver shared by Amazon (by category) and Taobao
    (by theme) — reference split.py:93-152 / Taobao split.py:94-152.

    Per processed file: positives (whole-df stratified split) + per-user
    negatives (each user's frame split separately, mirroring the reference's
    incremental appends), property json, seeded on-disk shuffle.
    """
    rng = random.Random(conf["seed"])
    n_domain = 0
    for p in processed_file_list:
        domain_name = osp.splitext(osp.split(p)[1])[0]
        domain_save_path = osp.join(split_save_path, f"domain_{n_domain}")
        exists = osp.exists(osp.join(domain_save_path, "train.csv"))
        if not exists or conf.get("rebuild", False):
            os.makedirs(domain_save_path, exist_ok=True)
            _write_header(domain_save_path)

            if conf.get("random_range"):
                ctr_ratio = round(rng.uniform(*conf["ctr_ratio_range"]), 2)
            else:
                ctr_ratio = conf["ctr_ratio"]

            df = pd.read_csv(p)
            if rename_cols:
                df = df.rename(columns=rename_cols)
            df = df.drop_duplicates()
            pid_range = df["pid"].unique().tolist()
            n_uid = df["uid"].nunique()
            n_pid = len(pid_range)
            df["domain"] = n_domain
            positive_df = df.copy()
            positive_df["label"] = 1
            _append_split(domain_save_path, positive_df, conf)

            negatives = sample_negatives_for_domain(
                df, pid_range, ctr_ratio, n_domain, rng
            )
            # split per user to mirror the reference's per-user appends
            for _, user_neg in negatives.groupby("uid"):
                _append_split(domain_save_path, user_neg, conf)

            with open(osp.join(domain_save_path, "domain_property.json"), "w") as f:
                json.dump(
                    {
                        "domain_name": domain_name,
                        "n_uid": int(n_uid),
                        "n_pid": int(n_pid),
                        "ctr_ratio": ctr_ratio,
                        "pid_range": [int(x) for x in pid_range],
                    },
                    f,
                )
        # NOTE: reference-faithful quirks kept deliberately: (1) the on-disk
        # shuffle re-runs on EVERY invocation, even for skipped domains
        # (reference split.py:148-149 sits outside the rebuild branch), so a
        # second "no-op" run re-permutes the csvs; (2) with random_range, the
        # ctr-ratio RNG draw happens only inside the rebuild branch, so
        # partial rebuilds consume a different RNG position than full builds
        # — exactly as the reference's global `random` stream does.
        for name in ("train.csv", "val.csv", "test.csv"):
            shuffle_csv_file(osp.join(domain_save_path, name), conf["seed"])
        n_domain += 1
    return n_domain
