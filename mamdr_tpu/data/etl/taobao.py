"""Taobao theme-click dataset builder (reference dataset/Taobao/*).

Input (local files under raw_data_path — Tianchi theme-click dataset):
  theme_click_log.csv       columns incl. user_id, item_id, theme_id
  user_embedding.csv        index user_id -> space-separated 128-d vector
  item_embedding.csv        index item_id -> space-separated 128-d vector

Pipeline (reference preprocess_data.py:26-95): remap theme ids; keep only
users/items that have pretrained embeddings; take the first `theme_num`
themes (-1 = all) as domains; export ``user_emb.json``/``item_emb.json``
keyed by the remapped int id; then the common split recipe (positives are
clicks, label 1).

CLI: ``python -m mamdr_tpu.data.etl.taobao --config config.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import random
from typing import List

import pandas as pd

from mamdr_tpu.data.etl.common import RawId2Id, split_domains


def preprocess(
    processed_data_path: str,
    raw_data_path: str,
    theme_num: int = -1,
    rebuild: bool = False,
) -> List[str]:
    uid2id = RawId2Id(osp.join(processed_data_path, "uid2id.json"), rebuild)
    pid2id = RawId2Id(osp.join(processed_data_path, "pid2id.json"), rebuild)
    theme2id = RawId2Id(osp.join(processed_data_path, "themeid2id.json"), rebuild)

    df = pd.read_csv(osp.join(raw_data_path, "theme_click_log.csv"))
    df["theme_id"] = df["theme_id"].map(theme2id.fit_transform)

    user_df = pd.read_csv(osp.join(raw_data_path, "user_embedding.csv"), index_col=0)
    item_df = pd.read_csv(osp.join(raw_data_path, "item_embedding.csv"), index_col=0)
    user_dict = user_df.iloc[:, 0].to_dict()
    item_dict = item_df.iloc[:, 0].to_dict()

    # Only keep interactions with pretrained embeddings (preprocess:40-44).
    df = df[df["user_id"].isin(user_dict.keys()) & df["item_id"].isin(item_dict.keys())]

    os.makedirs(processed_data_path, exist_ok=True)
    out: List[str] = []
    for name, group in df.groupby("theme_id"):
        if theme_num != -1 and len(out) >= theme_num:
            break
        processed = osp.join(processed_data_path, f"theme_{name}.csv")
        if not rebuild and osp.exists(processed):
            out.append(processed)
            continue
        group = group.copy()
        group["user_id"] = group["user_id"].map(uid2id.fit_transform)
        group["item_id"] = group["item_id"].map(pid2id.fit_transform)
        group.to_csv(processed, index=False, columns=["user_id", "item_id"])
        out.append(processed)

    uid2id.export(osp.join(processed_data_path, "uid2id.json"))
    pid2id.export(osp.join(processed_data_path, "pid2id.json"))
    theme2id.export(osp.join(processed_data_path, "themeid2id.json"))

    # Export pretrained vectors keyed by remapped int id (preprocess:83-94).
    user_emb = {}
    for raw, i in uid2id.raw_id2id.items():
        key = _coerce_key(raw, user_dict)
        if key is not None:
            user_emb[str(i)] = str(user_dict[key])
    item_emb = {}
    for raw, i in pid2id.raw_id2id.items():
        key = _coerce_key(raw, item_dict)
        if key is not None:
            item_emb[str(i)] = str(item_dict[key])
    with open(osp.join(processed_data_path, "user_emb.json"), "w") as f:
        json.dump(user_emb, f)
    with open(osp.join(processed_data_path, "item_emb.json"), "w") as f:
        json.dump(item_emb, f)
    return out


def _coerce_key(raw: str, d: dict):
    """RawId2Id stringifies keys; embedding csv indices may be ints."""
    if raw in d:
        return raw
    try:
        k = int(raw)
        if k in d:
            return k
    except ValueError:
        pass
    return None


def split_to_domains(conf: dict) -> int:
    split_save_path = conf["split_save_path"]
    processed_data_path = osp.join(split_save_path, conf["processed_data_path"])
    files = preprocess(
        processed_data_path,
        conf["raw_data_path"],
        theme_num=conf.get("theme_num", -1),
        rebuild=conf.get("rebuild", False),
    )
    n = split_domains(
        files, split_save_path, conf,
        rename_cols={"user_id": "uid", "item_id": "pid"},
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
