"""ETL tests: the full Amazon and Taobao build recipes on synthetic raw data,
checked against the reference's invariants, then loaded back through
MultiDomainDataset.from_disk."""

import gzip
import json
import os.path as osp

import numpy as np
import pandas as pd
import pytest

from mamdr_tpu.config import DatasetConfig
from mamdr_tpu.data.dataset import MultiDomainDataset
from mamdr_tpu.data.etl import amazon, taobao
from mamdr_tpu.data.etl.common import (
    RawId2Id,
    sample_negatives_for_domain,
    split_stratified_into_train_val_test,
)


def test_rawid2id_roundtrip(tmp_path):
    m = RawId2Id()
    a, b, a2 = m.fit_transform("x"), m.fit_transform("y"), m.fit_transform("x")
    assert (a, b, a2) == (0, 1, 0) and m.id == 2
    p = str(tmp_path / "map.json")
    m.export(p)
    m2 = RawId2Id(p)
    assert m2.fit_transform("y") == 1 and m2.fit_transform("z") == 2


def test_stratified_split_fractions():
    df = pd.DataFrame({"label": [1] * 60 + [0] * 140, "x": range(200)})
    tr, va, te = split_stratified_into_train_val_test(
        df, frac_train=0.6, frac_val=0.2, frac_test=0.2, random_state=0
    )
    assert len(tr) + len(va) + len(te) == 200
    assert abs(len(tr) - 120) <= 1 and abs(len(va) - 40) <= 1
    # stratified: positive ratio preserved per split
    for part in (tr, va, te):
        assert abs(part["label"].mean() - 0.3) < 0.05


def test_negative_sampling_invariants():
    import random

    df = pd.DataFrame(
        {
            "uid": [0, 0, 0, 1, 1],
            "pid": [0, 1, 2, 3, 4],
            "domain": 0,
        }
    )
    pid_range = list(range(20))
    negs = sample_negatives_for_domain(df, pid_range, 0.5, 0, random.Random(0))
    # user 0 clicked 3 -> 6 negatives, user 1 clicked 2 -> 4 negatives
    counts = negs.groupby("uid").size().to_dict()
    assert counts == {0: 6, 1: 4}
    assert (negs["label"] == 0).all()
    # no negative collides with that user's clicked items
    for uid, clicked in [(0, {0, 1, 2}), (1, {3, 4})]:
        assert not (set(negs[negs.uid == uid]["pid"]) & clicked)


def _write_amazon_raw(tmp_path, n_cat=2, n_users=30, n_items=40, n_rows=150):
    rng = np.random.default_rng(0)
    raw = tmp_path / "raw"
    raw.mkdir()
    cats = [f"Cat {i}" for i in range(n_cat)]
    for c in cats:
        rows = []
        for _ in range(n_rows):
            rows.append(
                {
                    "reviewerID": f"u{rng.integers(0, n_users)}",
                    "asin": f"{c}-i{rng.integers(0, n_items)}",
                    "overall": float(rng.integers(1, 6)),
                }
            )
        with gzip.open(raw / (c.replace(" ", "_") + ".json.gz"), "wt") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return cats, str(raw)


def test_amazon_end_to_end(tmp_path):
    cats, raw = _write_amazon_raw(tmp_path)
    split_path = str(tmp_path / "split_by_category")
    conf = {
        "categories": cats,
        "raw_data_path": raw,
        "split_save_path": split_path,
        "processed_data_path": "processed_data",
        "split_policy": "split_by_category",
        "ctr_ratio": 0.5,
        "random_range": False,
        "ctr_ratio_range": [0.2, 0.5],
        "train_val_test": [0.6, 0.2, 0.2],
        "seed": 123,
        "rebuild": False,
        "cores": 1,
    }
    n = amazon.split_to_domains(conf)
    assert n == 2
    # reference on-disk layout
    for i in range(2):
        for s in ("train", "val", "test"):
            assert osp.exists(osp.join(split_path, f"domain_{i}", f"{s}.csv"))
        prop = json.load(open(osp.join(split_path, f"domain_{i}", "domain_property.json")))
        assert prop["ctr_ratio"] == 0.5
    assert osp.exists(osp.join(split_path, "processed_data/uid2id.json"))

    # loads back through the runtime data layer
    ds = MultiDomainDataset.from_disk(
        DatasetConfig(
            name="Amazon",
            dataset_path=str(tmp_path),
            domain_split_path="split_by_category",
        )
    )
    assert ds.n_domain == 2
    d0 = ds.train[0]
    # positives:negatives ~ ctr 0.5 -> about 1/3 positives
    all_labels = np.concatenate([ds.train[0].label, ds.val[0].label, ds.test[0].label])
    ratio = all_labels.mean()
    assert 0.25 < ratio < 0.45, ratio
    # ids within vocab
    assert d0.uid.max() < ds.n_uid and d0.pid.max() < ds.n_pid
    # idempotent rebuild=False: second run keeps files
    assert amazon.split_to_domains(conf) == 2


def test_taobao_end_to_end(tmp_path):
    rng = np.random.default_rng(1)
    raw = tmp_path / "raw"
    raw.mkdir()
    users = [f"u{i}" for i in range(25)]
    items = [f"i{i}" for i in range(30)]
    # only some users/items have embeddings -> the rest get filtered
    emb_users = users[:20]
    emb_items = items[:25]
    pd.DataFrame(
        {
            "user_id": [u for u in emb_users],
            "emb": [" ".join(map(str, rng.normal(size=4).round(3))) for _ in emb_users],
        }
    ).set_index("user_id").to_csv(raw / "user_embedding.csv")
    pd.DataFrame(
        {
            "item_id": [i for i in emb_items],
            "emb": [" ".join(map(str, rng.normal(size=4).round(3))) for _ in emb_items],
        }
    ).set_index("item_id").to_csv(raw / "item_embedding.csv")
    rows = []
    for _ in range(400):
        rows.append(
            {
                "user_id": users[rng.integers(0, len(users))],
                "item_id": items[rng.integers(0, len(items))],
                "theme_id": int(rng.integers(100, 103)),
            }
        )
    pd.DataFrame(rows).to_csv(raw / "theme_click_log.csv", index=False)

    split_path = str(tmp_path / "split_by_theme")
    conf = {
        "raw_data_path": str(raw),
        "split_save_path": split_path,
        "processed_data_path": "processed_data",
        "theme_num": 2,
        "ctr_ratio": 0.5,
        "random_range": True,
        "ctr_ratio_range": [0.2, 0.5],
        "train_val_test": [0.6, 0.2, 0.2],
        "seed": 123,
        "rebuild": False,
    }
    n = taobao.split_to_domains(conf)
    assert n == 2
    # pretrained embedding export keyed by remapped int ids
    uemb = json.load(open(osp.join(split_path, "processed_data/user_emb.json")))
    assert len(uemb) > 0
    assert all(len(v.split()) == 4 for v in uemb.values())

    ds = MultiDomainDataset.from_disk(
        DatasetConfig(
            name="Taobao",
            dataset_path=str(tmp_path),
            domain_split_path="split_by_theme",
        )
    )
    assert ds.n_domain == 2
    assert ds.user_emb is not None and ds.user_emb.shape[1] == 4
    # filtered: every interaction's user has an embedding row
    prop = json.load(open(osp.join(split_path, "domain_0/domain_property.json")))
    assert 0.2 <= prop["ctr_ratio"] <= 0.5


def test_starving_tail_theme_gets_test_negatives(tmp_path):
    """Regression for the round-4 split-guard parity fix: a starving tail
    theme made of 1-click users at a ctr draw > 1/3 (quota = 2 negatives
    per user) must land 1 train + 1 TEST negative per user — the
    reference's second split stage keeps the single temp row as test
    (tool.py:146-155). The old m<3 guard sent both negatives to train,
    leaving the tail's test split all-positive (AUC undefined), which
    poisoned every Taobao-30 macro average."""
    rng = np.random.default_rng(3)
    raw = tmp_path / "raw"
    raw.mkdir()
    n_users, n_items = 120, 60
    for name, n in (("user", n_users), ("item", n_items)):
        ids = [f"{name[0]}{i}" for i in range(n)]
        pd.DataFrame(
            {f"{name}_id": ids,
             "emb": [" ".join(map(str, rng.normal(size=4).round(3)))
                     for _ in ids]}
        ).set_index(f"{name}_id").to_csv(raw / f"{name}_embedding.csv")
    rows = [  # theme 0: normal; theme 1: starving, every user exactly 1 click
        {"user_id": f"u{rng.integers(0, 60)}",
         "item_id": f"i{rng.integers(0, 40)}", "theme_id": 100}
        for _ in range(600)
    ] + [
        {"user_id": f"u{60 + i}", "item_id": f"i{40 + (i % 20)}",
         "theme_id": 101}
        for i in range(50)
    ]
    pd.DataFrame(rows).to_csv(raw / "theme_click_log.csv", index=False)
    split_path = str(tmp_path / "split")
    taobao.split_to_domains({
        "raw_data_path": str(raw), "split_save_path": split_path,
        "processed_data_path": "processed_data", "theme_num": 2,
        "ctr_ratio": 0.4, "random_range": False,  # quota = int(1/0.4) = 2
        "train_val_test": [0.6, 0.2, 0.2], "seed": 123, "rebuild": False,
    })
    test = pd.read_csv(osp.join(split_path, "domain_1/test.csv"))
    n_neg = int((test["label"] == 0).sum())
    n_pos = int((test["label"] == 1).sum())
    assert n_pos > 0
    # every 1-click user contributes exactly 1 test negative
    assert n_neg > 0, "starving-tail test split has no negatives"
    train = pd.read_csv(osp.join(split_path, "domain_1/train.csv"))
    tr_neg = int((train["label"] == 0).sum())
    assert tr_neg == n_neg  # the other negative of each user's pair


def test_vectorized_negatives_match_loop_distribution():
    """The vectorized sampler obeys the exact per-user recipe invariants of
    the loop path (counts, disjointness, pool membership) and matches its
    item-popularity distribution."""
    import random

    from mamdr_tpu.data.etl.common import sample_negatives_vectorized

    rng = np.random.default_rng(3)
    n_users, n_items, n_rows = 200, 150, 2000
    df = pd.DataFrame(
        {
            "uid": rng.integers(0, n_users, n_rows),
            "pid": rng.integers(0, n_items, n_rows),
            "domain": 0,
        }
    ).drop_duplicates()
    pid_range = df["pid"].unique().tolist()
    ctr = 0.3

    loop = sample_negatives_for_domain(df, pid_range, ctr, 0, random.Random(0))
    vec = sample_negatives_vectorized(df, pid_range, ctr, 0, np.random.default_rng(0))

    # identical per-user negative counts (the recipe's arithmetic)
    cl = loop.groupby("uid").size().sort_index()
    cv = vec.groupby("uid").size().sort_index()
    assert cl.equals(cv), "per-user quota mismatch"
    # no duplicates, nothing outside the pool, nothing the user clicked
    assert not vec.duplicated(["uid", "pid"]).any()
    pool = set(int(p) for p in pid_range)
    assert set(vec["pid"].astype(int)) <= pool
    clicked = df.groupby("uid")["pid"].apply(set).to_dict()
    for uid, g in vec.groupby("uid"):
        assert not (set(g["pid"].astype(int)) & clicked[int(uid)])
    # same marginal item-popularity shape (both uniform over complements)
    fl = loop["pid"].value_counts().reindex(sorted(pool), fill_value=0)
    fv = vec["pid"].value_counts().reindex(sorted(pool), fill_value=0)
    assert abs(fl.mean() - fv.mean()) < 1e-9  # same total by construction
    assert abs(fl.std() - fv.std()) < 0.35 * fl.std()


def test_vectorized_negatives_dense_users():
    """Users whose quota exceeds (or nearly exhausts) the complement take
    the whole complement — the reference's sampled=candidates branch."""
    from mamdr_tpu.data.etl.common import sample_negatives_vectorized

    # user 0 clicked 8 of 10 items, ctr 0.2 -> quota 40 >> complement 2
    df = pd.DataFrame({"uid": 0, "pid": list(range(8)), "domain": 0})
    vec = sample_negatives_vectorized(
        df, list(range(10)), 0.2, 0, np.random.default_rng(0)
    )
    assert sorted(vec["pid"]) == [8, 9]


def test_assign_user_splits_matches_sklearn_arithmetic():
    from mamdr_tpu.data.etl.common import assign_user_splits

    # user with m rows: n_temp=ceil(0.4m), train=m-n_temp,
    # test=ceil(n_temp/2), val=n_temp-test. m=2 -> 1 train + 1 TEST (the
    # reference's len(df_temp)>1 second-stage guard, tool.py:146-155 — the
    # load-bearing case for starving tail domains, whose 1-click users
    # contribute exactly 2 negatives at ctr>1/3); m=1 -> train (reference
    # raises inside sklearn there).
    uid = np.concatenate([np.full(m, i) for i, m in enumerate([1, 2, 3, 10, 37])])
    out = assign_user_splits(uid, [0.6, 0.2, 0.2], np.random.default_rng(0))
    df = pd.DataFrame({"uid": uid, "s": out})
    got = {
        int(u): tuple(int((g["s"] == c).sum()) for c in (0, 1, 2))
        for u, g in df.groupby("uid")
    }
    assert got[0] == (1, 0, 0) and got[1] == (1, 0, 1)
    assert got[2] == (1, 1, 1)        # m=3: temp=2, test=1, val=1
    assert got[3] == (6, 2, 2)        # m=10
    assert got[4] == (22, 7, 8)       # m=37: temp=15, test=8, val=7


def test_amazon_mirror_shim(tmp_path):
    """Zero-egress downloader parity: the fetch shim resolves category files
    from a local mirror with the reference's {Category}_5.json.gz naming
    (reference get_raw_data.py:7-41)."""
    import gzip as gz

    from mamdr_tpu.data.etl.amazon import _raw_path
    from mamdr_tpu.data.etl.get_raw_data import (
        category_name_to_filename,
        get_raw_data_path,
    )

    assert category_name_to_filename("Video Games") == "Video_Games_5.json.gz"
    assert (
        category_name_to_filename("Patio, Lawn and Garden")
        == "Patio_Lawn_and_Garden_5.json.gz"
    )

    mirror = tmp_path / "mirror"
    mirror.mkdir()
    with gz.open(mirror / "Video_Games_5.json.gz", "wt") as f:
        f.write(json.dumps({"reviewerID": "u1", "asin": "i1", "overall": 5.0}) + "\n")
    target = tmp_path / "raw"
    p = get_raw_data_path("Video Games", str(target), mirror_path=str(mirror))
    assert osp.exists(p)
    # idempotent second call; _raw_path finds the _5-suffixed file
    assert get_raw_data_path("Video Games", str(target), mirror_path=str(mirror)) == p
    assert _raw_path("Video Games", str(target)) == p
