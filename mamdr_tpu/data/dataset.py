"""Multi-domain dataset: per-domain splits as packed numpy, batched for scan.

Replaces the reference's per-domain ``tf.data`` CSV pipelines
(reference utils/dataset.py:12-130) with a TPU-friendly design: each domain
split is four packed numpy columns (uid, pid, domain, label — the on-disk CSV
schema, reference dataset/Amazon/split.py:20), and an epoch is *stacked* into
``[n_steps, batch]`` arrays so the whole domain-epoch runs as one
``lax.scan`` under a single jit — no per-batch host dispatch.

The reference's single-domain-batch invariant (SURVEY §2.4: StarFCN /
PartitionedNorm / AuxiliaryNet / WeightedLoss read the domain id from batch
element [0,0]) is preserved: every batch comes from exactly one domain and the
jitted step reads ``batch['domain'][0]``.

The final partial batch is padded to full size by wrapping around to the start
of the (shuffled) epoch; padded rows carry ``weight 0`` so they contribute
nothing to loss, gradients, or metrics.
"""

from __future__ import annotations

import glob
import json
import os
import os.path as osp
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

COLUMNS = ("uid", "pid", "domain", "label")


@dataclass
class DomainSplit:
    """One split (train/val/test) of one domain."""

    uid: np.ndarray     # int32 [N]
    pid: np.ndarray     # int32 [N]
    domain: np.ndarray  # int32 [N]
    label: np.ndarray   # float32 [N]

    @property
    def n(self) -> int:
        return int(self.uid.shape[0])

    def take(self, idx: np.ndarray) -> "DomainSplit":
        return DomainSplit(self.uid[idx], self.pid[idx], self.domain[idx], self.label[idx])

    def concat(self, other: "DomainSplit") -> "DomainSplit":
        return DomainSplit(
            np.concatenate([self.uid, other.uid]),
            np.concatenate([self.pid, other.pid]),
            np.concatenate([self.domain, other.domain]),
            np.concatenate([self.label, other.label]),
        )

    @classmethod
    def from_csv(cls, path: str) -> "DomainSplit":
        # CSV columns: uid,pid,domain,label (reference split.py:20).
        # Fast path: native mmap parser (native/csv_loader.cc via ctypes);
        # numpy fallback when the toolchain/library is unavailable.
        from mamdr_tpu.data.native_loader import load_csv_native

        native = load_csv_native(path)
        if native is not None:
            uid, pid, domain, label = native
            return cls(uid=uid, pid=pid, domain=domain, label=label)
        raw = np.genfromtxt(path, delimiter=",", skip_header=1, dtype=np.float64)
        if raw.size == 0:
            raw = np.zeros((0, 4))
        raw = np.atleast_2d(raw)
        return cls(
            uid=raw[:, 0].astype(np.int32),
            pid=raw[:, 1].astype(np.int32),
            domain=raw[:, 2].astype(np.int32),
            label=raw[:, 3].astype(np.float32),
        )

    @classmethod
    def from_arrays(cls, uid, pid, domain, label) -> "DomainSplit":
        return cls(
            np.asarray(uid, np.int32),
            np.asarray(pid, np.int32),
            np.asarray(domain, np.int32),
            np.asarray(label, np.float32),
        )


def stack_batches(
    split: DomainSplit,
    batch_size: int,
    shuffle: bool,
    rng: Optional[np.random.Generator] = None,
) -> Dict[str, np.ndarray]:
    """Pack one epoch into [n_steps, batch_size] arrays for lax.scan.

    Wrap-around padding for the last partial batch, masked by weight=0.
    """
    n = split.n
    if n == 0:
        raise ValueError("empty split")
    order = np.arange(n)
    if shuffle:
        assert rng is not None
        order = rng.permutation(n)
    n_steps = -(-n // batch_size)
    padded = n_steps * batch_size
    # modular wrap-around: splits smaller than the pad amount tile repeatedly
    full_idx = np.concatenate([order, order[np.arange(padded - n) % n]])
    weight = np.ones(padded, np.float32)
    weight[n:] = 0.0
    out = {
        "uid": split.uid[full_idx],
        "pid": split.pid[full_idx],
        "domain": split.domain[full_idx],
        "label": split.label[full_idx],
        "weight": weight,
    }
    return {k: v.reshape(n_steps, batch_size) for k, v in out.items()}


def split_support_query(
    split: DomainSplit,
    mode: str,
    ratio: float,
    rng: np.random.Generator,
):
    """Support/query division for meta strategies (reference maml.py:294-341).

    - ``train-train``: support = query = the full train set (independently
      reshuffled downstream).
    - ``meta-train/val``: exclusive split, support = first ratio fraction.
    - ``meta-train/val-no-exclusive``: support = full set, query = a random
      ratio-sized subset.
    """
    if mode == "train-train":
        return split, split
    perm = rng.permutation(split.n)
    n_support = max(1, int(split.n * ratio))
    if mode == "meta-train/val":
        return split.take(perm[:n_support]), split.take(perm[n_support:] if split.n - n_support > 0 else perm[:1])
    if mode == "meta-train/val-no-exclusive":
        return split, split.take(perm[:n_support])
    raise ValueError(f"unknown meta_split mode {mode!r}")


class MultiDomainDataset:
    """All domains, all splits, plus vocab sizes and dataset_info.

    Mirrors the reference ``MultiDomainDataset`` API surface
    (reference utils/dataset.py:41-130): discovers ``domain_*`` directories
    sorted by index, loads vocab sizes from ``processed_data/{uid2id,pid2id}.json``
    and (for Taobao) pretrained user/item embeddings.
    """

    def __init__(
        self,
        train: List[DomainSplit],
        val: List[DomainSplit],
        test: List[DomainSplit],
        n_uid: int,
        n_pid: int,
        user_emb: Optional[np.ndarray] = None,
        item_emb: Optional[np.ndarray] = None,
        seed: int = 123,
        batch_size: int = 1024,
        ctr_ratio: Optional[Dict[int, float]] = None,
        fixed_train: bool = False,
    ):
        assert len(train) == len(val) == len(test)
        self.train = train
        self.val = val
        self.test = test
        self.n_uid = n_uid
        self.n_pid = n_pid
        self.n_domain = len(train)
        self.user_emb = user_emb
        self.item_emb = item_emb
        self.seed = seed
        self.batch_size = batch_size
        self.ctr_ratio = ctr_ratio or {}
        self.fixed_train = fixed_train

    @property
    def dataset_info(self) -> Dict:
        """Per-domain example counts + ctr ratios + totals
        (reference utils/dataset.py:110-130)."""
        info: Dict = {"n_user": self.n_uid, "n_item": self.n_pid}
        tot_train = tot_val = tot_test = 0
        for i in range(self.n_domain):
            info[str(i)] = {
                "n_train": self.train[i].n,
                "n_val": self.val[i].n,
                "n_test": self.test[i].n,
            }
            if i in self.ctr_ratio:
                info[str(i)]["ctr_ratio"] = self.ctr_ratio[i]
            tot_train += self.train[i].n
            tot_val += self.val[i].n
            tot_test += self.test[i].n
        info["total_train"] = tot_train
        info["total_val"] = tot_val
        info["total_test"] = tot_test
        return info

    def split_counts(self, mode: str) -> List[int]:
        splits = {"train": self.train, "val": self.val, "test": self.test}[mode]
        return [s.n for s in splits]

    @classmethod
    def from_disk(cls, conf) -> "MultiDomainDataset":
        """Load the reference on-disk layout.

        ``<dataset_path>/<domain_split_path>/domain_<i>/{train,val,test}.csv``
        plus ``processed_data/{uid2id,pid2id}.json`` vocab maps and, for
        Taobao, ``processed_data/{user_emb,item_emb}.json`` pretrained vectors
        (reference utils/dataset.py:50-71).
        """
        root = osp.join(conf.dataset_path, conf.domain_split_path)
        with open(osp.join(root, "processed_data/uid2id.json")) as f:
            n_uid = json.load(f)["id"]
        with open(osp.join(root, "processed_data/pid2id.json")) as f:
            n_pid = json.load(f)["id"]

        user_emb = item_emb = None
        if conf.name == "Taobao":
            user_emb = _load_pretrained_emb(
                osp.join(root, "processed_data/user_emb.json"), n_uid
            )
            item_emb = _load_pretrained_emb(
                osp.join(root, "processed_data/item_emb.json"), n_pid
            )

        domain_dirs = sorted(
            glob.glob(osp.join(root, "domain_*")),
            key=lambda p: int(p.split("_")[-1]),
        )
        if not domain_dirs:
            raise FileNotFoundError(f"no domain_* dirs under {root}")
        train, val, test = [], [], []
        ctr_ratio = {}
        for i, d in enumerate(domain_dirs):
            train.append(DomainSplit.from_csv(osp.join(d, "train.csv")))
            val.append(DomainSplit.from_csv(osp.join(d, "val.csv")))
            test.append(DomainSplit.from_csv(osp.join(d, "test.csv")))
            prop_path = osp.join(d, "domain_property.json")
            if osp.exists(prop_path):
                with open(prop_path) as f:
                    ctr_ratio[i] = json.load(f).get("ctr_ratio")
        return cls(
            train, val, test, n_uid, n_pid,
            user_emb=user_emb, item_emb=item_emb,
            seed=conf.seed, batch_size=conf.batch_size,
            ctr_ratio=ctr_ratio,
            fixed_train=getattr(conf, "fixed_train", False),
        )


def _load_pretrained_emb(path: str, n_rows: int) -> np.ndarray:
    """Parse the Taobao emb json: {str(id): 'f f f ...'} (utils/dataset.py:57-61)."""
    with open(path) as f:
        raw = json.load(f)
    dim = len(next(iter(raw.values())).split())
    table = np.zeros((n_rows, dim), np.float32)
    for k, v in raw.items():
        table[int(k)] = np.fromstring(v, sep=" ", dtype=np.float32)
    return table
