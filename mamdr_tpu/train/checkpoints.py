"""Checkpointing: atomic on-disk snapshots of parameter pytrees.

Replaces the reference's Keras .h5 weight files (base_model.py:23-26, 177-178)
with flat-key .npz archives written atomically (tmp + rename). Unlike the
reference — which never serialises the MAMDR (shared, {specific_i})
decomposition (SURVEY §5.4) — `save_decomposition` checkpoints it explicitly,
making MAMDR resume-across-process possible.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import tempfile
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from mamdr_tpu.utils.trees import path_str

SEP = "//"


def _flatten(tree) -> Dict[str, np.ndarray]:
    out = {}
    jax.tree_util.tree_map_with_path(
        lambda p, x: out.__setitem__(path_str(p).replace("/", SEP), np.asarray(x)),
        tree,
    )
    return out


def _unflatten_into(tree, flat: Dict[str, np.ndarray]):
    """Restore values into an existing pytree structure (template-driven)."""

    def pick(p, x):
        key = path_str(p).replace("/", SEP)
        if key not in flat:
            raise KeyError(f"checkpoint missing parameter {key}")
        v = flat[key]
        if v.shape != x.shape:
            raise ValueError(f"shape mismatch for {key}: ckpt {v.shape} vs {x.shape}")
        return v.astype(x.dtype) if hasattr(x, "dtype") else v

    return jax.tree_util.tree_map_with_path(pick, tree)


def save_pytree(path: str, tree, keep=None) -> None:
    """Atomic npz write; `keep` (a same-structure bool pytree) drops
    False-flagged leaves from the file."""
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    flat = _flatten(tree)
    if keep is not None:
        keep_flat = _flatten(keep)
        flat = {k: v for k, v in flat.items() if bool(keep_flat[k])}
    fd, tmp = tempfile.mkstemp(dir=osp.dirname(osp.abspath(path)), suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    except BaseException:
        if osp.exists(tmp):
            os.unlink(tmp)
        raise


def load_pytree(path: str, template):
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten_into(template, flat)


def save_train_state(
    dirpath: str,
    state,
    epoch: int,
    stopper,
    np_rng,
    extra_trees: Optional[Dict[str, Any]] = None,
    extra_meta: Optional[Dict] = None,
    host_rng=None,
) -> None:
    """Atomic full-state snapshot: params + optimizer slots + batch stats +
    PRNG + step + early-stop counters + host RNG — everything needed to
    resume mid-run (the reference can't: its .h5 holds weights only and
    MAMDR's decomposition never reaches disk, SURVEY §5.3-5.4)."""
    os.makedirs(dirpath, exist_ok=True)
    save_pytree(osp.join(dirpath, "train_state.npz"), {
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
        "rng": state.rng,
        "step": state.step,
        "host_rng": host_rng if host_rng is not None else state.rng,
    })
    for name, tree in (extra_trees or {}).items():
        save_pytree(osp.join(dirpath, f"{name}.npz"), tree)
    meta = {
        "epoch": epoch,
        "stopper": {
            "patience": stopper.patience,
            "counter": stopper.counter,
            "best_metric": stopper.best_metric,
            "early_stop": stopper.early_stop,
        },
        "np_rng_state": np_rng.bit_generator.state,
        "extra_trees": sorted((extra_trees or {}).keys()),
    }
    if extra_meta:
        meta.update(extra_meta)
    tmp = osp.join(dirpath, "resume_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, osp.join(dirpath, "resume_meta.json"))


def has_train_state(dirpath: str) -> bool:
    return osp.exists(osp.join(dirpath, "resume_meta.json")) and osp.exists(
        osp.join(dirpath, "train_state.npz")
    )


def load_train_state(dirpath: str, state_template, extra_templates=None):
    """-> (state, epoch, stopper_dict, np_rng_state, extras dict).

    The host PRNG key (Trainer.rng, split every fused epoch) rides along as
    extras['host_rng'] so a resumed run continues the key stream instead of
    replaying epoch-0 shuffles."""
    with open(osp.join(dirpath, "resume_meta.json")) as f:
        meta = json.load(f)
    tmpl = {
        "params": state_template.params,
        "opt_state": state_template.opt_state,
        "batch_stats": state_template.batch_stats,
        "rng": state_template.rng,
        "step": state_template.step,
        "host_rng": state_template.rng,
    }
    loaded = load_pytree(osp.join(dirpath, "train_state.npz"), tmpl)
    host_rng = loaded.pop("host_rng")
    state = state_template.replace(**loaded)
    extras = {"host_rng": host_rng}
    for name, template in (extra_templates or {}).items():
        p = osp.join(dirpath, f"{name}.npz")
        if osp.exists(p):
            extras[name] = load_pytree(p, template)
    return state, meta["epoch"], meta["stopper"], meta["np_rng_state"], extras


def save_decomposition(
    dirpath: str,
    shared,
    domain_specific: List[Any],
    extra: Optional[Dict] = None,
    mask=None,
) -> None:
    """MAMDR checkpoint: shared params + per-domain specific deltas + metadata.

    With `mask` (the meta-param mask), each specific file stores ONLY the
    masked leaves: unmasked leaves of a specific tree are aliases of the
    shared tree by construction (MAMDRStrategy.strip), so writing them per
    domain multiplies the checkpoint by n_domain x full-model size — at
    Taobao-30 scale that was a 3.8GB write (~130MB frozen tables x 31 files)
    per improving epoch, dominating campaign epoch time. load_decomposition
    restores unmasked leaves from shared, preserving the alias semantics."""
    os.makedirs(dirpath, exist_ok=True)
    save_pytree(osp.join(dirpath, "shared.npz"), shared)
    for i, spec in enumerate(domain_specific):
        save_pytree(osp.join(dirpath, f"specific_{i}.npz"), spec, keep=mask)
    meta = {"n_domain": len(domain_specific), "masked_only": mask is not None}
    if extra:
        meta.update(extra)
    with open(osp.join(dirpath, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_decomposition(dirpath: str, template):
    with open(osp.join(dirpath, "meta.json")) as f:
        meta = json.load(f)
    shared = load_pytree(osp.join(dirpath, "shared.npz"), template)
    shared_flat = _flatten(shared)

    def load_spec(path):
        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}
        # masked-only files: unmasked leaves alias shared (strategy strip)
        merged = dict(shared_flat)
        merged.update(flat)
        return _unflatten_into(template, merged)

    specific = [
        load_spec(osp.join(dirpath, f"specific_{i}.npz"))
        for i in range(meta["n_domain"])
    ]
    return shared, specific, meta
