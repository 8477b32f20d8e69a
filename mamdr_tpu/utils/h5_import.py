"""Import reference Keras .h5 checkpoints into the flax param tree.

The reference persists weights with Keras ``save_weights`` HDF5
(reference model_zoo/base_model.py:177-178, per-domain finetune checkpoints
``domain_{idx}.h5`` specific_base_model.py:124-125). This maps those files
onto this framework's pytrees for the MLP (DeepCTR build_mlp,
deepctr.py:118-137) and STAR (star_fcn.py:61-99) families, so a
reference-trained model can be evaluated here for direct A/B (VERDICT r2
missing #3).

Layout handled: Keras save_weights HDF5 — root attr ``layer_names``, one
group per layer with attr ``weight_names`` (full names like
``sparse_emb_user_emb/user_emb/embeddings:0``, ``dnn/kernel0:0``,
``star_fcn/kernel_shared:0``) and one dataset per weight.

Name mapping (reference -> flax):
  *user_emb*/embeddings      -> embedding/user_emb
  *item_emb*/embeddings      -> embedding/item_emb
  *domain_emb*/embeddings    -> embedding/domain_emb
  kernel<i> / bias<i> (DNN)  -> dnn/Dense_<i>/.../kernel|bias
  final dense kernel [h,1]   -> logit/.../kernel (use_bias=False upstream)
  kernel_shared|bias_shared|kernel_specific|bias_specific (k-th layer)
                             -> k-th StarFCN's same-named leaf
Unmatched reference weights (e.g. Keras optimizer slots, PartitionedNorm
moving stats, which live in flax batch_stats) are returned in the report
rather than silently dropped.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import jax
import numpy as np

_EMB_FIELDS = ("user_emb", "item_emb", "domain_emb")


def read_keras_h5(path: str) -> List[Tuple[str, np.ndarray]]:
    """[(full_weight_name, array)] in the file's layer order; falls back to
    a plain dataset walk for files without save_weights attrs."""
    import h5py

    out: List[Tuple[str, np.ndarray]] = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        layer_names = root.attrs.get("layer_names")
        if layer_names is not None:
            for lname in layer_names:
                lname = lname.decode() if isinstance(lname, bytes) else lname
                g = root[lname]
                for wname in g.attrs.get("weight_names", []):
                    wname = (
                        wname.decode() if isinstance(wname, bytes) else wname
                    )
                    out.append((f"{lname}//{wname}", np.asarray(g[wname])))
        else:
            def visit(name, obj):
                if isinstance(obj, h5py.Dataset):
                    out.append((name, np.asarray(obj)))

            root.visititems(visit)
    return out


def _base_name(full: str) -> str:
    leaf = full.split("/")[-1]
    return leaf[:-2] if leaf.endswith(":0") else leaf


def _flatten_sorted(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    items = []
    for path, leaf in flat:
        keys = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        items.append(("/".join(keys), leaf))
    items.sort(key=lambda kv: kv[0])
    return items


def export_reference_weights(h5_path: str, model_params) -> None:
    """Write the MODEL subtree as a reference-layout Keras .h5 (the inverse
    of import_reference_weights), so weights trained HERE can be loaded by
    the reference's load_model (base_model.py:180-182) for A/B on the same
    graph. Covers the MLP family (embeddings + DNN + logit) and STAR FCN
    leaves; other leaves are written under their flax path (importable by
    this module, ignored by Keras name-matching loaders)."""
    import h5py

    ours = _flatten_sorted(model_params)
    layers: List[Tuple[str, str, np.ndarray]] = []  # (layer, weight, value)
    kernels = [(p, l) for p, l in ours if p.split("/")[-1] == "kernel"]
    biases = [(p, l) for p, l in ours if p.split("/")[-1] == "bias"]
    for path, leaf in ours:
        base = path.split("/")[-1]
        arr = np.asarray(leaf)
        if base in _EMB_FIELDS:
            lname = f"sparse_emb_{base}"
            layers.append((lname, f"{lname}/{base}/embeddings:0", arr))
        elif base == "kernel":
            idx = [p for p, _ in kernels].index(path)
            if idx < len(biases):
                layers.append(("dnn", f"dnn/kernel{idx}:0", arr))
            else:  # the bias-free logit head comes last in path order
                layers.append(("dense", "dense/kernel:0", arr))
        elif base == "bias":
            idx = [p for p, _ in biases].index(path)
            layers.append(("dnn", f"dnn/bias{idx}:0", arr))
        elif base in ("kernel_shared", "bias_shared", "kernel_specific",
                      "bias_specific"):
            lname = ("auxiliary_net" if "auxiliary" in path.lower()
                     else "star_fcn_" + path.split("/")[0].split("_")[-1])
            layers.append((lname, f"{lname}/{base}:0", arr))
        else:
            layers.append(("flax_extra", f"flax_extra/{path}:0", arr))

    grouped: Dict[str, List[Tuple[str, np.ndarray]]] = {}
    order: List[str] = []
    for lname, wname, arr in layers:
        if lname not in grouped:
            order.append(lname)
        grouped.setdefault(lname, []).append((wname, arr))
    with h5py.File(h5_path, "w") as f:
        f.attrs["layer_names"] = [ln.encode() for ln in order]
        for lname in order:
            g = f.create_group(lname)
            g.attrs["weight_names"] = [
                wn.encode() for wn, _ in grouped[lname]
            ]
            for wn, arr in grouped[lname]:
                g.create_dataset(wn, data=arr)


def import_reference_weights(h5_path: str, model_params) -> Tuple[dict, dict]:
    """Returns (new_model_params, report). ``model_params`` is the MODEL
    subtree (``trainer.state.params["model"]``). Raises on shape mismatch of
    a matched weight; unmatched names go to report["skipped"]."""
    weights = read_keras_h5(h5_path)
    ours = _flatten_sorted(model_params)

    # our buckets: final-leaf-name -> [(path, leaf)] in sorted path order
    buckets: Dict[str, List[Tuple[str, np.ndarray]]] = {}
    for path, leaf in ours:
        buckets.setdefault(path.split("/")[-1], []).append((path, leaf))

    assignments: Dict[str, np.ndarray] = {}
    skipped: List[str] = []

    def assign(path: str, ref_name: str, arr: np.ndarray, want_shape):
        if tuple(arr.shape) != tuple(want_shape):
            raise ValueError(
                f"{ref_name}: shape {arr.shape} != flax {path} {want_shape}"
            )
        assignments[path] = arr

    # indexed DNN weights: kernel<i>/bias<i>; un-indexed kernels (the final
    # logit dense) follow the indexed ones in layer order
    dnn_k: List[Tuple[int, str, np.ndarray]] = []
    dnn_b: List[Tuple[int, str, np.ndarray]] = []
    plain_kernels: List[Tuple[str, np.ndarray]] = []
    star: Dict[str, List[Tuple[str, np.ndarray]]] = {}

    for pos, (full, arr) in enumerate(weights):
        base = _base_name(full)
        m = re.fullmatch(r"(kernel|bias)(\d+)", base)
        emb_field = next((e for e in _EMB_FIELDS if e in full), None)
        if base == "embeddings" and emb_field:
            lst = buckets.get(emb_field, [])
            if len(lst) != 1:
                skipped.append(full)
            else:
                path, leaf = lst[0]
                assign(path, full, arr, leaf.shape)
        elif m:
            (dnn_k if m.group(1) == "kernel" else dnn_b).append(
                (int(m.group(2)), full, arr)
            )
        elif base == "kernel":
            plain_kernels.append((full, arr))
        elif base in ("kernel_shared", "bias_shared", "kernel_specific",
                      "bias_specific"):
            # AuxiliaryNet reuses the *_specific names (auxiliary_net.py);
            # keep it a separate group so FCN ordering stays positional
            aux = "auxiliary" in full.lower()
            star.setdefault((base, aux), []).append((full, arr))
        else:
            skipped.append(full)

    # DNN tower + logit: our "kernel" bucket is [dnn ... , logit] in sorted
    # path order ("dnn/..." < "logit/..."); reference order is kernel0..N
    # then the final dense's un-indexed kernel
    ref_kernels = [x[1:] for x in sorted(dnn_k)] + plain_kernels
    ref_biases = [x[1:] for x in sorted(dnn_b)]
    for kind, refs in (("kernel", ref_kernels), ("bias", ref_biases)):
        mine = buckets.get(kind, [])
        if not refs:
            continue
        if len(refs) != len(mine):
            raise ValueError(
                f"{kind} count mismatch: reference has {len(refs)}, "
                f"flax tree has {len(mine)} "
                f"({[p for p, _ in mine]})"
            )
        for (full, arr), (path, leaf) in zip(refs, mine):
            assign(path, full, arr, leaf.shape)

    for (base, aux), refs in star.items():
        mine = [
            (p, l) for p, l in buckets.get(base, [])
            if ("auxiliary" in p.lower()) == aux
        ]
        if len(refs) != len(mine):
            raise ValueError(
                f"{base}{' (auxiliary)' if aux else ''} count mismatch: "
                f"reference {len(refs)} vs flax {len(mine)}"
            )
        for (full, arr), (path, leaf) in zip(refs, mine):
            assign(path, full, arr, leaf.shape)

    flat = jax.tree_util.tree_flatten_with_path(model_params)
    new_leaves = []
    matched = []
    for path, leaf in flat[0]:
        keys = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path)
        if keys in assignments:
            new_leaves.append(
                np.asarray(assignments[keys], dtype=np.asarray(leaf).dtype)
            )
            matched.append(keys)
        else:
            new_leaves.append(leaf)
    new_params = jax.tree_util.tree_unflatten(flat[1], new_leaves)
    report = {
        "matched": matched,
        "unmatched_flax": [p for p, _ in ours if p not in assignments],
        "skipped": skipped,
    }
    return new_params, report
