"""Reference .h5 checkpoint importer (mamdr_tpu/utils/h5_import.py).

Fixtures are h5py-built files following the Keras ``save_weights`` HDF5
topology with the REFERENCE weight names (deepctr DNN kernels
``dnn/kernel<i>:0``, embeddings ``sparse_emb_user_emb/user_emb/
embeddings:0`` — reference deepctr.py:96-137; STAR
``kernel_shared``/``bias_specific`` — star_fcn.py:61-99), so the mapping is
pinned against the documented layout without needing TF1/deepctr installed.
"""

import numpy as np
import pytest

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.train.trainer import Trainer
from mamdr_tpu.utils.h5_import import import_reference_weights

h5py = pytest.importorskip("h5py")


def write_keras_h5(path, layers):
    """layers: [(layer_name, [(weight_name, array), ...])] in layer order."""
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = [ln.encode() for ln, _ in layers]
        for ln, weights in layers:
            g = f.create_group(ln)
            g.attrs["weight_names"] = [wn.encode() for wn, _ in weights]
            for wn, arr in weights:
                g.create_dataset(wn, data=arr)


def make_trainer(tmp_path, name="mlp", extra_model=None):
    model = {"name": name, "user_dim": 8, "item_dim": 8, "domain_dim": 8,
             "hidden_dim": [16, 8], "dropout": 0.0}
    model.update(extra_model or {})
    cfg = ExperimentConfig.from_dict(
        {
            "model": model,
            "train": {"epoch": 1, "learning_rate": 0.01, "patience": 1,
                       "metrics_jsonl": False},
            "dataset": {"name": "synthetic", "batch_size": 64, "seed": 3},
        }
    )
    cfg.train.checkpoint_path = str(tmp_path / f"c_{name}")
    cfg.train.result_save_path = str(tmp_path / f"r_{name}")
    ds = make_synthetic_dataset(n_domain=3, n_uid=40, n_pid=40,
                                n_per_domain=200, seed=3, batch_size=64)
    return Trainer(cfg, ds, verbose=False)


def test_import_mlp(tmp_path):
    t = make_trainer(tmp_path)
    model = t.state.params["model"]
    rng = np.random.default_rng(0)

    def like(a):
        return rng.normal(0, 0.1, np.asarray(a).shape).astype(np.float32)

    emb = model["embedding"]
    dnn = [model["dnn"][k] for k in sorted(model["dnn"])]
    logit_kernel = model["logit"]
    while isinstance(logit_kernel, dict):
        logit_kernel = next(iter(logit_kernel.values()))
    ref = {
        "user": like(emb["user_emb"]), "item": like(emb["item_emb"]),
        "dom": like(emb["domain_emb"]),
        "k": [like(layer["Dense_0"]["kernel"]) for layer in dnn],
        "b": [like(layer["Dense_0"]["bias"]) for layer in dnn],
        "logit": like(logit_kernel),
    }
    h5 = str(tmp_path / "ref.h5")
    write_keras_h5(h5, [
        ("sparse_emb_user_emb",
         [("sparse_emb_user_emb/user_emb/embeddings:0", ref["user"])]),
        ("sparse_emb_item_emb",
         [("sparse_emb_item_emb/item_emb/embeddings:0", ref["item"])]),
        ("sparse_emb_domain_emb",
         [("sparse_emb_domain_emb/domain_emb/embeddings:0", ref["dom"])]),
        ("dnn", [(f"dnn/kernel{i}:0", ref["k"][i]) for i in range(2)]
         + [(f"dnn/bias{i}:0", ref["b"][i]) for i in range(2)]),
        ("dense", [("dense/kernel:0", ref["logit"])]),
        # Keras noise the importer must skip, not crash on
        ("prediction_layer",
         [("prediction_layer/global_step:0", np.zeros((1,), np.float32))]),
    ])

    new_model, report = import_reference_weights(h5, model)
    np.testing.assert_array_equal(
        np.asarray(new_model["embedding"]["user_emb"]), ref["user"])
    np.testing.assert_array_equal(
        np.asarray(new_model["embedding"]["item_emb"]), ref["item"])
    for i, k in enumerate(sorted(new_model["dnn"])):
        np.testing.assert_array_equal(
            np.asarray(new_model["dnn"][k]["Dense_0"]["kernel"]), ref["k"][i])
        np.testing.assert_array_equal(
            np.asarray(new_model["dnn"][k]["Dense_0"]["bias"]), ref["b"][i])
    flat_logit = new_model["logit"]
    while isinstance(flat_logit, dict):
        flat_logit = next(iter(flat_logit.values()))
    np.testing.assert_array_equal(np.asarray(flat_logit), ref["logit"])
    assert report["skipped"] == ["prediction_layer//prediction_layer/global_step:0"]
    assert not report["unmatched_flax"], report["unmatched_flax"]

    # imported weights drive real predictions through the framework
    t.state = t.state.replace(params={**t.state.params, "model": new_model})
    loss, auc = t.evaluate_domain("val", 0, t.state.params,
                                  t.state.batch_stats)
    assert np.isfinite(loss) and 0.0 <= auc <= 1.0


def test_export_import_roundtrip(tmp_path):
    """export_reference_weights writes the reference Keras layout; importing
    it back reproduces the tree bit-exactly (MLP family)."""
    import jax
    import numpy as np

    from mamdr_tpu.utils.h5_import import export_reference_weights

    t = make_trainer(tmp_path)
    model = t.state.params["model"]
    h5 = str(tmp_path / "export.h5")
    export_reference_weights(h5, model)
    new_model, report = import_reference_weights(h5, model)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(model)[0],
        jax.tree_util.tree_flatten_with_path(new_model)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not report["unmatched_flax"], report


def test_import_shape_mismatch_raises(tmp_path):
    t = make_trainer(tmp_path)
    model = t.state.params["model"]
    h5 = str(tmp_path / "bad.h5")
    write_keras_h5(h5, [
        ("sparse_emb_user_emb",
         [("sparse_emb_user_emb/user_emb/embeddings:0",
           np.zeros((7, 3), np.float32))]),
    ])
    with pytest.raises(ValueError, match="shape"):
        import_reference_weights(h5, model)


ZOO = [
    ("mlp", {}),
    ("wdl", {}),
    ("deepfm", {}),
    ("nfm", {}),
    ("autoint", {}),
    ("ccpm", {}),
    ("pnn", {}),
    ("shared_bottom", {"tower_hidden_dim": [8]}),
    ("mmoe", {"tower_hidden_dim": [8], "num_experts": 2,
              "gate_dnn_hidden_units": [8]}),
    ("ple", {"tower_hidden_dim": [8], "specific_expert_num": 2,
             "shared_expert_num": 1, "num_levels": 2}),
    ("star", {"norm": "none", "dense": "star", "auxiliary_net": True,
              "auxiliary_dim": 8}),
]


@pytest.mark.parametrize("name,extra", ZOO, ids=[z[0] for z in ZOO])
def test_export_import_roundtrip_zoo(tmp_path, name, extra):
    """Every zoo family round-trips bit-exactly through the reference
    Keras layout (VERDICT r3 item 4: 11/11 models)."""
    import jax

    from mamdr_tpu.utils.h5_import import export_reference_weights

    t = make_trainer(tmp_path, name=name, extra_model=extra)
    model = t.state.params["model"]
    h5 = str(tmp_path / f"{name}.h5")
    export_reference_weights(h5, model)
    new_model, report = import_reference_weights(h5, model)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(model)[0],
        jax.tree_util.tree_flatten_with_path(new_model)[0],
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg=f"{name}: leaf {pa} failed round-trip")
    assert not report["unmatched_flax"], (name, report["unmatched_flax"])
    assert not report["skipped"], (name, report["skipped"])


def test_import_mtl_reference_layout(tmp_path):
    """A deepctr-convention MMoE file (per-task towers 'tower_domain_<k>',
    experts 'expert_<e>', per-task gate softmax, per-task unnamed logit
    Dense) stacks onto the batched [T,...] flax leaves."""
    t = make_trainer(tmp_path, name="mmoe",
                     extra_model={"tower_hidden_dim": [8], "num_experts": 2,
                                  "gate_dnn_hidden_units": [8]})
    model = t.state.params["model"]
    rng = np.random.default_rng(7)

    def like(shape):
        return rng.normal(0, 0.1, shape).astype(np.float32)

    T = np.asarray(model["towers"]["tower_kernel_0"]).shape[0]
    E = np.asarray(model["experts"]["expert_kernel_0"]).shape[0]
    tk = like(np.asarray(model["towers"]["tower_kernel_0"]).shape)
    tb = like(np.asarray(model["towers"]["tower_bias_0"]).shape)
    tl = like(np.asarray(model["towers"]["tower_logit"]).shape)
    ek0 = like(np.asarray(model["experts"]["expert_kernel_0"]).shape)
    eb0 = like(np.asarray(model["experts"]["expert_bias_0"]).shape)
    ek1 = like(np.asarray(model["experts"]["expert_kernel_1"]).shape)
    eb1 = like(np.asarray(model["experts"]["expert_bias_1"]).shape)
    gk = like(np.asarray(model["gate_kernel"]).shape)

    layers = []
    for e in range(E):
        layers.append((f"expert_{e}", [
            (f"expert_{e}/kernel0:0", ek0[e]), (f"expert_{e}/bias0:0", eb0[e]),
            (f"expert_{e}/kernel1:0", ek1[e]), (f"expert_{e}/bias1:0", eb1[e]),
        ]))
    for k in range(T):
        layers.append((f"tower_domain_{k}", [
            (f"tower_domain_{k}/kernel0:0", tk[k]),
            (f"tower_domain_{k}/bias0:0", tb[k]),
        ]))
        layers.append((f"gate_softmax_domain_{k}",
                       [(f"gate_softmax_domain_{k}/kernel:0", gk[k])]))
        lname = "dense" if k == 0 else f"dense_{k}"
        layers.append((lname, [(f"{lname}/kernel:0", tl[k])]))
    # per-task gate DNNs: ours is shared -> task 0 imported, rest skipped
    g0k = like(np.asarray(
        model["gate_dnn"]["Dense_0"]["Dense_0"]["kernel"]).shape)
    g0b = like(np.asarray(
        model["gate_dnn"]["Dense_0"]["Dense_0"]["bias"]).shape)
    for k in range(T):
        layers.append((f"gate_domain_{k}", [
            (f"gate_domain_{k}/kernel0:0", g0k),
            (f"gate_domain_{k}/bias0:0", g0b)]))

    h5 = str(tmp_path / "mmoe_ref.h5")
    write_keras_h5(h5, layers)
    new_model, report = import_reference_weights(h5, model)
    np.testing.assert_array_equal(
        np.asarray(new_model["towers"]["tower_kernel_0"]), tk)
    np.testing.assert_array_equal(
        np.asarray(new_model["towers"]["tower_logit"]), tl)
    np.testing.assert_array_equal(
        np.asarray(new_model["experts"]["expert_kernel_1"]), ek1)
    np.testing.assert_array_equal(np.asarray(new_model["gate_kernel"]), gk)
    np.testing.assert_array_equal(
        np.asarray(new_model["gate_dnn"]["Dense_0"]["Dense_0"]["kernel"]), g0k)
    # the per-task gate DNNs beyond task 0 are reported, not silently eaten
    assert any("gate_domain_1" in s for s in report["skipped"])
    # embeddings were not in the file -> unmatched, everything else matched
    assert all("emb" in p for p in report["unmatched_flax"]), report


def test_import_autoint_ccpm_reference_layout(tmp_path):
    """interacting_layer[_i] query/key/value/res and conv2d[_i] kernel/bias
    match positionally."""
    for name in ("autoint", "ccpm"):
        t = make_trainer(tmp_path, name=name)
        model = t.state.params["model"]
        rng = np.random.default_rng(5)
        layers = []
        expect = {}
        if name == "autoint":
            for i in sorted(int(k.split("_")[-1]) for k in model
                            if k.startswith("interacting_")):
                lname = ("interacting_layer" if i == 0
                         else f"interacting_layer_{i}")
                ws = []
                for w in ("query", "key", "value", "res"):
                    arr = rng.normal(0, 0.1, np.asarray(
                        model[f"interacting_{i}"][w]).shape).astype(np.float32)
                    expect[(f"interacting_{i}", w)] = arr
                    ws.append((f"{lname}/{w}:0", arr))
                layers.append((lname, ws))
        else:
            for i in sorted(int(k.split("_")[-1]) for k in model
                            if k.startswith("conv_")):
                lname = "conv2d" if i == 0 else f"conv2d_{i}"
                ws = []
                for w in ("kernel", "bias"):
                    arr = rng.normal(0, 0.1, np.asarray(
                        model[f"conv_{i}"][w]).shape).astype(np.float32)
                    expect[(f"conv_{i}", w)] = arr
                    ws.append((f"{lname}/{w}:0", arr))
                layers.append((lname, ws))
        h5 = str(tmp_path / f"{name}_ref.h5")
        write_keras_h5(h5, layers)
        new_model, report = import_reference_weights(h5, model)
        for (mod, w), arr in expect.items():
            np.testing.assert_array_equal(
                np.asarray(new_model[mod][w]), arr,
                err_msg=f"{name}: {mod}/{w}")
        assert not report["skipped"], (name, report["skipped"])


def test_import_star(tmp_path):
    t = make_trainer(tmp_path, name="star",
                     extra_model={"norm": "none", "dense": "star",
                                  "auxiliary_net": False})
    model = t.state.params["model"]
    import jax

    flat = jax.tree_util.tree_flatten_with_path(model)[0]
    star_leaves = {}
    for path, leaf in flat:
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        base = keys.split("/")[-1]
        if base in ("kernel_shared", "bias_shared", "kernel_specific",
                    "bias_specific") and "auxiliary" not in keys:
            star_leaves.setdefault(base, []).append((keys, leaf))
    assert star_leaves, "star model exposes no FCN leaves?"
    for base in star_leaves:
        star_leaves[base].sort(key=lambda kv: kv[0])

    rng = np.random.default_rng(1)
    layers = []
    ref_vals = {}
    for li in range(len(star_leaves["kernel_shared"])):
        weights = []
        for base in ("kernel_specific", "bias_specific", "kernel_shared",
                     "bias_shared"):
            keys, leaf = star_leaves[base][li]
            arr = rng.normal(0, 0.1, np.asarray(leaf).shape).astype(np.float32)
            ref_vals[keys] = arr
            weights.append((f"star_fcn_{li}/{base}:0", arr))
        layers.append((f"star_fcn_{li}", weights))
    h5 = str(tmp_path / "star.h5")
    write_keras_h5(h5, layers)

    new_model, report = import_reference_weights(h5, model)
    new_flat = jax.tree_util.tree_flatten_with_path(new_model)[0]
    for path, leaf in new_flat:
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        if keys in ref_vals:
            np.testing.assert_array_equal(np.asarray(leaf), ref_vals[keys])
    assert set(report["matched"]) == set(ref_vals)
