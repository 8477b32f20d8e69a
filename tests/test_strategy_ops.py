"""Golden tests for the weight-space operators vs tiny numpy oracles
(SURVEY §4 recommended test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np

from mamdr_tpu.strategies import ops
from mamdr_tpu.utils import trees


def make_tree(rng):
    return {
        "emb": {"user_emb": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)},
        "dnn": {
            "kernel": jnp.asarray(rng.normal(size=(3, 2)), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(2,)), jnp.float32),
        },
    }


def test_meta_parm_mask_modes():
    t = make_tree(np.random.default_rng(0))
    all_mask = trees.meta_parm_mask(t, ["all"])
    assert all(jax.tree_util.tree_leaves(all_mask))
    hidden = trees.meta_parm_mask(t, ["all_hidden"])
    flat = {trees.path_str(p): v for p, v in jax.tree_util.tree_flatten_with_path(hidden)[0]}
    assert flat["emb/user_emb"] is False and flat["dnn/kernel"] is True
    named = trees.meta_parm_mask(t, ["kernel"])
    flat = {trees.path_str(p): v for p, v in jax.tree_util.tree_flatten_with_path(named)[0]}
    assert flat["dnn/kernel"] and not flat["dnn/bias"] and not flat["emb/user_emb"]
    try:
        trees.meta_parm_mask(t, ["nonexistent_name"])
        assert False, "should raise"
    except ValueError:
        pass


def test_reptile_update_oracle():
    rng = np.random.default_rng(1)
    meta, adapted = make_tree(rng), make_tree(rng)
    mask = trees.meta_parm_mask(meta, ["all_hidden"])
    out = ops.reptile_update(meta, adapted, 0.1, mask)
    want_k = np.asarray(meta["dnn"]["kernel"]) + 0.1 * (
        np.asarray(adapted["dnn"]["kernel"]) - np.asarray(meta["dnn"]["kernel"])
    )
    np.testing.assert_allclose(np.asarray(out["dnn"]["kernel"]), want_k, rtol=1e-6)
    # unmasked leaf untouched
    np.testing.assert_array_equal(
        np.asarray(out["emb"]["user_emb"]), np.asarray(meta["emb"]["user_emb"])
    )


def test_merge_plus_times_oracle():
    rng = np.random.default_rng(2)
    sh, sp = make_tree(rng), make_tree(rng)
    mask = trees.meta_parm_mask(sh, ["all"])
    plus = ops.merge_weights(sh, sp, mask, "plus")
    times = ops.merge_weights(sh, sp, mask, "times")
    np.testing.assert_allclose(
        np.asarray(plus["dnn"]["bias"]),
        np.asarray(sh["dnn"]["bias"]) + np.asarray(sp["dnn"]["bias"]),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(times["dnn"]["bias"]),
        np.asarray(sh["dnn"]["bias"]) * np.asarray(sp["dnn"]["bias"]),
        rtol=1e-6,
    )


def reference_pcgrad_oracle(current, aux):
    """Direct numpy transcription of reference pcgrad.py:152-160."""
    current = {k: v.copy() for k, v in current.items()}
    aux = {k: v.copy() for k, v in aux.items()}
    out = {}
    for k in current:
        c, a = current[k], aux[k]
        dot = np.sum(c * a, axis=-1)
        mask = dot > 0
        if np.any(mask):
            a[mask] -= np.expand_dims(
                dot[mask] / np.linalg.norm(c[mask], axis=-1), -1
            ) * c[mask]
        out[k] = a
    return out


def test_pcgrad_reference_mode_oracle():
    rng = np.random.default_rng(3)
    cur = {"w": rng.normal(size=(5, 4)).astype(np.float32)}
    aux = {"w": rng.normal(size=(5, 4)).astype(np.float32)}
    got = ops.pcgrad_project(
        {"w": jnp.asarray(cur["w"])}, {"w": jnp.asarray(aux["w"])}, "reference"
    )
    want = reference_pcgrad_oracle(cur, aux)
    np.testing.assert_allclose(np.asarray(got["w"]), want["w"], rtol=1e-5)


def test_pcgrad_paper_mode_removes_conflict():
    gq = {"w": jnp.asarray([[1.0, 0.0]], jnp.float32)}
    ga = {"w": jnp.asarray([[-1.0, 1.0]], jnp.float32)}  # conflicting (dot<0)
    out = ops.pcgrad_project(gq, ga, "paper")
    # after projection, no component against gq remains
    assert abs(float(jnp.sum(out["w"] * gq["w"]))) < 1e-6


def test_specific_from_adapted():
    rng = np.random.default_rng(4)
    adapted, merged, spec = make_tree(rng), make_tree(rng), make_tree(rng)
    mask = trees.meta_parm_mask(spec, ["kernel"])
    out = ops.specific_from_adapted(adapted, merged, spec, mask)
    np.testing.assert_allclose(
        np.asarray(out["dnn"]["kernel"]),
        np.asarray(adapted["dnn"]["kernel"]) - np.asarray(merged["dnn"]["kernel"]),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(out["dnn"]["bias"]), np.asarray(spec["dnn"]["bias"])
    )


def test_dr_accumulate_times_uses_shared():
    rng = np.random.default_rng(5)
    acc = {"w": jnp.zeros((2, 2), jnp.float32)}
    adapted = {"w": jnp.asarray(rng.normal(size=(2, 2)), jnp.float32)}
    merged = {"w": jnp.asarray(rng.normal(size=(2, 2)), jnp.float32)}
    shared = {"w": jnp.asarray(rng.normal(size=(2, 2)), jnp.float32)}
    mask = {"w": True}
    out = ops.dr_accumulate(acc, adapted, merged, shared, mask, "times")
    want = (np.asarray(adapted["w"]) - np.asarray(merged["w"])) * np.asarray(shared["w"])
    np.testing.assert_allclose(np.asarray(out["w"]), want, rtol=1e-6)


def test_ema_accumulate():
    acc = {"w": jnp.ones((2,), jnp.float32)}
    g = {"w": jnp.full((2,), 3.0, jnp.float32)}
    out = ops.ema_accumulate(acc, g, {"w": True})
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0 * 0.999 + 3.0 * 0.001, rtol=1e-6)


def test_flat_adam_bit_exact_vs_optax():
    """flat_optimizer.flat_adam must match optax.adam exactly on trainable
    leaves and leave frozen leaves untouched with no slot state."""
    import optax

    from mamdr_tpu.train.flat_optimizer import flat_adam

    rng = np.random.default_rng(3)
    params = {
        "a": jnp.asarray(rng.normal(size=(16, 8)), jnp.float32),
        "b": {"w": jnp.asarray(rng.normal(size=(8,)), jnp.float32),
               "user_emb": jnp.asarray(rng.normal(size=(32, 4)), jnp.float32)},
    }
    mask = {"a": True, "b": {"w": True, "user_emb": False}}
    ref, fl = optax.adam(1e-3), flat_adam(1e-3, mask)
    sr, sf = ref.init(params), fl.init(params)
    pr, pf = params, params
    for _ in range(4):
        grads = jax.tree_util.tree_map(
            lambda x: jnp.asarray(rng.normal(size=x.shape), jnp.float32), params
        )
        ur, sr = ref.update(grads, sr, pr)
        pr = optax.apply_updates(pr, ur)
        uf, sf = fl.update(grads, sf, pf)
        pf = optax.apply_updates(pf, uf)
    np.testing.assert_allclose(np.asarray(pr["a"]), np.asarray(pf["a"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pr["b"]["w"]), np.asarray(pf["b"]["w"]), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(pf["b"]["user_emb"]), np.asarray(params["b"]["user_emb"])
    )
    # slot state covers only the trainable element count
    assert sf.mu.size == 16 * 8 + 8
