"""Fused Pallas MLP train-step kernel vs the autodiff path.

Runs the kernel in interpreter mode on CPU and checks (loss, grads) against
jax.value_and_grad of the regular loss_fn — exact math parity with dropout
off (same ops, f32), distribution checks with dropout on (the kernel uses
the same murmur3 hash-mask family with kernel-local seeds).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.models.zoo import build_model
from mamdr_tpu.ops.fused_mlp_step import maybe_make_fast_loss_grad
from mamdr_tpu.train.steps import StepConfig, make_loss_fn


def setup(dropout=0.0, emb_trainable=True, n_uid=50, n_pid=60, n_domain=3,
          batch=32, hidden=(32, 16)):
    cfg = ExperimentConfig.from_dict(
        {
            "model": {"name": "mlp", "user_dim": 8, "item_dim": 8,
                       "domain_dim": 8, "hidden_dim": list(hidden),
                       "dropout": dropout},
            "train": {"emb_trainable": emb_trainable},
            "dataset": {"name": "synthetic"},
        }
    )
    model = build_model(cfg, n_uid=n_uid, n_pid=n_pid, n_domain=n_domain)
    rng = np.random.default_rng(0)
    batch_d = {
        "uid": jnp.asarray(rng.integers(0, n_uid, batch), jnp.int32),
        "pid": jnp.asarray(rng.integers(0, n_pid, batch), jnp.int32),
        "domain": jnp.asarray(np.full(batch, 1), jnp.int32),
        "label": jnp.asarray(rng.integers(0, 2, batch), jnp.float32),
        "weight": jnp.asarray((rng.uniform(0, 1, batch) > 0.2), jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch_d["uid"], batch_d["pid"], batch_d["domain"], train=False,
    )
    params = {"model": variables["params"]}
    step_cfg = StepConfig(
        uncertainty_weight=False, l2_emb=1e-5, emb_trainable=emb_trainable,
        has_batch_stats=False, has_dropout=dropout > 0.0,
    )
    return model, params, batch_d, step_cfg


@pytest.mark.parametrize("emb_trainable", [True, False])
def test_kernel_matches_autodiff_no_dropout(emb_trainable):
    model, params, batch, step_cfg = setup(0.0, emb_trainable)
    fast = maybe_make_fast_loss_grad(model, step_cfg, interpret=True)
    assert fast is not None

    rng = jax.random.PRNGKey(3)
    loss_k, grads_k = fast(params, batch, rng, train=True)

    loss_fn = make_loss_fn(model, step_cfg)
    (loss_a, (_, _, data_loss_a)), grads_a = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params, {}, batch, rng, True)

    np.testing.assert_allclose(
        float(loss_k), float(data_loss_a), rtol=1e-5, atol=1e-7
    )
    flat_k = jax.tree_util.tree_leaves_with_path(grads_k)
    flat_a = {
        jax.tree_util.keystr(kp): g
        for kp, g in jax.tree_util.tree_leaves_with_path(grads_a)
    }
    checked = 0
    for kp, gk in flat_k:
        name = jax.tree_util.keystr(kp)
        ga = flat_a[name]
        if not emb_trainable and ("user_emb" in name or "item_emb" in name):
            # frozen tables: kernel path reports zeros (updates are masked
            # out either way — the autodiff grad there is dead code)
            assert np.all(np.asarray(gk) == 0.0)
            continue
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(ga), rtol=2e-5, atol=1e-7,
            err_msg=name,
        )
        checked += 1
    assert checked >= 6  # 2 dense kernels + biases + logit + domain table


def test_kernel_all_pad_batch_grads():
    """weight==0 everywhere: data grads vanish, only l2 table terms remain —
    identical to the autodiff path (which the has_data gate then discards)."""
    model, params, batch, step_cfg = setup(0.0, emb_trainable=True)
    batch = dict(batch)
    batch["weight"] = jnp.zeros_like(batch["weight"])
    fast = maybe_make_fast_loss_grad(model, step_cfg, interpret=True)
    rng = jax.random.PRNGKey(3)
    _, grads_k = fast(params, batch, rng, train=True)
    loss_fn = make_loss_fn(model, step_cfg)
    _, grads_a = jax.value_and_grad(loss_fn, has_aux=True)(
        params, {}, batch, rng, True
    )
    for gk, ga in zip(
        jax.tree_util.tree_leaves(grads_k), jax.tree_util.tree_leaves(grads_a)
    ):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(ga),
                                   rtol=2e-5, atol=1e-8)


def test_kernel_dropout_statistics():
    """Dropout on: kernel loss distribution matches autodiff-with-dropout in
    expectation (different mask seeds, same family/rate/scaling)."""
    model, params, batch, step_cfg = setup(0.5)
    fast = maybe_make_fast_loss_grad(model, step_cfg, interpret=True)
    loss_fn = make_loss_fn(model, step_cfg)

    lk = [
        float(fast(params, batch, jax.random.PRNGKey(i), train=True)[0])
        for i in range(8)
    ]
    la = [
        float(
            jax.value_and_grad(loss_fn, has_aux=True)(
                params, {}, batch, jax.random.PRNGKey(i), True
            )[0][0]
        )
        for i in range(8)
    ]
    assert abs(np.mean(lk) - np.mean(la)) < 0.05, (np.mean(lk), np.mean(la))
    # train=False disables masks entirely
    l0 = float(fast(params, batch, jax.random.PRNGKey(0), train=False)[0])
    l1 = float(fast(params, batch, jax.random.PRNGKey(9), train=False)[0])
    assert l0 == l1
