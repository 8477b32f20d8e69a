"""Model-zoo tests: init/forward shapes, param naming contracts, layer math
oracles, and a short train step for every base model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.models.layers import bi_interaction, fm_interaction, inner_product
from mamdr_tpu.models.zoo import build_model
from mamdr_tpu.utils import trees

ALL_MODELS = [
    "mlp", "wdl", "nfm", "autoint", "ccpm", "pnn", "deepfm",
    "shared_bottom", "mmoe", "ple", "star",
]


def make_cfg(name, **model_overrides):
    model = {
        "name": name,
        "user_dim": 8, "item_dim": 8, "domain_dim": 8,
        "hidden_dim": [16, 8],
        "tower_hidden_dim": [8],
        "dropout": 0.5,
        **model_overrides,
    }
    return ExperimentConfig.from_dict({"model": model, "train": {}, "dataset": {}})


def init_and_forward(name, **model_overrides):
    cfg = make_cfg(name, **model_overrides)
    model = build_model(cfg, n_uid=30, n_pid=30, n_domain=3)
    rng = jax.random.PRNGKey(0)
    B = 16
    uid = jnp.arange(B, dtype=jnp.int32) % 30
    pid = (jnp.arange(B, dtype=jnp.int32) * 7) % 30
    dom = jnp.ones((B,), jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, uid, pid, dom, train=False)
    out = model.apply(variables, uid, pid, dom, train=False)
    logits = out[0] if isinstance(out, tuple) else out
    return model, variables, logits


@pytest.mark.parametrize("name", ALL_MODELS)
def test_forward_shapes(name):
    overrides = {"norm": "pn", "dense": "star"} if name == "star" else {}
    _, variables, logits = init_and_forward(name, **overrides)
    assert logits.shape == (16,)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("name", ALL_MODELS)
def test_train_step_decreases_loss(name):
    """Every model must be trainable: 30 adam steps on one batch -> lower loss."""
    import optax

    overrides = {"norm": "pn", "dense": "star"} if name == "star" else {}
    cfg = make_cfg(name, dropout=0.0, **overrides)
    model = build_model(cfg, n_uid=30, n_pid=30, n_domain=3)
    rng = jax.random.PRNGKey(1)
    B = 64
    k1, k2 = jax.random.split(rng)
    uid = jax.random.randint(k1, (B,), 0, 30)
    pid = jax.random.randint(k2, (B,), 0, 30)
    dom = jnp.ones((B,), jnp.int32)
    label = (jnp.arange(B) % 2).astype(jnp.float32)
    variables = model.init({"params": rng}, uid, pid, dom, train=False)
    params = variables["params"]
    stats = dict(variables.get("batch_stats", {}))
    tx = optax.adam(0.05)
    opt = tx.init(params)

    def loss_fn(p, s):
        vs = {"params": p}
        if s:
            vs["batch_stats"] = s
        out = model.apply(vs, uid, pid, dom, train=True,
                          mutable=["batch_stats"] if s else False)
        logits, new = (out[0], out[1].get("batch_stats", s)) if s else (out, s)
        return optax.sigmoid_binary_cross_entropy(logits, label).mean(), new

    @jax.jit
    def step(p, s, o):
        (l, new_s), g = jax.value_and_grad(loss_fn, has_aux=True)(p, s)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), new_s, o, l

    first = None
    for i in range(30):
        params, stats, opt, l = step(params, stats, opt)
        if first is None:
            first = float(l)
    assert float(l) < first, f"{name}: loss {first} -> {float(l)}"


def test_star_param_naming_contract():
    """meta_parms filters like [emb, kernel_shared, bias_shared] must select
    exactly the reference's weight sets (star_fcn.py:61-99 names)."""
    _, variables, _ = init_and_forward("star", norm="pn", dense="star")
    params = {"model": variables["params"]}
    mask = trees.meta_parm_mask(params, ["emb", "kernel_shared", "bias_shared"])
    flat = {
        trees.path_str(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    selected = {k for k, v in flat.items() if v}
    assert any("user_emb" in k for k in selected)
    assert any("kernel_shared" in k for k in selected)
    assert not any("kernel_specific" in k for k in selected)
    assert not any("gamma_specific" in k for k in selected)


def test_star_partitioned_norm_stats_per_domain():
    """Training on domain d must only update domain d's moving stats."""
    cfg = make_cfg("star", norm="pn", dense="star", dropout=0.0)
    model = build_model(cfg, n_uid=30, n_pid=30, n_domain=3)
    rng = jax.random.PRNGKey(2)
    B = 32
    uid = jax.random.randint(rng, (B,), 0, 30)
    pid = jax.random.randint(rng, (B,), 0, 30)
    dom = jnp.full((B,), 2, jnp.int32)
    variables = model.init({"params": rng}, uid, pid, dom, train=False)
    stats0 = variables["batch_stats"]
    _, updated = model.apply(
        {"params": variables["params"], "batch_stats": stats0},
        uid, pid, dom, train=True, mutable=["batch_stats"],
    )
    mm0 = np.asarray(stats0["partitioned_norm"]["moving_mean"])
    mm1 = np.asarray(updated["batch_stats"]["partitioned_norm"]["moving_mean"])
    assert np.array_equal(mm0[0], mm1[0]) and np.array_equal(mm0[1], mm1[1])
    assert not np.array_equal(mm0[2], mm1[2])


def test_fm_interaction_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 3, 5)).astype(np.float32)
    got = np.asarray(fm_interaction(jnp.asarray(x)))
    want = np.zeros(4, np.float32)
    for b in range(4):
        for i in range(3):
            for j in range(i + 1, 3):
                want[b] += x[b, i] @ x[b, j]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bi_interaction_oracle():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    got = np.asarray(bi_interaction(jnp.asarray(x)))
    want = np.zeros((2, 4), np.float32)
    for b in range(2):
        for i in range(3):
            for j in range(i + 1, 3):
                want[b] += x[b, i] * x[b, j]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_inner_product_oracle():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    got = np.asarray(inner_product(jnp.asarray(x)))
    assert got.shape == (2, 3)  # 3 choose 2
    np.testing.assert_allclose(got[0, 0], x[0, 0] @ x[0, 1], rtol=1e-5)
    np.testing.assert_allclose(got[1, 2], x[1, 1] @ x[1, 2], rtol=1e-5)


def test_mtl_head_selection_uses_batch_domain():
    """MTL models must route through the head of the batch's domain."""
    cfg = make_cfg("mmoe", dropout=0.0)
    model = build_model(cfg, n_uid=30, n_pid=30, n_domain=3)
    rng = jax.random.PRNGKey(3)
    B = 8
    uid = jnp.arange(B, dtype=jnp.int32)
    pid = jnp.arange(B, dtype=jnp.int32)
    variables = model.init({"params": rng}, uid, pid, jnp.zeros((B,), jnp.int32), train=False)
    out0 = model.apply(variables, uid, pid, jnp.zeros((B,), jnp.int32), train=False)
    out1 = model.apply(variables, uid, pid, jnp.ones((B,), jnp.int32), train=False)
    # different domain -> different head AND different domain embedding
    assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_pretrained_frozen_embeddings():
    """load_pretrain_emb + emb_trainable=False: tables start at the given
    values and the optimizer mask freezes user/item (incl. linear) tables."""
    import optax

    from mamdr_tpu.train.steps import make_optimizer

    pre_u = np.full((30, 8), 0.5, np.float32)
    pre_i = np.full((30, 8), -0.25, np.float32)
    cfg = make_cfg("wdl", dropout=0.0)
    cfg.train.load_pretrain_emb = True
    cfg.train.emb_trainable = False
    model = build_model(cfg, n_uid=30, n_pid=30, n_domain=3,
                        pretrained_user=pre_u, pretrained_item=pre_i)
    rng = jax.random.PRNGKey(4)
    B = 16
    uid = jnp.arange(B, dtype=jnp.int32)
    pid = jnp.arange(B, dtype=jnp.int32)
    dom = jnp.zeros((B,), jnp.int32)
    variables = model.init({"params": rng}, uid, pid, dom, train=False)
    params = {"model": variables["params"]}
    np.testing.assert_array_equal(
        np.asarray(params["model"]["embedding"]["user_emb"]), pre_u
    )
    tx = make_optimizer("adam", 0.1, params, emb_trainable=False)
    opt = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt, params)
    # frozen: user/item tables (incl. linear dim-1) get zero update
    assert np.all(np.asarray(updates["model"]["embedding"]["user_emb"]) == 0)
    assert np.all(np.asarray(updates["model"]["linear"]["linear_item_emb"]) == 0)
    # trainable: domain table and dnn keep nonzero updates
    assert np.any(np.asarray(updates["model"]["embedding"]["domain_emb"]) != 0)


def test_fast_dropout_statistics():
    """Hash-PRNG dropout: correct keep rate, inverted scaling, determinism,
    and decorrelation across seeds."""
    import jax.numpy as jnp

    from mamdr_tpu.ops.fast_random import dropout_mask, hash_uniform

    u = np.asarray(hash_uniform(jnp.uint32(123), (100_000,)))
    assert 0.0 <= u.min() and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(np.corrcoef(u[:-1], u[1:])[0, 1]) < 0.02  # adjacent decorrelated

    m1 = np.asarray(dropout_mask(jnp.uint32(1), 0.5, (4096, 64)))
    m2 = np.asarray(dropout_mask(jnp.uint32(1), 0.5, (4096, 64)))
    m3 = np.asarray(dropout_mask(jnp.uint32(2), 0.5, (4096, 64)))
    assert np.array_equal(m1, m2)           # deterministic per seed
    assert not np.array_equal(m1, m3)       # seed changes mask
    assert abs(m1.mean() - 0.5) < 0.01      # keep rate

    # flax module path: train applies mask+scale, eval is identity
    from mamdr_tpu.models.layers import FastDropout

    x = jnp.ones((512, 32))
    mod = FastDropout(0.5)
    y = mod.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)})
    y = np.asarray(y)
    assert set(np.unique(y.round(4))) <= {0.0, 2.0}  # inverted scaling
    assert abs((y > 0).mean() - 0.5) < 0.05
    y_eval = mod.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(x))
