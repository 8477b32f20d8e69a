"""AUC metric parity: vs sklearn (loose) and vs the reference's exact
500-bucket Riemann semantics (tight, via a numpy oracle of the Keras math)."""

import numpy as np
import jax.numpy as jnp

from mamdr_tpu.metrics.auc import auc_init, auc_result, auc_thresholds, auc_update


def keras_auc_oracle(y_true, y_pred, num_thresholds=500):
    """Direct numpy transcription of the Keras AUC math (utils/auc.py)."""
    eps = 1e-7
    thr = np.array(
        [0.0 - eps]
        + [(i + 1) / (num_thresholds - 1) for i in range(num_thresholds - 2)]
        + [1.0 + eps]
    )
    pred_pos = y_pred[None, :] > thr[:, None]
    pos = y_true > 0.5
    tp = (pred_pos & pos[None, :]).sum(1).astype(float)
    fn = (~pred_pos & pos[None, :]).sum(1).astype(float)
    fp = (pred_pos & ~pos[None, :]).sum(1).astype(float)
    tn = (~pred_pos & ~pos[None, :]).sum(1).astype(float)

    def div(a, b):
        return np.where(b == 0, 0.0, a / np.where(b == 0, 1.0, b))

    rec = div(tp, tp + fn)
    fpr = div(fp, fp + tn)
    heights = (rec[:-1] + rec[1:]) / 2
    return float(np.sum((fpr[:-1] - fpr[1:]) * heights))


def test_thresholds_shape_and_endpoints():
    thr = np.asarray(auc_thresholds(500))
    assert thr.shape == (500,)
    assert thr[0] < 0 and thr[-1] > 1
    assert np.isclose(thr[1], 1 / 499)


def test_auc_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    y = (rng.uniform(size=2000) < 0.3).astype(np.float32)
    p = np.clip(rng.normal(0.3 + 0.3 * y, 0.25), 0, 1).astype(np.float32)
    state = auc_init()
    # streaming in 3 uneven chunks must equal one-shot
    for chunk in np.split(np.arange(2000), [700, 1200]):
        state = auc_update(state, jnp.asarray(y[chunk]), jnp.asarray(p[chunk]))
    got = float(auc_result(state))
    want = keras_auc_oracle(y, p)
    assert abs(got - want) < 1e-5


def test_auc_close_to_sklearn():
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(1)
    y = (rng.uniform(size=4000) < 0.5).astype(np.float32)
    p = np.clip(rng.normal(0.4 + 0.2 * y, 0.3), 0, 1).astype(np.float32)
    state = auc_update(auc_init(), jnp.asarray(y), jnp.asarray(p))
    got = float(auc_result(state))
    want = roc_auc_score(y, p)
    assert abs(got - want) < 5e-3  # bucketing error bound


def test_weight_masking():
    y = np.array([1, 0, 1, 0], np.float32)
    p = np.array([0.9, 0.1, 0.8, 0.2], np.float32)
    w = np.array([1, 1, 0, 0], np.float32)
    s_masked = auc_update(auc_init(), jnp.asarray(y), jnp.asarray(p), jnp.asarray(w))
    s_sub = auc_update(auc_init(), jnp.asarray(y[:2]), jnp.asarray(p[:2]))
    assert np.allclose(np.asarray(s_masked.true_positives), np.asarray(s_sub.true_positives))
    assert abs(float(auc_result(s_masked)) - float(auc_result(s_sub))) < 1e-6
