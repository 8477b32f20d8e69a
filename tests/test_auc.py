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


def _oracle_counts(y_true, y_pred, thr):
    pred_pos = y_pred[None, :] > thr[:, None]
    pos = y_true > 0.5
    tp = (pred_pos & pos[None, :]).sum(1).astype(float)
    fn = (~pred_pos & pos[None, :]).sum(1).astype(float)
    fp = (pred_pos & ~pos[None, :]).sum(1).astype(float)
    tn = (~pred_pos & ~pos[None, :]).sum(1).astype(float)
    return tp, fn, fp, tn


def _div(a, b):
    return np.where(b == 0, 0.0, a / np.where(b == 0, 1.0, b))


def keras_auc_oracle_full(y_true, y_pred, num_thresholds=500, curve="ROC",
                          summation_method="interpolation", thresholds=None):
    """Numpy transcription of the FULL vendored Keras AUC surface
    (reference utils/auc.py:179-281): PR curve, minoring/majoring, custom
    thresholds, and the Davis & Goadrich PR interpolation closed form."""
    eps = 1e-7
    if thresholds is not None:
        inner = sorted(thresholds)
    else:
        inner = [(i + 1) / (num_thresholds - 1)
                 for i in range(num_thresholds - 2)]
    thr = np.array([0.0 - eps] + list(inner) + [1.0 + eps])
    tp, fn, fp, tn = _oracle_counts(y_true, y_pred, thr)
    if curve == "PR" and summation_method == "interpolation":
        dtp = tp[:-1] - tp[1:]
        p = tp + fp
        dp = p[:-1] - p[1:]
        slope = _div(dtp, np.maximum(dp, 0))
        intercept = tp[1:] - slope * p[1:]
        safe_ratio = np.where((p[:-1] > 0) & (p[1:] > 0),
                              _div(p[:-1], np.maximum(p[1:], 0)),
                              np.ones_like(p[1:]))
        return float(np.sum(_div(slope * (dtp + intercept * np.log(safe_ratio)),
                                 np.maximum(tp[1:] + fn[1:], 0))))
    rec = _div(tp, tp + fn)
    if curve == "ROC":
        x, y = _div(fp, fp + tn), rec
    else:
        x, y = rec, _div(tp, tp + fp)
    if summation_method == "interpolation":
        heights = (y[:-1] + y[1:]) / 2
    elif summation_method == "minoring":
        heights = np.minimum(y[:-1], y[1:])
    else:
        heights = np.maximum(y[:-1], y[1:])
    return float(np.sum((x[:-1] - x[1:]) * heights))


def test_auc_full_surface_matches_oracle():
    """PR curve, minoring/majoring, custom thresholds — all modes of the
    vendored Keras class (reference utils/auc.py:66-95) vs the numpy oracle."""
    rng = np.random.default_rng(7)
    y = (rng.uniform(size=3000) < 0.35).astype(np.float32)
    p = np.clip(rng.normal(0.35 + 0.25 * y, 0.25), 0, 1).astype(np.float32)
    for curve in ("ROC", "PR"):
        for summ in ("interpolation", "minoring", "majoring"):
            state = auc_update(auc_init(200), jnp.asarray(y), jnp.asarray(p),
                               num_thresholds=200)
            got = float(auc_result(state, curve=curve, summation_method=summ))
            want = keras_auc_oracle_full(y, p, 200, curve, summ)
            assert abs(got - want) < 1e-5, (curve, summ, got, want)
    # sanity: minoring <= interpolation <= majoring for the ROC curve
    st = auc_update(auc_init(200), jnp.asarray(y), jnp.asarray(p),
                    num_thresholds=200)
    lo = float(auc_result(st, summation_method="minoring"))
    mid = float(auc_result(st))
    hi = float(auc_result(st, summation_method="majoring"))
    assert lo <= mid <= hi


def test_auc_custom_thresholds():
    rng = np.random.default_rng(9)
    y = (rng.uniform(size=1000) < 0.4).astype(np.float32)
    p = np.clip(rng.normal(0.4 + 0.2 * y, 0.3), 0, 1).astype(np.float32)
    custom = [0.9, 0.1, 0.25, 0.5, 0.75]  # unsorted on purpose (ref sorts)
    thr = np.asarray(auc_thresholds(thresholds=custom))
    assert thr.shape == (7,) and thr[0] < 0 and thr[-1] > 1
    assert np.all(np.diff(thr) > 0)
    state = auc_update(auc_init(thresholds=custom), jnp.asarray(y),
                       jnp.asarray(p), thresholds=custom)
    for curve in ("ROC", "PR"):
        got = float(auc_result(state, curve=curve))
        want = keras_auc_oracle_full(y, p, curve=curve, thresholds=custom)
        assert abs(got - want) < 1e-5, (curve, got, want)


def test_auc_invalid_args_raise():
    import pytest

    state = auc_init(10)
    with pytest.raises(ValueError, match="curve"):
        auc_result(state, curve="nope")
    with pytest.raises(ValueError, match="summation"):
        auc_result(state, summation_method="nope")


def test_pr_auc_close_to_sklearn():
    """The Davis & Goadrich interpolation approximates sklearn AP."""
    from sklearn.metrics import average_precision_score

    rng = np.random.default_rng(3)
    y = (rng.uniform(size=5000) < 0.5).astype(np.float32)
    p = np.clip(rng.normal(0.4 + 0.25 * y, 0.3), 0, 1).astype(np.float32)
    state = auc_update(auc_init(), jnp.asarray(y), jnp.asarray(p))
    got = float(auc_result(state, curve="PR"))
    want = average_precision_score(y, p)
    assert abs(got - want) < 5e-3


def test_weight_masking():
    y = np.array([1, 0, 1, 0], np.float32)
    p = np.array([0.9, 0.1, 0.8, 0.2], np.float32)
    w = np.array([1, 1, 0, 0], np.float32)
    s_masked = auc_update(auc_init(), jnp.asarray(y), jnp.asarray(p), jnp.asarray(w))
    s_sub = auc_update(auc_init(), jnp.asarray(y[:2]), jnp.asarray(p[:2]))
    assert np.allclose(np.asarray(s_masked.true_positives), np.asarray(s_sub.true_positives))
    assert abs(float(auc_result(s_masked)) - float(auc_result(s_sub))) < 1e-6
