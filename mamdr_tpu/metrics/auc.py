"""Streaming ROC-AUC on device, matching the reference's vendored Keras metric.

The reference evaluates every domain with a 500-threshold streaming AUC
(reference utils/auc.py:16, thresholds at utils/auc.py:110-126, confusion
matrix semantics utils/metrics_utils.py:194-214, interpolation summation
utils/auc.py:249-281; call sites pass num_thresholds=500, e.g.
model_zoo/DeepCTR/deepctr.py:60). Published AUC numbers depend on this exact
bucketing — sklearn's exact AUC differs in the 3rd decimal — so we reproduce
the math bit-for-bit:

  thresholds = [-eps] + [(i+1)/(T-1) for i in range(T-2)] + [1+eps]
  tp[t] = sum(w * (pred >  thr[t]) * (label == 1))  (fp/tn/fn analogous)
  recall = tp/(tp+fn); fpr = fp/(fp+tn)             (div_no_nan)
  auc = sum((fpr[:-1]-fpr[1:]) * (recall[:-1]+recall[1:])/2)

The whole update is jit-friendly (a [T,B] boolean contraction on the VPU) and
the state is four f32 vectors, so it can live inside `lax.scan` eval loops
with zero host sync until the final `auc_result` read.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_K_EPSILON = 1e-7  # Keras backend epsilon (reference utils/auc.py:126)


class AucState(NamedTuple):
    true_positives: jax.Array   # [T]
    true_negatives: jax.Array   # [T]
    false_positives: jax.Array  # [T]
    false_negatives: jax.Array  # [T]


def auc_thresholds(num_thresholds: int = 500, thresholds=None) -> jax.Array:
    """Threshold vector incl. the +/- epsilon endpoints (utils/auc.py:110-126).

    ``thresholds``: optional explicit list of values in [0,1]; when given it
    overrides ``num_thresholds`` (reference utils/auc.py:110-113 — the
    supplied values are sorted and the two epsilon endpoints appended).
    """
    if thresholds is not None:
        inner = sorted(float(t) for t in thresholds)
    else:
        if num_thresholds <= 1:
            raise ValueError("num_thresholds must be > 1")
        inner = [(i + 1) * 1.0 / (num_thresholds - 1)
                 for i in range(num_thresholds - 2)]
    return jnp.asarray([0.0 - _K_EPSILON] + inner + [1.0 + _K_EPSILON], jnp.float32)


def auc_init(num_thresholds: int = 500, thresholds=None) -> AucState:
    n = (len(thresholds) + 2) if thresholds is not None else num_thresholds
    z = jnp.zeros((n,), jnp.float32)
    return AucState(z, z, z, z)


def auc_update(
    state: AucState,
    y_true: jax.Array,
    y_pred: jax.Array,
    weight: jax.Array | None = None,
    num_thresholds: int = 500,
    thresholds=None,
) -> AucState:
    """Accumulate confusion-matrix counts for a batch.

    y_true/y_pred: [B] (or any shape, flattened); weight: same shape or None.
    Semantics per reference utils/metrics_utils.py:203-207:
    positive prediction is ``pred > threshold`` (strict).
    """
    thr = auc_thresholds(num_thresholds, thresholds)
    y_true = jnp.ravel(y_true).astype(jnp.float32)
    y_pred = jnp.ravel(y_pred).astype(jnp.float32)
    w = jnp.ones_like(y_pred) if weight is None else jnp.ravel(weight).astype(jnp.float32)

    label_pos = y_true > 0.5                      # [B]
    pred_pos = y_pred[None, :] > thr[:, None]     # [T, B]

    wp = jnp.where(label_pos, w, 0.0)             # weights of positive-label rows
    wn = jnp.where(label_pos, 0.0, w)

    tp = jnp.sum(jnp.where(pred_pos, wp[None, :], 0.0), axis=1)
    fn = jnp.sum(jnp.where(pred_pos, 0.0, wp[None, :]), axis=1)
    fp = jnp.sum(jnp.where(pred_pos, wn[None, :], 0.0), axis=1)
    tn = jnp.sum(jnp.where(pred_pos, 0.0, wn[None, :]), axis=1)

    return AucState(
        state.true_positives + tp,
        state.true_negatives + tn,
        state.false_positives + fp,
        state.false_negatives + fn,
    )


def _div_no_nan(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.where(b == 0.0, 0.0, a / jnp.where(b == 0.0, 1.0, b))


def interpolate_pr_auc(state: AucState) -> jax.Array:
    """PR-AUC via the Davis & Goadrich 2006 closed-form interpolation
    (reference utils/auc.py:179-246): TP and P=TP+FP vary linearly within
    each threshold interval, giving per-interval area
    ``slope * (dTP + intercept * log(P_hi/P_lo)) / total_pos``."""
    tp, fp, fn = state.true_positives, state.false_positives, state.false_negatives
    dtp = tp[:-1] - tp[1:]
    p = tp + fp
    dp = p[:-1] - p[1:]
    prec_slope = _div_no_nan(dtp, jnp.maximum(dp, 0.0))
    intercept = tp[1:] - prec_slope * p[1:]
    safe_p_ratio = jnp.where(
        (p[:-1] > 0) & (p[1:] > 0),
        _div_no_nan(p[:-1], jnp.maximum(p[1:], 0.0)),
        jnp.ones_like(p[1:]),
    )
    return jnp.sum(
        _div_no_nan(
            prec_slope * (dtp + intercept * jnp.log(safe_p_ratio)),
            jnp.maximum(tp[1:] + fn[1:], 0.0),
        )
    )


def auc_result(
    state: AucState,
    curve: str = "ROC",
    summation_method: str = "interpolation",
) -> jax.Array:
    """AUC via Riemann summation (reference utils/auc.py:248-281).

    curve: 'ROC' (x=FPR, y=recall) or 'PR' (x=recall, y=precision).
    summation_method: 'interpolation' (midpoint; for PR it switches to the
    Davis & Goadrich closed form, utils/auc.py:249-253), 'minoring' (lower
    bound: min of interval endpoints), 'majoring' (upper bound: max).
    """
    curve = curve.upper()
    summation_method = summation_method.lower()
    if curve not in ("ROC", "PR"):
        raise ValueError(f"invalid curve {curve!r}; options: ROC, PR")
    if summation_method not in ("interpolation", "minoring", "majoring"):
        raise ValueError(
            f"invalid summation method {summation_method!r}; "
            "options: interpolation, minoring, majoring"
        )
    if curve == "PR" and summation_method == "interpolation":
        return interpolate_pr_auc(state)
    recall = _div_no_nan(
        state.true_positives, state.true_positives + state.false_negatives
    )
    if curve == "ROC":
        x = _div_no_nan(
            state.false_positives, state.false_positives + state.true_negatives
        )
        y = recall
    else:  # PR
        x = recall
        y = _div_no_nan(
            state.true_positives, state.true_positives + state.false_positives
        )
    if summation_method == "interpolation":
        heights = (y[:-1] + y[1:]) / 2.0
    elif summation_method == "minoring":
        heights = jnp.minimum(y[:-1], y[1:])
    else:  # majoring
        heights = jnp.maximum(y[:-1], y[1:])
    return jnp.sum((x[:-1] - x[1:]) * heights)
