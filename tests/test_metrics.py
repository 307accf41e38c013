"""Evaluation metrics — independent reference checks (pair-counting AUC
vs the rank-identity implementation; hand-counted confusion). Cross-engine
parity is covered by the eval_binary_discount DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pytest

from preprocessor_spark.operators.metrics import confusion_metrics, roc_auc


@pytest.fixture(scope="module")
def spark():
    from preprocessor_spark.session import get_spark

    return get_spark("test-metrics")


def _pair_auc(scores, labels):
    """Brute-force pair counting: P(s+ > s-) + 0.5 P(s+ = s-)."""
    pos = [s for s, y in zip(scores, labels) if y]
    neg = [s for s, y in zip(scores, labels) if not y]
    wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_auc_vs_pair_counting_with_ties(spark):
    rng = np.random.default_rng(5)
    labels = (rng.random(400) < 0.4).astype(int)
    # quantized scores -> many ties; positives shifted up
    scores = np.round(rng.normal(labels * 0.8, 1.0) * 4) / 4
    df = spark.createDataFrame(
        [(float(s), int(y)) for s, y in zip(scores, labels)], "s double, y int"
    )
    got = roc_auc(df, "s", "y").collect()[0]
    assert got.n_pos == int(labels.sum()) and got.n_neg == int((1 - labels).sum())
    assert got.auc == pytest.approx(_pair_auc(scores, labels), abs=1e-6)
    assert 0.6 < got.auc < 0.9  # the planted signal is real but noisy


def test_auc_perfect_and_random(spark):
    rows = [(float(i), int(i >= 5)) for i in range(10)]
    df = spark.createDataFrame(rows, "s double, y int")
    assert roc_auc(df, "s", "y").collect()[0].auc == 1.0
    # constant score -> all ties -> 0.5
    const = spark.createDataFrame([(1.0, i % 2) for i in range(10)], "s double, y int")
    assert roc_auc(const, "s", "y").collect()[0].auc == 0.5


def test_auc_degenerate_single_class_null(spark):
    df = spark.createDataFrame([(1.0, 1), (2.0, 1)], "s double, y int")
    got = roc_auc(df, "s", "y").collect()[0]
    assert got.auc is None and got.n_neg == 0


def test_confusion_hand_counted(spark):
    #               score, label   pred@0.5: >=0.5
    rows = [(0.9, 1), (0.8, 0), (0.6, 1), (0.4, 1), (0.3, 0), (0.1, 0), (0.5, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    got = confusion_metrics(df, "s", "y", 0.5).collect()[0]
    assert (got.tp, got.fp, got.tn, got.fn) == (2, 2, 2, 1)
    assert got.precision == pytest.approx(2 / 4)
    assert got.recall == pytest.approx(2 / 3, abs=1e-6)
    assert got.f1 == pytest.approx(4 / 7, abs=1e-6)
    assert got.accuracy == pytest.approx(4 / 7, abs=1e-6)


def test_confusion_zero_denominators_null(spark):
    # nothing predicted positive -> precision NULL, recall 0
    rows = [(0.1, 1), (0.2, 0)]
    df = spark.createDataFrame(rows, "s double, y int")
    got = confusion_metrics(df, "s", "y", 0.9).collect()[0]
    assert got.precision is None
    assert got.recall == 0.0
