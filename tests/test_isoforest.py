"""Isolation forest — planted-outlier and determinism tests (rows-only
graded; see operators/isoforest.py docstring)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from preprocessor_spark.operators.isoforest import (
    _build_tree,
    _c,
    _path_lengths,
    isolation_forest_fit,
    isolation_forest_score,
)


def test_c_normalizer_known_values():
    assert _c(1) == 0.0
    # c(2) = 2*H(1) - 2*(1/2) = 2*... harmonic(1)=1 -> 2-1 = 1 (log-approx
    # form is only asymptotic; just check shape/monotonicity here)
    assert 0.0 < _c(2) < _c(16) < _c(256)


def test_path_lengths_match_scalar_walk():
    """Vectorized mask-partition walk == straight-line per-row recursion."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(128, 3))
    tree = _build_tree(x, np.random.default_rng(2), depth_cap=8)

    def walk(row):
        node, depth = 0, 0
        while True:
            f, t, l, r = tree[node]
            if f < 0:
                return depth + _c(t)
            node = l if row[int(f)] < t else r
            depth += 1

    q = rng.normal(size=(50, 3))
    got = _path_lengths(q, tree)
    want = np.array([walk(r) for r in q])
    np.testing.assert_allclose(got, want, atol=1e-12)


@pytest.fixture(scope="module")
def spark():
    from preprocessor_spark.session import get_spark

    return get_spark("test-isoforest")


@pytest.fixture(scope="module")
def planted(spark):
    """Two tight gaussian clusters + 5 gross outliers far outside."""
    rng = np.random.default_rng(7)
    a = rng.normal(loc=0.0, scale=0.5, size=(500, 2))
    b = rng.normal(loc=8.0, scale=0.5, size=(500, 2))
    outliers = np.array([[40.0, -40.0], [-35.0, 35.0], [50.0, 50.0], [-45.0, -45.0], [0.0, 60.0]])
    rows = [(i, float(x), float(y)) for i, (x, y) in enumerate(np.vstack([a, b, outliers]))]
    return spark.createDataFrame(rows, "id int, x double, y double"), set(range(1000, 1005))


def test_outliers_take_top_scores(spark, planted):
    df, outlier_ids = planted
    model = isolation_forest_fit(df, ["x", "y"], n_trees=100, seed=3)
    scored = isolation_forest_score(df, model).toPandas()
    top5 = set(scored.nlargest(5, "anomaly_score")["id"])
    assert top5 == outlier_ids
    # scores live in (0,1]; bulk of inliers near or below 0.5
    assert scored["anomaly_score"].between(0, 1).all()
    assert scored[~scored.id.isin(outlier_ids)]["anomaly_score"].median() < 0.55
    assert scored[scored.id.isin(outlier_ids)]["anomaly_score"].min() > 0.6


def test_deterministic_across_repartition(spark, planted):
    df, _ = planted
    m1 = isolation_forest_fit(df, ["x", "y"], n_trees=20, seed=5)
    m2 = isolation_forest_fit(df.repartition(17), ["x", "y"], n_trees=20, seed=5)
    s1 = isolation_forest_score(df, m1).toPandas().sort_values("id")
    s2 = isolation_forest_score(df.repartition(9), m2).toPandas().sort_values("id")
    assert s1["anomaly_score"].tolist() == s2["anomaly_score"].tolist()


def test_null_features_score_null_and_plan_shape(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 2.0), (2, None, 3.0), (3, 0.9, 2.1), (4, 1.1, 1.9)],
        "id int, x double, y double",
    )
    model = isolation_forest_fit(df, ["x", "y"], n_trees=10, sample_size=8, seed=1)
    out = isolation_forest_score(df, model)
    pdf = out.toPandas().set_index("id")
    assert math.isnan(pdf.loc[2, "anomaly_score"]) or pdf.loc[2, "anomaly_score"] is None
    assert pdf.drop(index=2)["anomaly_score"].notna().all()
    # zero shuffles: scoring is a pure projection over the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_underdetermined_raises(spark):
    df = spark.createDataFrame([(1.0, None)], "x double, y double")
    with pytest.raises(ValueError, match="usable rows"):
        isolation_forest_fit(df, ["x", "y"])
