"""One-pass distributed ridge regression (operators/linreg.py): numpy
closed-form parity, OLS-equals-lstsq at λ=0, null handling, the engine-
exact 2-feature path vs the general solver, and repartition stability.
(The graded query's DuckDB oracle runs via tests/test_queries.py.)"""

import numpy as np
import pytest

from preprocessor_spark.operators.linreg import ridge_fit, ridge_fit_2feature


@pytest.fixture(scope="module")
def spark():
    from preprocessor_spark.session import get_spark

    return get_spark("test-linreg", cpus=4)


def _data(n=400, seed=2):
    rng = np.random.default_rng(seed)
    x1 = np.round(rng.uniform(0, 50, n), 2)
    x2 = np.round(rng.uniform(0, 0.1, n), 2)
    y = np.round(3.0 + 2.5 * x1 - 40.0 * x2 + rng.normal(0, 2, n), 2)
    return x1, x2, y


def _df(spark, x1, x2, y):
    # .tolist(): PySpark rejects numpy.float64 in createDataFrame rows
    return spark.createDataFrame(
        list(zip(x1.tolist(), x2.tolist(), y.tolist())),
        "x1 double, x2 double, y double",
    )


def _ridge_closed_form(X, y, l2):
    n, p = X.shape
    Xb = np.column_stack([np.ones(n), X])
    A = Xb.T @ Xb
    A[1:, 1:] += l2 * np.eye(p)
    return np.linalg.solve(A, Xb.T @ y)


def test_ols_matches_lstsq(spark):
    x1, x2, y = _data()
    df = _df(spark, x1, x2, y)
    fit = ridge_fit(df, ["x1", "x2"], "y", l2=0.0)
    Xb = np.column_stack([np.ones(len(x1)), x1, x2])
    ref, *_ = np.linalg.lstsq(Xb, y, rcond=None)
    assert fit["intercept"] == pytest.approx(ref[0], rel=1e-9)
    assert fit["coef"][0] == pytest.approx(ref[1], rel=1e-9)
    assert fit["coef"][1] == pytest.approx(ref[2], rel=1e-9)
    # residual-derived stats match the direct computation
    resid = y - Xb @ ref
    assert fit["rmse"] == pytest.approx(np.sqrt((resid**2).mean()), rel=1e-9)
    ss_tot = ((y - y.mean()) ** 2).sum()
    assert fit["r2"] == pytest.approx(1 - (resid**2).sum() / ss_tot, rel=1e-9)


def test_ridge_matches_closed_form_and_shrinks(spark):
    x1, x2, y = _data()
    df = _df(spark, x1, x2, y)
    lam = 500.0
    fit = ridge_fit(df, ["x1", "x2"], "y", l2=lam)
    ref = _ridge_closed_form(np.column_stack([x1, x2]), y, lam)
    assert fit["intercept"] == pytest.approx(ref[0], rel=1e-9)
    assert fit["coef"] == pytest.approx(list(ref[1:]), rel=1e-9)
    ols = ridge_fit(df, ["x1", "x2"], "y", l2=0.0)
    # L2 shrinks the coefficient norm
    assert np.hypot(*fit["coef"]) < np.hypot(*ols["coef"])


def test_2feature_expression_path_equals_general(spark):
    x1, x2, y = _data(seed=5)
    df = _df(spark, x1, x2, y)
    lam = 100.0
    row = ridge_fit_2feature(df, "x1", "x2", "y", l2=lam).collect()[0]
    fit = ridge_fit(df, ["x1", "x2"], "y", l2=lam)
    assert row["theta0"] == pytest.approx(fit["intercept"], rel=1e-12)
    assert row["theta1"] == pytest.approx(fit["coef"][0], rel=1e-12)
    assert row["theta2"] == pytest.approx(fit["coef"][1], rel=1e-12)
    assert row["r2"] == pytest.approx(fit["r2"], rel=1e-9)
    assert row["rmse"] == pytest.approx(fit["rmse"], rel=1e-9)
    assert row["n"] == len(x1)


def test_nulls_dropped_rowwise(spark):
    df = spark.createDataFrame(
        [
            (1.0, 1.0, 10.0),
            (2.0, None, 20.0),
            (3.0, 2.0, None),
            (4.0, 3.0, 40.0),
            (5.0, 1.5, 50.0),
        ],
        "x1 double, x2 double, y double",
    )
    fit = ridge_fit(df, ["x1", "x2"], "y", l2=0.0)
    assert fit["n"] == 3  # only fully-populated rows enter the Gram matrix


def test_repartition_exactness(spark):
    """Decimal accumulation makes the fit bit-identical under any physical
    partitioning — the property that lets the query carry a value oracle."""
    x1, x2, y = _data(seed=7)
    df = _df(spark, x1, x2, y)
    a = ridge_fit_2feature(df, "x1", "x2", "y", l2=100.0).collect()[0]
    b = ridge_fit_2feature(
        df.repartition(17), "x1", "x2", "y", l2=100.0
    ).collect()[0]
    assert tuple(a) == tuple(b)


def test_underdetermined_raises(spark):
    df = spark.createDataFrame([(1.0, 2.0, 3.0)], "x1 double, x2 double, y double")
    with pytest.raises(ValueError, match="rows <"):
        ridge_fit(df, ["x1", "x2"], "y")


def test_magnitude_overflow_raises(spark):
    """|x| >= 1e12 overflows the DECIMAL(18,6) moment cast. Under ANSI
    (Spark 4 default) the cast itself errors loudly; under non-ANSI it
    yields NULL and the n/n_raw guard raises instead. Either way the fit
    must refuse rather than silently drop the row (ADVICE round 7)."""
    rows = [(1.0e13, 1.0, 2.0), (2.0, 3.0, 4.0), (5.0, 6.0, 7.0), (8.0, 9.0, 10.0)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    loud = "1e12|NUMERIC_VALUE_OUT_OF_RANGE"
    with pytest.raises(Exception, match=loud):
        ridge_fit(df, ["x1", "x2"], "y")
    with pytest.raises(Exception, match=loud):
        ridge_fit_2feature(df, "x1", "x2", "y").collect()
    # non-ANSI: the NULL-drop path must hit the n/n_raw guard
    ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(ValueError, match="1e12"):
            ridge_fit(df, ["x1", "x2"], "y")
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi)


def test_grouped_ols_vs_numpy_per_group(spark):
    import numpy as np
    from preprocessor_spark.operators.linreg import grouped_ols

    rng = np.random.default_rng(21)
    rows = []
    truth = {"a": (2.0, 5.0), "b": (-1.5, 30.0), "c": (0.0, 7.0)}
    for g, (b, a) in truth.items():
        x = np.round(rng.uniform(0, 50, 200), 2)
        y = np.round(a + b * x + rng.normal(0, 3, 200), 2)
        rows += [(g, float(xi), float(yi)) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in grouped_ols(df, ["g"], "x", "y").collect()}
    for g in truth:
        xs = np.array([x for gg, x, _ in rows if gg == g])
        ys = np.array([y for gg, _, y in rows if gg == g])
        b_ref, a_ref = np.polyfit(xs, ys, 1)
        r_ref = np.corrcoef(xs, ys)[0, 1] ** 2
        r = got[g]
        assert r.n == 200 and r.n_overflow == 0
        assert r.slope == pytest.approx(b_ref, abs=1e-4)
        assert r.intercept == pytest.approx(a_ref, abs=1e-3)
        assert r.r2 == pytest.approx(r_ref, abs=1e-6)


def test_grouped_ols_degenerate_groups_null(spark):
    from preprocessor_spark.operators.linreg import grouped_ols

    rows = [
        ("one", 1.0, 5.0),            # single point -> NULL fit
        ("const", 2.0, 1.0), ("const", 2.0, 9.0),  # zero x-variance -> NULL
        ("ok", 0.0, 0.0), ("ok", 1.0, 2.0), ("ok", 2.0, 4.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in grouped_ols(df, ["g"], "x", "y").collect()}
    assert got["one"].slope is None and got["const"].slope is None
    assert got["ok"].slope == pytest.approx(2.0) and got["ok"].r2 == pytest.approx(1.0)
