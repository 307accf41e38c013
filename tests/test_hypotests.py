"""Hypothesis-test operators — independent numpy reference checks.

Each test recomputes the statistic by a DIFFERENT path than the operator
(full materialized ranks instead of count-collapsed cumsums, an explicit
expected-count matrix instead of the o²/e identity, textbook two-pass
variance instead of moment algebra), so a shared algebra bug can't pass.
Cross-engine value parity is covered by the DuckDB oracles in
tests/test_queries.py (welch_ttest_shipmodes, chi2_shipmode_returnflag,
mannwhitney_quantity_modes)."""

from __future__ import annotations

import numpy as np
import pytest

from preprocessor_spark.operators.hypotests import (
    chi2_independence,
    mann_whitney_u,
    welch_ttest,
)


@pytest.fixture(scope="module")
def spark():
    from preprocessor_spark.session import get_spark

    return get_spark("test-hypotests")


def test_welch_vs_textbook_two_pass(spark):
    rng = np.random.default_rng(11)
    a = np.round(rng.normal(10.0, 2.0, 300), 4)
    b = np.round(rng.normal(10.8, 3.5, 200), 4)
    rows = [("a", float(x)) for x in a] + [("b", float(x)) for x in b]
    df = spark.createDataFrame(rows, "g string, x double")
    got = welch_ttest(df, "x", "g", "a", "b").collect()[0]

    # textbook path: explicit means, explicit squared deviations
    ma, mb = a.mean(), b.mean()
    va, vb = a.var(ddof=1), b.var(ddof=1)
    sea, seb = va / len(a), vb / len(b)
    t = (ma - mb) / np.sqrt(sea + seb)
    dof = (sea + seb) ** 2 / (sea**2 / (len(a) - 1) + seb**2 / (len(b) - 1))

    assert got.n_a == 300 and got.n_b == 200
    assert got.mean_a == pytest.approx(ma, abs=1e-6)
    assert got.var_a == pytest.approx(va, abs=1e-5)
    assert got.t_stat == pytest.approx(t, abs=1e-6)
    assert got.welch_df == pytest.approx(dof, abs=1e-4)


def test_welch_overflow_certificate_raises(spark):
    # |x| >= 1e14 overflows the DECIMAL(18,4) moment cast to NULL under
    # non-ANSI Spark; the pre/post-cast count certificate must raise
    # instead of silently dropping the row from n / sum x / sum x^2
    # under ANSI Spark (4.x default) the cast itself raises
    # NUMERIC_VALUE_OUT_OF_RANGE — equally loud; the certificate covers
    # the non-ANSI silent-NULL mode
    rows = [("a", 1.0), ("a", 2.0), ("a", 1.0e15), ("b", 3.0), ("b", 4.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    with pytest.raises(
        Exception, match="welch_ttest|NUMERIC_VALUE_OUT_OF_RANGE|1e14"
    ):
        welch_ttest(df, "x", "g", "a", "b").collect()
    # and the certificate path itself, with the cast forced non-ANSI
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="welch_ttest"):
            welch_ttest(df, "x", "g", "a", "b").collect()
    finally:
        spark.conf.unset("spark.sql.ansi.enabled")


def test_welch_identical_groups_t_zero(spark):
    rows = [("a", float(v)) for v in (1, 2, 3, 4, 5)] + [
        ("b", float(v)) for v in (1, 2, 3, 4, 5)
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    got = welch_ttest(df, "x", "g", "a", "b").collect()[0]
    assert got.t_stat == 0.0
    assert got.mean_a == got.mean_b == 3.0
    assert got.welch_df == pytest.approx(8.0, abs=1e-9)  # equal n, equal var


def test_chi2_vs_explicit_expected_matrix(spark):
    rng = np.random.default_rng(4)
    # dependent columns: b leans with a
    rows = []
    for _ in range(2000):
        a = int(rng.integers(0, 3))
        p = [0.6, 0.3, 0.1] if a == 0 else ([0.2, 0.5, 0.3] if a == 1 else [0.1, 0.2, 0.7])
        b = int(rng.choice(3, p=p))
        rows.append((f"a{a}", f"b{b}"))
    df = spark.createDataFrame(rows, "a string, b string")
    got = chi2_independence(df, "a", "b").collect()[0]

    # reference: full observed + expected matrices, (o-e)^2/e summed
    obs = np.zeros((3, 3))
    for a, b in rows:
        obs[int(a[1]), int(b[1])] += 1
    e = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = ((obs - e) ** 2 / e).sum()
    v = np.sqrt(chi2 / (obs.sum() * 2))

    assert got.n == 2000 and got.dof == 4
    assert got.chi2 == pytest.approx(chi2, abs=1e-6)
    assert got.cramers_v == pytest.approx(v, abs=1e-6)
    assert got.chi2 > 100  # planted dependence is gross


def test_chi2_absent_cell_counted(spark):
    # a=x never co-occurs with b=q: the o=0 cell must still contribute e
    rows = [("x", "p")] * 10 + [("y", "p")] * 10 + [("y", "q")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    got = chi2_independence(df, "a", "b").collect()[0]
    obs = np.array([[10.0, 0.0], [10.0, 10.0]])
    e = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / obs.sum()
    chi2 = ((obs - e) ** 2 / e).sum()
    assert got.cells == 3  # only observed combos materialize
    assert got.chi2 == pytest.approx(chi2, abs=1e-9)


def test_mannwhitney_vs_materialized_ranks(spark):
    rng = np.random.default_rng(9)
    a = rng.integers(1, 20, 400).astype(float)  # heavy ties
    b = (rng.integers(1, 20, 300) + 2).astype(float)
    rows = [("a", float(x)) for x in a] + [("b", float(x)) for x in b]
    df = spark.createDataFrame(rows, "g string, x double")
    got = mann_whitney_u(df, "x", "g", "a", "b").collect()[0]

    # reference: materialize midranks over the pooled sample
    pooled = np.concatenate([a, b])
    order = pooled.argsort(kind="stable")
    ranks = np.empty(len(pooled))
    i = 0
    sorted_v = pooled[order]
    while i < len(pooled):
        j = i
        while j < len(pooled) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # midrank
        i = j
    r_a = ranks[: len(a)].sum()
    u_a = r_a - len(a) * (len(a) + 1) / 2.0
    u_b = len(a) * len(b) - u_a
    n = len(pooled)
    _, t_counts = np.unique(pooled, return_counts=True)
    tie = float((t_counts.astype(object) ** 3 - t_counts).sum())
    var_u = len(a) * len(b) / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z = (u_a - len(a) * len(b) / 2.0) / np.sqrt(var_u)

    assert got.n_a == 400 and got.n_b == 300
    assert got.u_a == u_a and got.u_b == u_b  # exact integers at x2 scale
    assert got.z == pytest.approx(z, abs=1e-6)


def test_mannwhitney_all_tied_z_null(spark):
    rows = [("a", 5.0)] * 4 + [("b", 5.0)] * 6
    df = spark.createDataFrame(rows, "g string, x double")
    got = mann_whitney_u(df, "x", "g", "a", "b").collect()[0]
    assert got.u_a == got.u_b == 12.0  # n_a*n_b/2 under total ties
    assert got.z is None  # zero variance -> no z

def test_mannwhitney_plan_no_single_partition_on_data(spark):
    rng = np.random.default_rng(2)
    rows = [("a" if rng.random() < 0.5 else "b", float(rng.integers(0, 50))) for _ in range(500)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = mann_whitney_u(df, "x", "g", "a", "b")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the only allowed SinglePartition feeds the 1-row final agg, never a
    # window over the distinct-value frame
    assert "Window" not in plan or "SinglePartition" not in plan.split("Window")[1][:400]
    got = out.collect()[0]
    assert got.n_a + got.n_b == 500
