"""Round-9 analytics operators: association rules, CUPED, offline CUSUM
changepoint, mutual information, gains/decile table, seasonal decompose,
linear SHAP — each against an independent numpy/textbook reference."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from preprocessor_spark.operators.abtest import cuped_adjusted_means
from preprocessor_spark.operators.changepoint import cusum_changepoint
from preprocessor_spark.operators.hypotests import mutual_information
from preprocessor_spark.operators.itemsets import association_rules
from preprocessor_spark.operators.linreg import ridge_fit_2feature, shapley_linear_2f
from preprocessor_spark.operators.metrics import gains_table
from preprocessor_spark.operators.seasonal import seasonal_decompose


@pytest.fixture(scope="module")
def spark():
    from preprocessor_spark.session import get_spark

    return get_spark("test-round9", cpus=4)


# ---------------------------------------------------------------- rules


def test_association_rules_vs_hand_counts(spark):
    baskets = {
        1: ["a", "b", "c"],
        2: ["a", "b"],
        3: ["a", "c"],
        4: ["b", "c"],
        5: ["a", "b", "c"],
        6: ["d"],
    }
    rows = [(b, i) for b, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r.antecedent, r.consequent): r
        for r in association_rules(df, "basket", "item").collect()
    }
    n = 6
    cnt = {"a": 4, "b": 4, "c": 4, "d": 1}
    pair = {("a", "b"): 3, ("a", "c"): 3, ("b", "c"): 3}
    assert set(out) == {
        (x, y) for x, y in [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
                            ("b", "c"), ("c", "b")]
    }
    r = out[("a", "b")]
    assert r.pair_cnt == 3 and r.cnt_ante == 4 and r.cnt_cons == 4
    assert r.confidence == pytest.approx(3 / 4, abs=1e-6)
    assert r.lift == pytest.approx((3 * 6) / (4 * 4), abs=1e-6)
    assert r.leverage == pytest.approx(3 / 6 - (4 / 6) * (4 / 6), abs=1e-6)
    assert r.conviction == pytest.approx((1 - 4 / 6) / (1 - 3 / 4), abs=1e-6)


def test_association_rules_conviction_null_at_conf_1(spark):
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {(r.antecedent, r.consequent): r for r in
           association_rules(df, "basket", "item").collect()}
    assert out[("x", "y")].confidence == 1.0
    assert out[("x", "y")].conviction is None  # mlxtend inf -> NULL


# ---------------------------------------------------------------- cuped


def test_cuped_matches_numpy(spark):
    rng = np.random.default_rng(9)
    n = 400
    x = rng.normal(50, 10, n)
    noise = rng.normal(0, 5, n)
    variant = np.array(["a", "b"] * (n // 2))
    y = 2.0 * x + noise + np.where(variant == "b", 3.0, 0.0)
    x, y = np.round(x, 4), np.round(y, 4)
    df = spark.createDataFrame(
        [(str(v), float(yy), float(xx)) for v, yy, xx in zip(variant, y, x)],
        "variant string, y double, x double",
    )
    got = {r.variant: r for r in cuped_adjusted_means(df, "variant", "y", "x").collect()}
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    y_adj = y - theta * (x - x.mean())
    for v in ("a", "b"):
        m = variant == v
        assert got[v].mean_raw == pytest.approx(y[m].mean(), abs=1e-5)
        assert got[v].mean_cuped == pytest.approx(y_adj[m].mean(), abs=1e-5)
        assert got[v].var_cuped == pytest.approx(y_adj[m].var(), abs=6e-3)
        assert got[v].theta == pytest.approx(theta, abs=1e-5)
        # the whole point: adjusted variance collapses (corr ~ 0.97)
        assert got[v].var_cuped < 0.2 * got[v].var_raw
        assert got[v].var_reduction_pct > 80.0
    # treatment effect preserved by the adjustment
    assert (got["b"].mean_cuped - got["a"].mean_cuped) == pytest.approx(
        3.0, abs=1.0
    )


# ------------------------------------------------------------ changepoint


def test_cusum_changepoint_finds_planted_shift(spark):
    rng = np.random.default_rng(4)
    series = np.round(
        np.concatenate([rng.normal(10, 0.5, 60), rng.normal(14, 0.5, 40)]), 3
    )
    rows = [("u1", i + 1, float(v)) for i, v in enumerate(series)]
    # a flat series for a second key
    rows += [("u2", i + 1, 5.0) for i in range(20)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    got = {r.key: r for r in cusum_changepoint(df, "k", "t", "v").collect()}
    r = got["u1"]
    assert abs(r.cp_pos - 60) <= 2
    assert r.mean_before == pytest.approx(10.0, abs=0.3)
    assert r.mean_after == pytest.approx(14.0, abs=0.3)
    assert r.shift == pytest.approx(4.0, abs=0.5)
    # numpy twin: argmax |cumsum(x - mean)|
    s = np.cumsum(series - series.mean())[:-1]
    assert r.cp_pos == int(np.argmax(np.abs(s))) + 1
    assert r.s_max == pytest.approx(float(np.max(np.abs(s))), abs=1e-3)
    # flat series: every |S_t| = 0, earliest tie wins
    assert got["u2"].cp_pos == 1 and got["u2"].s_max == 0.0


# ---------------------------------------------------------------- MI


def test_mutual_information_vs_sklearn_formula(spark):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 3, 500)
    b = (a + rng.integers(0, 2, 500)) % 3  # correlated
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(a, b)], "a int, b int"
    )
    got = mutual_information(df, "a", "b").collect()[0]
    # direct formula
    n = len(a)
    mi = 0.0
    ha = hb = 0.0
    import collections

    ca, cb = collections.Counter(a), collections.Counter(b)
    cab = collections.Counter(zip(a, b))
    for (x, y), o in cab.items():
        mi += (o / n) * math.log(o * n / (ca[x] * cb[y]))
    for x, c in ca.items():
        ha -= (c / n) * math.log(c / n)
    for y, c in cb.items():
        hb -= (c / n) * math.log(c / n)
    assert got.mi == pytest.approx(mi, abs=1e-5)
    assert got.h_a == pytest.approx(ha, abs=1e-5)
    assert got.h_b == pytest.approx(hb, abs=1e-5)
    assert got.nmi == pytest.approx(mi / math.sqrt(ha * hb), abs=1e-5)


def test_mutual_information_independent_is_zero(spark):
    rows = [(x, y) for x in range(3) for y in range(4) for _ in range(10)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = mutual_information(df, "a", "b").collect()[0]
    assert got.mi == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------- gains


def test_gains_table_vs_numpy(spark):
    rng = np.random.default_rng(7)
    score = np.round(rng.uniform(0, 1, 1000), 3)
    label = (rng.uniform(0, 1, 1000) < score).astype(int)  # monotone-ish
    df = spark.createDataFrame(
        [(float(s), int(l)) for s, l in zip(score, label)], "s double, y int"
    )
    got = {r.bucket: r for r in gains_table(df, "s", "y", n_buckets=10).collect()}
    assert sum(r.n for r in got.values()) == 1000
    assert sum(r.positives for r in got.values()) == int(label.sum())
    # numpy replay of the tie-group bucketing: distinct scores desc,
    # bucket = ceil(10 * cum/N) of the group's last row
    import collections

    cnt = collections.Counter(score)
    pos = collections.defaultdict(int)
    for s, l in zip(score, label):
        pos[s] += l
    cum = 0
    want_n = collections.defaultdict(int)
    want_p = collections.defaultdict(int)
    for s in sorted(cnt, reverse=True):
        cum += cnt[s]
        b = min(10, math.ceil(10 * cum / 1000))
        want_n[b] += cnt[s]
        want_p[b] += pos[s]
    for b in want_n:
        assert got[b].n == want_n[b] and got[b].positives == want_p[b]
    # top decile must outperform base rate on this monotone label
    assert got[1].lift > 1.3
    # cumulative gain reaches 1 at the last bucket
    assert got[max(got)].cum_gain == pytest.approx(1.0, abs=1e-9)


# ------------------------------------------------------------- seasonal


def _np_seasonal(series, period):
    """numpy replay of statsmodels seasonal_decompose(additive)."""
    n = len(series)
    x = np.asarray(series, dtype=float)
    trend = np.full(n, np.nan)
    if period % 2 == 0:
        h = period // 2
        for t in range(h, n - h):
            trend[t] = (0.5 * x[t - h] + x[t - h + 1 : t + h].sum() + 0.5 * x[t + h]) / period
    else:
        h = (period - 1) // 2
        for t in range(h, n - h):
            trend[t] = x[t - h : t + h + 1].mean()
    det = x - trend
    phases = np.arange(n) % period
    s_raw = np.array([np.nanmean(det[phases == j]) for j in range(period)])
    s = s_raw - s_raw.mean()
    seasonal = s[phases]
    return trend, seasonal, x - trend - seasonal


@pytest.mark.parametrize("period", [6, 7])
def test_seasonal_decompose_vs_numpy(spark, period):
    rng = np.random.default_rng(11)
    n = 90
    t = np.arange(n)
    series = np.round(
        0.05 * t + 2.0 * np.sin(2 * np.pi * t / period) + rng.normal(0, 0.1, n), 4
    )
    df = spark.createDataFrame(
        [("k", i + 1, float(v)) for i, v in enumerate(series)],
        "k string, t int, v double",
    )
    got = {
        r.pos: r
        for r in seasonal_decompose(df, "k", "t", "v", period=period).collect()
    }
    trend, seasonal, resid = _np_seasonal(series, period)
    assert len(got) == n
    for i in range(n):
        r = got[i + 1]
        if math.isnan(trend[i]):
            assert r.trend is None and r.resid is None
        else:
            assert r.trend == pytest.approx(trend[i], abs=1e-5)
            assert r.resid == pytest.approx(resid[i], abs=1e-5)
        assert r.seasonal == pytest.approx(seasonal[i], abs=1e-5)


# ---------------------------------------------------------------- shap


def test_shapley_linear_sums_to_prediction(spark):
    rng = np.random.default_rng(13)
    n = 300
    x1 = np.round(rng.normal(10, 3, n), 4)
    x2 = np.round(rng.normal(-5, 2, n), 4)
    y = np.round(3.0 + 2.0 * x1 - 1.5 * x2 + rng.normal(0, 0.1, n), 4)
    df = spark.createDataFrame(
        [(i, float(a), float(b), float(c)) for i, (a, b, c) in enumerate(zip(x1, x2, y))],
        "id long, x1 double, x2 double, y double",
    )
    top = shapley_linear_2f(df, "x1", "x2", "y", "id", k=20).collect()
    assert len(top) == 20
    fit = ridge_fit_2feature(df, "x1", "x2", "y").collect()[0]
    for r in top:
        # phi_j = theta_j (x_j - mean); baseline + phis == prediction
        assert r.phi_1 == pytest.approx(fit.theta1 * (r.x1 - x1.mean()), abs=1e-4)
        assert r.phi_2 == pytest.approx(fit.theta2 * (r.x2 - x2.mean()), abs=1e-4)
        assert r.prediction == pytest.approx(r.baseline + r.phi_1 + r.phi_2, abs=1e-5)
        # near-noiseless fit: prediction ~ y
        assert r.prediction == pytest.approx(r.y, abs=0.5)
    # rows are the largest |phi_1 + phi_2| — all above the median magnitude
    mag = np.abs(2.0 * (x1 - x1.mean()) - 1.5 * (x2 - x2.mean()))
    floor = np.quantile(mag, 0.85)
    for r in top:
        assert abs(r.phi_1 + r.phi_2) >= floor - 0.5
