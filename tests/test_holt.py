"""Holt linear-trend smoothing — exactness and invariant tests (rows-only
graded; sequential recursion is not SQL-expressible)."""

from __future__ import annotations

import numpy as np
import pytest

from preprocessor_spark.operators.holt import holt_forecast


@pytest.fixture(scope="module")
def spark():
    from preprocessor_spark.session import get_spark

    return get_spark("test-holt")


def test_straight_line_fit_is_exact(spark):
    # on y = 3 + 2t the one-step predictions are exact for ANY alpha/beta:
    # rmse 0, level = last value, trend = slope, forecasts extrapolate
    rows = [("s", t, 3.0 + 2.0 * t) for t in range(20)]
    df = spark.createDataFrame(rows, "k string, o int, v double")
    got = holt_forecast(df, "k", "o", "v", alpha=0.37, beta=0.81, horizon=3).collect()[0]
    assert got.n == 20 and got.rmse == 0.0
    assert got.level == pytest.approx(3.0 + 2.0 * 19)
    assert got.trend == pytest.approx(2.0)
    assert got.forecast == [pytest.approx(3.0 + 2.0 * (19 + h)) for h in (1, 2, 3)]


def test_matches_scalar_reference_recursion(spark):
    rng = np.random.default_rng(17)
    vals = np.round(rng.normal(50, 5, 60) + np.arange(60) * 0.4, 3)
    rows = [("s", int(t), float(v)) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, o int, v double")
    a, b = 0.5, 0.3
    got = holt_forecast(df, "k", "o", "v", alpha=a, beta=b, horizon=2).collect()[0]

    lvl, tr, sse = vals[0], vals[1] - vals[0], 0.0
    for t in range(1, len(vals)):
        err = vals[t] - (lvl + tr)
        sse += err * err
        nl = a * vals[t] + (1 - a) * (lvl + tr)
        tr = b * (nl - lvl) + (1 - b) * tr
        lvl = nl
    assert got.level == pytest.approx(lvl, abs=1e-6)
    assert got.trend == pytest.approx(tr, abs=1e-6)
    assert got.rmse == pytest.approx(np.sqrt(sse / 59), abs=1e-6)
    assert got.forecast[1] == pytest.approx(lvl + 2 * tr, abs=1e-5)


def test_unordered_input_and_multiple_keys(spark):
    rng = np.random.default_rng(2)
    rows = []
    for k in ("a", "b"):
        for t in rng.permutation(30):  # arrival order scrambled
            rows.append((k, int(t), float(t) * (1.0 if k == "a" else -2.0)))
    df = spark.createDataFrame(rows, "k string, o int, v double").repartition(7)
    got = {r.k: r for r in holt_forecast(df, "k", "o", "v").collect()}
    assert got["a"].trend == pytest.approx(1.0)
    assert got["b"].trend == pytest.approx(-2.0)
    assert got["a"].rmse == 0.0 and got["b"].rmse == 0.0


def test_short_series_dropped_and_param_validation(spark):
    df = spark.createDataFrame([("x", 1, 1.0)], "k string, o int, v double")
    assert holt_forecast(df, "k", "o", "v").count() == 0
    with pytest.raises(ValueError, match="alpha"):
        holt_forecast(df, "k", "o", "v", alpha=0.0)
    with pytest.raises(ValueError, match="horizon"):
        holt_forecast(df, "k", "o", "v", horizon=0)


def test_holt_stream_equals_batch_after_drain(spark, tmp_path):
    """Streaming twin contract: after an in-order full drain, the
    applyInPandasWithState recursion emits exactly the batch fit."""
    import time

    import pandas as pd

    from preprocessor_spark.streaming import holt_stream, run_available_now

    rng = np.random.default_rng(31)
    rows = []
    for uid in (1, 2, 3):
        base = rng.uniform(10, 20)
        for t in range(40):
            rows.append(
                (
                    uid * 1000 + t,
                    pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=t),
                    uid,
                    "m",
                    float(base + 0.7 * t + rng.normal(0, 1)),
                    "{}",
                )
            )
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    src = str(tmp_path / "holt_events")
    # two time-ordered files -> two micro-batches, state carries across
    early = pdf[pdf.ts < pd.Timestamp("2024-01-01 00:20:00")]
    late = pdf[pdf.ts >= pd.Timestamp("2024-01-01 00:20:00")]
    spark.createDataFrame(early).coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)  # distinct mtimes keep listing order == event order
    spark.createDataFrame(late).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_available_now(
        holt_stream(stream, "user_id", "ts", "value"), "holt_state", output_mode="update"
    )
    out = spark.table("holt_state").toPandas()
    final = out.sort_values("n").groupby("user_id").last().reset_index()

    from preprocessor_spark.operators.holt import holt_forecast

    batch = (
        holt_forecast(spark.createDataFrame(pdf), "user_id", "ts", "value")
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == 3
    for _, r in final.iterrows():
        b = batch.loc[r.user_id]
        assert (r.n, r.level, r.trend, r.rmse) == (b.n, b.level, b.trend, b.rmse)
        assert list(r.forecast) == list(b.forecast)
