"""Coverage for order-dependent fill strategies, the 12-format datetime
probe table, and the CSV/JSON source connectors."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from preprocessor_spark import Preprocessor
from preprocessor_spark.sources import read_csv, read_json


def _prep_roundtrip_values(spark, values, strategy, **kw):
    pdf = pd.DataFrame({"x": values, "k": list(range(len(values)))})
    df = spark.createDataFrame(pdf)
    prep = Preprocessor(df, num_fill_null=strategy, **kw)
    out = prep.transform(df).toPandas().sort_values("k")
    return out["x"].tolist()


def test_fill_forward(spark):
    vals = _prep_roundtrip_values(spark, [1.0, None, None, 4.0, None], "forward")
    assert vals == [1.0, 1.0, 1.0, 4.0, 4.0]


def test_fill_backward(spark):
    vals = _prep_roundtrip_values(spark, [None, 2.0, None, 4.0, None], "backward")
    assert vals == [2.0, 2.0, 4.0, 4.0, None] or (
        vals[:4] == [2.0, 2.0, 4.0, 4.0] and (vals[4] is None or np.isnan(vals[4]))
    )


def test_fill_interpolate(spark):
    vals = _prep_roundtrip_values(spark, [1.0, None, None, 4.0], "interpolate")
    assert vals == [1.0, 2.0, 3.0, 4.0]


def test_fill_literal(spark):
    vals = _prep_roundtrip_values(spark, [1.0, None, 3.0], 99.5)
    assert vals == [1.0, 99.5, 3.0]


def test_fill_zero_one_min_max(spark):
    assert _prep_roundtrip_values(spark, [2.0, None, 4.0], "zero")[1] == 0.0
    assert _prep_roundtrip_values(spark, [2.0, None, 4.0], "one")[1] == 1.0
    assert _prep_roundtrip_values(spark, [2.0, None, 4.0], "min")[1] == 2.0
    assert _prep_roundtrip_values(spark, [2.0, None, 4.0], "max")[1] == 4.0


def test_inf_clamp_then_fill(spark):
    vals = _prep_roundtrip_values(spark, [1.0, float("inf"), 3.0], "mean")
    assert vals[1] == pytest.approx(2.0)  # inf → null → mean(1,3)


@pytest.mark.parametrize(
    "strings,fmt_roundtrip",
    [
        (["2021-03-04 05:06:07", "2021-03-05 06:07:08"], True),
        (["2021-03-04T05:06:07", "2021-03-05T06:07:08"], True),
        (["04/03/2021", "05/03/2021"], True),  # %d/%m/%Y
        (["2021-03", "2021-04"], True),
        (["05:06:07", "06:07:08"], True),  # time-only → 1970-01-01 promotion
    ],
)
def test_datetime_format_probe(spark, strings, fmt_roundtrip):
    pdf = pd.DataFrame({"dat": strings, "x": [1.0, 2.0]})
    df = spark.createDataFrame(pdf)
    prep = Preprocessor(df)
    assert "dat" in prep.datetime_features
    out = prep.transform(df)
    assert dict(out.dtypes)["dat"] == "double"  # float epoch seconds
    if fmt_roundtrip:
        back = prep.inverse_transform(out).toPandas()
        assert sorted(back["dat"].tolist()) == sorted(strings)


def test_datetime_epoch_values(spark):
    pdf = pd.DataFrame({"dat": ["1970-01-01 00:00:10"], "x": [1.0]})
    df = spark.createDataFrame(pdf)
    prep = Preprocessor(df)
    out = prep.transform(df).toPandas()
    assert out["dat"].iloc[0] == pytest.approx(10.0)  # seconds since epoch


def test_csv_json_sources(spark, tmp_path):
    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    sdf = spark.createDataFrame(pdf)
    csv_dir = str(tmp_path / "csv")
    json_dir = str(tmp_path / "json")
    sdf.write.mode("overwrite").option("header", "true").csv(csv_dir)
    sdf.write.mode("overwrite").json(json_dir)

    back_csv = read_csv(spark, csv_dir).toPandas().sort_values("a").reset_index(drop=True)
    assert back_csv["a"].tolist() == [1, 2, 3]
    assert back_csv["b"].tolist() == ["x", "y", "z"]
    back_json = read_json(spark, json_dir).toPandas().sort_values("a").reset_index(drop=True)
    assert back_json["b"].tolist() == ["x", "y", "z"]


def test_asof_forward_direction(spark):
    from preprocessor_spark.operators.asof import asof_join

    left = spark.createDataFrame([("A", 1.0), ("A", 5.0)], "sym string, t double")
    right = spark.createDataFrame([("A", 2.0, 100.0)], "sym string, t double, v double")
    out = asof_join(left, right, on="t", by=["sym"], direction="forward").toPandas()
    out = out.set_index("t")
    assert out.loc[1.0, "r_v"] == 100.0  # next value at/after 1.0
    assert pd.isna(out.loc[5.0, "r_v"])  # nothing after 5.0


def test_partitioned_order_fill(spark):
    """Per-series forward fill with partition_by — the scale path."""
    pdf = pd.DataFrame(
        {
            "series": ["a", "a", "a", "b", "b"],
            "x": [1.0, None, None, 7.0, None],
        }
    )
    df = spark.createDataFrame(pdf)
    prep = Preprocessor(df, num_fill_null="forward", excluded_col=["series"], partition_by=["series"])
    out = prep.transform(df).toPandas().sort_index()
    by_series = out.groupby("series")["x"].apply(list).to_dict()
    assert by_series["a"] == [1.0, 1.0, 1.0]
    assert by_series["b"] == [7.0, 7.0]


def test_backward_fill_tied_keys_with_tiebreak(spark):
    """Duplicate order keys + tiebreak_col: the reverse scan mirrors the
    forward order exactly, so fills at tied rows are deterministic."""
    import pandas as pd

    from preprocessor_spark.functions.numerical import backward_fill_expr, interpolate_expr

    pdf = pd.DataFrame(
        {
            "rid": [0, 1, 2, 3],
            "t": [1, 5, 5, 9],
            "v": [1.0, None, 10.0, 20.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        df.withColumn("bf", backward_fill_expr(F.col("v"), "t", tiebreak_col="rid"))
        .withColumn("interp", interpolate_expr(F.col("v"), "t", tiebreak_col="rid"))
        .toPandas()
        .sort_values("rid")
    )
    # row rid=1 (t=5, null): next non-null at-or-after in (t, rid) order is
    # rid=2's 10.0; interpolation midpoint between 1.0 and 10.0 is 5.5
    assert out.loc[out.rid == 1, "bf"].iloc[0] == 10.0
    assert out.loc[out.rid == 1, "interp"].iloc[0] == pytest.approx(5.5)
