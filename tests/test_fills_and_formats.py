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


# ---------------------------------------------------------------------------
# scale-safe (range-partitioned two-pass) order-dependent fills
# ---------------------------------------------------------------------------

def _fill_frame(spark, n=20_000, seed=7):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "rid": np.arange(n, dtype="int64"),
            "okey": rng.permutation(n).astype("float64"),
            "v": rng.normal(size=n),
        }
    )
    pdf.loc[rng.random(n) < 0.3, "v"] = np.nan
    # null order keys exercise the nulls-first bucket-0 routing
    pdf.loc[rng.random(n) < 0.01, "okey"] = np.nan
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize("strategy", ["forward", "backward", "interpolate"])
def test_bucketed_fill_matches_global_window(spark, strategy):
    """The range-partitioned two-pass carry must be value-identical (exact,
    including FP) to the single-partition global-window formulation."""
    from pyspark.sql import Window

    from preprocessor_spark.functions import numerical as N

    df = _fill_frame(spark)
    got = (
        N.apply_order_dependent_fills(
            df, {"v": strategy}, order_col="okey", tiebreak_col="rid", num_buckets=16
        )
        .select("rid", "v")
        .toPandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    col = F.col("v")
    if strategy == "forward":
        ref = F.coalesce(col, N.forward_fill_expr(col, "okey", None))
    elif strategy == "backward":
        ref = F.coalesce(col, N.backward_fill_expr(col, "okey", None, tiebreak_col="rid"))
    else:
        ref = N.interpolate_expr(col, "okey", None, tiebreak_col="rid")
    want = (
        df.select("rid", ref.alias("v")).toPandas().sort_values("rid").reset_index(drop=True)
    )
    # exact: same values bit-for-bit, same null positions
    assert got["v"].isna().equals(want["v"].isna())
    a = got["v"].fillna(0.0).to_numpy()
    b = want["v"].fillna(0.0).to_numpy()
    assert (a == b).all()


def test_bucketed_fill_plan_is_parallel(spark):
    """The fill stage must NOT plan Exchange SinglePartition: the windows
    run per range-bucket (hash exchange), which is the property that
    survives a 100× scale-up."""
    from preprocessor_spark.functions import numerical as N
    from preprocessor_spark.plans import formatted_plan

    df = _fill_frame(spark, n=5_000)
    out = N.apply_order_dependent_fills(
        df, {"v": "interpolate"}, order_col="okey", tiebreak_col="rid", num_buckets=16
    )
    plan = formatted_plan(out)
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(__bkt" in plan, plan
    assert "BroadcastHashJoin" in plan, plan  # the P-row carry fix-up


def test_transform_fill_plan_is_parallel_without_partition_by(spark):
    """Preprocessor.transform with an order-dependent fill and NO
    partition_by must plan the bucketed fill, not a single-partition
    window (the round-1 scale-killer)."""
    import numpy as np
    import pandas as pd

    from preprocessor_spark import Preprocessor
    from preprocessor_spark.plans import formatted_plan

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"x": rng.normal(size=3_000), "y": rng.normal(size=3_000)})
    pdf.loc[rng.random(3_000) < 0.2, "x"] = np.nan
    df = spark.createDataFrame(pdf)
    prep = Preprocessor(df, num_fill_null="forward")
    plan = formatted_plan(prep.transform(df))
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(__bkt" in plan, plan


def test_write_partitioned_alignment(spark, sf_dir, tmp_path):
    from preprocessor_spark.sources import write_partitioned

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "part_docs")
    write_partitioned(d, out, ["source"])
    back = spark.read.parquet(out)
    assert back.count() == d.count()
    # exactly one data file per partition directory
    import glob
    for p in glob.glob(f"{out}/source=*"):
        files = [f for f in glob.glob(f"{p}/*.parquet")]
        assert len(files) == 1, p
    # sharded variant: at most files_per_partition files per directory
    out2 = str(tmp_path / "part_docs_sharded")
    write_partitioned(d, out2, ["source"], files_per_partition=3)
    assert spark.read.parquet(out2).count() == d.count()
    for p in glob.glob(f"{out2}/source=*"):
        assert 1 <= len(glob.glob(f"{p}/*.parquet")) <= 3, p


def test_compact_parquet(spark, sf_dir, tmp_path):
    from preprocessor_spark.sources import compact_parquet

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frag = str(tmp_path / "fragmented")
    d.repartition(40).write.parquet(frag)
    assert len(spark.read.parquet(frag).inputFiles()) == 40
    dest = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, dest)
    assert n == 1  # tiny dataset fits one target file
    assert len(spark.read.parquet(dest).inputFiles()) == 1
    assert spark.read.parquet(dest).count() == d.count()


def test_read_parquet_merge_schema(spark, tmp_path):
    from preprocessor_spark.sources import read_parquet

    base = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id bigint, s string").write.parquet(f"{base}/p=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, s string, score double"
    ).write.parquet(f"{base}/p=2")
    merged = read_parquet(spark, base, merge_schema=True)
    assert set(merged.columns) == {"id", "s", "score", "p"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_write_jsonl_roundtrip(spark, sf_dir, tmp_path):
    from preprocessor_spark.sources import write_jsonl

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "source", "text")
    out = str(tmp_path / "corpus_jsonl")
    write_jsonl(d, out, num_shards=4)
    files = [f for f in spark.read.json(out).inputFiles()]
    assert len(files) == 4
    back = spark.read.json(out)
    assert back.count() == d.count()
    a = {r["doc_id"]: r["text"] for r in d.collect()}
    b = {r["doc_id"]: r["text"] for r in back.collect()}
    assert a == b


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    from preprocessor_spark.plans import formatted_plan
    from preprocessor_spark.sources import read_orc, write_orc

    sdf = spark.range(100).selectExpr("id", "id * 2 AS v", "CAST(id % 3 AS STRING) AS g")
    orc_dir = str(tmp_path / "orc")
    write_orc(sdf, orc_dir)
    back = read_orc(spark, orc_dir)
    assert back.count() == 100
    assert sorted(back.columns) == ["g", "id", "v"]
    assert back.agg(F.sum("v")).collect()[0][0] == sdf.agg(F.sum("v")).collect()[0][0]
    # predicate reaches the ORC scan (same pushdown story as parquet)
    plan = formatted_plan(back.filter(F.col("id") > 50))
    assert "PushedFilters" in plan and "GreaterThan(id,50)" in plan, plan


def test_text_source_line_and_wholefile(spark, tmp_path):
    from preprocessor_spark.sources import read_text

    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_text("solo\n")
    lines = read_text(spark, str(d)).toPandas()["value"].sort_values().tolist()
    assert lines == ["line one", "line two", "solo"]
    whole = read_text(spark, str(d), whole_file=True).toPandas()["value"].tolist()
    assert sorted(whole) == ["line one\nline two\n", "solo\n"]
