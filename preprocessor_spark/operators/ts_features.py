"""tsfresh-style per-series time-series feature extraction, Spark-native.

The reference escapes to the tsfresh library on a pandas-converted table
(`/root/reference/clearbox_preprocessor/preprocessor.py:558-638`). tsfresh is
not available here and, more importantly, that design collects the entire
table to the driver. We re-express the common tsfresh feature set as ONE
``groupBy(id).agg(...)`` pass of built-in JVM expressions — a single shuffle
keyed by the series id, scaling to any number of series — with tsfresh's
``{column}__{feature}`` naming so downstream code ports over.

Order-dependent features (mean_change, mean_abs_change) are computed from a
``lag`` window partitioned by the series id — per-series windows, no global
sort.

Relevance filtering (`extract_relevant_features`, preprocessor.py:629):
tsfresh runs per-feature hypothesis tests against the target on the driver.
The feature matrix is one row per series — inherently small — so we collect
it and keep features whose |Pearson correlation| with the target clears a
threshold; if nothing is relevant we return all features, matching the
reference's fallback (`preprocessor.py:632-636`).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

FEATURES = (
    "mean",
    "median",
    "standard_deviation",
    "variance",
    "minimum",
    "maximum",
    "sum_values",
    "length",
    "abs_energy",
    "root_mean_square",
    "mean_change",
    "mean_abs_change",
)


def _feature_aggs(col: str) -> list:
    c = F.col(col).cast("double")
    d = F.col(f"__diff_{col}")
    return [
        F.mean(c).alias(f"{col}__mean"),
        F.expr(f"percentile(cast(`{col}` as double), 0.5)").alias(f"{col}__median"),
        F.stddev_pop(c).alias(f"{col}__standard_deviation"),
        F.var_pop(c).alias(f"{col}__variance"),
        F.min(c).alias(f"{col}__minimum"),
        F.max(c).alias(f"{col}__maximum"),
        F.sum(c).alias(f"{col}__sum_values"),
        F.count(c).cast("double").alias(f"{col}__length"),
        F.sum(c * c).alias(f"{col}__abs_energy"),
        F.sqrt(F.mean(c * c)).alias(f"{col}__root_mean_square"),
        F.mean(d).alias(f"{col}__mean_change"),
        F.mean(F.abs(d)).alias(f"{col}__mean_abs_change"),
    ]


def extract_ts_features(
    data: DataFrame,
    y=None,
    time: str | None = None,
    column_id: str | None = None,
    relevance_threshold: float = 0.3,
) -> DataFrame:
    """Per-series features over every numeric value column.

    ``y``: optional mapping/dict/list of (id, label) or a dict {id: label}
    used for relevance filtering.
    """
    if time is None:
        raise ValueError("Time column name is required for time-series feature extraction.")
    if column_id is None:
        raise ValueError("column_id is required for per-series feature extraction.")

    value_cols = [
        f.name
        for f in data.schema.fields
        if f.name not in (time, column_id) and isinstance(f.dataType, _NUMERIC_TYPES)
    ]
    if not value_cols:
        raise ValueError("No numeric value columns to extract features from.")

    w = Window.partitionBy(column_id).orderBy(time)
    with_diffs = data.withColumns(
        {
            f"__diff_{c}": F.col(c).cast("double") - F.lag(F.col(c).cast("double")).over(w)
            for c in value_cols
        }
    )
    aggs = []
    for c in value_cols:
        aggs.extend(_feature_aggs(c))
    feats = with_diffs.groupBy(column_id).agg(*aggs)

    if y is None:
        return feats

    # relevance filter, driver-side over the (small) per-series matrix
    y_map = dict(y) if not isinstance(y, dict) else y
    rows = feats.collect()
    if not rows:
        return feats
    feat_names = [c for c in feats.columns if c != column_id]
    labels = []
    matrix: dict[str, list[float]] = {f: [] for f in feat_names}
    for r in rows:
        sid = r[column_id]
        if sid not in y_map:
            continue
        labels.append(float(y_map[sid]))
        for fname in feat_names:
            v = r[fname]
            matrix[fname].append(float(v) if v is not None else float("nan"))

    def _pearson(xs: list[float], ys: list[float]) -> float:
        n = len(xs)
        if n < 2:
            return 0.0
        pairs = [(a, b) for a, b in zip(xs, ys) if not math.isnan(a)]
        if len(pairs) < 2:
            return 0.0
        xs2 = [a for a, _ in pairs]
        ys2 = [b for _, b in pairs]
        mx = sum(xs2) / len(xs2)
        my = sum(ys2) / len(ys2)
        sx = math.sqrt(sum((a - mx) ** 2 for a in xs2))
        sy = math.sqrt(sum((b - my) ** 2 for b in ys2))
        if sx == 0 or sy == 0:
            return 0.0
        return sum((a - mx) * (b - my) for a, b in pairs) / (sx * sy)

    relevant = [f for f in feat_names if abs(_pearson(matrix[f], labels)) >= relevance_threshold]
    if not relevant:  # fallback: all features (preprocessor.py:632-636)
        return feats
    return feats.select(column_id, *relevant)
