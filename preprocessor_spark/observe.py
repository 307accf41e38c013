"""In-flight pipeline metrics via the Observation API.

At 100 TB a second "count the nulls" scan costs as much as the transform
itself. ``df.observe`` attaches aggregate metrics to an existing action:
they are computed inside the SAME job (map-side, merged on the driver), so
data-quality counters come for free with whatever write/collect already
runs. This is the batch twin of StreamingQueryListener metrics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_observed_stats(
    df: DataFrame, metrics: dict[str, Column], name: str | None = None
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``; read ``obs.get`` after any
    action on the returned frame has completed."""
    obs = Observation(name) if name else Observation()
    observed = df.observe(obs, *[v.alias(k) for k, v in metrics.items()])
    return observed, obs


def null_count_metrics(df: DataFrame, cols: list[str] | None = None) -> dict[str, Column]:
    """Row count + per-column null counts as observe-ready aggregates."""
    cols = cols or df.columns
    out: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in cols:
        out[f"n_null_{c}"] = F.count(F.when(F.col(c).isNull(), 1))
    return out
