"""CDC apply: MERGE/upsert and SCD2 history tracking as pure DataFrame ops.

A 100 TB corpus is not rebuilt per crawl — deltas are merged in. Lakehouse
formats (Delta/Iceberg/Hudi) ship MERGE INTO; on plain parquet the same
semantics are a keyed outer join, which is what this module provides:

- :func:`merge_upsert` — ``WHEN MATCHED [AND delete] THEN DELETE /
  UPDATE, WHEN NOT MATCHED THEN INSERT``. CDC batches are normally ≪
  target, and Spark cannot broadcast a FULL OUTER join — so the
  ``broadcast_source=True`` (default) path decomposes MERGE into
  (target LEFT-broadcast-JOIN batch → update/delete) ∪ (batch ANTI
  matched-keys → insert): the 100 TB target streams through broadcast
  hash joins with ZERO shuffles of the target (the key-projected semi
  join for matched keys is column-pruned at the scan). With
  ``broadcast_source=False`` (batch ~ target size) it falls back to the
  single full-outer-join formulation, one co-partitioned shuffle each
  side.
- :func:`scd2_apply` — slowly-changing-dimension type 2: updates close the
  current version (``valid_to`` = the update's effective time) and open a
  new one; multiple updates to one key in a single batch chain via one
  keyed window (lead over effective time). History for untouched keys
  passes through untouched.

Both return the NEW table as a DataFrame — writing it back (e.g. via
``sources.compact_parquet`` / partitioned sinks) stays the caller's
choice, mirroring how MERGE INTO separates plan from commit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    delete_col: str | None = None,
    broadcast_source: bool = True,
) -> DataFrame:
    """MERGE semantics over plain DataFrames; returns the merged table with
    the target's schema.

    - matched + ``delete_col`` true → row removed;
    - matched → ``update_cols`` (default: every non-key target column also
      present in source) taken from source, the rest kept;
    - source-only → inserted (missing target columns become NULL);
    - target-only → kept as-is.

    ``keys`` must be unique in ``source`` (CDC batches are deduped to final
    state per key first — enforced here with a fail-fast count check, since
    a duplicate key would silently fan out target rows).
    """
    if not keys:
        raise ValueError("keys must name at least one column")
    dup = source.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError("source has duplicate keys; reduce to final state per key first")

    if update_cols is None:
        update_cols = [
            c for c in target.columns if c not in keys and c in source.columns
        ]
    missing = [c for c in update_cols if c not in source.columns]
    if missing:
        raise ValueError(f"update_cols not in source: {missing}")

    s = source
    if delete_col is None:
        s = s.withColumn("__del", F.lit(False))
    else:
        s = s.withColumn("__del", F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False)))
    s = s.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in update_cols],
        "__del",
        F.lit(True).alias("__in_src"),
    )

    def _cond(left: DataFrame):
        cond = None
        for k in keys:
            c = left[k].eqNullSafe(F.col(f"__k_{k}"))
            cond = c if cond is None else (cond & c)
        return cond

    def _merged_cols(j: DataFrame, matched_only: bool) -> list[Column]:
        out_cols: list[Column] = []
        for c in target.columns:
            if c in keys and not matched_only:
                out_cols.append(F.coalesce(target[c], F.col(f"__k_{c}")).alias(c))
            elif c in update_cols:
                out_cols.append(
                    F.when(F.coalesce(F.col("__in_src"), F.lit(False)), F.col(f"__s_{c}"))
                    .otherwise(target[c])
                    .alias(c)
                )
            else:
                out_cols.append(target[c].alias(c))
        return out_cols

    if not broadcast_source:
        j = target.join(s, _cond(target), "full_outer")
        # delete rows vanish whether matched (remove target row) or
        # source-only (nothing to insert) — one filter covers both branches
        j = j.filter(~F.coalesce(F.col("__del"), F.lit(False)))
        return j.select(*_merged_cols(j, matched_only=False))

    # broadcast path: FULL OUTER cannot broadcast, so decompose.
    # 1. update/delete: every target row through ONE broadcast left join
    upd = (
        target.join(F.broadcast(s), _cond(target), "left")
        .filter(~(F.coalesce(F.col("__in_src"), F.lit(False)) & F.col("__del")))
        .select(*_merged_cols(target, matched_only=True))
    )
    # 2. insert: batch keys absent from the target. The semi join reads a
    # key-only projection of the target (column-pruned scan, no shuffle);
    # its result is ≤ |batch| rows, so the final anti join is tiny.
    # null-safe like every other key comparison in this operator: a NULL
    # source key matching a NULL target key must count as MATCHED here, or
    # the row is applied as an update by join 1 AND re-inserted by join 3 —
    # a duplicate the full-outer path would never produce
    tkeys = target.select(*keys)
    matched_keys = tkeys.join(
        F.broadcast(s.select(*[F.col(f"__k_{k}") for k in keys])),
        [F.col(k).eqNullSafe(F.col(f"__k_{k}")) for k in keys],
        "left_semi",
    ).distinct()
    ins = (
        s.filter(~F.col("__del"))
        .join(
            F.broadcast(matched_keys),
            [F.col(f"__k_{k}").eqNullSafe(F.col(k)) for k in keys],
            "left_anti",
        )
        .select(
            *[
                F.col(f"__k_{c}").alias(c)
                if c in keys
                else F.col(f"__s_{c}").alias(c)
                if c in update_cols
                else F.lit(None).cast(target.schema[c].dataType).alias(c)
                for c in target.columns
            ]
        )
    )
    return upd.unionByName(ins)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked_cols: list[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Type-2 SCD apply; returns the full new history table.

    ``dim`` carries (key, tracked attrs, valid_from, valid_to NULL-open,
    is_current); ``updates`` carries (key, tracked attrs, effective_ts).
    Every update row opens a version at its effective time; the previously
    current version (and each intra-batch predecessor) closes at the next
    version's start. Keys absent from updates pass through. Brand-new keys
    insert their chain directly. One shuffle on the key (window + join);
    the closed-history rows never reshuffle."""
    upd = updates.select(
        F.col(key).alias("__k"),
        *[F.col(c) for c in tracked_cols],
        F.col(effective_col).alias("__eff"),
    )
    w = Window.partitionBy("__k").orderBy("__eff")
    new_rows = upd.withColumn("__next", F.lead("__eff").over(w)).select(
        F.col("__k").alias(key),
        *tracked_cols,
        F.col("__eff").alias(valid_from),
        F.col("__next").alias(valid_to),
        F.col("__next").isNull().alias(current_col),
    )

    first_eff = upd.groupBy(F.col("__k")).agg(F.min("__eff").alias("__first_eff"))
    d = dim.join(F.broadcast(first_eff), dim[key] == F.col("__k"), "left")
    untouched_or_closed = d.select(
        *[
            F.when(
                F.col("__first_eff").isNotNull() & F.col(current_col),
                F.col("__first_eff"),
            )
            .otherwise(F.col(valid_to))
            .alias(valid_to)
            if c == valid_to
            else F.when(
                F.col("__first_eff").isNotNull() & F.col(current_col), F.lit(False)
            )
            .otherwise(F.col(current_col))
            .alias(current_col)
            if c == current_col
            else F.col(c)
            for c in dim.columns
        ]
    )
    return untouched_or_closed.unionByName(new_rows, allowMissingColumns=True)
