"""Z-order (Morton-curve) data clustering — multi-dimensional layout for
scan pruning.

A 100 TB table sorted on one key prunes beautifully on that key and not at
all on any other. Interleaving the bits of several keys into one Morton
value and range-partitioning + sorting on IT gives every interleaved
dimension partial locality: a box predicate on ANY of the dimensions maps
to a bounded set of Z-ranges, so file/row-group min-max stats (which
parquet keeps per column automatically) exclude most of the data. This is
the same layout trick Delta/Iceberg expose as ``OPTIMIZE ZORDER BY`` —
here built from public primitives: a codegen'd bit-interleave expression +
``repartitionByRange`` + ``sortWithinPartitions``.

Two entry points:

- ``zorder_value(cols, bits)``: the raw interleave of the low ``bits`` of
  integer columns — exact, engine-portable arithmetic (the DuckDB oracle
  reproduces it bit-for-bit with the same shifts/masks).
- ``quantize_minmax(df, col, bits)``: maps an arbitrary numeric column
  onto [0, 2^bits) rank space using global min/max (one tiny agg,
  broadcast back) — feed its output to ``zorder_value`` for real layouts
  where keys aren't already small ints.

``zorder_cluster`` materializes the layout: one range exchange on the
Morton value (the same shuffle ANY global re-layout costs), then an
in-partition sort — no Exchange SinglePartition, no driver data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of each column.

    Bit ``i`` of column ``j`` lands at output position ``i * n + j``.
    Plain shift/mask/multiply-by-constant arithmetic: stays inside
    whole-stage codegen and never overflows a long for
    ``bits * n <= 62`` (checked).
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least 2 columns")
    if bits * n > 62:
        raise ValueError(f"bits*n_cols must be <= 62, got {bits * n}")
    cs = [F.col(c).cast("long") if isinstance(c, str) else c.cast("long") for c in cols]
    terms = []
    for j, c in enumerate(cs):
        for i in range(bits):
            # ((c >> i) & 1) << (i*n + j), as multiply by a literal power
            # of two (shiftleft needs a literal shift anyway)
            terms.append(
                F.shiftright(c, i).bitwiseAND(F.lit(1)) * F.lit(1 << (i * n + j)).cast("long")
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The ANSI-SQL twin of ``zorder_value`` — same shifts, same masks —
    so an external engine (the DuckDB oracle, a warehouse) can compute or
    verify the clustering key."""
    n = len(cols)
    terms = [
        f"((({c}) >> {i}) & 1) * {1 << (i * n + j)}"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def quantize_minmax(df: DataFrame, col: str, bits: int = 16) -> DataFrame:
    """Add ``{col}__q``: the column scaled onto [0, 2^bits) by global
    min/max. One scalar agg broadcast back — no data shuffle. Ties/NaNs:
    nulls map to 0 (sort first, prune never)."""
    stats = df.agg(
        F.min(F.col(col).cast("double")).alias("__mn"),
        F.max(F.col(col).cast("double")).alias("__mx"),
    )
    top = float((1 << bits) - 1)
    return df.crossJoin(F.broadcast(stats)).withColumn(
        f"{col}__q",
        F.when(
            F.col("__mx") > F.col("__mn"),
            F.least(
                F.floor(
                    (F.col(col).cast("double") - F.col("__mn"))
                    / (F.col("__mx") - F.col("__mn"))
                    * (top + 1.0)
                ),
                F.lit(top),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    ).drop("__mn", "__mx").fillna({f"{col}__q": 0})


def zorder_cluster(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Re-layout ``df`` clustered on the Morton curve of ``cols`` (columns
    must already be non-negative ints < 2^bits — quantize first
    otherwise). Write the result partitioned-as-is and every interleaved
    column gets useful per-file min/max pruning stats."""
    z = zorder_value(cols, bits).alias("__z")
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
