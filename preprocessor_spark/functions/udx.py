"""User-defined extension surface: Python UDTF + grouped-agg pandas UDF.

Completes SURVEY §2.11 (UDF / UDAF / UDTF): the scalar pandas-UDF and
mapInPandas/applyInPandas families live with their operators (signatures,
multimodal, quantile ppf, streaming state); this module holds the two
remaining shapes:

- ``SentenceSplitter`` — a Spark 4 Python **UDTF** (table function): one
  document row in, one row per sentence out, with position and word count.
  UDTFs run row-at-a-time in Python — fine for demo/low-volume lateral
  views; the hot-path equivalent of this exact computation is
  ``sentences_expr`` below (JVM split + posexplode), which is what
  pipelines should use at scale. Both produce identical rows, asserted in
  tests.
- ``weighted_mean_udaf`` — a **grouped-agg pandas UDF** (vectorized UDAF):
  Arrow-batched per group, one scalar out. Used where the aggregate has no
  built-in (here: weight-normalized mean with explicit null policy).
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

_SENTENCE_SPLIT_RE = r"(?<=[.!?])\s+"


@udtf(returnType="pos: int, sentence: string, n_words: int")
class SentenceSplitter:
    """One row per sentence of the input text (order-preserving)."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        for pos, s in enumerate(p for p in re.split(_SENTENCE_SPLIT_RE, text) if p.strip()):
            yield pos, s, len(s.split())


def split_sentences_udtf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Lateral-join the UDTF over a document frame → (id, pos, sentence,
    n_words). The input view name is unique per call (and dropped once the
    returned frame is analyzed), so concurrent callers on one session can't
    clobber each other's view between registration and spark.sql."""
    import uuid

    spark = df.sparkSession
    spark.udtf.register("split_sentences", SentenceSplitter)
    view = f"__udtf_in_{uuid.uuid4().hex}"
    df.select(id_col, text_col).createOrReplaceTempView(view)
    try:
        # spark.sql analyzes eagerly, so the view reference is resolved
        # before we drop it
        return spark.sql(
            f"""
            SELECT i.{id_col}, s.pos, s.sentence, s.n_words
            FROM {view} i, LATERAL split_sentences(i.{text_col}) s
            """
        )
    finally:
        spark.catalog.dropTempView(view)


def sentences_expr(text: Column) -> Column:
    """JVM twin of the UDTF: array of sentences via regex split (codegen,
    zero Python — the form to use on the 100 TB hot path)."""
    return F.filter(
        F.split(text, _SENTENCE_SPLIT_RE), lambda s: F.trim(s) != ""
    )


def split_sentences_native(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """posexplode of ``sentences_expr`` — same output contract as
    ``split_sentences_udtf``, pure JVM."""
    return df.select(
        F.col(id_col),
        F.posexplode(sentences_expr(F.col(text_col))).alias("pos", "sentence"),
    ).withColumn("n_words", F.size(F.split(F.trim(F.col("sentence")), r"\s+")))


@pandas_udf("double")
def weighted_mean_udaf(v: pd.Series, w: pd.Series) -> float:
    """Grouped-agg pandas UDF: Σ(v·w)/Σ(w) over non-null pairs; null when
    the group has no usable weight mass."""
    mask = v.notna() & w.notna()
    denom = w[mask].sum()
    if denom == 0 or not mask.any():
        return None
    return float((v[mask] * w[mask]).sum() / denom)


def grouped_stats_arrow(
    df: DataFrame, group_col: str, value_col: str, weight_col: str
) -> DataFrame:
    """Per-group weighted mean via ``applyInArrow`` (Spark 4): the grouped
    batch arrives as a ``pyarrow.Table`` and leaves as one — no
    pandas materialization on either side, so the Python hop costs one
    Arrow buffer view instead of a Series copy per column. Asserted
    equivalent to the grouped-agg pandas UDAF twin above (tests), which
    remains the reference; this is the lower-overhead form for wide or
    binary-heavy groups.
    """
    import pyarrow as pa

    def _agg(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v, w = table.column(value_col), table.column(weight_col)
        mask = pc.and_(pc.is_valid(v), pc.is_valid(w))
        vv, ww = pc.filter(v, mask), pc.filter(w, mask)
        denom = pc.sum(ww).as_py()
        num = pc.sum(pc.multiply(vv, ww)).as_py()
        mean = None if (denom is None or denom == 0) else num / denom
        return pa.table(
            {
                group_col: [table.column(group_col)[0].as_py()],
                "weighted_mean": pa.array([mean], type=pa.float64()),
                "n": pa.array([len(table)], type=pa.int64()),
            }
        )

    return df.groupBy(group_col).applyInArrow(
        _agg, schema=f"{group_col} string, weighted_mean double, n long"
    )
