"""Document chunking and sequence packing for LLM training pipelines.

**Chunking** splits each document into overlapping token windows (the RAG /
context-window preprocessing step). Implemented as ``posexplode`` over a
per-row ``sequence`` of chunk indices + ``slice`` on the token array — a
purely NARROW plan: no shuffle at any scale, output rows ≈ Σ ceil(n_i /
stride). Engine-portable (DuckDB mirrors with generate_series + list_slice),
so chunk boundaries are reproducible outside Spark.

**Packing** plans how documents fill fixed-size training contexts.
``pack_concat_chop`` is the GPT-style concat-and-chop: documents are laid
end-to-end in a deterministic order and cut every ``ctx_len`` tokens; a
document's pack and offset fall out of an exclusive running token sum —
one window per salt bucket, so the plan is a single keyed shuffle and each
bucket packs independently (buckets ≈ parallelism, deterministic under
repartitioning). ``pack_first_fit`` is the bin-packing variant (first-fit
decreasing inside each bucket) for when documents must not straddle packs —
sequential by nature, so it runs as ``applyInPandas`` per bucket with the
same bucket-level parallelism.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from preprocessor_spark.operators.splits import split_bucket_expr
from preprocessor_spark.operators.text import tokens_expr


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """One row per (doc, chunk): ``chunk_id``, ``n_chunk_tokens``,
    ``chunk_text``. Chunks start every ``stride = chunk_tokens - overlap``
    tokens; the last chunk may be short; empty docs produce no chunks."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = tokens_expr(F.col(text_col))
    n = F.size(toks)
    # ceil((n - overlap)/stride), floored at 1 for short non-empty docs: the
    # last chunk always reaches the final token, and no chunk consists
    # solely of tokens another chunk already covers
    n_chunks = F.when(
        n > 0,
        F.floor(
            (F.greatest(n - F.lit(overlap), F.lit(1)) + F.lit(stride - 1)).cast("bigint")
            / F.lit(stride)
        ),
    ).otherwise(F.lit(0))
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        n_chunks.cast("int").alias("__n_chunks"),
    ).filter(F.col("__n_chunks") > 0)
    # the filter also guards sequence(): Spark's sequence(0, -1) steps
    # BACKWARD ([0, -1]) instead of returning empty, so an empty doc must
    # never reach the explode
    exploded = base.select(
        id_col,
        "__toks",
        F.posexplode(F.sequence(F.lit(0), F.col("__n_chunks") - 1)).alias("chunk_id", "__i"),
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def pack_concat_chop(
    df: DataFrame,
    id_col: str = "doc_id",
    token_count: Column | str = "n_tokens",
    ctx_len: int = 2048,
    buckets: int = 64,
    salt: str = "",
) -> DataFrame:
    """Concat-and-chop packing plan: (id, bucket, pack_id, start_offset,
    n_tokens). Documents are ordered by (bucket, id) — bucket from the
    stable md5 hash, so the layout is deterministic and append-stable per
    bucket — then cut every ``ctx_len`` tokens. ``pack_id`` is globally
    unique as (bucket, local_pack). One keyed shuffle; per-bucket windows."""
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    tc = F.col(token_count) if isinstance(token_count, str) else token_count
    base = df.select(
        F.col(id_col),
        tc.cast("bigint").alias("n_tokens"),
        (split_bucket_expr(F.col(id_col), salt) % buckets).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        "bucket",
        "n_tokens",
        F.floor(cum_before / ctx_len).cast("bigint").alias("pack_id"),
        (cum_before % ctx_len).cast("bigint").alias("start_offset"),
    )


def pack_first_fit(
    df: DataFrame,
    id_col: str = "doc_id",
    token_count: Column | str = "n_tokens",
    ctx_len: int = 2048,
    buckets: int = 64,
    salt: str = "",
) -> DataFrame:
    """First-fit-decreasing bin packing (no document straddles a pack):
    (id, bucket, pack_id, pack_used). Sequential by nature → applyInPandas
    per salt bucket; parallelism = buckets, deterministic (stable sort by
    (-n_tokens, id)). Documents longer than ``ctx_len`` get a singleton
    pack. ``pack_used`` is the bin's total AFTER placing the row's doc."""
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    tc = F.col(token_count) if isinstance(token_count, str) else token_count
    base = df.select(
        F.col(id_col).alias("id"),
        tc.cast("bigint").alias("n_tokens"),
        (split_bucket_expr(F.col(id_col), salt) % buckets).alias("bucket"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", "id"], ascending=[False, True])
        used: list[int] = []  # tokens placed per bin; oversized docs overfill their own
        full: list[bool] = []  # oversized singleton bins never accept more
        assign = []
        for n in pdf["n_tokens"]:
            placed = None
            for i in range(len(used)):
                if not full[i] and used[i] + n <= ctx_len:
                    placed = i
                    break
            if placed is None:
                used.append(0)
                full.append(n > ctx_len)
                placed = len(used) - 1
            used[placed] += n
            assign.append((placed, used[placed]))
        out = pdf.copy()
        out["pack_id"] = [a[0] for a in assign]
        out["pack_used"] = [a[1] for a in assign]
        return out

    schema = "id long, n_tokens long, bucket long, pack_id long, pack_used long"
    packed = base.groupBy("bucket").applyInPandas(_pack, schema=schema)
    return packed.withColumnRenamed("id", id_col)
