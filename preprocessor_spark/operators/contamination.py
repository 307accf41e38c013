"""Benchmark decontamination: flag/drop training documents that overlap an
evaluation set.

The standard recipe (public: GPT-3 appendix C, The Pile, FineWeb): a
training doc is contaminated if it shares >= ``min_hits`` distinct word
``ngram``-grams with any benchmark document. Spark shape:

- benchmark side: distinct n-grams of the (small) eval corpus — broadcast;
- corpus side: explode each doc's distinct n-grams (narrow), equi-join
  against the broadcast benchmark grams, count distinct hits per doc.

One narrow explode + one broadcast join + one keyed groupBy — the corpus
is scanned once and nothing corpus-sized is ever shuffled except matched
(doc_id, gram) pairs, which contamination makes rare by construction.

N-grams join on a hash, not the string: ``xxhash64`` (fast, default) or
``md5_64`` (engine-portable — DuckDB reproduces it bit-for-bit, used by
the oracle-checked query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from preprocessor_spark.operators.text import tokens_expr


def _gram_hash(gram: Column, hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.xxhash64(gram)
    if hash_fn == "md5_64":
        # first 8 md5 hex chars as int64 — engines agree byte-for-byte
        return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("bigint")
    raise ValueError(f"hash_fn must be xxhash64 or md5_64, got {hash_fn!r}")


def ngram_hashes_expr(text: Column, ngram: int, hash_fn: str = "xxhash64") -> Column:
    """Distinct hashed word n-grams of a document (lowercased tokens)."""
    toks = F.transform(tokens_expr(text), lambda t: F.lower(t))
    n_grams = F.greatest(F.size(toks) - F.lit(ngram - 1), F.lit(0))
    grams = F.when(
        n_grams > 0,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: _gram_hash(F.concat_ws(" ", F.slice(toks, i, ngram)), hash_fn),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return F.array_distinct(grams)


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    ngram: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, n_contaminated_grams) for every doc sharing >=1 n-gram with the
    benchmark. Docs with zero hits are absent (join them back as clean)."""
    bench_text_col = bench_text_col or text_col
    bench_grams = (
        benchmark.select(
            F.explode(ngram_hashes_expr(F.col(bench_text_col), ngram, hash_fn)).alias("__g")
        )
        .distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(ngram_hashes_expr(F.col(text_col), ngram, hash_fn)).alias("__g")
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    ngram: int = 8,
    min_hits: int = 1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Drop contaminated documents (>= ``min_hits`` shared distinct
    n-grams): one left-anti join against the hit table."""
    hits = contamination_hits(
        docs, benchmark, id_col, text_col, bench_text_col, ngram, hash_fn
    ).filter(F.col("n_contaminated_grams") >= min_hits)
    return docs.join(hits, id_col, "left_anti")
