"""Character-n-gram language-model quality scoring (CCNet-style).

The public CCNet / data-quality recipe scores documents by language-model
perplexity and filters the tail. This operator trains the simplest useful
LM — a unigram model over character n-grams with add-α smoothing — ON THE
CORPUS ITSELF (deterministic, no external model file) and scores each doc
by its mean gram log-probability. Outlier docs (binary junk, wrong
language, mojibake, machine-generated noise) surface as low scores.

Scale shape: one explode over char n-grams, one groupBy for corpus counts,
one 2-scalar aggregate, one hash join back — all JVM expressions, no
Python. The count table is |distinct grams| rows (≤ alphabet^n, tiny), so
the join broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def char_ngram_lm_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    alpha: float = 1.0,
) -> DataFrame:
    """(id, n_grams, avg_logp) per document with ≥1 gram.

    logp(g) = ln((c(g)+α) / (N+α·V)) with corpus totals N (gram
    occurrences) and V (distinct grams); avg_logp is the doc's mean —
    higher = more typical of the corpus. Rounded to 6 decimals so
    partial-sum order can't produce engine-visible float drift."""
    norm = F.lower(F.col(text_col))
    length = F.length(norm)
    idx = F.when(length >= n, F.sequence(F.lit(1), length - n + 1)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: norm.substr(i, F.lit(n)))
    exploded = df.select(F.col(id_col).alias("__id"), F.explode(grams).alias("__g"))
    # deliberately NOT persisted: the explode is pure codegen (lower +
    # substr — no hashing), so recomputing it for the count pass and the
    # scoring pass is two pipelined projected scans, while caching it
    # materializes ~n_chars rows (~10× the corpus bytes) — measured 0.5 s
    # SLOWER at sf0.1 and strictly worse at scale (guide §5: cache only
    # when recompute costs more than the memory pressure)
    counts = exploded.groupBy("__g").agg(F.count(F.lit(1)).alias("__c"))
    stats = counts.agg(
        F.sum("__c").alias("__N"), F.count(F.lit(1)).alias("__V")
    )
    logp = F.log(
        (F.col("__c") + F.lit(float(alpha)))
        / (F.col("__N") + F.lit(float(alpha)) * F.col("__V"))
    )
    return (
        exploded.join(F.broadcast(counts), "__g")
        .crossJoin(F.broadcast(stats))
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.avg(logp), 6).alias("avg_logp"),
        )
        .select(F.col("__id").alias(id_col), "n_grams", "avg_logp")
    )
