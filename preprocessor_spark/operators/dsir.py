"""DSIR-style importance resampling for training-data selection.

Data Selection with Importance Resampling (Xie et al., 2023 — public
recipe) picks raw-corpus documents that look like a small TARGET domain:
fit cheap bag-of-hashed-n-gram language models on the target and on the
raw corpus, weight every raw document by the log-likelihood ratio
``ln p_target(doc) - ln p_raw(doc)``, then resample with Gumbel-top-k.

Everything here is deterministic and engine-portable (exact DuckDB twins):

- **Features**: word unigrams + bigrams over whitespace tokens of
  ``lower(text)``, hashed into ``n_buckets`` via the same md5-hex bucket
  recipe as :mod:`preprocessor_spark.operators.splits` (DuckDB:
  ``CAST(('0x' || substr(md5(g),1,8)) AS BIGINT) % n_buckets``). Hashed
  buckets are the paper's trick AND the scale lever: the two count tables
  are ≤ ``n_buckets`` rows regardless of corpus size.
- **Models**: add-α smoothed bucket unigram LMs,
  ``p(b) = (c(b)+α) / (N+α·B)``; the per-doc weight is the MEAN per-gram
  log-ratio (mean, not sum, so weight is length-invariant like the
  reference recipe's normalized score).
- **Resampling**: Gumbel-top-k without replacement, with the Gumbel
  uniform drawn content-addressed from ``md5(doc_id ∥ salt)`` (first 13
  hex digits → 52-bit integer → u ∈ (0,1), exact in a double in both
  engines) instead of an RNG — reproducible across runs, engines, and
  partitionings, and a row's fate is joinable after the fact.

Scale shape (100 TB): one explode over grams with a row-local md5 bucket
(whole-stage codegen), ONE groupBy producing both corpora's bucket counts
(conditional agg — the target flag rides along), a broadcast join back,
one per-doc agg. The selection is a single ``ORDER BY key LIMIT k``
(TakeOrderedAndProject — no global sort materialized). No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from preprocessor_spark.caching import register_persisted

GUMBEL_HEX_DIGITS = 13  # 16^13 = 2^52: exact as a double in both engines


def word_gram_buckets_expr(text: Column, n_buckets: int) -> Column:
    """array<bigint> of hashed word unigram+bigram buckets for one doc.

    Tokens = non-empty splits of ``lower(text)`` on ``\\s+`` (the corpus
    tokenizer used across the text operators); bigrams join adjacent
    tokens with a single space. Bucket = md5-hex prefix mod ``n_buckets``
    — row-local, engine-portable, no shuffle."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    bigrams = F.transform(
        F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(F.array().cast("array<int>")),
        lambda i: F.concat(F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)),
    )
    grams = F.concat(toks, bigrams)
    return F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint")
        % F.lit(n_buckets),
    )


def gumbel_key_expr(key: Column, weight: Column, salt: str = "") -> Column:
    """Gumbel-top-k sort key: ``weight + Gumbel(u)`` with
    ``u = (h + 0.5) / 16^13`` from the md5 of the row key — deterministic
    resampling where a doc's selection odds rise with its weight but low-
    weight docs keep a chance (the "resampling", vs a hard top-k cut)."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, GUMBEL_HEX_DIGITS),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(16**GUMBEL_HEX_DIGITS))
    return weight + (-F.log(-F.log(u)))


def dsir_weights(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: Column,
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """(id, n_grams, dsir_weight) for every doc with ≥1 token.

    ``target`` is a boolean Column marking the target-domain rows *within*
    ``df`` (the raw corpus LM is fit on ALL rows, target included, as in
    the public recipe where raw is the superset being filtered).
    ``dsir_weight = round(mean_g [ln p_t(bucket(g)) - ln p_r(bucket(g))], 6)``
    — rounded so partial-sum order can't produce engine-visible drift."""
    exploded = df.select(
        F.col(id_col).alias("__id"),
        target.alias("__t"),
        F.explode(word_gram_buckets_expr(F.col(text_col), n_buckets)).alias("__b"),
    )
    exploded = register_persisted(exploded.persist())
    # ONE shuffle: both corpora's counts from the same groupBy
    counts = exploded.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__cr"),
        F.sum(F.col("__t").cast("bigint")).alias("__ct"),
    )
    stats = counts.agg(F.sum("__cr").alias("__Nr"), F.sum("__ct").alias("__Nt"))
    a = F.lit(float(alpha))
    denom_t = F.col("__Nt") + a * F.lit(n_buckets)
    denom_r = F.col("__Nr") + a * F.lit(n_buckets)
    log_ratio = (
        F.log(F.col("__ct") + a) - F.log(denom_t) - F.log(F.col("__cr") + a) + F.log(denom_r)
    )
    return (
        exploded.join(F.broadcast(counts), "__b")
        .crossJoin(F.broadcast(stats))
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.avg(log_ratio), 6).alias("dsir_weight"),
        )
        .select(F.col("__id").alias(id_col), "n_grams", "dsir_weight")
    )


def dsir_select(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target: Column,
    k: int,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Gumbel-top-k resample of ``k`` docs by DSIR weight: the weights
    pass plus one ``ORDER BY (weight + gumbel) DESC LIMIT k`` — planned as
    TakeOrderedAndProject, so no global sort and the driver holds k rows,
    not the corpus. Returns (id, n_grams, dsir_weight, gumbel_key), the
    key rounded to 6 decimals (libm last-ulp differences between engines
    vanish at that precision; the continuous Gumbel term keeps boundary
    keys far enough apart that rank order is engine-stable)."""
    w = dsir_weights(df, text_col, id_col, target, n_buckets=n_buckets, alpha=alpha)
    key = gumbel_key_expr(F.col(id_col), F.col("dsir_weight"), salt)
    return (
        w.withColumn("gumbel_key", key)
        .orderBy(F.col("gumbel_key").desc())
        .limit(k)
        .withColumn("gumbel_key", F.round("gumbel_key", 6))
    )
