"""Round-4 operator tests: distributed BPE training/encoding, incremental
batch-vs-corpus dedup, and the hashed-n-gram logistic-regression quality
classifier."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from preprocessor_spark.operators.bpe import (
    END,
    BPEModel,
    bpe_encode_udf,
    train_bpe,
    word_counts,
)
from preprocessor_spark.operators.classifier import (
    fit_quality_classifier,
    score_quality_udf,
)
from preprocessor_spark.operators.dedup import incremental_dedup_stats


# --------------------------------------------------------------------------
# BPE
# --------------------------------------------------------------------------

def _corpus(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)], ["id", "text"])


def test_bpe_classic_merge_sequence(spark):
    """The canonical Sennrich corpus: {'low':5,'lower':2,'newest':6,
    'widest':3}. The first merges must assemble 'est</w>' (count 9 beats
    every alternative); a frequent word eventually becomes ONE token."""
    rows = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    df = _corpus(spark, rows)
    model = train_bpe(df, "text", num_merges=30)
    assert model.merges[0] == ("e", "s")
    assert model.merges[1] == ("es", "t")
    assert model.merges[2] == ("est", END)
    enc = bpe_encode_udf(model)
    out = {
        r["text"]: r["toks"]
        for r in df.select("text", enc(F.col("text")).alias("toks")).distinct().collect()
    }
    # with 30 merges this tiny vocab is fully memorized
    assert out["newest"] == ["newest" + END]
    assert out["low"] == ["low" + END]


def test_bpe_deterministic_and_roundtrip(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m1 = train_bpe(docs, "text", num_merges=40, min_freq=2)
    m2 = train_bpe(docs, "text", num_merges=40, min_freq=2)
    assert m1.merges == m2.merges  # same corpus -> same merge sequence

    enc = bpe_encode_udf(m1)
    sample = docs.limit(20).select("text", enc(F.col("text")).alias("toks")).collect()
    for r in sample:
        # lossless: concatenating tokens and stripping end markers restores
        # the lowercased word sequence
        restored = "".join(r["toks"]).replace(END, " ").strip()
        expected = " ".join((r["text"] or "").lower().split())
        assert restored == expected


def test_bpe_word_counts_match_duckdb(spark, sf_dir):
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r["word"]: r["n"] for r in word_counts(docs, "text").collect()}
    want = dict(
        duckdb.sql(
            f"""SELECT w, COUNT(*) FROM (
                   SELECT unnest(list_filter(
                       regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS w
                   FROM '{sf_dir}/documents.parquet') GROUP BY w"""
        ).fetchall()
    )
    assert got == want


def test_bpe_partial_vocab_splits_rare_words(spark):
    """With merges exhausted early, unseen/rare words stay multi-token but
    still decode losslessly."""
    rows = ["aaaa aaaa aaaa bbbb"]
    df = _corpus(spark, rows)
    model = train_bpe(df, "text", num_merges=3)
    enc = bpe_encode_udf(model)
    toks = df.select(enc(F.col("text")).alias("t")).collect()[0]["t"]
    assert "".join(toks).replace(END, " ").strip() == "aaaa aaaa aaaa bbbb"
    # 'bbbb' never merged (freq-1 pairs) -> stays char-split, END separate
    assert toks[-5:] == ["b", "b", "b", "b", END]


# --------------------------------------------------------------------------
# incremental dedup
# --------------------------------------------------------------------------

def test_incremental_dedup_stats(spark):
    base = "w%d " * 40
    corpus = _corpus(
        spark,
        [" ".join(f"c{i}w{j}" for j in range(40)) for i in range(5)],
    ).withColumnRenamed("id", "doc_id")
    c0 = " ".join(f"c0w{j}" for j in range(40))
    half_overlap = " ".join(f"c1w{j}" for j in range(20)) + " " + " ".join(
        f"new{j}" for j in range(20)
    )
    fresh = " ".join(f"z{j}" for j in range(40))
    batch = spark.createDataFrame(
        [(100, c0), (101, half_overlap), (102, fresh)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in incremental_dedup_stats(
            corpus, batch, "text", "doc_id", window_tokens=10
        ).collect()
    }
    # verbatim copy: exact dup, full containment, dropped
    assert out[100]["exact_dup"] == 1
    assert out[100]["seen_window_frac"] == 1.0
    assert out[100]["keep"] == 0
    # half overlap: not exact; windows fully inside the first 20 tokens are
    # seen (11 of 31), frac < 0.5 -> kept
    assert out[101]["exact_dup"] == 0
    assert 0.0 < out[101]["seen_window_frac"] < 0.5
    assert out[101]["keep"] == 1
    # fresh doc: nothing seen, kept
    assert out[102]["exact_dup"] == 0
    assert out[102]["n_seen_windows"] == 0
    assert out[102]["keep"] == 1


def test_incremental_dedup_high_containment_dropped(spark):
    corpus = spark.createDataFrame(
        [(0, " ".join(f"w{j}" for j in range(40)))], ["doc_id", "text"]
    )
    # 38 of 40 tokens shared -> nearly all windows seen -> dropped
    near = " ".join(f"w{j}" for j in range(38)) + " x1 x2"
    batch = spark.createDataFrame([(10, near)], ["doc_id", "text"])
    row = incremental_dedup_stats(
        corpus, batch, "text", "doc_id", window_tokens=10
    ).collect()[0]
    assert row["exact_dup"] == 0
    assert row["seen_window_frac"] > 0.5
    assert row["keep"] == 0


def test_incremental_dedup_short_doc_kept(spark):
    """Docs shorter than the window have no windows: frac 0, kept (no
    containment evidence) unless exact."""
    corpus = spark.createDataFrame(
        [(0, " ".join(f"w{j}" for j in range(40)))], ["doc_id", "text"]
    )
    batch = spark.createDataFrame([(10, "tiny doc"), (11, None)], ["doc_id", "text"])
    rows = {
        r["doc_id"]: r
        for r in incremental_dedup_stats(
            corpus, batch, "text", "doc_id", window_tokens=10
        ).collect()
    }
    assert rows[10]["n_windows"] == 0 and rows[10]["keep"] == 1
    assert rows[11]["n_windows"] == 0


# --------------------------------------------------------------------------
# quality classifier
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def planted_quality(spark):
    rng = np.random.RandomState(7)
    words = ["table", "query", "window", "stream", "batch", "join", "sort", "merge"]
    clean = [
        (i, " ".join(rng.choice(words, size=30)), 1) for i in range(120)
    ]
    junk_syms = ["$$$", "###!!", "??%%", "@@@@", "^^^^^", "!!!!"]
    junk = [
        (1000 + i, " ".join(rng.choice(junk_syms, size=30)), 0) for i in range(120)
    ]
    return spark.createDataFrame(clean + junk, ["id", "text", "label"]).repartition(8)


def test_classifier_separates_planted_junk(spark, planted_quality):
    model = fit_quality_classifier(
        planted_quality, "text", "label", dim=256, iterations=25, lr=4.0
    )
    # training loss must strictly improve from the first iteration
    assert model.losses[-1] < model.losses[0] * 0.5
    scored = planted_quality.withColumn(
        "p", score_quality_udf(model)(F.col("text"))
    ).collect()
    acc = np.mean([(r["p"] >= 0.5) == (r["label"] == 1) for r in scored])
    assert acc >= 0.95
    # calibrated direction: clean scores above junk on average
    mc = np.mean([r["p"] for r in scored if r["label"] == 1])
    mj = np.mean([r["p"] for r in scored if r["label"] == 0])
    assert mc > 0.7 > 0.3 > mj


def test_classifier_deterministic(spark, planted_quality):
    m1 = fit_quality_classifier(
        planted_quality, "text", "label", dim=128, iterations=5, lr=2.0
    )
    m2 = fit_quality_classifier(
        planted_quality, "text", "label", dim=128, iterations=5, lr=2.0
    )
    assert np.array_equal(m1.weights, m2.weights) and m1.bias == m2.bias
