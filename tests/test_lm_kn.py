"""Interpolated Kneser-Ney bigram LM (operators/lm_kn.py): hand-computed
probabilities on a tiny corpus, backoff-regime coverage, perplexity sanity
(a model prefers text it has seen), and repartition determinism."""

import math

import pytest
from pyspark.sql import functions as F

from preprocessor_spark.operators.lm_kn import (
    _bigrams,
    score_docs,
    train_bigram_kn,
)


@pytest.fixture(scope="module")
def spark():
    from preprocessor_spark.session import get_spark

    return get_spark("test-lm-kn", cpus=4)


TRAIN = [
    (1, "the cat sat"),
    (2, "the cat ran"),
    (3, "a dog sat"),
]
# training bigram types: (the,cat) c=2, (cat,sat), (cat,ran), (a,dog),
# (dog,sat) each c=1  ->  D = 5 distinct types
# contexts: the: c=2 n1_fwd=1; cat: c=2 n1_fwd=2; a: c=1 n1_fwd=1; dog: c=1 n1_fwd=1
# continuations: cat n1_bwd=1, sat n1_bwd=2, ran n1_bwd=1, dog n1_bwd=1


def _model(spark):
    df = spark.createDataFrame(TRAIN, "doc_id long, text string")
    return train_bigram_kn(df, "text")


def test_bigram_extraction_lowercases_and_handles_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "The  CAT\tsat"), (2, "one"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = _bigrams(df, "text", "doc_id").collect()
    got = {(r.doc_id, r.w1, r.w2) for r in rows}
    assert got == {(1, "the", "cat"), (1, "cat", "sat")}


def test_hand_computed_kn_probabilities(spark):
    model = _model(spark)
    assert model["n_bigram_types"] == 5
    score = spark.createDataFrame(
        [(10, "the cat sat"), (11, "the dog ran"), (12, "zz the qq")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in score_docs(score, model).collect()}
    d, D = 0.75, 5.0

    # doc 10: all bigrams seen.
    # p(cat|the) = (2-.75)/2 + .75*1/2 * (1/5)
    p_the_cat = (2 - d) / 2 + (d * 1 / 2) * (1 / D)
    # p(sat|cat) = (1-.75)/2 + .75*2/2 * (2/5)
    p_cat_sat = (1 - d) / 2 + (d * 2 / 2) * (2 / D)
    r = out[10]
    assert r.n_bigrams == 2 and r.n_seen == 2
    assert r.sum_p == pytest.approx(p_the_cat + p_cat_sat, abs=1e-12)
    assert r.min_p == pytest.approx(min(p_the_cat, p_cat_sat), abs=1e-12)
    assert r.perplexity == pytest.approx(
        math.exp(-(math.log(p_the_cat) + math.log(p_cat_sat)) / 2), rel=1e-9
    )

    # doc 11: (the,dog) unseen bigram, seen ctx + seen cont ->
    #   p = 0/2-ish: max(0-.75,0)/2 + .75*1/2*(1/5)
    p_the_dog = (d * 1 / 2) * (1 / D)
    #   (dog,ran): seen ctx dog, seen cont ran -> .75*1/1*(1/5)
    p_dog_ran = (d * 1 / 1) * (1 / D)
    r = out[11]
    assert r.n_bigrams == 2 and r.n_seen == 0
    assert r.sum_p == pytest.approx(p_the_dog + p_dog_ran, abs=1e-12)

    # doc 12: (zz,the): unseen ctx, seen cont 'the'? 'the' never appears as
    # w2 in training -> unseen cont -> 0.5/D. (the,qq): seen ctx, unseen
    # cont -> 0.5/D too (falls through both regimes).
    r = out[12]
    assert r.n_bigrams == 2 and r.n_seen == 0
    assert r.sum_p == pytest.approx(2 * 0.5 / D, abs=1e-15)
    assert r.min_p == pytest.approx(0.5 / D, abs=1e-15)


def test_probabilities_are_a_distribution_for_seen_context(spark):
    """Σ_w2 P(w2|w1) over the training vocab must be 1 for a seen context —
    the KN discount mass is exactly redistributed (checked for 'cat')."""
    model = _model(spark)
    d, D = 0.75, float(model["n_bigram_types"])
    bg = {(r.w1, r.w2): r.c for r in model["bigrams"].collect()}
    ctx = {r.w1: (r.c_w1, r.n1_fwd) for r in model["contexts"].collect()}
    cont = {r.w2: r.n1_bwd for r in model["continuations"].collect()}
    c_w1, n1f = ctx["cat"]
    total = 0.0
    for w2, n1b in cont.items():
        c = bg.get(("cat", w2), 0)
        total += max(c - d, 0.0) / c_w1 + (d * n1f / c_w1) * (n1b / D)
    # Pcont sums to 1 over the vocab by construction (Σ n1_bwd = D)
    assert total == pytest.approx(1.0, abs=1e-12)


def test_model_prefers_in_domain_text(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows += [(100 + i, "lorem ipsum dolor sit amet consectetur") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_bigram_kn(df, "text")
    probe = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "zz qq kk vv")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.perplexity for r in score_docs(probe, model).collect()}
    assert out[1] < out[2] / 10


def test_repartition_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 5} w{i % 3} w{i % 11}") for i in range(200)],
        "doc_id long, text string",
    )
    model = train_bigram_kn(df, "text")
    a = sorted(score_docs(df, model).collect())
    model2 = train_bigram_kn(df.repartition(13), "text")
    b = sorted(score_docs(df.repartition(5), model2).collect())
    assert a == b  # exact equality incl. float sums (sorted fold)


def test_scoring_plan_has_no_cartesian(spark):
    df = spark.createDataFrame(TRAIN, "doc_id long, text string")
    model = train_bigram_kn(df, "text")
    plan = score_docs(df, model)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
