"""Multinomial NB — independent reference checks (numpy recomputation on a
tiny corpus; separability on a planted bilingual corpus). Cross-engine
parity is covered by the nbayes_lang_docs DuckDB oracle."""

from __future__ import annotations

import math

import numpy as np
import pytest

from preprocessor_spark.operators.nbayes import nb_classify, nb_confusion


@pytest.fixture(scope="module")
def spark():
    from preprocessor_spark.session import get_spark

    return get_spark("test-nbayes")


def test_scores_match_numpy_reference(spark):
    rows = [
        (1, "apple banana apple", "fruit"),
        (2, "banana banana cherry", "fruit"),
        (3, "carrot potato", "veg"),
        (4, "potato potato apple", "veg"),
        (5, "apple cherry", "fruit"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, cls string")
    got = {r.doc: r for r in nb_classify(df, "id", "text", "cls").collect()}

    # reference NB computed straight from the definition
    docs = {i: t.split() for i, t, _ in rows}
    labels = {i: c for i, _, c in rows}
    classes = sorted(set(labels.values()))
    vocab = {w for t in docs.values() for w in t}
    cnt = {c: {} for c in classes}
    for i, toks in docs.items():
        for w in toks:
            cnt[labels[i]][w] = cnt[labels[i]].get(w, 0) + 1
    totals = {c: sum(cnt[c].values()) for c in classes}
    nd = {c: sum(1 for v in labels.values() if v == c) for c in classes}

    def score(toks, c):
        s = math.log(nd[c] / len(rows))
        for w in toks:
            s += math.log((cnt[c].get(w, 0) + 1) / (totals[c] + len(vocab)))
        return s

    for i, toks in docs.items():
        best = max(classes, key=lambda c: (score(toks, c), [-ord(x) for x in c]))
        r = got[i]
        assert r.predicted == best
        assert r.log_score == pytest.approx(score(toks, best), abs=1e-5)
    # resubstitution on this separable toy corpus is perfect
    assert all(got[i].predicted == labels[i] for i in docs)


def test_separates_planted_languages(spark):
    rng = np.random.default_rng(13)
    latin = "the of and to in it is was for on".split()
    faux = "der und das ist ein nicht mit von zu den".split()
    rows = []
    for i in range(120):
        vocab_ = latin if i % 2 == 0 else faux
        text = " ".join(rng.choice(vocab_, size=12))
        rows.append((i, text, "en" if i % 2 == 0 else "de"))
    df = spark.createDataFrame(rows, "id long, text string, cls string")
    conf = {
        (r.true_class, r.predicted): r.n
        for r in nb_confusion(nb_classify(df, "id", "text", "cls")).collect()
    }
    correct = conf.get(("en", "en"), 0) + conf.get(("de", "de"), 0)
    assert correct == 120  # disjoint vocabularies classify perfectly


def test_unseen_tokens_smoothed_not_dropped(spark):
    rows = [
        (1, "x x x", "a"),
        (2, "y y y", "b"),
        (3, "x z", "a"),  # z unseen in either class at train... seen in a
    ]
    df = spark.createDataFrame(rows, "id long, text string, cls string")
    got = {r.doc: r for r in nb_classify(df, "id", "text", "cls").collect()}
    assert got[3].predicted == "a"  # the x evidence dominates the smoothed z
    assert all(np.isfinite(r.log_score) for r in got.values())


def test_empty_docs_excluded_by_contract(spark):
    rows = [(1, "a b", "x"), (2, "   ", "x"), (3, "a", "y")]
    df = spark.createDataFrame(rows, "id long, text string, cls string")
    got = nb_classify(df, "id", "text", "cls").collect()
    assert {r.doc for r in got} == {1, 3}
