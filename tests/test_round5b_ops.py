"""Round-5 breadth tests: Bloom-filter pre-filtered join, URL
canonicalization / registered-domain / domain caps, and the recursive-CTE
hierarchy walk."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- bloom join


def _revenue(join_df):
    return sorted(
        (r[0], r[1]) for r in
        join_df.groupBy("s_name").agg(F.count(F.lit(1)).alias("n")).collect()
    )


def test_bloom_join_equals_plain_join(spark):
    from preprocessor_spark.operators.bloomjoin import bloom_join

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_suppkey", "l_quantity")
    supp = (
        spark.read.parquet(f"{sf}/supplier.parquet")
        .where("s_acctbal > 0")
        .select("s_suppkey", "s_name")
    )
    got = _revenue(bloom_join(li, supp, "l_suppkey", "s_suppkey"))
    want = _revenue(li.join(supp, li.l_suppkey == supp.s_suppkey))
    assert got == want and len(got) > 0


def test_bloom_join_exact_even_at_high_fp_rate(spark):
    """With a deliberately tiny bitmap (huge false-positive rate) the
    composite result is STILL exactly the plain join — the exact join
    sweeps up every Bloom false positive."""
    from preprocessor_spark.operators.bloomjoin import bloom_join

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_suppkey", "l_quantity")
    supp = (
        spark.read.parquet(f"{sf}/supplier.parquet")
        .where("s_acctbal > 5000")
        .select("s_suppkey", "s_name")
    )
    got = _revenue(bloom_join(li, supp, "l_suppkey", "s_suppkey", num_bits=64, num_hashes=2))
    want = _revenue(li.join(supp, li.l_suppkey == supp.s_suppkey))
    assert got == want


def test_bloom_prefilter_never_drops_true_matches(spark):
    from preprocessor_spark.operators.bloomjoin import bloom_bitmap, bloom_prefilter

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_suppkey")
    supp = (
        spark.read.parquet(f"{sf}/supplier.parquet")
        .where("s_acctbal > 5000")
        .select("s_suppkey")
    )
    bm = bloom_bitmap(supp, "s_suppkey", num_bits=256, num_hashes=3)
    kept = {
        r[0]
        for r in bloom_prefilter(li, bm, "l_suppkey", num_bits=256, num_hashes=3)
        .select("l_suppkey").distinct().collect()
    }
    true_keys = {r[0] for r in supp.collect()}
    li_keys = {r[0] for r in li.select("l_suppkey").distinct().collect()}
    assert (true_keys & li_keys) <= kept


def test_bloom_join_selectivity_and_plan(spark):
    """The default bitmap prunes most non-matching rows, and the probe
    runs as BroadcastHashJoins (map-side) — no extra shuffle of the large
    side beyond the final exact join."""
    from preprocessor_spark.operators.bloomjoin import (
        bloom_bitmap, bloom_join, bloom_prefilter,
    )

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select("l_suppkey")
    supp = (
        spark.read.parquet(f"{sf}/supplier.parquet")
        .where("s_acctbal > 5000")
        .select("s_suppkey", "s_name")
    )
    n_match_keys = supp.count()
    bm = bloom_bitmap(supp, "s_suppkey")
    kept_keys = (
        bloom_prefilter(li, bm, "l_suppkey").select("l_suppkey").distinct().count()
    )
    # 10 distinct suppkeys at sf0.001; <1% FP rate => kept ~= true matches
    assert kept_keys <= n_match_keys + 1
    j = bloom_join(li, supp, "l_suppkey", "s_suppkey")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan


def test_bloom_join_rejects_mismatched_key_types(spark):
    from preprocessor_spark.operators.bloomjoin import bloom_join

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        F.col("l_suppkey").cast("int").alias("l_suppkey")
    )
    supp = spark.read.parquet(f"{sf}/supplier.parquet").select("s_suppkey")
    with pytest.raises(ValueError, match="types must match"):
        bloom_join(li, supp, "l_suppkey", "s_suppkey")


# ---------------------------------------------------------------------- urls


URL_CASES = [
    # (raw, canonical, domain)
    ("HTTP://Example.COM:80/a//b/?utm_source=x&z=1&a=2#f",
     "http://example.com/a/b?a=2&z=1", "example.com"),
    ("https://www.Sub.Shop.co.uk:443/",
     "https://www.sub.shop.co.uk/", "shop.co.uk"),
    ("http://example.com:8080/path/",
     "http://example.com:8080/path", "example.com"),
    ("https://a.example.com", "https://a.example.com/", "example.com"),
    ("http://example.com/?gclid=g&ref=r", "http://example.com/", "example.com"),
    ("http://localhost/x", "http://localhost/x", "localhost"),
    ("http://example.com/a/b/c?b=2&a=1&a=0",
     "http://example.com/a/b/c?a=0&a=1&b=2", "example.com"),
]


def test_parse_urls_cases(spark):
    from preprocessor_spark.operators.urls import parse_urls

    df = spark.createDataFrame([(i, u) for i, (u, _, _) in enumerate(URL_CASES)], "i int, url string")
    rows = {
        r["i"]: r
        for r in parse_urls(df, "url").collect()
    }
    for i, (_, canon, dom) in enumerate(URL_CASES):
        assert rows[i]["url_canonical"] == canon, (i, rows[i]["url_canonical"], canon)
        assert rows[i]["url_domain"] == dom, (i, rows[i]["url_domain"], dom)


def test_parse_urls_no_shuffle(spark):
    """Pure narrow projection: the parse must not introduce an Exchange."""
    from preprocessor_spark.operators.urls import parse_urls

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", F.concat(F.lit("https://h.example.com/p?a=1"), F.col("doc_id").cast("string")).alias("url")
    )
    plan = parse_urls(df, "url")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_domain_cap_sample_deterministic_and_capped(spark):
    from preprocessor_spark.operators.urls import domain_cap_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", F.col("source").alias("domain")
    )
    kept1 = domain_cap_sample(docs, "domain", "doc_id", cap=7)
    kept2 = domain_cap_sample(docs, "domain", "doc_id", cap=7)
    ids1 = sorted(r[0] for r in kept1.select("doc_id").collect())
    ids2 = sorted(r[0] for r in kept2.select("doc_id").collect())
    assert ids1 == ids2
    per_dom = kept1.groupBy("domain").count().collect()
    assert all(r["count"] <= 7 for r in per_dom)
    # every domain with >=7 docs is kept at exactly the cap
    totals = {r["domain"]: r["count"] for r in docs.groupBy("domain").count().collect()}
    got = {r["domain"]: r["count"] for r in per_dom}
    for dom, n in totals.items():
        assert got[dom] == min(n, 7)


# ------------------------------------------------------------ recursive CTE


def test_recursive_cte_depths_match_binary_tree(spark):
    """Every supplier key k>0 sits at depth floor(log2(k))+... — computed
    independently in Python by chasing parents — and the recursion must
    visit each node exactly once."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    out = {r["depth"]: (r["n_nodes"], r["sum_node"]) for r in
           em.recursive_cte_tree(spark, sf).collect()}
    keys = [r[0] for r in
            spark.read.parquet(f"{sf}/supplier.parquet").select("s_suppkey").collect()]

    def depth(k):
        d = 0
        while k > 0:
            k >>= 1
            d += 1
        return d

    from collections import defaultdict
    want = defaultdict(lambda: [0, 0])
    for k in keys:
        want[depth(k)][0] += 1
        want[depth(k)][1] += k
    assert out == {d: tuple(v) for d, v in want.items()}
