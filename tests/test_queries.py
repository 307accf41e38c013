"""Local emulation of the driver's t2 correctness gate: run every
``__spark_entry__.queries()`` entry and its DuckDB oracle side-by-side at
sf0.001 and require identical (order-insensitive) results. Stricter than the
driver in one way: floats must match exactly — any fp nondeterminism in a
query design shows up here before it costs a round."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def _compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}"
    )
    # dtype-kind parity BEFORE canonicalization: the driver hashes string
    # representations, so a Spark bigint vs a DuckDB HUGEINT→float64 column
    # ('1275' vs '1275.0') hash-mismatches even with identical values.
    # Datetime resolution (ns vs us) is exempt — the driver normalizes it.
    def _kind(d):
        d = str(d)
        if d.startswith(("int", "uint", "Int")):
            return "int"
        if d.startswith(("float", "Float")):
            return "float"
        if d.startswith("datetime"):
            return "datetime"
        return "object"

    for c in sorted(set(spark_pdf.columns) & set(oracle_pdf.columns)):
        sk, ok = _kind(spark_pdf[c].dtype), _kind(oracle_pdf[c].dtype)
        assert sk == ok, f"{name}.{c}: spark dtype {spark_pdf[c].dtype} vs oracle {oracle_pdf[c].dtype}"

    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        if a[c].dtype == "float64":
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            for i, (x, y) in enumerate(zip(av, bv)):
                both_nan = (isinstance(x, float) and math.isnan(x)) and (
                    isinstance(y, float) and math.isnan(y)
                )
                assert both_nan or x == y, f"{name}.{c}[{i}]: {x!r} != {y!r} (diff {x - y!r})"
        else:
            assert a[c].tolist() == b[c].tolist(), f"{name}.{c}: mismatch"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(spark, ddb, name):
    assert name in QUERIES, f"oracle without query: {name}"
    spark_pdf = QUERIES[name](spark, SF_DIR).toPandas()
    oracle_pdf = ddb.execute(ORACLES[name]).fetchdf()
    _compare(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_runs(spark, name):
    """Rows-only check for non-SQL-expressible operators."""
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_graded_window_is_all_oracle_backed():
    """Driver contract: the first 50 registry entries are the graded window —
    every one of them must carry a DuckDB oracle (an oracle-backed query
    outside the window is invisible to the scoreboard)."""
    names = list(QUERIES)
    window = names[:50]
    missing = [n for n in window if n not in ORACLES]
    assert not missing, f"graded-window entries without oracle: {missing}"


def test_graded_window_contract():
    """Driver contract: every entry in the first-50 graded window must have
    an oracle, every oracle must have a query, and the bench headline list
    must reference real registry entries."""
    names = list(QUERIES)
    assert len(names) >= 50
    missing = [n for n in names[:50] if n not in ORACLES]
    assert not missing, f"graded-window entries without oracles: {missing}"
    orphans = [k for k in ORACLES if k not in QUERIES]
    assert not orphans, f"oracles without queries: {orphans}"

    import bench

    ghost = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not ghost, f"bench headline entries not in queries(): {ghost}"


def test_minhash_corpus_dedup_invariants_duckdb(spark):
    """Round-3 verdict task 7: the end-to-end minhash corpus dedup is
    rows-only by necessity (hash-family specific), but its EXACT invariants
    are SQL — so grade them in DuckDB over the emitted pair/component/kept
    tables:

      1. pair consistency — both ends of every candidate pair share a
         component label;
      2. canonical labeling — every component label is the min id of its
         members;
      3. survivor arithmetic — n_kept = n_docs - (n_component_members -
         n_components), i.e. exactly the non-canonical members drop;
      4. dropped mapping — every dropped id appears in the component table
         with a SURVIVING canonical of smaller id.
    """
    from preprocessor_spark.caching import persist_scope
    from preprocessor_spark.operators.dedup import minhash_dedup_corpus, minhash_lsh_pairs
    from preprocessor_spark.operators.graph import connected_components

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    kw = dict(num_hashes=64, bands=16, threshold=0.6)
    with persist_scope():
        pairs_pdf = minhash_lsh_pairs(docs, "text", "doc_id", **kw).select("id_a", "id_b").toPandas()
        comps_pdf = connected_components(
            minhash_lsh_pairs(docs, "text", "doc_id", **kw)
        ).toPandas()
        kept_pdf = minhash_dedup_corpus(docs, "text", "doc_id", **kw).select("doc_id").toPandas()
    docs_pdf = docs.select("doc_id").toPandas()

    con = duckdb.connect()
    con.register("pairs", pairs_pdf)
    con.register("comps", comps_pdf)
    con.register("kept", kept_pdf)
    con.register("docs", docs_pdf)

    bad_pairs = con.execute(
        """SELECT COUNT(*) FROM pairs p
           JOIN comps a ON p.id_a = a.id JOIN comps b ON p.id_b = b.id
           WHERE a.component <> b.component"""
    ).fetchone()[0]
    assert bad_pairs == 0

    unmatched_ends = con.execute(
        """SELECT COUNT(*) FROM (
               SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs
           ) e LEFT JOIN comps c ON e.id = c.id WHERE c.id IS NULL"""
    ).fetchone()[0]
    assert unmatched_ends == 0

    bad_labels = con.execute(
        """SELECT COUNT(*) FROM (
               SELECT component, MIN(id) AS m FROM comps GROUP BY component
           ) WHERE component <> m"""
    ).fetchone()[0]
    assert bad_labels == 0

    n_docs, n_kept, n_members, n_components = (
        con.execute("SELECT COUNT(*) FROM docs").fetchone()[0],
        con.execute("SELECT COUNT(*) FROM kept").fetchone()[0],
        con.execute("SELECT COUNT(*) FROM comps").fetchone()[0],
        con.execute("SELECT COUNT(DISTINCT component) FROM comps").fetchone()[0],
    )
    assert n_kept == n_docs - (n_members - n_components)

    bad_dropped = con.execute(
        """WITH dropped AS (
               SELECT doc_id FROM docs EXCEPT SELECT doc_id FROM kept
           )
           SELECT COUNT(*) FROM dropped d
           LEFT JOIN comps c ON d.doc_id = c.id
           LEFT JOIN kept k ON c.component = k.doc_id
           WHERE c.id IS NULL            -- dropped but in no cluster
              OR c.component >= d.doc_id -- canonical not strictly smaller
              OR k.doc_id IS NULL        -- canonical itself didn't survive"""
    ).fetchone()[0]
    assert bad_dropped == 0
