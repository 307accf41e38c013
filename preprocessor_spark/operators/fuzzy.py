"""Cross-table fuzzy (similarity) join — entity resolution over text keys.

Joining two tables on approximately-equal text (crawl records ↔ canonical
registry, near-duplicate titles across sources) is a similarity JOIN, not a
self-dedup. Rather than duplicating the prefix-filter machinery, the join
reuses :func:`preprocessor_spark.operators.dedup.ngram_jaccard_pairs`
(AllPairs/PPJoin: global-frequency-ordered prefix index + length filter +
vectorized verify — every shuffle keyed, no cross product) via SIDE
TAGGING: left ids map to 2·id, right ids to 2·id+1, the union runs through
the self-join pair generator, and only cross-parity pairs survive. The
remap is a pure projection, so the scale shape is exactly the dedup
operator's; the extra cost over a native two-table PPJoin is generating
(then discarding) same-side pairs, which the caller can avoid for
disjoint-content sides by raising ``threshold``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from preprocessor_spark.caching import register_persisted
from preprocessor_spark.operators.dedup import ngram_jaccard_pairs


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    text_col: str,
    left_id: str,
    right_id: str,
    threshold: float = 0.5,
    shingle_n: int = 3,
    collapse_exact: bool = True,
) -> DataFrame:
    """(left_id, right_id, jaccard) for every cross-table pair whose word
    ``shingle_n``-gram Jaccard ≥ threshold. Exact (no false negatives —
    prefix filtering is lossless). Ids must be non-negative integers below
    2⁶² (the parity remap doubles them).

    ``collapse_exact`` (default): SIDE-AWARE exact-duplicate collapse —
    rows group on (side, content hash), so every group is side-pure; the
    PPJoin runs on one representative per group with candidate-stage parity
    pruning (sound because a representative's parity IS its group's side),
    and cross-parity representative pairs expand back to member pairs
    through keyed joins on the group hash. Cross-side verbatim matches need
    no special case: the two side-pure groups hold distinct representatives
    whose texts are identical, so the PPJoin itself emits their pair at
    Jaccard 1.0. This makes the operator duplication-invariant — candidate
    count depends on DISTINCT texts per side, not the replication factor
    (previously 12.6× cost for 10× 10-way-duplicated data; the collapsed
    plan adds only a hash groupBy + two expansion joins). Output is
    bit-identical to ``collapse_exact=False`` (equivalence-tested)."""
    lu = left.select(
        (F.col(left_id).cast("long") * 2).alias("__fid"),
        F.col(text_col).alias("__ft"),
    )
    ru = right.select(
        (F.col(right_id).cast("long") * 2 + 1).alias("__fid"),
        F.col(text_col).alias("__ft"),
    )
    u = lu.unionByName(ru)
    parity_pred = lambda ia, ib: (ia % 2) != (ib % 2)  # noqa: E731

    if collapse_exact:
        # group key = side ⊕ content hash → side-pure groups; min id is the
        # representative and carries the group's parity
        m = register_persisted(
            u.filter(F.col("__ft").isNotNull())
            .select(
                "__fid",
                F.concat(
                    (F.col("__fid") % 2).cast("string"), F.lit("|"), F.md5("__ft")
                ).alias("__g"),
            )
            .persist()
        )
        # thin-duplication bypass mirroring ngram_jaccard_pairs: when ≥98%
        # of (side, content) groups are singletons, skip the collapse —
        # identical output, and the uncollapsed plan avoids the expansion
        # joins the near-duplicate-free case never needs
        st = m.agg(
            F.count(F.lit(1)).alias("n"), F.count_distinct("__g").alias("g")
        ).first()
        if st["g"] >= 0.98 * st["n"]:
            m.unpersist()
            collapse_exact = False

    if collapse_exact:
        reps = m.groupBy("__g").agg(F.min("__fid").alias("__rid"))
        rep_rows = u.join(
            reps.select(F.col("__rid").alias("__fid")), "__fid", "left_semi"
        )
        rep_pairs = ngram_jaccard_pairs(
            rep_rows,
            "__ft",
            "__fid",
            shingle_n=shingle_n,
            threshold=threshold,
            collapse_exact=False,  # reps are distinct per (side, content)
            candidate_predicate=parity_pred,
        )
        ga = reps.select(F.col("__rid").alias("id_a"), F.col("__g").alias("__ga"))
        gb = reps.select(F.col("__rid").alias("id_b"), F.col("__g").alias("__gb"))
        ma = m.select(F.col("__fid").alias("__a"), F.col("__g").alias("__ga"))
        mb = m.select(F.col("__fid").alias("__b"), F.col("__g").alias("__gb"))
        cross = (
            rep_pairs.join(ga, "id_a")
            .join(gb, "id_b")
            .select("__ga", "__gb", "jaccard")
            .join(ma, "__ga")
            .join(mb, "__gb")
            .select(F.col("__a").alias("id_a"), F.col("__b").alias("id_b"), "jaccard")
        )
    else:
        pairs = ngram_jaccard_pairs(
            u,
            "__ft",
            "__fid",
            shingle_n=shingle_n,
            threshold=threshold,
            # candidate-stage parity pruning: same-side pairs never reach
            # the verification joins
            collapse_exact=False,
            candidate_predicate=parity_pred,
        )
        cross = pairs.filter((F.col("id_a") % 2) != (F.col("id_b") % 2))

    left_key = F.when(F.col("id_a") % 2 == 0, F.col("id_a")).otherwise(F.col("id_b"))
    right_key = F.when(F.col("id_a") % 2 == 1, F.col("id_a")).otherwise(F.col("id_b"))
    # shiftright, not /2: long division yields DOUBLE, which corrupts ids
    # ≥ 2^53; the arithmetic shift is exact for the full doubled-id range
    # (right_key is odd, so >>1 equals (right_key − 1) / 2)
    return cross.select(
        F.shiftright(left_key, 1).alias(left_id),
        F.shiftright(right_key, 1).alias(right_id),
        "jaccard",
    )


def _segments(s: str, k: int) -> list[tuple[int, int, str]]:
    """PassJoin even partition of ``s`` into k+1 segments: (i, start, seg),
    0-based start. Shorter segments first (any fixed scheme works as long
    as both sides derive it identically from the string length)."""
    m = len(s)
    parts = k + 1
    base, rem = divmod(m, parts)
    out = []
    pos = 0
    for i in range(parts):
        ln = base + (1 if i >= parts - rem else 0)
        out.append((i, pos, s[pos : pos + ln]))
        pos += ln
    return out


def _common_prefix(a: str, b: str) -> int:
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    text_col: str,
    left_id: str,
    right_id: str,
    max_dist: int = 1,
    strip_common_prefix: bool = True,
    max_candidates: int | None = None,
) -> DataFrame:
    """(left_id, right_id, dist) for every cross-table pair with
    Levenshtein distance ≤ ``max_dist``. EXACT — PassJoin segment
    signatures (Li et al., PVLDB 2011): if ed(s,t) ≤ k, then t must contain
    one of s's k+1 segments verbatim at a start position within ±k of its
    nominal position, so an equi-join on (|s|, segment-index, segment,
    ~position) loses no true pair; survivors verify with the JVM
    ``levenshtein``.

    Exact-duplicate strings collapse first (distinct strings drive the
    join; pairs expand back through keyed joins) — catalogs/logs repeat
    values massively and candidate count is quadratic in that duplication.

    Two guards cover the degenerate regime (ID-like corpora whose strings
    share one long constant prefix, e.g. "Customer#000…", which would put a
    shared segment in every row and push the candidate join toward
    all-pairs-per-length):

    - ``strip_common_prefix`` (default): the corpus-wide longest common
      prefix — LCP(lexicographic min, lexicographic max), one tiny agg;
      every string in the lexicographic range shares it — is stripped
      before segmenting AND verifying. Sound because Levenshtein distance
      is invariant under removal of a prefix shared by BOTH strings, and
      the corpus LCP is shared by every pair. This turns the docstring's
      own worst case into a well-spread join.
    - ``max_candidates``: an OPT-IN pre-join candidate-count probe —
      per-key counts on both sides of the (l, i, seg) equi-join, summed
      products — that fails fast with a diagnostic instead of launching a
      quadratic join (a residual shared-prefix *cluster* can still
      degenerate after the global strip). Default ``None`` runs without the
      probe (no behavior change for legitimate large joins, and no extra
      pass); note the estimate counts candidate rows BEFORE the
      (left,right) pair dedup, so pairs sharing several segments are
      counted once per shared segment — size the bound accordingly.

    Strings shorter than k+1 chars use an explicit length-bucket fallback
    key (their pigeonhole slot can be an empty segment), which is dense by
    nature — as is the true result set at that length."""
    from pyspark.sql.functions import pandas_udf

    k = max_dist
    if k < 0:
        raise ValueError("max_dist must be >= 0")

    @pandas_udf("array<struct<i: int, seg: string>>")
    def _seg_keys(s: pd.Series) -> pd.Series:
        # strings shorter than k+1 would carry empty segments whose
        # pigeonhole slot can be the untouched one — they get an explicit
        # length-bucket fallback key instead (candidates = every left
        # string within ±k length; the output is inherently dense there)
        return s.map(
            lambda t: None
            if t is None
            else [{"i": -1, "seg": ""}]
            if len(t) <= k
            else [{"i": i, "seg": seg} for i, _, seg in _segments(t, k)]
        )

    @pandas_udf("array<struct<l: int, i: int, seg: string>>")
    def _sub_keys(s: pd.Series) -> pd.Series:
        def keys(t):
            if t is None:
                return None
            out = set()
            n = len(t)
            for l in range(max(0, n - k), n + k + 1):
                if l <= k:
                    out.add((l, -1, ""))
                    continue
                for i, start, seg in _segments("x" * l, k):
                    ln = len(seg)
                    for p in range(max(0, start - k), min(n - ln, start + k) + 1):
                        out.add((l, i, t[p : p + ln]))
            return [{"l": l, "i": i, "seg": g} for l, i, g in sorted(out)]

        return s.map(keys)

    lm = left.filter(F.col(text_col).isNotNull()).select(
        F.col(left_id).alias("__lid"), F.col(text_col).alias("__lt")
    )
    rm = right.filter(F.col(text_col).isNotNull()).select(
        F.col(right_id).alias("__rid"), F.col(text_col).alias("__rt")
    )
    ld = lm.select("__lt").distinct()
    rd = rm.select("__rt").distinct()

    # ld/rd keyed by the ORIGINAL string (the expansion-join key); __ls/__rs
    # are the prefix-stripped twins the PassJoin machinery runs on
    lcp = 0
    if strip_common_prefix:
        bounds = (
            ld.select(F.col("__lt").alias("__t"))
            .unionByName(rd.select(F.col("__rt").alias("__t")))
            .agg(F.min("__t").alias("lo"), F.max("__t").alias("hi"))
            .first()
        )
        if bounds["lo"] is not None:
            lcp = _common_prefix(bounds["lo"], bounds["hi"])
    def _stripped(col_name: str):
        return F.substring(F.col(col_name), lcp + 1, 1 << 30) if lcp else F.col(col_name)

    rseg = rd.select(
        "__rt", _stripped("__rt").alias("__rs")
    ).select(
        "__rt", "__rs", F.length("__rs").alias("__rl"), F.explode(_seg_keys(F.col("__rs"))).alias("sk")
    ).select("__rt", "__rs", "__rl", F.col("sk.i").alias("i"), F.col("sk.seg").alias("seg"))
    lsub = ld.select(
        "__lt", _stripped("__lt").alias("__ls")
    ).select(
        "__lt", "__ls", F.explode(_sub_keys(F.col("__ls"))).alias("sk")
    ).select("__lt", "__ls", F.col("sk.l").alias("__rl"), F.col("sk.i").alias("i"), F.col("sk.seg").alias("seg"))

    if max_candidates is not None:
        # probe the join's output size before paying for it: per-key row
        # counts on each side, summed products — a few small aggs over the
        # (persisted) key tables, never the candidate rows themselves
        lsub = register_persisted(lsub.persist())
        rseg = register_persisted(rseg.persist())
        keys = ["__rl", "i", "seg"]
        est_row = (
            lsub.groupBy(*keys).agg(F.count(F.lit(1)).alias("__lc"))
            .join(rseg.groupBy(*keys).agg(F.count(F.lit(1)).alias("__rc")), keys)
            .agg(F.sum(F.col("__lc") * F.col("__rc")).alias("est"))
            .first()
        )
        est = est_row["est"] or 0
        if est > max_candidates:
            raise RuntimeError(
                f"edit_distance_join candidate estimate {est:,} exceeds "
                f"max_candidates={max_candidates:,} — the corpus has a "
                "degenerate shared-segment cluster (ID-like strings with a "
                "long common prefix that global stripping cannot remove, or "
                "a huge near-uniform-length block). Strip the per-cluster "
                "constant prefix, raise max_candidates (the estimate counts "
                "pre-dedup candidate rows, so it overcounts pairs sharing "
                "several segments), tighten max_dist, or pass "
                "max_candidates=None to run unguarded."
            )

    cand = (
        lsub.join(rseg, ["__rl", "i", "seg"])
        .select("__lt", "__ls", "__rt", "__rs")
        .dropDuplicates(["__lt", "__rt"])
    )
    # verify on the stripped pair: ed(P+u, P+v) == ed(u, v) when P is
    # shared, and the corpus LCP is shared by every surviving pair
    verified = (
        cand.withColumn("dist", F.levenshtein("__ls", "__rs"))
        .filter(F.col("dist") <= k)
    )
    return (
        verified.join(lm, "__lt")
        .join(rm, "__rt")
        .select(F.col("__lid").alias(left_id), F.col("__rid").alias(right_id), "dist")
    )
