"""Distributed k-fold cross-validation for the engine-exact linear fit —
model selection infrastructure in TWO passes total, independent of k.

The naive CV loop refits k times (k scans); at 100 TB that is k wasted
passes. The moment trick collapses it: ONE groupBy(fold) computes each
fold's exact DECIMAL normal-equation moments; every fold's TRAINING
moments are then grand totals minus its own row (exact DECIMAL
subtraction on the k-row frame — leave-one-fold-out for free), and the
per-fold Cramer solve is a deterministic double expression over them. A
SECOND pass joins the broadcast k-row theta table back onto the rows and
scores each held-out fold. Two scans, any k.

Engine-portability: fold assignment is the repo's md5 bucket
(:func:`preprocessor_spark.operators.splits.split_bucket_expr`); moments
accumulate in DECIMAL(38,8) with the welch-style overflow certificate;
decimal→double goes through the floor/frac split-cast; the Cramer solve
reuses the fixed association order of
:func:`preprocessor_spark.operators.linreg._cramer2_thetas`; test
residuals² quantize to DECIMAL(28,10) before summing, so the per-fold SSE
is an exact sum of quantized values (no order-dependent float sum) — the
whole report is VALUE-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from preprocessor_spark.operators.hypotests import _dec_double

_DEC = "decimal(38,8)"
_OVERFLOW_MSG = (
    "kfold_cv_ols2: input magnitude >= 1e14 overflows the DECIMAL(18,4) "
    "moment cast to NULL under non-ANSI Spark; pre-scale the columns"
)
_SSE_OVERFLOW_MSG = (
    "kfold_cv_ols2: a held-out squared residual >= 1e18 overflows the "
    "DECIMAL(28,10) quantization cast to NULL under non-ANSI Spark; "
    "pre-scale the columns"
)


def kfold_cv_ols2(
    df: DataFrame,
    x1: str,
    x2: str,
    y: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """Per-fold OLS fit (y = θ0 + θ1·x1 + θ2·x2) trained on the OTHER k−1
    folds, scored on the held-out fold.

    Returns one row per fold: fold, n_train, n_test, theta0, theta1,
    theta2, rmse_test, r2_test (1 − SSE/SST over the held-out fold, NULL
    when the fold's y is constant). Rows with any null among x1/x2/y are
    dropped before folding.
    """
    from preprocessor_spark.operators.splits import split_bucket_expr

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    x1c = F.col(x1).cast("decimal(18,4)")
    x2c = F.col(x2).cast("decimal(18,4)")
    yc = F.col(y).cast("decimal(18,4)")
    from preprocessor_spark.caching import register_persisted

    # persisted: BOTH passes (training-moment agg and held-out scoring)
    # reference this frame, and without the cache each would re-run the
    # md5 fold bucket + the DECIMAL casts over every row — the md5 alone
    # is the single most expensive per-row expression here. Values are
    # identical either way; register_persisted lets a caller's
    # persist_scope release the cache after materializing.
    base = register_persisted(
        df.where(
            F.col(x1).isNotNull() & F.col(x2).isNotNull() & F.col(y).isNotNull()
        )
        .select(
            (split_bucket_expr(F.col(id_col)) % k).cast("int").alias("fold"),
            x1c.alias("x1d"),
            x2c.alias("x2d"),
            yc.alias("yd"),
            F.col(x1).cast("double").alias("x1v"),
            F.col(x2).cast("double").alias("x2v"),
            F.col(y).cast("double").alias("yv"),
        )
        .persist()
    )

    def _s(expr, name):
        return F.sum(expr.cast(_DEC)).alias(name)

    cells = base.groupBy("fold").agg(
        F.count("yd").alias("n"),
        F.count(F.lit(1)).alias("n_raw"),
        _s(F.col("x1d"), "s1"),
        _s(F.col("x2d"), "s2"),
        _s(F.col("x1d") * F.col("x1d"), "s11"),
        _s(F.col("x1d") * F.col("x2d"), "s12"),
        _s(F.col("x2d") * F.col("x2d"), "s22"),
        _s(F.col("yd"), "sy"),
        _s(F.col("x1d") * F.col("yd"), "s1y"),
        _s(F.col("x2d") * F.col("yd"), "s2y"),
        _s(F.col("yd") * F.col("yd"), "syy"),
    )
    wt = Window.partitionBy()
    mom = ["s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y", "syy"]
    with_tot = cells.select(
        "fold",
        "n",
        "n_raw",
        F.sum("n").over(wt).alias("tn"),
        F.sum("n_raw").over(wt).alias("tn_raw"),
        *[F.col(c) for c in mom],
        *[F.sum(c).over(wt).alias(f"t{c}") for c in mom],
    )
    # training moments = totals − held-out fold, exact in DECIMAL, then
    # split-cast; certificate on the exact grand totals
    n_t = F.coalesce(
        F.assert_true(F.col("tn") == F.col("tn_raw"), F.lit(_OVERFLOW_MSG)).cast(
            "long"
        ),
        F.col("tn") - F.col("n"),
    ).cast("double")
    tr = {c: _dec_double(F.col(f"t{c}") - F.col(c)) for c in mom}
    n, s1, s2 = n_t, tr["s1"], tr["s2"]
    s11, s12, s22 = tr["s11"], tr["s12"], tr["s22"]
    sy, s1y, s2y = tr["sy"], tr["s1y"], tr["s2y"]
    # Cramer over [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] — the
    # linreg._cramer2_thetas fixed association order
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    thetas = with_tot.select(
        "fold",
        (F.col("tn") - F.col("n")).alias("n_train"),
        F.col("n").alias("n_test"),
        (det0 / det).alias("t0"),
        (det1 / det).alias("t1"),
        (det2 / det).alias("t2"),
    )
    scored = base.join(F.broadcast(thetas), "fold")
    resid = F.col("yv") - (
        F.col("t0") + F.col("t1") * F.col("x1v") + F.col("t2") * F.col("x2v")
    )
    # quantize per-row squared residuals so the fold SSE is an exact sum
    # (a 1e-10 quantization step; order-independent by construction)
    r2q = (resid * resid).cast("decimal(28,10)")
    per_fold = scored.groupBy("fold", "n_train", "n_test", "t0", "t1", "t2").agg(
        F.sum(r2q.cast("decimal(38,10)")).alias("sse"),
        F.count(r2q).alias("n_sse"),
        F.count(F.lit(1)).alias("n_sse_raw"),
        F.sum(F.col("yd").cast(_DEC)).alias("sy_test"),
        F.sum((F.col("yd") * F.col("yd")).cast(_DEC)).alias("syy_test"),
    )
    # certificate: a |residual| >= 1e9 squares past DECIMAL(28,10)'s 18
    # integer digits and NULLs under non-ANSI Spark — that would silently
    # drop rows from the fold SSE, so fail loudly instead
    sse = F.coalesce(
        F.assert_true(
            F.col("n_sse") == F.col("n_sse_raw"), F.lit(_SSE_OVERFLOW_MSG)
        ).cast("double"),
        _dec_double(F.col("sse")),
    )
    n_te = F.col("n_test").cast("double")
    sst = _dec_double(F.col("syy_test")) - _dec_double(F.col("sy_test")) * _dec_double(
        F.col("sy_test")
    ) / n_te
    return per_fold.select(
        "fold",
        "n_train",
        "n_test",
        F.round(F.col("t0"), 6).alias("theta0"),
        F.round(F.col("t1"), 6).alias("theta1"),
        F.round(F.col("t2"), 6).alias("theta2"),
        F.round(F.sqrt(sse / n_te), 6).alias("rmse_test"),
        F.round(F.when(sst > 0, 1.0 - sse / sst), 6).alias("r2_test"),
    ).orderBy("fold")
