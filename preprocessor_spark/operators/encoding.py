"""K-fold out-of-fold target encoding — the leakage-safe tabular-ML codec.

Mean-target encoding computed the only defensible way: each row's encoded
value is the target mean of its category EXCLUDING the row's own fold
(Micci-Barreca, SIGKDD Explorations 2001; the category_encoders /
kaggle-standard construction), so the encoding never sees the row's own
label. Complements the fit/transform encoders in
`functions/categorical.py` (one-hot, label, rare-shrink — reference
counterpart `/root/reference/clearbox_preprocessor/preprocessor.py`'s
categorical pipeline), which are target-free.

Distributed + engine-portable by construction:

- fold = stable md5 bucket of the row key (`splits.split_bucket_expr` —
  the repo-wide content-addressed idiom, replayed exactly by DuckDB as
  ``CAST(('0x' || substr(md5(key), 1, 8)) AS BIGINT) % 10000 % k``);
- ONE groupBy(category, fold) computes exact DECIMAL target sums and
  counts (map-side combined, output = |cats|·k rows);
- per-category totals derive from that tiny frame (window over the
  bounded cell frame, never over data);
- OOF mean = (tot_sum − fold_sum) / (tot_cnt − fold_cnt) with optional
  global-mean smoothing — one deterministic double expression over exact
  DECIMAL/int scalars, hence VALUE-oracle-able;
- rows join the |cats|·k encoding table back by (category, fold) —
  a broadcast join in any sane plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from preprocessor_spark.operators.splits import split_bucket_expr

_DEC = "decimal(38,8)"


def oof_fold_expr(key, k: int, salt: str = ""):
    """Stable fold id in [0, k): the md5 bucket folded modulo k."""
    return split_bucket_expr(key, salt) % k


def target_encode_oof(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    key_col: str,
    k: int = 5,
    smoothing: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """The (category, fold) → encoded-value table.

    ``smoothing`` m blends toward the out-of-fold GLOBAL mean with weight
    m pseudo-observations: (oof_sum + m·g) / (oof_cnt + m). A category
    whose out-of-fold count is zero (single-fold category) encodes to the
    out-of-fold global mean. Apply to rows by joining on (cat, fold) with
    :func:`oof_fold_expr` — the table is |cats|·k rows, broadcastable.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # note: when BUCKETS % k != 0 fold sizes skew by <= 1/10000 — accepted,
    # the md5-bucket replay contract matters more than perfect balance
    t = F.col(target_col).cast(_DEC)
    cells = (
        df.where(
            F.col(cat_col).isNotNull()
            & F.col(target_col).isNotNull()
            & F.col(key_col).isNotNull()
        )
        .groupBy(
            F.col(cat_col).alias("category"),
            oof_fold_expr(F.col(key_col), k, salt).alias("fold"),
        )
        .agg(F.sum(t).alias("s"), F.count(F.lit(1)).alias("c"))
    )
    # bounded |cats|·k frame from here on
    wc = Window.partitionBy("category")
    wf = Window.partitionBy("fold")
    wg = Window.partitionBy()
    tot_s, tot_c = F.sum("s").over(wc), F.sum("c").over(wc)
    fold_s, fold_c = F.sum("s").over(wf), F.sum("c").over(wf)
    all_s, all_c = F.sum("s").over(wg), F.sum("c").over(wg)
    oof_s = (tot_s - F.col("s")).cast("double")
    oof_c = (tot_c - F.col("c")).cast("double")
    # out-of-fold GLOBAL mean: excludes the row's ENTIRE fold (all
    # categories), not just this cell — same-fold labels of other
    # categories must not leak into the smoothing prior / fallback
    g = ((all_s - fold_s).cast("double")) / ((all_c - fold_c).cast("double"))
    m = float(smoothing)
    enc = F.when(oof_c > 0, (oof_s + F.lit(m) * g) / (oof_c + F.lit(m))).otherwise(g)
    return cells.select(
        "category",
        "fold",
        F.col("c").alias("n_in_fold"),
        (tot_c - F.col("c")).alias("n_oof"),
        F.round(enc, 6).alias("encoded"),
    )
