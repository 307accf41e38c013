"""Isotonic regression (PAV) — monotone calibration with a value oracle.

The pool-adjacent-violators algorithm (Ayer et al. 1955; the
`sklearn.isotonic` / probability-calibration standard): fit the
nondecreasing step function minimizing weighted squared error. The
classifier-calibration complement to `operators/metrics.py` (AUC says how
well scores RANK; the isotonic fit turns them into calibrated
probabilities).

Scale shape: the ONLY data-sized pass is one groupBy(x) collapsing rows to
per-distinct-x exact sums (DECIMAL Σy, int64 n) — map-side combined,
output bounded by |distinct x| (the calibration contract: scores are
binned/quantized; bin first for continuous scores — same bounded-frame
contract as `hypotests.chi2_independence`). PAV then runs once over that
bounded frame in a single Arrow task.

Engine-portable exactness (what makes a SEQUENTIAL algorithm
value-oracle-able): block means are computed as double divisions of EXACT
sums (Decimal Σy converted exactly, int64 n), and the PAV solution equals
the minimax identity ŷ_i = max_{j≤i} min_{k≥i} mean(y[j..k]) — which an
SQL engine can evaluate directly from DECIMAL prefix sums over the bounded
frame. Identical exact range-sums ⇒ identical doubles ⇒ the driver's
hash-compare passes on the full fitted table.
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEC = "decimal(38,8)"


def _pav(sy: list, n: list) -> list[float]:
    """Weighted PAV over per-x exact sums. Pools on strict violation
    (prev mean > cur mean) carrying EXACT block sums; each block's mean is
    one double division of exact values."""
    blocks = []  # [y_sum (Decimal), n_sum (int), count_of_xs]
    for s, w in zip(sy, n):
        blocks.append([Decimal(s), int(w), 1])
        while len(blocks) > 1 and (
            float(blocks[-2][0]) / blocks[-2][1]
            > float(blocks[-1][0]) / blocks[-1][1]
        ):
            s2, w2, c2 = blocks.pop()
            blocks[-1][0] += s2
            blocks[-1][1] += w2
            blocks[-1][2] += c2
    out: list[float] = []
    for s, w, c in blocks:
        out.extend([float(s) / w] * c)
    return out


def isotonic_fit(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Fitted table (x, n, y_mean, y_iso): one row per distinct x, y_iso
    nondecreasing in x. Apply to new scores with a last-step-at-or-below
    lookup (one broadcast range join — `operators/asof.py` is the keyed
    form). Rounds y columns to 6 decimals (the repo float-presentation
    contract)."""
    x, y = F.col(x_col), F.col(y_col)
    cells = (
        df.where(x.isNotNull() & y.isNotNull())
        .groupBy(x.alias("x"))
        .agg(
            F.sum(y.cast(_DEC)).alias("sy"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    x_type = cells.schema["x"].dataType
    schema = T.StructType(
        [
            T.StructField("x", x_type, True),
            T.StructField("n", T.LongType(), False),
            T.StructField("y_mean", T.DoubleType(), True),
            T.StructField("y_iso", T.DoubleType(), True),
        ]
    )

    def fit(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values("x").reset_index(drop=True)
        iso = _pav(list(pdf["sy"]), list(pdf["n"]))
        return pd.DataFrame(
            {
                "x": pdf["x"],
                "n": pdf["n"].astype("int64"),
                "y_mean": [
                    round(float(s) / int(w), 6)
                    for s, w in zip(pdf["sy"], pdf["n"])
                ],
                "y_iso": [round(v, 6) for v in iso],
            }
        )

    # single bounded group — the |distinct x| cardinality contract above
    return cells.groupBy(F.lit(1).alias("__g")).applyInPandas(fit, schema=schema)
