"""Matrix profile (STOMP) and CWT ridge-line peak counting per series.

Closes the final two documented tsfresh residuals (reference escapes to the
tsfresh library at ``clearbox_preprocessor/preprocessor.py:558-638``; tsfresh
itself returns NaN for ``matrix_profile`` / ``query_similarity_count``
without its optional native ``matrixprofile``/``stumpy`` dependencies and
needs scipy for ``number_cwt_peaks`` — both are re-expressed here in pure
numpy from the published algorithms):

- **STOMP** (Zhu et al., "Matrix Profile II", ICDM 2016): the z-normalized
  matrix profile via the O(1) sliding-dot-product recursion
  ``QT[j] = QT[j-1] - x[i-1]*x[j-1] + x[i+m-1]*x[j+m-1]`` — O(n) per row,
  O(n^2) per series, fully vectorized across ``j`` with numpy. Trivial
  matches are suppressed with the standard ``ceil(m/4)`` exclusion zone.
- **MASS-style query counting** (``query_similarity_count``): the distance
  profile of one query subsequence against a series, counted below a
  threshold.
- **find_peaks_cwt**: scipy's public ridge-line algorithm (CWT with Ricker
  wavelets -> per-row relative maxima -> ridge lines connected within
  ``width/4`` column drift and ``ceil(widths[0])`` row gaps -> filtered on
  length >= n_rows/4 and SNR >= 1 against the 10th-percentile noise floor of
  the smallest-width row), re-implemented from the published description.
  ``number_cwt_peaks_n_{1,5}`` are the tsfresh parameterizations.

Spark shape — identical to the spectral tier (one keyed shuffle): ``groupBy
(id).agg(sort_array(collect_list(struct(order, value))))`` gathers each
series sorted on its executor, then ONE Arrow-batched ``mapInPandas`` stage
runs the numpy kernels per series. Nothing gathers to the driver; at 100 TB
the cost scales with the NUMBER of series (each task holds one series at a
time), the same locality contract tsfresh itself requires.

Grading: rows-only by design (iterative float recursions are not
DuckDB-replayable); ``tests/test_matrix_profile.py`` checks STOMP exactly
against an independent brute-force z-normalized scan, planted motif/discord
recovery, the degenerate (constant / short) contracts, and CWT peak counts
on constructed multi-bump signals.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from preprocessor_spark.operators.ts_features import _NUMERIC_TYPES
from preprocessor_spark.operators.ts_spectral import _ricker

MP_STATS = ("min", "max", "mean", "median", "p25", "p75")
CWT_PEAK_NS = (1, 5)  # tsfresh number_cwt_peaks default grid


# ---------------------------------------------------------------- STOMP --
def _sliding_stats(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Means and stds of every length-m window, O(n) via cumulative sums."""
    c = np.cumsum(np.concatenate(([0.0], x)))
    c2 = np.cumsum(np.concatenate(([0.0], x * x)))
    s = c[m:] - c[:-m]
    s2 = c2[m:] - c2[:-m]
    mu = s / m
    var = np.maximum(s2 / m - mu * mu, 0.0)
    return mu, np.sqrt(var)


def _dist_row(
    qt: np.ndarray, m: int, mu_i: float, sig_i: float, mu: np.ndarray, sig: np.ndarray
) -> np.ndarray:
    """z-normalized distances of window i (stats mu_i/sig_i, dot products qt
    against every window) to all windows. Constant-window convention
    (stumpy's): both flat -> 0, exactly one flat -> sqrt(m)."""
    d = np.empty_like(qt)
    ok = (sig > 0) & (sig_i > 0)
    if ok.any():
        corr = (qt[ok] - m * mu_i * mu[ok]) / (m * sig_i * sig[ok])
        d[ok] = np.sqrt(np.maximum(2.0 * m * (1.0 - np.minimum(corr, 1.0)), 0.0))
    both_flat = (sig == 0) & (sig_i == 0)
    d[both_flat] = 0.0
    d[~ok & ~both_flat] = math.sqrt(m)
    return d


def stomp(x: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Matrix profile + profile index of ``x`` with window ``m``.

    Returns (mp, mpi) of length n-m+1; mp[i] is the z-normalized Euclidean
    distance from window i to its nearest non-trivial match, mpi[i] that
    match's start. Exclusion zone ceil(m/4) around the diagonal.
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    k = n - m + 1
    if m < 3 or k < 2:
        return np.full(max(k, 0), np.nan), np.full(max(k, 0), -1)
    mu, sig = _sliding_stats(x, m)
    excl = int(math.ceil(m / 4))

    qt = np.array(
        [float(np.dot(x[:m], x[j : j + m])) for j in range(k)], dtype=np.float64
    )
    qt_first = qt.copy()  # row 0 dot products, reused to start each column
    mp = np.full(k, np.inf)
    mpi = np.full(k, -1, dtype=np.int64)
    for i in range(k):
        if i > 0:
            # STOMP recursion: shift the dot products one step along the diagonal
            qt[1:] = qt[:-1] - x[i - 1] * x[: k - 1] + x[i + m - 1] * x[m : m + k - 1]
            qt[0] = qt_first[i]
        d = _dist_row(qt, m, mu[i], sig[i], mu, sig)
        lo, hi = max(0, i - excl), min(k, i + excl + 1)
        d[lo:hi] = np.inf
        j = int(np.argmin(d))
        if np.isfinite(d[j]):
            mp[i] = d[j]
            mpi[i] = j
    mp[~np.isfinite(mp)] = np.nan
    return mp, mpi


def mass_distance_profile(query: np.ndarray, x: np.ndarray) -> np.ndarray:
    """z-normalized distances of ``query`` to every window of ``x``."""
    query = np.asarray(query, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    m = query.size
    k = x.size - m + 1
    if k < 1:
        return np.empty(0)
    mu, sig = _sliding_stats(x, m)
    qmu, qsig = float(query.mean()), float(query.std())
    qt = np.array(
        [float(np.dot(query, x[j : j + m])) for j in range(k)], dtype=np.float64
    )
    return _dist_row(qt, m, qmu, qsig, mu, sig)


def query_similarity_count(
    x: np.ndarray, query: np.ndarray, threshold: float
) -> float:
    """tsfresh ``query_similarity_count`` (normalize=True): number of
    windows of ``x`` whose z-normalized distance to ``query`` is below
    ``threshold``."""
    d = mass_distance_profile(query, x)
    if d.size == 0:
        return float("nan")
    return float(np.count_nonzero(d < threshold))


def matrix_profile_summary(v: np.ndarray, window: int | None = None) -> dict:
    """Per-series feature dict: the six tsfresh summary stats of the matrix
    profile plus motif/discord locations (the actionable outputs for
    training-data QA: motif = most repeated shape, discord = anomaly)."""
    v = np.asarray(v, dtype=np.float64)
    v = v[np.isfinite(v)]
    n = v.size
    m = window if window is not None else max(4, n // 4)
    out: dict[str, float] = {f"matrix_profile_{s}": np.nan for s in MP_STATS}
    out.update(
        {
            "matrix_profile_window": float(m),
            "motif_position": np.nan,
            "motif_distance": np.nan,
            "discord_position": np.nan,
            "discord_distance": np.nan,
        }
    )
    if n - m + 1 < 2 or m < 3:
        return out
    mp, _ = stomp(v, m)
    finite = mp[np.isfinite(mp)]
    if finite.size == 0:
        return out
    out["matrix_profile_min"] = float(np.min(finite))
    out["matrix_profile_max"] = float(np.max(finite))
    out["matrix_profile_mean"] = float(np.mean(finite))
    out["matrix_profile_median"] = float(np.median(finite))
    out["matrix_profile_p25"] = float(np.percentile(finite, 25))
    out["matrix_profile_p75"] = float(np.percentile(finite, 75))
    ok = np.where(np.isfinite(mp))[0]
    out["motif_position"] = float(ok[np.argmin(mp[ok])])
    out["motif_distance"] = out["matrix_profile_min"]
    out["discord_position"] = float(ok[np.argmax(mp[ok])])
    out["discord_distance"] = out["matrix_profile_max"]
    return out


# ------------------------------------------------------ find_peaks_cwt --
def _cwt_ricker(x: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """scipy.signal.cwt with the Ricker wavelet: per width, 'same'-mode
    convolution with a wavelet of min(10*width, n) points."""
    n = x.size
    out = np.empty((len(widths), n))
    for i, w in enumerate(widths):
        wav = _ricker(min(10 * int(w), n), float(w))
        out[i] = np.convolve(x, wav, mode="same")
    return out


def _rel_maxima(row: np.ndarray) -> np.ndarray:
    """Boolean mask of strict one-neighbor relative maxima (order=1, clip)."""
    n = row.size
    if n == 0:
        return np.zeros(0, dtype=bool)
    left = np.empty(n)
    right = np.empty(n)
    left[0], left[1:] = row[0], row[:-1]  # clip mode: edges compare to self
    right[-1], right[:-1] = row[-1], row[1:]
    return (row > left) & (row > right)


def _identify_ridge_lines(matr: np.ndarray, max_distances: np.ndarray, gap_thresh: float):
    """scipy's ridge-line tracker: start at the largest width that has any
    relative maximum, walk toward width 0 connecting each new maximum to the
    nearest open line within max_distances[row]; close lines whose gap run
    exceeds gap_thresh."""
    all_max = np.array([_rel_maxima(matr[r]) for r in range(matr.shape[0])])
    has_relmax = np.nonzero(all_max.any(axis=1))[0]
    if len(has_relmax) == 0:
        return []
    start_row = has_relmax[-1]
    ridge_lines = [
        [[start_row], [int(c)], 0] for c in np.nonzero(all_max[start_row])[0]
    ]
    final_lines = []
    for row in range(start_row - 1, -1, -1):
        this_max_cols = np.nonzero(all_max[row])[0]
        for line in ridge_lines:
            line[2] += 1
        prev_cols = np.array([line[1][-1] for line in ridge_lines])
        for col in this_max_cols:
            line = None
            if prev_cols.size:
                closest = int(np.argmin(np.abs(col - prev_cols)))
                if abs(col - prev_cols[closest]) <= max_distances[row]:
                    line = ridge_lines[closest]
            if line is not None:
                line[0].append(row)
                line[1].append(int(col))
                line[2] = 0
            else:
                ridge_lines.append([[row], [int(col)], 0])
        for line in ridge_lines[:]:
            if line[2] > gap_thresh:
                final_lines.append(line)
                ridge_lines.remove(line)
    out = []
    for line in final_lines + ridge_lines:
        order = np.argsort(line[0])
        out.append(
            (np.asarray(line[0])[order], np.asarray(line[1])[order])
        )
    return out


def _filter_ridge_lines(
    cwt_mat: np.ndarray,
    ridge_lines,
    min_length: float | None = None,
    min_snr: float = 1.0,
    noise_perc: float = 10.0,
    window_size: float | None = None,
):
    num_points = cwt_mat.shape[1]
    if min_length is None:
        min_length = math.ceil(cwt_mat.shape[0] / 4)
    if window_size is None:
        window_size = math.ceil(num_points / 20)
    window_size = int(window_size)
    hf, odd = divmod(window_size, 2)
    row_one = cwt_mat[0, :]
    noises = np.array(
        [
            np.percentile(
                row_one[max(i - hf, 0) : min(i + hf + odd, num_points)], noise_perc
            )
            for i in range(num_points)
        ]
    )

    def keep(line) -> bool:
        rows, cols = line
        if len(rows) < min_length:
            return False
        noise = noises[cols[0]]
        if noise == 0:
            # scipy evaluates abs(signal/0): inf >= min_snr keeps a nonzero
            # signal, but 0/0 = nan fails `nan >= min_snr` and DROPS the
            # line — match that, or all-zero segments count phantom peaks
            return cwt_mat[rows[0], cols[0]] != 0
        return abs(cwt_mat[rows[0], cols[0]] / noise) >= min_snr

    return [l for l in ridge_lines if keep(l)]


def find_peaks_cwt(x: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Peak locations by CWT ridge-line tracking (scipy defaults: gap
    threshold ceil(widths[0]), drift widths/4, min ridge length n_rows/4,
    SNR >= 1 vs the 10th-percentile noise floor)."""
    widths = np.asarray(widths, dtype=float)
    gap_thresh = math.ceil(widths[0])
    max_distances = widths / 4.0
    mat = _cwt_ricker(np.asarray(x, dtype=np.float64), widths)
    ridge = _identify_ridge_lines(mat, max_distances, gap_thresh)
    filtered = _filter_ridge_lines(mat, ridge)
    locs = np.asarray(sorted(line[1][0] for line in filtered))
    return locs


def number_cwt_peaks(v: np.ndarray, n: int) -> float:
    """tsfresh ``number_cwt_peaks`` param n: peaks found with Ricker widths
    1..n."""
    v = np.asarray(v, dtype=np.float64)
    v = v[np.isfinite(v)]
    if v.size < 3:
        return float("nan")
    return float(len(find_peaks_cwt(v, np.arange(1, n + 1))))


def count_query_matches(
    data: DataFrame,
    time: str,
    column_id: str,
    value_col: str,
    query: list[float],
    threshold: float,
) -> DataFrame:
    """Per series id: how many windows z-normalize-match ``query`` below
    ``threshold`` (tsfresh ``query_similarity_count``, normalize=True) —
    the motif-census shape ("how often does this pattern occur per
    entity"). Same one-keyed-shuffle + one-Arrow-stage plan as the feature
    extractors; the query vector ships inside the serialized closure
    (bounded: it is one window, not data)."""
    qvec = np.asarray(list(query), dtype=np.float64)
    thr = float(threshold)
    pair = F.struct(F.col(time).alias("o"), F.col(value_col).cast("double").alias("v"))
    n_part = int(data.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    gathered = (
        data.repartition(n_part, column_id)
        .groupBy(column_id)
        .agg(
            F.sort_array(
                F.collect_list(F.when(F.col(value_col).isNotNull(), pair))
            ).alias("__series")
        )
    )
    id_field = gathered.schema[column_id]
    schema = T.StructType(
        [
            T.StructField(column_id, id_field.dataType, True),
            T.StructField("n_windows", T.LongType(), True),
            T.StructField("match_count", T.LongType(), True),
        ]
    )

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            ids, nw, mc = [], [], []
            for sid, series in zip(pdf[column_id], pdf["__series"]):
                vv = np.array([p["v"] for p in series], dtype=float)
                vv = vv[np.isfinite(vv)]
                d = mass_distance_profile(qvec, vv)
                ids.append(sid)
                nw.append(len(d))
                mc.append(int(np.count_nonzero(d < thr)))
            yield pd.DataFrame(
                {column_id: ids, "n_windows": nw, "match_count": mc}
            )

    return gathered.mapInPandas(compute, schema=schema)


# ------------------------------------------------------- Spark operator --
MP_FEATURES: tuple[str, ...] = tuple(
    [f"matrix_profile_{s}" for s in MP_STATS]
    + [
        "matrix_profile_window",
        "motif_position",
        "motif_distance",
        "discord_position",
        "discord_distance",
    ]
    + [f"number_cwt_peaks_n_{n}" for n in CWT_PEAK_NS]
)


def extract_matrix_profile(
    data: DataFrame,
    time: str,
    column_id: str,
    value_cols: list[str] | None = None,
    window: int | None = None,
    round_decimals: int | None = None,
) -> DataFrame:
    """One row per series id: matrix-profile summary stats, motif/discord
    locations, and CWT peak counts per numeric value column, named
    ``{col}__{feature}``. One keyed shuffle + one Arrow stage — same plan
    shape as the spectral tier. ``round_decimals`` rounds inside the Arrow
    stage (numpy half-even; a caller-side F.round projection is
    codegen-expensive at this column count)."""
    if value_cols is None:
        value_cols = [
            f.name
            for f in data.schema.fields
            if f.name not in (time, column_id)
            and isinstance(f.dataType, _NUMERIC_TYPES)
        ]
    if not value_cols:
        raise ValueError("No numeric value columns to extract features from.")

    aggs = []
    for c in value_cols:
        pair = F.struct(F.col(time).alias("o"), F.col(c).cast("double").alias("v"))
        aggs.append(
            F.sort_array(F.collect_list(F.when(F.col(c).isNotNull(), pair))).alias(
                f"__series_{c}"
            )
        )
    # Keyed repartition before the gather — same rationale as the spectral
    # tier: AQE coalesces the few-MB series shuffle to one partition, which
    # serializes the compute-bound Arrow stage; an explicit count keeps all
    # cores busy while the groupBy reuses the partitioning (one exchange).
    n_part = int(data.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    gathered = data.repartition(n_part, column_id).groupBy(column_id).agg(*aggs)

    id_field = gathered.schema[column_id]
    fields = [T.StructField(column_id, id_field.dataType, True)]
    for c in value_cols:
        fields += [
            T.StructField(f"{c}__{name}", T.DoubleType(), True)
            for name in MP_FEATURES
        ]
    schema = T.StructType(fields)
    n_feat = len(MP_FEATURES)

    def compute(batches):
        import pandas as pd

        for pdf in batches:
            nrows = len(pdf)
            out = {column_id: pdf[column_id].to_numpy()}
            for c in value_cols:
                mat = np.full((nrows, n_feat), np.nan)
                col = pdf[f"__series_{c}"].to_numpy()
                for i in range(nrows):
                    vv = np.array([p["v"] for p in col[i]], dtype=float)
                    feats = matrix_profile_summary(vv, window=window)
                    for n in CWT_PEAK_NS:
                        feats[f"number_cwt_peaks_n_{n}"] = number_cwt_peaks(vv, n)
                    mat[i, :] = [feats[k] for k in MP_FEATURES]
                if round_decimals is not None:
                    mat = np.round(mat, round_decimals)
                # NaN -> null inside the Arrow stage (validity bitmap), not
                # a JVM when(~isnan) projection — same rationale as the
                # spectral tier
                nanmask = np.isnan(mat)
                for j, name in enumerate(MP_FEATURES):
                    out[f"{c}__{name}"] = pd.arrays.FloatingArray(
                        mat[:, j], nanmask[:, j]
                    )
            yield pd.DataFrame(out)

    return gathered.mapInPandas(compute, schema=schema)
