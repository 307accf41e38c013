"""Datetime inference / conversion as Spark expressions.

Re-expresses the reference's DatetimeTransformer
(`/root/reference/clearbox_preprocessor/utils/datetime_transformer.py`)
Spark-first:

- content-based inference samples 100 driver-side rows (`:57-80`, `:65`) and
  probes the same 12-format table (`:23-36`) — probing stays on the driver,
  never on executors;
- fitted columns are converted to **float epoch seconds**
  (µs timestamp / 1e6, `:51`) as plain column expressions;
- inverse converts epoch seconds back and, for string-origin columns,
  formats with the fitted pattern (`:125-128`) via ``date_format``.

The chrono/Python `%`-format ↔ Java pattern mapping is hand-built from the
reference's table. Time-only formats are promoted by prefixing
"1970-01-01 " (`:45-50`).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

# (python strptime fmt, java pattern, kind) in the reference's probe order
# (datetime_transformer.py:23-36). kind ∈ {datetime, date, time}.
FORMAT_TABLE: list[tuple[str, str, str]] = [
    ("%Y-%m-%d %H:%M:%S.%f", "yyyy-MM-dd HH:mm:ss.SSSSSS", "datetime"),
    ("%Y-%m-%d %H:%M:%S", "yyyy-MM-dd HH:mm:ss", "datetime"),
    ("%Y-%m-%dT%H:%M:%S.%f", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS", "datetime"),
    ("%Y-%m-%dT%H:%M:%S", "yyyy-MM-dd'T'HH:mm:ss", "datetime"),
    ("%Y-%m-%d %H:%M", "yyyy-MM-dd HH:mm", "datetime"),
    ("%Y-%m-%d", "yyyy-MM-dd", "date"),
    ("%d/%m/%Y", "dd/MM/yyyy", "date"),
    ("%Y-%m", "yyyy-MM", "date"),
    ("%Y", "yyyy", "date"),
    ("%H:%M:%S", "HH:mm:ss", "time"),
    ("%H:%M", "HH:mm", "time"),
    ("%H", "HH", "time"),
]

TIME_KINDS = {"time"}


def is_date_string(value: str) -> bool:
    """dateutil-based sniff (datetime_transformer.py:14-20); driver-side only."""
    try:
        from dateutil.parser import parse

        parse(value)
        return True
    except (ValueError, OverflowError, TypeError):
        return False


def probe_format(sample_values: list[str]) -> tuple[str, str, str] | None:
    """Find the first format in the reference's table that parses the first
    non-null sample (the reference probes only ``head(1)``,
    datetime_transformer.py:40). Returns (py_fmt, java_fmt, kind)."""
    first = next((v for v in sample_values if v is not None), None)
    if first is None:
        return None
    for py_fmt, java_fmt, kind in FORMAT_TABLE:
        try:
            probe = f"1970-01-01 {first}" if kind in TIME_KINDS else first
            probe_fmt = f"%Y-%m-%d {py_fmt}" if kind in TIME_KINDS else py_fmt
            # %f rejects a missing fractional part, like chrono's %.f probe
            datetime.strptime(probe, probe_fmt)
            return py_fmt, java_fmt, kind
        except (ValueError, TypeError):
            continue
    return None


def parse_to_epoch_expr(col: Column, java_fmt: str, kind: str) -> Column:
    """string → float epoch seconds (datetime_transformer.py:45-51)."""
    if kind in TIME_KINDS:
        col = F.concat(F.lit("1970-01-01 "), col)
        java_fmt = f"yyyy-MM-dd {java_fmt}"
    ts = F.to_timestamp(col, java_fmt)
    return ts.cast("double")


def native_to_epoch_expr(col: Column) -> Column:
    """Date/Timestamp column → float epoch seconds."""
    return col.cast("timestamp").cast("double")


def epoch_to_string_expr(col: Column, java_fmt: str, kind: str) -> Column:
    """float epoch seconds → original string format
    (datetime_transformer.py:125-128)."""
    ts = F.timestamp_seconds(col)
    return F.date_format(ts, java_fmt)


def epoch_to_native_expr(col: Column, dtype_simple: str) -> Column:
    """float epoch seconds → original Date/Timestamp dtype.

    Divergence (documented): the reference never restores natively-typed
    datetime columns (its ``datetime_formats`` map only covers string-origin
    columns), leaving float seconds behind; we restore the real dtype.
    """
    ts = F.timestamp_seconds(col)
    if dtype_simple == "date":
        return ts.cast("date")
    return ts.cast(dtype_simple)
