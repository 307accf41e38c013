"""Spark 4 POLYMORPHIC UDTF: output schema computed by a static ``analyze``
from the literal schema argument, so one registered function parses any
delimited layout — ``SELECT * FROM delimited_parse(line, 'a int, b string',
',')``.

Lives in its own module on purpose: the UDTF's analyze/eval run in
sessionless Python workers that re-import the defining module, so it must
be importable with no SparkSession side effects (udx.py's module-level
pandas_udf decorator is exactly such a side effect). For the same reason
the DDL mini-parser below is hand-rolled — ``StructType.fromDDL`` needs a
JVM the workers don't have.

The JVM twin is the built-in ``from_csv`` (asserted identical in tests) —
use that on the hot path; the UDTF form exists for the table-function call
surface and for layouts computed at call time.
"""

from __future__ import annotations


def _simple_ddl_fields(ddl: str) -> list[tuple[str, str]]:
    out = []
    for part in ddl.split(","):
        name, typ = part.strip().split(None, 1)
        out.append((name, typ.strip().lower()))
    return out


def _simple_ddl_struct(ddl: str):
    from pyspark.sql.types import (
        DoubleType, FloatType, IntegerType, LongType, StringType,
        StructField, StructType,
    )

    types = {
        "int": IntegerType(), "integer": IntegerType(),
        "bigint": LongType(), "long": LongType(),
        "double": DoubleType(), "float": FloatType(),
        "string": StringType(),
    }
    return StructType(
        [StructField(n, types[t]) for n, t in _simple_ddl_fields(ddl)]
    )


def make_delimited_parse_udtf():
    """Build the UDTF class (lazily — @udtf needs an active session)."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class DelimitedParse:
        @staticmethod
        def analyze(
            line: AnalyzeArgument, schema: AnalyzeArgument, delim: AnalyzeArgument
        ) -> AnalyzeResult:
            if not schema.isConstantExpression:
                raise ValueError("schema argument must be a literal DDL string")
            return AnalyzeResult(_simple_ddl_struct(schema.value))

        def eval(self, line: str, schema: str, delim: str):
            if line is None:
                return
            fields = _simple_ddl_fields(schema)
            parts = line.split(delim)
            row = []
            for i, (_, t) in enumerate(fields):
                raw = parts[i] if i < len(parts) and parts[i] != "" else None
                if raw is None:
                    row.append(None)
                elif t in ("int", "integer", "bigint", "long", "smallint", "tinyint"):
                    row.append(int(raw))
                elif t in ("double", "float"):
                    row.append(float(raw))
                else:
                    row.append(raw)
            yield tuple(row)

    return DelimitedParse
