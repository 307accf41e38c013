"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the noop sink (measures compute,
not driver-collect bandwidth).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from preprocessor_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "semi_anti_theta_counts",
    "window_orders_family",
    "topk_orders",
    "rollup_cube_grouping",
    "tumbling_json_events",
    "asof_purchase_last_view",
    "prep_value_counts_case",
    "prep_scale_stats",
    "prep_onehot_segment",
    "preprocessor_fit_transform",
    "prep_datetime_pipeline",
    "dedup_exact_documents",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    "sessionize_user_events",
    "fill_events_all",
    "embed_neardup_lsh",
    "text_profile_docs",
    "split_documents",
    "text_quality_by_source",
    "text_fingerprint",
    "ts_features_by_user",
    "knn_bruteforce",
    "knn_ivf",
    "multimodal_image_features",
    "sql_api_revenue",
    "pipeline_llm_corpus",
    "text_gopher_quality",
    "sample_hash_documents",
    "search_bm25_docs",
    "embed_normalize_quantize",
    "embed_pca_project",
    "chunk_documents_tokens",
    "pack_documents_plan",
    "pii_redaction_stats",
    "contamination_check",
    "domain_temperature_mix",
    "text_repetition_stats",
    "hll_user_rollup",
    "top_terms_skewed",
    "text_normalize_docs",
    "sample_stratified_topk",
    "dedup_minhash_corpus",
    "quantile_sketch_rollup",
    "dedup_substring_spans",
    "text_line_dedup",
    "text_lm_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("preprocessor-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Warm one-time process costs so per-query timings measure compute:
    # JVM/codegen, parquet file-index + footers, and the Python UDF worker
    # pool (spawned lazily on first pandas UDF).
    spark.range(1000).count()
    for t in ("lineitem", "orders", "customer", "part", "documents", "embeddings"):
        try:
            entrymod._t(spark, sf_dir, t).limit(1).count()
        except Exception:
            pass
    try:
        entrymod._t(spark, sf_dir, "events").limit(1).count()
    except Exception:
        pass
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(1000).select(_warm(col("id"))).count()

    # two runs per query, report the min: steady-state compute, not
    # first-touch codegen/page-cache noise
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
