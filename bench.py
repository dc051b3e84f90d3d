#!/usr/bin/env python
"""Benchmark runner (driver contract + BASELINE.md protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; per query: one
warm-up run, then 3 timed runs, median reported. Execution sinks into
`format("noop")` so the full plan runs without driver-side transfer
costing the measurement.

Prints exactly ONE JSON line to stdout:
  {"metric": "suite_wall_sec", "value": N, "unit": "sec",
   "queries": {...}, "sf": ..., "config": {...}}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Headline set: one representative per cost class (scan, Q1-shape agg,
# big joins incl. salted, windows, per-key top-n, global sort+rank,
# exploding text agg, vector search, sessionization, streaming sink).
BENCH_KEYS = [
    "scan_parquet",
    "agg_groupby_multi",
    "join_inner_equi",
    "join_skew_salted",
    "join_asof",
    "win_ranking",
    "limit_by",
    "sort_multikey",
    "dedup_by_key_latest",
    "llm_tfidf_terms",
    "llm_sim_topk_exact",
    "llm_dedup_near",
    "llm_dedup_simhash",
    "llm_dedup_clusters",
    "llm_quality_score",
    "agg_window_funnel",
    "agg_state_merge",
    "win_sessionize",
    "stream_session_gap",
    "stream_foreachbatch_sink",
    # composed TPC-H-shaped reports (§2.12) — the end-to-end workload
    "rpt_revenue_forecast",
    "rpt_shipping_priority",
    "rpt_local_supplier_volume",
    "rpt_product_profit",
    "rpt_large_volume_orders",
]

N_RUNS = 3


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")

    from pyspark.sql import SparkSession

    from etl_ch_destination_spark.session import ensure_session_defaults

    spark = (
        SparkSession.builder.appName("etl-ch-destination-spark-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    ensure_session_defaults(spark)
    spark.sparkContext.setLogLevel("ERROR")

    from etl_ch_destination_spark.registry import all_queries

    queries = all_queries()
    timings: dict[str, float] = {}
    for key in BENCH_KEYS:
        fn = queries[key]

        def run() -> float:
            t0 = time.monotonic()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            return time.monotonic() - t0

        try:
            run()  # warm-up (JIT, code cache, FS cache)
            timings[key] = round(statistics.median(run() for _ in range(N_RUNS)), 3)
        except Exception as exc:  # a broken key must not zero the whole bench
            print(f"bench {key} failed: {exc}", file=sys.stderr)
            timings[key] = -1.0
        # keys that persist() (neardup, ivf) must not hold executor
        # memory against later keys — each key measures from a cold cache
        spark.catalog.clearCache()

    ok = {k: v for k, v in timings.items() if v >= 0}
    result = {
        "metric": "suite_wall_sec",
        "value": round(sum(ok.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "config": {
            "master": f"local[{cpus}]",
            "shuffle_partitions": int(shuffle),
            "aqe": True,
            "runs": N_RUNS,
            "os_cpus": os.cpu_count(),
        },
    }
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
