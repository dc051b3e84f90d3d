"""SparkSession factory (SURVEY.md §7 Phase 0).

Scale notes (100 TB design): on a real cluster the same builder is used
with ``master`` unset (picked up from spark-submit), AQE handles
post-shuffle coalescing + skew joins at runtime, and
``spark.sql.shuffle.partitions`` should be ~2-3x total executor cores
(here sized for local[32]). Session timezone is pinned to UTC because
fixture timestamps are naive (FIXTURES.md) and ClickHouse DateTime is
timezone-naive at rest.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def _pin_os_utc() -> None:
    """Pin the Python process timezone to UTC.

    Non-Arrow ``DataFrame.collect()`` converts TimestampType through the
    driver's OS timezone; on a non-UTC host, timestamp-returning
    oracle-checked queries would drift from DuckDB's naive timestamps
    even with the Spark session timezone pinned.
    """
    if os.environ.get("TZ") != "UTC":
        os.environ["TZ"] = "UTC"
        if hasattr(time, "tzset"):
            time.tzset()


def get_spark(
    app_name: str = "etl-ch-destination-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    AQE on (runtime re-plan, skew-join splitting, partition coalescing),
    UTC session time, Arrow enabled for the pandas-UDF paths.
    """
    _pin_os_utc()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_session_defaults(spark: SparkSession) -> SparkSession:
    """Pin engine-required session state on an externally-provided session.

    The driver harness passes its own SparkSession to ``queries()``
    callables. Idempotent; set once per session here rather than
    per-table-load so concurrent readers never race on session confs
    (VERDICT r1 "What's wrong" #5):

    - UTC session + OS timezone: naive fixture timestamps hash-match the
      DuckDB oracle only under UTC.
    - ``nanosAsLong``: the ``events`` fixture stores TIMESTAMP(NANOS),
      which Spark's vectorized parquet reader otherwise rejects.
    """
    _pin_os_utc()
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


# Backwards-compatible name used by round-1 call sites.
ensure_utc = ensure_session_defaults
