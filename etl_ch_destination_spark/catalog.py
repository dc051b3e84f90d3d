"""Fixture catalog: parquet loaders + temp-view registration.

Scale notes: reads are plain ``spark.read.parquet`` so Catalyst gets
predicate pushdown / column pruning / partition pruning for free; at
100 TB the same call points at a partitioned table root and nothing
here changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from etl_ch_destination_spark.schemas import TABLES
from etl_ch_destination_spark.session import ensure_utc

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Columnar scan ≈ ClickHouse MergeTree read.

    ``events.parquet`` stores ``ts`` as TIMESTAMP(NANOS), which Spark's
    vectorized parquet reader rejects; read it as raw int64 nanos and
    convert with exact integer division (values are µs-granular, so
    the conversion is lossless — verified against DuckDB).
    """
    ensure_utc(spark)
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return spark.read.parquet(path).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a temp view (SQL entry point, SURVEY §3.2)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
