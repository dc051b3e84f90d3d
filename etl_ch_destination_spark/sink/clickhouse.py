"""ClickHouse JDBC sink (SURVEY §2.1 `sink_clickhouse_jdbc` — the
reference's defining operator: batched INSERT into ClickHouse over
JDBC, BASELINE.json "ClickHouse JDBC sink").

No ClickHouse server exists in this environment, so the module is
factored exactly at the testable seam:

- `ch_type` / `ddl_for`: Spark schema → ClickHouse DDL (the reverse
  of the SURVEY §1.2 type map) — pure string generation, unit-tested
  in tests/test_sinks.py;
- `jdbc_writer`: a fully-configured DataFrameWriter (driver class,
  batchsize, isolation) that the caller `.save()`s when a server is
  reachable;
- `stamp_batch`: the idempotence stamp — ClickHouse deduplicates
  identical insert blocks, and a `_batch_id` column makes replays
  deduplicable downstream too (`sink_idempotent_batch`,
  `stream_foreachbatch_sink`).

Scale notes (100 TB): one JDBC connection per partition writes
`batchsize`-row insert blocks; size partitions so a block is a few
hundred MB uncompressed (repartition before write), order rows by the
destination table's ORDER BY key within partitions so MergeTree parts
arrive pre-sorted, and keep `isolationLevel=NONE` (CH has no
transactions — retries rely on the batch stamp, not rollback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

DEFAULT_BATCH_SIZE = 100_000
JDBC_DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"


def ch_type(dt: DataType, nullable: bool = False) -> str:
    """Spark type → ClickHouse type (reverse of SURVEY §1.2)."""
    if isinstance(dt, ByteType):
        base = "Int8"
    elif isinstance(dt, ShortType):
        base = "Int16"
    elif isinstance(dt, IntegerType):
        base = "Int32"
    elif isinstance(dt, LongType):
        base = "Int64"
    elif isinstance(dt, FloatType):
        base = "Float32"
    elif isinstance(dt, DoubleType):
        base = "Float64"
    elif isinstance(dt, DecimalType):
        base = f"Decimal({dt.precision}, {dt.scale})"
    elif isinstance(dt, StringType):
        base = "String"
    elif isinstance(dt, BinaryType):
        base = "String"
    elif isinstance(dt, BooleanType):
        base = "Bool"
    elif isinstance(dt, DateType):
        base = "Date32"
    elif isinstance(dt, TimestampType):
        base = "DateTime64(6)"  # Spark timestamps are µs precision
    elif isinstance(dt, ArrayType):
        # CH forbids Nullable inside Array element types by default
        base = f"Array({ch_type(dt.elementType, nullable=False)})"
    elif isinstance(dt, MapType):
        base = (
            f"Map({ch_type(dt.keyType, False)}, {ch_type(dt.valueType, False)})"
        )
    else:
        raise TypeError(f"no ClickHouse mapping for Spark type {dt.simpleString()}")
    if nullable and not isinstance(dt, (ArrayType, MapType)):
        return f"Nullable({base})"
    return base


def ddl_for(
    schema: StructType,
    table: str,
    order_by: list[str],
    engine: str = "MergeTree",
    partition_by: str | None = None,
) -> str:
    """CREATE TABLE DDL for a Spark schema. ORDER BY columns are never
    Nullable (MergeTree key constraint)."""
    key = set(order_by)
    cols = ",\n  ".join(
        f"`{f.name}` {ch_type(f.dataType, f.nullable and f.name not in key)}"
        for f in schema.fields
    )
    ddl = f"CREATE TABLE IF NOT EXISTS {table} (\n  {cols}\n) ENGINE = {engine}()"
    if partition_by:
        ddl += f"\nPARTITION BY {partition_by}"
    ddl += "\nORDER BY (" + ", ".join(f"`{c}`" for c in order_by) + ")"
    return ddl


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    mode: str = "append",
):
    """Configured JDBC writer for a ClickHouse destination. The caller
    invokes ``.save()``; not executed here (no server in this env)."""
    return (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", JDBC_DRIVER)
        .option("batchsize", str(batch_size))
        .option("isolationLevel", "NONE")
        .mode(mode)
    )


def stamp_batch(df: DataFrame, batch_id: str) -> DataFrame:
    """Stamp a replay-stable batch id so re-delivered batches are
    deduplicable (`dropDuplicates(['_batch_id', key])` downstream)."""
    return df.withColumn("_batch_id", F.lit(batch_id))
