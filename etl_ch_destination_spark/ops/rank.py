"""Scale-safe global ranking.

A bare ``Window.orderBy(...)`` with no ``partitionBy`` funnels every
row through ONE task — fine on a laptop, dead at 100 TB. The
scale-safe idiom implemented here:

1. bucket rows by value ranges of the leading sort key
   (approx-percentile boundaries — deterministic given the data,
   unlike ``repartitionByRange`` whose sampled boundaries can differ
   between the jobs that reuse them);
2. rank *within* each bucket with a partitioned window (parallel);
3. add cumulative bucket offsets from a tiny per-bucket count
   (driver-side state bounded by the bucket count, never the row
   count).

Costs one extra pass over the input (the counts job); both passes are
embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_rank(
    df: DataFrame,
    order: list[Column],
    lead: str,
    descending: bool = False,
    name: str = "pos",
    buckets: int = 64,
) -> DataFrame:
    """Append a 1-based global rank column under the TOTAL order ``order``.

    ``lead`` is the leading sort key (numeric), used only for bucketing —
    boundary accuracy affects balance, never correctness. ``order`` must be
    a total order (include a unique tiebreaker). NULLs in ``lead`` land in
    the extreme bucket; ``order`` must place them consistently with the
    intended global order (e.g. ``desc_nulls_last``).
    """
    spark = df.sparkSession
    probs = [i / buckets for i in range(1, buckets)]
    row = df.select(F.percentile_approx(lead, probs, 10_000).alias("b")).first()
    bounds = sorted(set(row["b"] or []), reverse=descending)

    c = F.col(lead)
    bucket: Column = F.lit(0)
    for b in bounds:
        past = (c < F.lit(b)) if descending else (c > F.lit(b))
        bucket = bucket + F.when(past, 1).otherwise(0)
    bucket = F.when(c.isNull(), F.lit(len(bounds))).otherwise(bucket).cast("int")

    # Deliberately NOT persisted between the counts job and the rank
    # job: the bucket bounds are baked in as literals, so recompute
    # yields identical bucket assignment for any deterministic source,
    # and re-running the columnar scan keeps parquet pushdown +
    # whole-stage codegen that an InMemoryTableScan would forfeit
    # (measured ~1.6× faster than persist() at sf0.1). Nondeterministic
    # sources (samples, RNG columns) must be materialized by the caller
    # first.
    bucketed = df.withColumn("__bkt", bucket)
    counts = bucketed.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__cnt")).collect()
    acc = 0
    offsets = []
    for r in sorted(counts, key=lambda r: r["__bkt"]):
        offsets.append((r["__bkt"], acc))
        acc += r["__cnt"]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__bkt int, __off long")

    w = Window.partitionBy("__bkt").orderBy(*order)
    return (
        bucketed.join(F.broadcast(off_df), "__bkt")
        .withColumn(name, (F.col("__off") + F.row_number().over(w)).cast("long"))
        .drop("__bkt", "__off")
    )


def with_global_cumsum(
    df: DataFrame,
    order: list[Column],
    lead: str,
    value: str,
    descending: bool = False,
    name: str = "cum",
    buckets: int = 64,
) -> DataFrame:
    """Append the global running sum of ``value`` under the TOTAL
    order ``order`` — the scale-safe form of
    ``SUM(value) OVER (ORDER BY ...)``, built exactly like
    with_global_rank: value-range bucketing on ``lead``, a parallel
    per-bucket cumulative window, and broadcast per-bucket SUM offsets
    (driver state = |buckets| scalars). ``value`` must be integral
    (int64 additions are order-insensitive; float cumsums are not
    deterministic under re-bucketing)."""
    spark = df.sparkSession
    probs = [i / buckets for i in range(1, buckets)]
    row = df.select(F.percentile_approx(lead, probs, 10_000).alias("b")).first()
    bounds = sorted(set(row["b"] or []), reverse=descending)

    c = F.col(lead)
    bucket: Column = F.lit(0)
    for b in bounds:
        past = (c < F.lit(b)) if descending else (c > F.lit(b))
        bucket = bucket + F.when(past, 1).otherwise(0)
    bucket = F.when(c.isNull(), F.lit(len(bounds))).otherwise(bucket).cast("int")

    bucketed = df.withColumn("__bkt", bucket)
    sums = (
        bucketed.groupBy("__bkt")
        .agg(F.sum(value).cast("long").alias("__s"))
        .collect()
    )
    acc = 0
    offsets = []
    for r in sorted(sums, key=lambda r: r["__bkt"]):
        offsets.append((r["__bkt"], acc))
        acc += r["__s"]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__bkt int, __off long")

    w = (
        Window.partitionBy("__bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bucketed.join(F.broadcast(off_df), "__bkt")
        .withColumn(
            name, (F.col("__off") + F.sum(value).over(w)).cast("long")
        )
        .drop("__bkt", "__off")
    )
