"""Deduplication operators.

ClickHouse analog: ReplacingMergeTree collapses rows sharing the
sorting key at merge time, keeping the max-version row; ``FINAL``
forces it at query time. Spark has no merge-time concept, so the
engine exposes the query-time form as a library op.

Scale notes (100 TB): one shuffle on the dedup key; the window form
is deterministic under any partitioning (never use
``orderBy().dropDuplicates()`` — its winner depends on partition
scan order). With AQE on, skewed keys are split automatically; for a
known-hot key space use ``ops.salting``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_by_key(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
) -> DataFrame:
    """Keep exactly one row per key: the first under ``order_by``.

    ``order_by`` must be a TOTAL order within each key group (include a
    unique tiebreaker such as the row's primary key) or the result is
    nondeterministic under shuffle.

    ReplacingMergeTree(ver) ≡ ``latest_by_key(df, [sort_key],
    [F.desc(ver), F.desc(pk)])``.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal (hash-groupBy under the hood).

    Equivalent to ``SELECT DISTINCT``; one shuffle on all (or the
    given) columns. Partial aggregation removes intra-partition
    duplicates before the exchange, so shuffle volume is bounded by
    the distinct count, not the row count.
    """
    return df.dropDuplicates(cols) if cols else df.distinct()
