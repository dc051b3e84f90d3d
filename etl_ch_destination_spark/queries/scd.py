"""Slowly-changing-dimension maintenance (SCD Type 2) — the warehouse
counterpart of the engine's ReplacingMergeTree dedup (SCD1,
`dedup_by_key_latest`): instead of keeping only the latest row per
key, keep EVERY version with a validity interval.

ClickHouse analog: a versioned dimension table maintained by inserts
plus `ORDER BY (key, valid_from)` reads; the interval stitching here
is what a CH user does with `lead()` over the version history.

Scale notes (100 TB): one union (no shuffle), one window over
(key, valid_from) — a single hash shuffle on the dimension key, frame
bounded per key by the number of versions (tiny). The change-detection
aggregate on orders does map-side partial aggregation first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.registry import query


@query(
    "dim_scd2_history",
    """
    WITH changes AS (
      SELECT o_custkey AS c_custkey, MAX(o_orderdate) AS eff
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_totalprice > 200000
      GROUP BY o_custkey
    ),
    versions AS (
      SELECT c_custkey, c_mktsegment AS segment,
             TIMESTAMP '1995-01-01' AS valid_from
      FROM customer
      UNION ALL
      SELECT c.c_custkey, 'PREMIER' AS segment, ch.eff AS valid_from
      FROM customer c JOIN changes ch ON c.c_custkey = ch.c_custkey
    )
    SELECT c_custkey, segment, valid_from,
           LEAD(valid_from) OVER (PARTITION BY c_custkey ORDER BY valid_from)
             AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY c_custkey ORDER BY valid_from)
             IS NULL AS is_current
    FROM versions
    """,
)
def dim_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history: customers who placed a >200k order since
    2000 are promoted to the PREMIER segment effective at their latest
    such order; every prior version is preserved with
    [valid_from, valid_to) stitched by ``lead`` over the version
    sequence (open interval = current row).

    Invariants (tests/test_scd.py): per key, intervals are disjoint,
    contiguous, start at the epoch, and exactly one row is current."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    changes = (
        o.filter((F.col("o_orderdate") >= "2000-01-01") & (F.col("o_totalprice") > 200000))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.max("o_orderdate").alias("eff"))
    )
    base = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1995-01-01 00:00:00").cast("timestamp").alias("valid_from"),
    )
    promoted = (
        c.join(changes, "c_custkey")
        .select("c_custkey", F.lit("PREMIER").alias("segment"), F.col("eff").alias("valid_from"))
    )
    w = Window.partitionBy("c_custkey").orderBy("valid_from")
    nxt = F.lead("valid_from").over(w)
    return (
        base.unionByName(promoted)
        .select(
            "c_custkey",
            "segment",
            "valid_from",
            nxt.alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
    )


@query(
    "join_pit_scd2",
    """
    WITH changes AS (
      SELECT o_custkey AS c_custkey, MAX(o_orderdate) AS eff
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '2000-01-01' AND o_totalprice > 200000
      GROUP BY o_custkey
    ),
    versions AS (
      SELECT c_custkey, c_mktsegment AS segment,
             TIMESTAMP '1995-01-01' AS valid_from
      FROM customer
      UNION ALL
      SELECT c.c_custkey, 'PREMIER' AS segment, ch.eff AS valid_from
      FROM customer c JOIN changes ch ON c.c_custkey = ch.c_custkey
    ),
    dim AS (
      SELECT c_custkey, segment, valid_from,
             LEAD(valid_from) OVER (PARTITION BY c_custkey
                                    ORDER BY valid_from) AS valid_to
      FROM versions
    )
    SELECT o.o_orderkey,
           o.o_custkey,
           d.segment AS segment_at_order,
           d.valid_from AS version_from
    FROM orders o
    JOIN dim d
      ON o.o_custkey = d.c_custkey
     AND d.valid_from <= o.o_orderdate
     AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    """,
)
def join_pit_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join — facts against the SCD2 dimension
    AS OF each fact's own timestamp: every order picks the customer
    version whose [valid_from, valid_to) interval contains
    o_orderdate, so pre-promotion orders see the historical segment
    and post-promotion orders see PREMIER. This is THE query shape an
    SCD2 dimension exists to serve (and what `FINAL`-style latest-row
    dedup gets wrong for historical facts); it complements join_asof
    (nearest-key matching) with interval CONTAINMENT semantics.

    The dimension is built by the same logic as dim_scd2_history, so
    the two keys stay semantically locked. Correctness hinges on the
    SCD2 invariants (disjoint, contiguous intervals — tested in
    test_scd.py): they guarantee each order matches EXACTLY one
    version, asserted in tests here.

    Plan shape: an EQUI-join on the customer key with the interval
    predicate as a residual filter — per key there are only a handful
    of versions, so this is the standard bounded equi-prefix range
    join (join_theta_range's argument), never an interval cross
    product. At 100 TB the dim side is broadcastable after pruning to
    (key, interval, attrs)."""
    from etl_ch_destination_spark.queries.scd import dim_scd2_history

    o = load_table(spark, sf_dir, "orders")
    d = dim_scd2_history(spark, sf_dir).select(
        "c_custkey", "segment", "valid_from", "valid_to"
    )
    cond = (
        (o.o_custkey == d.c_custkey)
        & (d.valid_from <= o.o_orderdate)
        & (d.valid_to.isNull() | (o.o_orderdate < d.valid_to))
    )
    return o.join(d, cond).select(
        "o_orderkey",
        "o_custkey",
        F.col("segment").alias("segment_at_order"),
        F.col("valid_from").alias("version_from"),
    )
