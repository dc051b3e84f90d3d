"""Composed analytical reports, part 2 (SURVEY §2.12) — the
supplier/supply-chain half of the TPC-H workload (Q2/Q11/Q12/Q16/Q20/
Q21 shapes), adapted to the fixture schema: there is no ``partsupp``
table, so part↔supplier relationships are derived from ``lineitem``
shipment history, and no ship/commit/receipt date triple, so lateness
is measured as ship-lag from order date.

With these six, all 21 adaptable TPC-H query shapes are covered
(Q1 is the flagship in queries/aggregations.py; the §2.12 table in
SURVEY.md maps each key to its shape). Everything here hash-matches
its DuckDB oracle.

Determinism rules used throughout (see _util):
- ratios/averages = exact-decimal sums cast to DOUBLE, then IEEE ops
  in the same order both engines;
- "min/max over a group" keys keep ALL tied rows (equality join back)
  rather than picking an arbitrary winner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.queries._util import money
from etl_ch_destination_spark.registry import query


@query(
    "rpt_min_cost_supplier",
    """
    WITH supp_price AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS unit_price
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey AS b_partkey, MIN(unit_price) AS best_price
      FROM supp_price JOIN part ON p_partkey = l_partkey
      WHERE p_size = 15
      GROUP BY l_partkey
    )
    SELECT p_partkey, p_name, s_suppkey, s_name, n_name, unit_price AS best_price
    FROM supp_price
    JOIN best     ON l_partkey = b_partkey AND unit_price = best_price
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    """,
)
def rpt_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — cheapest supplier per part (one size slice).
    No ``partsupp.ps_supplycost`` exists, so the observed unit sell
    price (revenue/quantity over shipment history) stands in for
    supply cost.

    Determinism: unit_price is exact-decimal sums → one IEEE divide;
    the per-part minimum keeps ALL tied suppliers via equality join
    (same policy as rpt_top_supplier). Plan: part size-slice broadcast
    prunes before the per-(part,supplier) agg; the min-join is
    agg → broadcast join back — lineitem shuffles once on the
    composite key."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15).select("p_partkey", "p_name")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp_price = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey", "p_partkey", "p_name")
        .agg(
            (
                F.sum(money("l_extendedprice")).cast("double")
                / F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
            ).alias("unit_price")
        )
    )
    best = supp_price.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_price").alias("best_price_min")
    )
    return (
        supp_price.join(
            F.broadcast(best),
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_price") == F.col("best_price_min")),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("unit_price").alias("best_price"),
        )
    )


@query(
    "rpt_nation_inventory_value",
    """
    WITH v AS (
      SELECT s_nationkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2))) AS val
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey
    )
    SELECT s_nationkey, CAST(val AS DOUBLE) AS value
    FROM v
    WHERE CAST(val AS DOUBLE) > (SELECT CAST(SUM(val) AS DOUBLE) FROM v) * 0.04
    """,
)
def rpt_nation_inventory_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — supplier nations holding an outsized share
    (>4%) of total shipped value.

    Determinism: the share threshold compares DOUBLEs derived from
    exact decimal sums — decimal×decimal products stay exact, the
    single scale-by-0.04 and compare happen in IEEE on both sides
    (comparing in decimal would hit Spark's 38-digit precision clamp).
    Plan: supplier broadcast; one agg shuffle; the grand total is a
    1-row broadcast reused from the cached per-nation frame, not a
    recompute."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice", "l_quantity")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey")
        .agg(F.sum(money("l_extendedprice") * F.col("l_quantity").cast("decimal(12,2)")).alias("val"))
        .cache()  # ≤25 rows; reused by total + filter branches
    )
    total = v.agg((F.sum("val").cast("double") * F.lit(0.04)).alias("threshold"))
    return (
        v.join(F.broadcast(total))
        .filter(F.col("val").cast("double") > F.col("threshold"))
        .select("s_nationkey", F.col("val").cast("double").alias("value"))
    )


@query(
    "rpt_shipping_delay_classes",
    """
    SELECT CASE WHEN DATE_DIFF('day', o_orderdate, l_shipdate) <= 30 THEN 'fast'
                WHEN DATE_DIFF('day', o_orderdate, l_shipdate) <= 90 THEN 'normal'
                ELSE 'slow' END AS speed,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY speed
    """,
)
def rpt_shipping_delay_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — line items bucketed by ship lag (the fixture
    has no shipmode, so the bucket IS the derived delay class), split
    by order priority.

    Plan: one fact-fact shuffle; the CASE bucketing is codegen'd; the
    conditional counts are a single pass (two SUM(CASE) in one agg,
    not two scans)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    speed = (
        F.when(lag <= 30, "fast").when(lag <= 90, "normal").otherwise("slow").alias("speed")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(speed)
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "rpt_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_size IN (1, 4, 9, 14, 23)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def rpt_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — how many distinct suppliers have shipped each
    (brand, type, size) slice, excluding distressed suppliers (negative
    balance stands in for the complaint-comment filter; the
    part↔supplier relation is shipment history, not partsupp).

    Plan: the exclusion list is tiny → broadcast LEFT ANTI join; the
    part slice is broadcast; COUNT(DISTINCT) expands to the standard
    two-phase distinct aggregate on the grouped key."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 4, 9, 14, 23))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "rpt_excess_shipments",
    """
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%red%'
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 50
    )
    """,
)
def rpt_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — suppliers who moved a large volume of red
    parts in one year (candidates for surplus programs; partsupp
    availability is replaced by shipped volume).

    Plan: the inner aggregate produces a small supplier-id set →
    broadcast LEFT SEMI into supplier; exact-decimal quantity sum
    keeps the >50 threshold stable cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    movers = (
        li.filter((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(movers), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "rpt_waiting_orders",
    """
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
        AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s_name
    """,
)
def rpt_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — suppliers who were the SOLE late shipper on
    finalized multi-supplier orders (late = shipped >90 days after
    order date; the fixture has no commit/receipt dates).

    Plan: the ``late`` frame is computed once and reused for both the
    driving side and the sole-blame anti join; the multi-supplier
    existence test is a semi join on orderkey with the supplier
    inequality as a residual predicate — both resolve as hash joins
    on l_orderkey, no cartesian."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        load_table(spark, sf_dir, "lineitem")
        .join(o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = li.alias("l2")
    l3 = late.alias("l3")
    multi = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole = multi.alias("l1").join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


PARETO_PCT = 80


@query(
    "rpt_pareto_suppliers",
    f"""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT CAST(SUM(rev_cents) AS BIGINT) AS t FROM rev),
    c AS (
        SELECT l_suppkey, rev_cents,
               CAST(SUM(rev_cents) OVER (ORDER BY rev_cents DESC, l_suppkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS BIGINT) AS cum_cents
        FROM rev
    )
    SELECT l_suppkey, rev_cents, cum_cents,
           CAST(cum_cents AS DOUBLE) / (SELECT t FROM tot) AS cum_share,
           100 * cum_cents <= {PARETO_PCT} * (SELECT t FROM tot) AS in_top80
    FROM c
    """,
)
def rpt_pareto_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration — suppliers ranked by revenue with the
    GLOBAL running revenue share, flagging the set that carries the
    first 80% (flag decided by integer cross-multiplication, share is
    one final division). The classic ABC-analysis / "how concentrated
    is my supply base" report.

    The global cumulative sum uses ops/rank.with_global_cumsum — the
    scale-safe SUM-OVER-(ORDER BY) idiom: value-range buckets on the
    revenue key, parallel per-bucket cumulative windows, broadcast
    per-bucket offsets — NOT a single-task global window; the oracle
    states the same semantics with a plain window over the ~|suppliers|
    aggregate. One aggregate shuffle + the bucketed exchange; at
    100 TB the cumsum runs over the supplier aggregate, which is
    orders of magnitude smaller than the scan."""
    from etl_ch_destination_spark.ops.rank import with_global_cumsum

    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("bigint")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(cents).cast("bigint").alias("rev_cents")
    )
    total = rev.agg(F.sum("rev_cents").cast("bigint").alias("t")).collect()[0].t
    c = with_global_cumsum(
        rev,
        order=[F.col("rev_cents").desc(), F.col("l_suppkey")],
        lead="rev_cents",
        value="rev_cents",
        descending=True,
        name="cum_cents",
    )
    return c.select(
        "l_suppkey",
        "rev_cents",
        "cum_cents",
        (F.col("cum_cents").cast("double") / F.lit(float(total))).alias("cum_share"),
        (100 * F.col("cum_cents") <= PARETO_PCT * F.lit(total)).alias("in_top80"),
    )


@query(
    "rpt_abc_classification",
    """
    WITH rev AS (
      SELECT l_partkey AS p_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
               AS r
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT p_partkey, r,
             SUM(r) OVER (ORDER BY r DESC, p_partkey
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(r) OVER () AS total,
             CAST(ROW_NUMBER() OVER (ORDER BY r DESC, p_partkey) AS BIGINT)
               AS rk
      FROM rev
    )
    SELECT p_partkey, rk,
           CAST(r AS DOUBLE) AS revenue,
           CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
           CASE WHEN 5 * cum <= 4 * total THEN 'A'
                WHEN 20 * cum <= 19 * total THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def rpt_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification — Pareto-bucket every part by its
    share of cumulative discounted revenue: class A while the running
    total is within 80% of grand revenue, B within 95%, else C (the
    80/15/5 convention of ABC analysis). The class boundaries are
    decided in EXACT DECIMAL cross-multiplication (5·cum ≤ 4·total ⇔
    cum/total ≤ 0.8) so a part sitting on a boundary classifies
    identically in both engines — a float share would flip on ulps.

    Plan: one partial-agg shuffle to per-part revenue, then a single
    global sort (range exchange) carrying the running decimal sum —
    the same shape as any ORDER BY + cumulative window. At 100 TB the
    per-part frame is |parts| (millions, not billions) and the decimal
    widths (38,2 headroom) absorb the grand total without overflow;
    ties are broken by partkey so the frontier is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    from etl_ch_destination_spark.queries._util import disc_price

    rev = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(disc_price()).alias("r")
    )
    from pyspark.sql.window import Window

    w_cum = (
        Window.orderBy(F.desc("r"), F.asc("p_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    w_rk = Window.orderBy(F.desc("r"), F.asc("p_partkey"))
    ranked = rev.select(
        "p_partkey",
        "r",
        F.sum("r").over(w_cum).alias("cum"),
        F.sum("r").over(w_all).alias("total"),
        F.row_number().over(w_rk).cast("bigint").alias("rk"),
    )
    return ranked.select(
        "p_partkey",
        "rk",
        F.col("r").cast("double").alias("revenue"),
        (F.col("cum").cast("double") / F.col("total").cast("double")).alias(
            "cum_share"
        ),
        F.when(F.lit(5) * F.col("cum") <= F.lit(4) * F.col("total"), "A")
        .when(F.lit(20) * F.col("cum") <= F.lit(19) * F.col("total"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "rpt_supplier_scorecard",
    """
    WITH j AS (
      SELECT l.l_suppkey,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
               AS rev,
             l.l_partkey,
             date_diff('day', o.o_orderdate, l.l_shipdate) AS lag_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    m AS (
      SELECT l_suppkey,
             CAST(COUNT(*) AS BIGINT) AS n_shipments,
             CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             SUM(rev) AS rev,
             CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_on_time,
             CAST(SUM(lag_days) AS BIGINT) AS lag_sum
      FROM j GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation,
           m.n_shipments, m.n_parts,
           CAST(m.rev AS DOUBLE) AS revenue,
           CAST(m.n_on_time AS DOUBLE) / m.n_shipments AS on_time_rate,
           CAST(m.lag_sum AS DOUBLE) / m.n_shipments AS avg_ship_lag_days,
           CAST(RANK() OVER (PARTITION BY n.n_name
                             ORDER BY m.rev DESC, s.s_suppkey) AS BIGINT)
             AS rank_in_nation
    FROM m
    JOIN supplier s ON s.s_suppkey = m.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
)
def rpt_supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier scorecard — the composed vendor-management report: per
    supplier, shipment volume, distinct-part breadth, exact-decimal
    discounted revenue, on-time rate (ship lag ≤ 30 days from order
    date — the fixture has no commit date, the SURVEY §2.12 lateness
    convention), mean ship lag, and revenue rank within the supplier's
    nation. One fact-side shuffle (lineitem⋈orders on the order key),
    one supplier-grain aggregate, then two broadcast dim joins and a
    |suppliers|-sized window — the canonical wide-metrics scorecard
    shape: every metric shares the single heavy exchange.

    All ratios are single divisions of exact integers/decimals."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    from etl_ch_destination_spark.queries._util import disc_price

    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey",
        disc_price().alias("rev"),
        "l_partkey",
        lag.alias("lag_days"),
    )
    m = j.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shipments"),
        F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
        F.sum("rev").alias("rev"),
        F.sum(F.when(F.col("lag_days") <= 30, 1).otherwise(0))
        .cast("bigint")
        .alias("n_on_time"),
        F.sum("lag_days").cast("bigint").alias("lag_sum"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("nation").orderBy(F.desc("rev"), F.asc("s_suppkey"))
    return (
        m.join(F.broadcast(s), m.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            "n_shipments",
            "n_parts",
            "rev",
            (F.col("n_on_time").cast("double") / F.col("n_shipments")).alias(
                "on_time_rate"
            ),
            (F.col("lag_sum").cast("double") / F.col("n_shipments")).alias(
                "avg_ship_lag_days"
            ),
        )
        .withColumn("rank_in_nation", F.rank().over(w).cast("bigint"))
        .withColumn("revenue", F.col("rev").cast("double"))
        .drop("rev")
        .select(
            "s_suppkey", "s_name", "nation", "n_shipments", "n_parts",
            "revenue", "on_time_rate", "avg_ship_lag_days", "rank_in_nation",
        )
    )


CYCLE_LATE_DAYS = 800  # "late" threshold for the share column


@query(
    "rpt_order_cycle_time",
    f"""
    WITH cyc AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             datediff('day', o.o_orderdate, MAX(l.l_shipdate)) AS days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(days) AS BIGINT) AS min_days,
           CAST(MAX(days) AS BIGINT) AS max_days,
           CAST(SUM(days) AS DOUBLE) / COUNT(*) AS avg_days,
           CAST(SUM(CASE WHEN days > {CYCLE_LATE_DAYS} THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS late_share
    FROM cyc
    GROUP BY o_orderpriority
    """,
)
def rpt_order_cycle_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-last-shipment cycle time by priority — the
    supply-chain SLA readout (does URGENT actually ship faster?): per
    order the span from order date to its LAST line shipment, then
    per-priority count/min/max/mean and the share beyond the
    {CYCLE_LATE_DAYS}-day late threshold. Day spans are exact integers
    (datediff); the only floats are two final divisions on exact int64
    sums — the repo ratio discipline.

    Plan: the fact⋈fact join shuffles once on l_orderkey (its natural
    key), the per-order MAX collapses lines map-side first via partial
    aggregation, and the per-priority rollup is a 5-group hash agg."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cyc = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "o_orderpriority",
            F.datediff("last_ship", "o_orderdate").alias("days"),
        )
    )
    return cyc.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.min("days").cast("bigint").alias("min_days"),
        F.max("days").cast("bigint").alias("max_days"),
        (F.sum("days").cast("double") / F.count(F.lit(1))).alias("avg_days"),
        (
            F.sum(F.when(F.col("days") > CYCLE_LATE_DAYS, 1).otherwise(0))
            .cast("double")
            / F.count(F.lit(1))
        ).alias("late_share"),
    )
