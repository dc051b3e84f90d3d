"""Composed analytical reports (SURVEY §2.12) — TPC-H-shaped end-to-end
queries over the fixture star schema.

Every earlier §2 key isolates ONE operator; these reports are the
integration surface — the multi-join, multi-agg plans a real user of a
ClickHouse-destination ETL engine actually ships. Shapes follow the
classic TPC-H workload (Q3/Q4/Q5/Q6/Q7/Q8/Q9/Q10/Q13/Q14/Q15/Q17/Q18/
Q19/Q22) adapted to the fixture subset of the schema (no ``partsupp``
table; trimmed columns — FIXTURES.md).

Scale notes (100 TB) common to the suite:
- dimension tables (``region``/``nation``/``part``-filtered/``supplier``)
  are broadcast explicitly, so the fact table never shuffles for them;
- fact ⋈ fact joins (``orders`` ⋈ ``lineitem``) shuffle on the join key
  once and AQE handles skew/right-sizing;
- every aggregate does map-side partial aggregation before the exchange;
- top-k outputs use orderBy+limit → TakeOrderedAndProject (O(k) driver
  memory), with an explicit unique tiebreaker so LIMIT is deterministic
  in both engines;
- money arithmetic follows the exact-decimal policy in ``_util`` so
  parallel sums hash-match DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.queries._util import (
    SQL_DISC_PRICE,
    dsum,
    money,
    one,
    rate,
    sql_dsum,
)
from etl_ch_destination_spark.registry import query


def _disc_price() -> F.Column:
    return money("l_extendedprice") * (one() - rate("l_discount"))


@query(
    "rpt_shipping_priority",
    f"""
    SELECT l_orderkey,
           {sql_dsum(SQL_DISC_PRICE, "revenue")},
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_shipdate  > TIMESTAMP '1998-07-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def rpt_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — top-10 unshipped orders by revenue for one
    market segment.

    Plan: customer is filtered then broadcast (segment cut ≈ 1/5 of an
    already-small dim side relative to lineitem); orders ⋈ lineitem is
    the one real shuffle; final top-10 is TakeOrderedAndProject with
    ``l_orderkey`` as the deterministic tiebreaker."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-07-01")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-07-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_disc_price(), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "rpt_order_priority_check",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      AND o_orderdate <  TIMESTAMP '1999-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def rpt_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — orders per priority that had at least one item
    shipped >60 days after ordering (late-shipment audit; the fixture
    has no ``l_commitdate``, so lateness is measured from order date).

    Plan: LEFT SEMI join — existence only, lineitem columns never
    materialize past the join, and the date predicate rides along as a
    join condition so the probe side stays narrow."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1999-01-01") & (F.col("o_orderdate") < "1999-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "rpt_local_supplier_volume",
    f"""
    SELECT n_name, {sql_dsum(SQL_DISC_PRICE, "revenue")}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def rpt_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — revenue per nation where customer and supplier
    are co-located, one region, one year.

    Plan: the 6-table star resolves as lineitem shuffling ONCE for
    orders; supplier/nation/region are broadcast; the co-location
    predicate (c_nationkey = s_nationkey) is applied as a post-join
    filter on broadcast-resolved columns — no extra exchange."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
        .groupBy("n_name")
        .agg(dsum(_disc_price(), "revenue"))
    )


@query(
    "rpt_revenue_forecast",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def rpt_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — revenue uplift if small-quantity discounts were
    dropped: pure filter + global agg, no joins.

    Plan: every predicate pushes to the parquet scan (PushedFilters);
    partial agg per split, single-row exchange. The fastest possible
    query shape at any scale — this is the scan-efficiency benchmark."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(money("l_extendedprice") * rate("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "rpt_nation_trade_flow",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           {sql_dsum(SQL_DISC_PRICE, "revenue")}
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def rpt_nation_trade_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bilateral trade volume between two nations by
    ship year, both directions.

    Plan: nation appears twice (supplier side, customer side) — both
    broadcast, so the disambiguation costs nothing; the nation-pair
    predicate lands after both broadcasts resolve. One fact shuffle
    (lineitem ⋈ orders)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(_disc_price(), "revenue"))
    )


@query(
    "rpt_market_share",
    f"""
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             {SQL_DISC_PRICE} AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'AMERICA'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM vol
    GROUP BY o_year
    """,
)
def rpt_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — one nation's share of ECONOMY-part revenue in
    one region's market, by order year.

    Determinism: numerator and denominator are exact decimal sums cast
    to DOUBLE, then one IEEE division — bit-identical to the oracle.
    Plan: part is filtered to one type then broadcast, pruning lineitem
    early; the only fact shuffle is lineitem ⋈ orders."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(r.select("r_regionkey")), n1.n_regionkey == F.col("r_regionkey"), "left_semi")
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(12,2)")
    return vol.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@query(
    "rpt_product_profit",
    """
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                    - CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(0.05 AS DECIMAL(3,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS INT)
    """,
)
def rpt_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — profit on red parts per supplier nation per
    year. The fixture has no ``partsupp.ps_supplycost``, so cost is
    modeled as 5% of retail price per unit (exact decimal both sides).

    Plan: part is LIKE-filtered then broadcast (the filter cannot push
    to parquet as a range, but the scan prunes to two columns); one
    fact shuffle (lineitem ⋈ orders); supplier/nation broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cost = (
        money("p_retailprice")
        * F.lit(0.05).cast("decimal(3,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(_disc_price() - cost, "profit"))
    )


@query(
    "rpt_returned_items",
    f"""
    SELECT c_custkey, c_name,
           {sql_dsum(SQL_DISC_PRICE, "revenue")},
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1999-10-01'
      AND o_orderdate <  TIMESTAMP '2000-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def rpt_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — top-20 customers by returned-item revenue in
    one quarter (churn-risk report).

    Plan: returnflag + date predicates push to the scans; customer is
    broadcast into the post-shuffle join; top-20 is
    TakeOrderedAndProject with the unique c_custkey tiebreaker."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1999-10-01") & (F.col("o_orderdate") < "2000-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_disc_price(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "rpt_customer_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def rpt_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — histogram of non-urgent orders per customer,
    including zero-order customers (the LEFT join is the point: an
    inner join would silently drop them).

    Plan: the join condition carries the priority filter (pushed to the
    orders scan); two cascaded aggs, the second over ≤ a few dozen
    distinct counts — trivially small exchange."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "rpt_promo_revenue_share",
    f"""
    SELECT CAST(100 AS DOUBLE)
           * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_DISC_PRICE}
                           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-03-01'
      AND l_shipdate <  TIMESTAMP '1998-04-01'
    """,
)
def rpt_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — % of one month's revenue from PROMO parts.

    Determinism: both sums exact decimal → DOUBLE, two IEEE ops
    (divide, scale by 100) in the same order as the oracle. Plan: part
    broadcast, single partial+final agg to one row."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-03-01") & (F.col("l_shipdate") < "1998-04-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast("decimal(12,2)")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100).cast("double")
                * F.sum(promo).cast("double")
                / F.sum(_disc_price()).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "rpt_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum(SQL_DISC_PRICE, "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def rpt_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — supplier(s) with the maximum revenue in one
    quarter (keeps ALL maxima, not an arbitrary top-1).

    Plan: per-supplier agg (one shuffle), then the scalar max is a
    1-row broadcast joined back on equality — the view is computed
    once and reused via cache, not recomputed per branch. Exact-decimal
    revenue makes the equality comparison safe cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-04-01")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(_disc_price(), "total_revenue"))
        .cache()  # tiny (one row per supplier); reused by max + join branches
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "rpt_small_quantity_revenue",
    """
    WITH brand_parts AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'
    ),
    part_avg AS (
      SELECT l_partkey AS a_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem JOIN brand_parts ON l_partkey = p_partkey
      GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN brand_parts ON l_partkey = p_partkey
    JOIN part_avg    ON l_partkey = a_partkey
    WHERE l_quantity < 0.5 * avg_qty
    """,
)
def rpt_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue locked in below-half-average-quantity
    line items of one brand (small-order consolidation estimate).

    Determinism: the per-part average is exact-decimal-sum / count in
    DOUBLE — identical in both engines, so the `<` threshold cannot
    flip on ulps. Plan: brand filter prunes part to ~4%, broadcast
    twice (filter + per-part average — itself aggregated from the
    pruned lineitem, so it stays broadcast-small); lineitem never
    shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    bp = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li_brand = li.join(F.broadcast(bp), li.l_partkey == F.col("p_partkey"))
    part_avg = li_brand.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_qty"
        )
    )
    return (
        li_brand.join(F.broadcast(part_avg), F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "rpt_large_volume_orders",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 300
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def rpt_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — orders whose total quantity exceeds 300 units,
    with their customers.

    Plan: the HAVING subquery and the outer agg share the same
    ``l_orderkey`` grouping, so the plan is agg → filter → join back —
    the big-order id set is tiny and broadcast into the semi join;
    customer broadcast. Exact-decimal quantity sum keeps the >300
    threshold and the output identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty_dec")
    )
    big = per_order.filter(F.col("qty_dec") > 300)
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("sum_qty"),
        )
    )


@query(
    "rpt_brand_promo_revenue",
    f"""
    SELECT {sql_dsum(SQL_DISC_PRICE, "revenue")}, COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def rpt_brand_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — revenue from three disjunctive
    (brand, size-range, quantity-range) promo buckets.

    Plan: the part side of each disjunct (brand+size) is pre-filtered
    with the union of the three part predicates BEFORE the broadcast,
    so the hash side stays small; the mixed part×lineitem disjunction
    is applied post-join, where it is a cheap codegen'd predicate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    part_pre = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35))
    )
    full = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p.filter(part_pre)), li.l_partkey == p.p_partkey)
        .filter(full)
        .agg(dsum(_disc_price(), "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "rpt_idle_customers",
    """
    WITH threshold AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n_name,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT avg_bal FROM threshold)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-06-01'
      )
    GROUP BY n_name
    """,
)
def rpt_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — wealthy customers DORMANT since mid-2000, by
    nation (the fixture has no phone column, so grouping is by nation;
    and order density is high enough that "never ordered" would be
    vacuous, so the existence check is date-bounded instead).

    Determinism: the average threshold is exact-decimal-sum / count in
    DOUBLE on both sides. Plan: scalar threshold is a 1-row broadcast
    cross join (NOT a collect — stays lazy/distributed); orders
    existence check is a LEFT ANTI join on the shuffled key; nation
    broadcast."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-06-01")
        .select("o_custkey")
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(money("c_acctbal"), "totacctbal"),
        )
    )


@query(
    "rpt_corpus_curation",
    """
    WITH canon AS (
      SELECT doc_id, text, lang, source FROM (
        SELECT doc_id, text, lang, source,
               ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                                  ORDER BY doc_id) AS rn
        FROM documents
      ) WHERE rn = 1
    ),
    scored AS (
      SELECT lang, source,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             length(text) AS n_chars,
             len(list_filter(string_split(text, ' '),
                             x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS n_stop
      FROM canon
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_distinct) AS DOUBLE) / SUM(n_words) AS distinct_word_ratio
    FROM scored
    WHERE n_words >= 50
      AND CAST(n_stop AS DOUBLE) / n_words <= 0.3
      AND CAST(n_distinct AS DOUBLE) / n_words >= 0.1
    GROUP BY lang, source
    """,
)
def rpt_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed LLM-pipeline report — the corpus counterpart of the
    TPC-H reports: exact-dedup (canonical per normalized-content hash)
    → quality filter (length / stopword-ratio / lexical-diversity
    thresholds, the llm_quality_score heuristics) → per-(lang, source)
    curation rollup.

    Determinism: group metrics are INTEGER sums with one final double
    division — never a parallel sum of per-doc doubles (order-
    sensitive). Plan: one shuffle for the content-hash dedup window
    (uniform 128-bit key, skew-free), per-row scoring is codegen'd
    string/array built-ins, then a partial+final agg on the tiny
    (lang, source) grid."""
    d = load_table(spark, sf_dir, "documents")
    from etl_ch_destination_spark.ops.dedup import latest_by_key

    hashed = d.withColumn(
        "content_hash", F.md5(F.lower(F.trim(F.col("text"))).cast("binary"))
    )
    canon = latest_by_key(hashed, ["content_hash"], [F.asc("doc_id")])
    words = F.split("text", " ")
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    n_stop = F.expr(
        "size(filter(split(text, ' '), x -> x IN ('the', 'a', 'of', 'and', 'to')))"
    )
    scored = canon.select(
        "lang",
        "source",
        n_words.alias("n_words"),
        n_distinct.alias("n_distinct"),
        F.length("text").alias("n_chars"),
        n_stop.alias("n_stop"),
    )
    kept = scored.filter(
        (F.col("n_words") >= 50)
        & (F.col("n_stop").cast("double") / F.col("n_words") <= 0.3)
        & (F.col("n_distinct").cast("double") / F.col("n_words") >= 0.1)
    )
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_distinct").cast("double") / F.sum("n_words")).alias("distinct_word_ratio"),
    )


@query(
    "rpt_monthly_yoy",
    """
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS ym,
             CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS yr,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1, 2
    )
    SELECT ym, rev_cents,
           LAG(rev_cents, 12) OVER (ORDER BY ym) AS rev_cents_prev_year,
           CAST(rev_cents - LAG(rev_cents, 12) OVER (ORDER BY ym) AS DOUBLE)
             / CAST(LAG(rev_cents, 12) OVER (ORDER BY ym) AS DOUBLE)
             AS yoy_growth,
           CAST(SUM(rev_cents) OVER (PARTITION BY yr ORDER BY ym
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS ytd_cents
    FROM m
    """,
)
def rpt_monthly_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue report: lag-12 growth plus the
    year-to-date running sum — the standard finance/BI trend pair.
    The calendar is dense in the fixture (every month has orders), so
    LAG(12) IS the same month last year; growth is one IEEE division
    of exact cent sums and NULL for the first year, ytd is a running
    window inside each year.

    Plan discipline (the win_percent_of_total lesson): aggregate
    FIRST — orders collapse to ~80 (month) rows via a partial-
    aggregable hash agg, and only that dimension-sized frame flows
    into the unpartitioned LAG window. The three windows share one
    sort."""
    o = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    m = (
        o.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            F.year("o_orderdate").cast("bigint").alias("yr"),
            cents.alias("cents"),
        )
        .groupBy("ym", "yr")
        .agg(F.sum("cents").cast("bigint").alias("rev_cents"))
    )
    w = Window.orderBy("ym")
    w_ytd = (
        Window.partitionBy("yr")
        .orderBy("ym")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag("rev_cents", 12).over(w)
    return m.select(
        "ym",
        "rev_cents",
        prev.alias("rev_cents_prev_year"),
        (
            (F.col("rev_cents") - prev).cast("double") / prev.cast("double")
        ).alias("yoy_growth"),
        F.sum("rev_cents").over(w_ytd).cast("bigint").alias("ytd_cents"),
    )
