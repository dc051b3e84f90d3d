"""SURVEY §2.3 — joins.

ClickHouse analog: `JOIN` clauses incl. ASOF JOIN; the right table is
always the in-memory hash side in CH, so `F.broadcast` on dimensions
is the faithful Spark translation (SURVEY.md:219-227).

Scale notes (100 TB):
- equi-joins shuffle both sides on the key; Catalyst picks
  sort-merge/shuffled-hash, AQE re-plans to broadcast when a side
  turns out small, and splits skewed partitions (session.py turns
  both on);
- dimensions (nation/region/supplier) are broadcast explicitly —
  plan-shape asserted in tests/test_plans.py;
- the theta/range join keeps an EQUI PREFIX (nation key) so Catalyst
  hash-joins and applies the range as a post-predicate — never a
  cross/BNL join over the fact table;
- ASOF is the union+window idiom in ops/asof.py (one shuffle per
  side, sort-merge-shaped);
- salting (ops/salting.py) is the manual skew fallback; AQE skew-join
  is the default-on first line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.ops.asof import asof_join
from etl_ch_destination_spark.ops.dedup import latest_by_key
from etl_ch_destination_spark.ops.salting import salted_join
from etl_ch_destination_spark.queries._util import dsum, money, sql_dsum
from etl_ch_destination_spark.registry import query


@query(
    "join_inner_equi",
    """
    SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join orders ⋈ customer; Catalyst picks SMJ/SHJ (or
    broadcast under AQE when customer is small)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "join_left_right_full",
    """
    WITH l AS (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'),
         r AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
    SELECT 'left' AS jt, l.c_custkey AS l_key, r.o_custkey AS r_key,
           l.c_name AS c_name, r.n_orders AS n_orders
    FROM l LEFT JOIN r ON l.c_custkey = r.o_custkey
    UNION ALL
    SELECT 'right' AS jt, l.c_custkey, r.o_custkey, l.c_name, r.n_orders
    FROM l RIGHT JOIN r ON l.c_custkey = r.o_custkey
    UNION ALL
    SELECT 'full' AS jt, l.c_custkey, r.o_custkey, l.c_name, r.n_orders
    FROM l FULL JOIN r ON l.c_custkey = r.o_custkey
    """,
)
def join_left_right_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three outer-join types in one tagged union: BUILDING customers
    vs per-customer order counts, so both sides have unmatched rows.

    Plan note: the three joins pick different strategies, so Catalyst
    cannot reuse the aggregated exchange and each branch re-derives its
    inputs (3× scan+agg). Fine for this three-in-one diagnostic query;
    a production pipeline runs ONE join type, or persists the shared
    aggregate first when fanning out like this at scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    r = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))

    def tagged(how: str) -> DataFrame:
        return l.join(r, l.c_custkey == r.o_custkey, how).select(
            F.lit(how).alias("jt"),
            l.c_custkey.alias("l_key"),
            r.o_custkey.alias("r_key"),
            "c_name",
            "n_orders",
        )

    return tagged("left").unionByName(tagged("right")).unionByName(tagged("full"))


@query(
    "join_broadcast_dim",
    f"""
    SELECT r_name,
           COUNT(*) AS n_customers,
           {sql_dsum("CAST(c_acctbal AS DECIMAL(12,2))", "sum_acctbal")}
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast dims (nation, region) — ClickHouse always hashes
    the right table in memory; broadcast is the faithful analog. The
    explicit F.broadcast makes the plan independent of stats/thresholds
    (BroadcastHashJoin asserted in tests/test_plans.py)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(money("c_acctbal"), "sum_acctbal"),
        )
    )


@query(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI ≈ ClickHouse `IN (subquery)`: existence filter, right
    columns never materialized (smaller shuffle than inner+distinct)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000
    )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI ≈ `NOT IN`/NOT EXISTS: customers with no high-value
    order (the price filter keeps the result non-trivial — nearly every
    customer has *some* order)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    "SELECT n_name, r_name FROM nation CROSS JOIN region",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product — bounded inputs only (25 × 5). At scale a
    cross join is only ever legitimate against a broadcast-small side."""
    n = load_table(spark, sf_dir, "nation").select("n_name")
    r = load_table(spark, sf_dir, "region").select("r_name")
    return n.crossJoin(r)


@query(
    "join_theta_range",
    """
    SELECT s_nationkey AS nationkey,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT s_suppkey) AS n_suppliers
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey
     AND c_acctbal >= s_acctbal - 100
     AND c_acctbal <= s_acctbal + 100
    GROUP BY s_nationkey
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join with an EQUI PREFIX: Catalyst hash-joins on the
    nation key and evaluates the band predicate post-match — never a
    BNL/cross join over the big side. At 100 TB, a range join with no
    natural equi key gets one manufactured: bucketize the range key
    (floor(value/width)) and join on adjacent buckets."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    cond = (
        (s.s_nationkey == c.c_nationkey)
        & (c.c_acctbal >= s.s_acctbal - 100)
        & (c.c_acctbal <= s.s_acctbal + 100)
    )
    return (
        s.join(c, cond)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


@query(
    "join_asof",
    """
    WITH views AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view'
    ),
    purch AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    )
    SELECT v.event_id, v.user_id, v.ts, v.value,
           p.ts AS asof_ts, p.value AS asof_value
    FROM views v ASOF LEFT JOIN purch p
      ON v.user_id = p.user_id AND v.ts >= p.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ASOF JOIN: each view event matched to the user's
    latest purchase at-or-before it (ops/asof.py union+window idiom;
    DuckDB's native ASOF JOIN is the oracle). The right side is
    pre-deduped per (user_id, ts) so ties are deterministic in both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts", "value")
    purch = latest_by_key(
        ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value"),
        ["user_id", "ts"],
        [F.desc("event_id")],
    ).select("user_id", "ts", "value")
    return asof_join(views, purch, keys=["user_id"], ts="ts", how="left")


@query(
    "join_asof_forward",
    """
    WITH views AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view'
    ),
    purch AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    )
    SELECT v.event_id, v.user_id, v.ts, v.value,
           CASE WHEN p.ts - v.ts <= INTERVAL 2 HOUR THEN p.ts END AS asof_ts,
           CASE WHEN p.ts - v.ts <= INTERVAL 2 HOUR THEN p.value END AS asof_value
    FROM views v ASOF LEFT JOIN purch p
      ON v.user_id = p.user_id AND v.ts <= p.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward ASOF with tolerance (pandas ``merge_asof`` parity): each
    view matched to the user's EARLIEST purchase at-or-after it, nulled
    beyond a 2-hour horizon — "did this view convert within 2h". Same
    union+window idiom scanned in descending time; DuckDB's native
    forward ASOF (``v.ts <= p.ts``) plus a CASE horizon is the oracle.
    Equivalence to pandas merge_asof is asserted in tests/test_ops.py."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts", "value")
    purch = latest_by_key(
        ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value"),
        ["user_id", "ts"],
        [F.desc("event_id")],
    ).select("user_id", "ts", "value")
    return asof_join(
        views, purch, keys=["user_id"], ts="ts", how="left",
        direction="forward", tolerance_seconds=2 * 3600,
    )


@query(
    "join_skew_salted",
    f"""
    SELECT s_nationkey,
           COUNT(*) AS n_items,
           {sql_dsum("CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))", "revenue")}
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted join (ops/salting.py): lineitem ⋈ supplier
    spread over 8 salts, row-identical to the plain join the oracle
    runs. AQE skew-join is the default-on first line; this is the
    manual fallback for known-hot keys."""
    from etl_ch_destination_spark.queries._util import disc_price

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    joined = salted_join(
        li, s, "l_suppkey", "s_suppkey", salt_cols=["l_orderkey", "l_linenumber"], n_salts=8
    )
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(disc_price(), "revenue"),
    )


@query(
    "join_asof_nearest",
    """
    WITH views AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view'
    ),
    purch AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    )
    SELECT v.event_id, v.user_id, v.ts, v.value,
           CASE WHEN f.ts IS NULL THEN b.ts
                WHEN b.ts IS NULL THEN f.ts
                WHEN epoch(v.ts) - epoch(b.ts) <= epoch(f.ts) - epoch(v.ts) THEN b.ts
                ELSE f.ts END AS asof_ts,
           CASE WHEN f.ts IS NULL THEN b.value
                WHEN b.ts IS NULL THEN f.value
                WHEN epoch(v.ts) - epoch(b.ts) <= epoch(f.ts) - epoch(v.ts) THEN b.value
                ELSE f.value END AS asof_value
    FROM views v
    ASOF LEFT JOIN purch b ON v.user_id = b.user_id AND v.ts >= b.ts
    ASOF LEFT JOIN purch f ON v.user_id = f.user_id AND v.ts <= f.ts
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction ASOF (pandas ``merge_asof(direction='nearest')``
    parity): each view matched to the user's CLOSEST purchase in time,
    either side, tie broken toward the earlier one. One shuffle on the
    key serves both in-partition scans (ascending + descending window
    over the same partitioning); the oracle is two native DuckDB ASOF
    joins arbitrated by the same distance CASE."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts", "value")
    purch = latest_by_key(
        ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value"),
        ["user_id", "ts"],
        [F.desc("event_id")],
    ).select("user_id", "ts", "value")
    return asof_join(views, purch, keys=["user_id"], ts="ts", how="left", direction="nearest")
