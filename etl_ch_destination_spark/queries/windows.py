"""SURVEY §2.5 — window functions.

ClickHouse analog: window functions plus the signature `LIMIT n BY
key` clause (SURVEY.md:252-259).

Scale notes (100 TB): every window here is PARTITIONED by a real key
(user/customer) — one shuffle on the key, parallel per-partition
sort, streaming frame evaluation. No unpartitioned windows over base
tables anywhere (the global-rank case goes through ops/rank.py).
`limit_by` relies on Spark ≥3.5's InferWindowGroupLimit pushing the
rank filter below the sort (WindowGroupLimit node asserted in
tests/test_plans.py) so each partition keeps only n rows instead of
sorting everything.

Determinism: every ORDER BY carries a unique tiebreaker (orderkey /
event_id) so ranks, offsets, and frames are total — identical in both
engines under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.registry import query

HOUR_US = 3_600_000_000  # one hour in microseconds


@query(
    "win_ranking",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rk,
           DENSE_RANK() OVER w AS drk,
           NTILE(4) OVER w AS nt
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/ntile per customer, ordered by spend
    (orderkey tiebreak → total order → deterministic ntile)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("drk"),
        F.ntile(4).over(w).alias("nt"),
    )


@query(
    "win_lag_lead",
    """
    SELECT event_id, user_id, ts,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset access per user event stream: previous/next value and the
    µs gap since the previous event (exact integers — no timestamp
    subtraction dialect drift)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


@query(
    "win_running_rows",
    """
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def win_running_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer with a ROWS frame; money summed in
    exact decimal (frame order is total, but decimal keeps the policy
    uniform engine-wide)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "win_sliding_range",
    """
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_last_hour,
           MAX(value) OVER w AS max_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_sliding_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over the numeric event time (µs): per user, count and
    max value over the trailing hour — the moving-window shape behind
    rate limiting / anomaly features. count/max are order-insensitive,
    so the frame needs no tiebreaker."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-HOUR_US, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.max("value").over(w).alias("max_last_hour"),
    )


@query(
    "win_first_last",
    """
    SELECT event_id, user_id, ts,
           FIRST_VALUE(pv IGNORE NULLS) OVER w AS first_purchase_value,
           LAST_VALUE(pv IGNORE NULLS) OVER w AS last_purchase_value
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'purchase' THEN value END AS pv
      FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last_value with IGNORE NULLS — the gap-fill idiom: each
    event carries the user's first and latest purchase value so far."""
    ev = load_table(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.withColumn("pv", pv).select(
        "event_id",
        "user_id",
        "ts",
        F.first("pv", ignorenulls=True).over(w).alias("first_purchase_value"),
        F.last("pv", ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@query(
    "limit_by",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def limit_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse `LIMIT 3 BY o_custkey` — top-3 orders per customer.
    Spark ≥3.5 rewrites the rank filter into WindowGroupLimit (per-
    partition top-n retained before the full sort — plan asserted in
    tests/test_plans.py), making this the scale path for per-key
    top-n."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "win_sessionize",
    """
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER w < INTERVAL 30 MINUTE THEN 0 ELSE 1 END
               AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM g
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end
    FROM s GROUP BY 1, 2
    """,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization — the lag+cumsum idiom: an event opens a new
    session when >30 min elapsed since the user's previous event;
    running SUM of those break flags numbers the sessions. The batch
    twin of stream_session_gap (same 30-min gap; the streaming form
    uses session_window state).

    One shuffle on user_id; both windows and the final per-session
    aggregate reuse that partitioning. Per-user event counts bound the
    sort — scale-safe. event_id tiebreak makes the order total."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # strict <: an event exactly gap-after the previous one opens a NEW
    # session, matching session_window's exclusive end (asserted against
    # the session_window op in tests/test_behavior.py). µs precision:
    # cast-to-long truncates to seconds and mis-buckets events within
    # 1s of the 30-min boundary (bit the sf0.1 sweep).
    gap_ok = (
        F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    ) < 30 * 60 * 1_000_000
    g = ev.withColumn(
        "new_session", F.when(gap_ok, F.lit(0)).otherwise(F.lit(1))
    )
    s = g.withColumn("session_seq", F.sum("new_session").over(run))
    return s.groupBy("user_id", F.col("session_seq").cast("bigint").alias("session_seq")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "win_cume_pct",
    """
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice)
             AS pct_rank,
           cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice)
             AS cume
    FROM orders
    """,
)
def win_cume_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position windows: percent_rank ((rank−1)/(n−1)) and
    cume_dist (rows ≤ current / n) of order value within each priority
    class. Both depend only on VALUES, not tie order — deterministic
    without a tiebreaker, unlike row_number. One shuffle on the
    partition key; both functions share the same window frame so
    Catalyst evaluates them in one Window operator."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
