"""SURVEY §2 extras — ClickHouse behavioral-analytics aggregates
(agg_window_funnel, agg_retention, agg_sequence_match) over the
`events` fixture.

These are the signature ClickHouse event-chain functions
(`windowFunnel`, `retention`, `sequenceMatch`) a product-analytics
user of a ClickHouse-destination engine runs daily. Semantics and the
exists-chain scale argument live in ops/funnel.py; each key here is
fully oracle-checked — the DuckDB SQL re-expresses the identical
chain logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.ops.funnel import (
    funnel_levels,
    retention_flags,
    sequence_match_2,
)
from etl_ch_destination_spark.registry import query

FUNNEL_WINDOW = "INTERVAL 6 HOURS"  # 32/107/11 users at levels 1/2/3 (sf0.01)


@query(
    "agg_window_funnel",
    """
    WITH s1 AS (SELECT user_id, ts AS t1 FROM events WHERE event_type = 'view'),
    s2 AS (SELECT user_id, ts AS t2 FROM events WHERE event_type = 'click'),
    s3 AS (SELECT user_id, ts AS t3 FROM events WHERE event_type = 'purchase'),
    c12 AS (
      SELECT s1.user_id, t1, min(t2) AS t2
      FROM s1 JOIN s2 ON s1.user_id = s2.user_id
        AND t2 > t1 AND t2 <= t1 + INTERVAL 6 HOUR
      GROUP BY 1, 2
    ),
    lvl AS (
      SELECT user_id, max(l) AS funnel_level FROM (
        SELECT user_id, 1 AS l FROM s1
        UNION ALL SELECT user_id, 2 FROM c12
        UNION ALL SELECT c12.user_id, 3 FROM c12
          JOIN s3 ON c12.user_id = s3.user_id
          AND t3 > t2 AND t3 <= t1 + INTERVAL 6 HOUR
      ) GROUP BY 1
    )
    SELECT COALESCE(funnel_level, 0) AS funnel_level,
           COUNT(*) AS n_users
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN lvl USING (user_id)
    GROUP BY 1
    """,
)
def agg_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``windowFunnel(6h)(ts, view, click, purchase)``:
    users per max funnel level reached by SOME strictly-ordered
    view→click→purchase chain inside a 6-hour window anchored at the
    view. Exact exists-chain form (ops/funnel.funnel_levels) — per-user
    equi-joins with bounded state, no per-user event-list fold."""
    ev = load_table(spark, sf_dir, "events")
    lv = funnel_levels(
        ev,
        steps=[
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        window_expr=FUNNEL_WINDOW,
    )
    # Level cardinality is tiny and fixed (0..3), so roll up with ONE
    # global conditional aggregate (Exchange SinglePartition of 4 longs)
    # + a stack projection back to rows — not a groupBy(funnel_level)
    # hash shuffle of the per-user frame.
    wide = lv.agg(
        *[
            F.sum(F.when(F.col("funnel_level") == k, 1).otherwise(0)).alias(f"__n{k}")
            for k in range(4)
        ]
    )
    return wide.select(
        F.expr(
            "stack(4, 0, __n0, 1, __n1, 2, __n2, 3, __n3) AS (funnel_level, n_users)"
        )
    ).filter(F.col("n_users") > 0)


@query(
    "agg_retention",
    """
    SELECT CAST(sum(d0) AS BIGINT) AS n_day0,
           CAST(sum(d0 * d1) AS BIGINT) AS n_ret1,
           CAST(sum(d0 * d2) AS BIGINT) AS n_ret2
    FROM (
      SELECT user_id,
             max(CASE WHEN ts::DATE = DATE '2024-01-01' THEN 1 ELSE 0 END) AS d0,
             max(CASE WHEN ts::DATE = DATE '2024-01-02' THEN 1 ELSE 0 END) AS d1,
             max(CASE WHEN ts::DATE = DATE '2024-01-03' THEN 1 ELSE 0 END) AS d2
      FROM events GROUP BY 1
    )
    """,
)
def agg_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``retention(day0, day1, day2)`` cohort counts: users
    active on Jan 1, and of those, how many returned on Jan 2 / Jan 3.
    Two hash aggregates (per-user flags, then global sums) — shuffle
    bounded at one row per user, then one row total."""
    ev = load_table(spark, sf_dir, "events")
    flags = retention_flags(
        ev,
        conditions=[
            F.to_date("ts") == F.lit("2024-01-01").cast("date"),
            F.to_date("ts") == F.lit("2024-01-02").cast("date"),
            F.to_date("ts") == F.lit("2024-01-03").cast("date"),
        ],
    )
    return flags.agg(
        F.sum("r1").cast("bigint").alias("n_day0"),
        F.sum("r2").cast("bigint").alias("n_ret1"),
        F.sum("r3").cast("bigint").alias("n_ret2"),
    )


@query(
    "agg_sequence_match",
    """
    SELECT matched, COUNT(*) AS n_users FROM (
      SELECT user_id,
             COALESCE(
               CAST(min(CASE WHEN event_type = 'signup' THEN ts END)
                  < max(CASE WHEN event_type = 'purchase' THEN ts END) AS INT),
               0) AS matched
      FROM events GROUP BY 1
    ) GROUP BY 1
    """,
)
def agg_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2)')(ts, signup, purchase)``
    per user, rolled up to matched/unmatched counts. min/max
    formulation (ops/funnel.sequence_match_2): any signup strictly
    before any purchase ⟺ min ts(signup) < max ts(purchase) — one
    aggregate, no join, no ordering pass."""
    ev = load_table(spark, sf_dir, "events")
    m = sequence_match_2(
        ev,
        first=F.col("event_type") == "signup",
        then=F.col("event_type") == "purchase",
    )
    return m.groupBy("matched").agg(F.count(F.lit(1)).alias("n_users"))


FUNNEL_TYPES = ("view", "click", "purchase")


@query(
    "agg_window_funnel_strict",
    """
    WITH fe AS (
        SELECT user_id, event_type, ts, event_id,
               lead(event_type) OVER w AS nxt1_type,
               lead(ts) OVER w AS nxt1_ts,
               lead(event_type, 2) OVER w AS nxt2_type,
               lead(ts, 2) OVER w AS nxt2_ts
        FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    anchors AS (
        SELECT user_id, ts AS t1,
               CASE
                 WHEN nxt1_type = 'click' AND nxt1_ts <= ts + INTERVAL 6 HOUR
                      AND nxt2_type = 'purchase'
                      AND nxt2_ts <= ts + INTERVAL 6 HOUR THEN 3
                 WHEN nxt1_type = 'click' AND nxt1_ts <= ts + INTERVAL 6 HOUR
                      THEN 2
                 ELSE 1
               END AS lvl,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM fe WHERE event_type = 'view'
    ),
    best AS (
        SELECT user_id, MAX(lvl) AS funnel_level FROM anchors GROUP BY user_id
    )
    SELECT COALESCE(funnel_level, 0) AS funnel_level, COUNT(*) AS n_users
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN best USING (user_id)
    GROUP BY 1
    """,
)
def agg_window_funnel_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`windowFunnel(strict_order)` — the strict variant of
    agg_window_funnel: chain steps must be CONSECUTIVE among the
    user's funnel-type events (view → click → purchase with nothing
    from the funnel set interleaved; any other funnel event between
    two steps breaks the chain, CH's strict_order semantics, which
    also subsumes strict_dedup — a duplicate step IS an interleaved
    event). Every view anchors a candidate chain; a user's level is
    the best over anchors; users with no funnel events count at
    level 0.

    Where the base key is an exists-chain of joins (steps may
    interleave), this one is pure lead() windows over the filtered
    event stream — ONE shuffle on user_id for the window pair + anchor
    rank, then two tiny aggregates. The strict form is actually the
    CHEAPER plan at scale: no join fan-out at all."""
    ev = load_table(spark, sf_dir, "events")
    fe = ev.filter(F.col("event_type").isin(*FUNNEL_TYPES))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    win = F.expr("INTERVAL 6 HOURS")
    fe = fe.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lead("event_type").over(w).alias("nxt1_type"),
        F.lead("ts").over(w).alias("nxt1_ts"),
        F.lead("event_type", 2).over(w).alias("nxt2_type"),
        F.lead("ts", 2).over(w).alias("nxt2_ts"),
    )
    lvl = (
        F.when(
            (F.col("nxt1_type") == "click")
            & (F.col("nxt1_ts") <= F.col("ts") + win)
            & (F.col("nxt2_type") == "purchase")
            & (F.col("nxt2_ts") <= F.col("ts") + win),
            3,
        )
        .when(
            (F.col("nxt1_type") == "click")
            & (F.col("nxt1_ts") <= F.col("ts") + win),
            2,
        )
        .otherwise(1)
    )
    anchors = fe.filter(F.col("event_type") == "view").select(
        "user_id", lvl.alias("lvl")
    )
    best = anchors.groupBy("user_id").agg(F.max("lvl").alias("funnel_level"))
    users = ev.select("user_id").distinct()
    return (
        users.join(best, "user_id", "left")
        .groupBy(F.coalesce("funnel_level", F.lit(0)).alias("funnel_level"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
