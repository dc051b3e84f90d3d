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


@query(
    "agg_window_funnel_dedup",
    """
    WITH e AS (
      SELECT user_id, event_type, ts FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    s1 AS (SELECT user_id, ts AS t1 FROM e WHERE event_type = 'view'),
    c12 AS (
      SELECT s1.user_id, t1, MIN(s2.ts) AS t2
      FROM s1 JOIN e s2 ON s1.user_id = s2.user_id
        AND s2.event_type = 'click'
        AND s2.ts > t1 AND s2.ts <= t1 + INTERVAL 24 HOUR
      GROUP BY 1, 2
    ),
    c12v AS (
      SELECT c12.* FROM c12
      WHERE NOT EXISTS (
        SELECT 1 FROM e v WHERE v.user_id = c12.user_id
          AND v.event_type = 'view' AND v.ts > c12.t1 AND v.ts < c12.t2)
    ),
    c123 AS (
      SELECT c12v.user_id, t1, t2, MIN(s3.ts) AS t3
      FROM c12v JOIN e s3 ON c12v.user_id = s3.user_id
        AND s3.event_type = 'purchase'
        AND s3.ts > t2 AND s3.ts <= t1 + INTERVAL 24 HOUR
      GROUP BY 1, 2, 3
    ),
    c123v AS (
      SELECT c123.* FROM c123
      WHERE NOT EXISTS (
        SELECT 1 FROM e x WHERE x.user_id = c123.user_id
          AND x.event_type IN ('view', 'click')
          AND x.ts > c123.t2 AND x.ts < c123.t3)
    ),
    lvl AS (
      SELECT user_id, MAX(l) AS funnel_level FROM (
        SELECT user_id, 1 AS l FROM s1
        UNION ALL SELECT user_id, 2 FROM c12v
        UNION ALL SELECT user_id, 3 FROM c123v
      ) GROUP BY 1
    )
    SELECT COALESCE(funnel_level, 0) AS funnel_level, COUNT(*) AS n_users
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN lvl USING (user_id)
    GROUP BY 1
    """,
)
def agg_window_funnel_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`windowFunnel(strict_deduplication)` (VERDICT r13 #5) — the CH
    mode between base and strict_order: steps may interleave with
    NON-funnel noise and with not-yet-matched steps, but an event
    matching an ALREADY-MATCHED condition strictly between two chain
    events interrupts the chain. Pinned greedy semantics (CH walks
    the stream in time order): each view anchors a chain; the chain
    takes the FIRST click in (t1, t1+24h] — dead if another view lands
    strictly between t1 and that click — then the FIRST purchase in
    (t2, t1+24h] — dead if a view OR click lands strictly between t2
    and it (both conditions are matched by then; a purchase between
    does not interrupt, condition 3 is not yet matched). A user's
    level is the max over anchors; users with no funnel events count
    at level 0. Verified against a brute-force per-user replay in
    tests/test_round14_keys.py. The window is pinned at 24h (not the
    base key's 6h) because interrupts must actually FIRE to test the
    mode: at 6h the sf0.001 fixture kills zero chains; at 24h the
    interrupt path changes 3/14/149 user levels at sf0.001/0.01/0.1.

    Plan: the base exists-chain joins plus two LEFT ANTI range joins
    for the interrupt checks — all equi on user_id (SMJ/SHJ with the
    range as the join residual), no cartesian anywhere; per-user
    state stays bounded exactly like agg_window_funnel."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type").isin(*FUNNEL_TYPES)).select(
        "user_id", "event_type", "ts"
    )
    win = F.expr("INTERVAL 24 HOURS")
    s1 = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("t1")
    )
    s2 = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("tc")
    )
    s3 = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u3"), F.col("ts").alias("tp")
    )
    c12 = (
        s1.join(
            s2,
            (F.col("user_id") == F.col("u2"))
            & (F.col("tc") > F.col("t1"))
            & (F.col("tc") <= F.col("t1") + win),
        )
        .groupBy("user_id", "t1")
        .agg(F.min("tc").alias("t2"))
    )
    vint = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("uv"), F.col("ts").alias("tv")
    )
    c12v = c12.join(
        vint,
        (F.col("user_id") == F.col("uv"))
        & (F.col("tv") > F.col("t1"))
        & (F.col("tv") < F.col("t2")),
        "left_anti",
    )
    c123 = (
        c12v.join(
            s3,
            (F.col("user_id") == F.col("u3"))
            & (F.col("tp") > F.col("t2"))
            & (F.col("tp") <= F.col("t1") + win),
        )
        .groupBy("user_id", "t1", "t2")
        .agg(F.min("tp").alias("t3"))
    )
    vcint = e.filter(
        F.col("event_type").isin("view", "click")
    ).select(F.col("user_id").alias("ux"), F.col("ts").alias("tx"))
    c123v = c123.join(
        vcint,
        (F.col("user_id") == F.col("ux"))
        & (F.col("tx") > F.col("t2"))
        & (F.col("tx") < F.col("t3")),
        "left_anti",
    )
    lvls = (
        s1.select("user_id", F.lit(1).alias("l"))
        .unionByName(c12v.select("user_id", F.lit(2).alias("l")))
        .unionByName(c123v.select("user_id", F.lit(3).alias("l")))
        .groupBy("user_id")
        .agg(F.max("l").alias("funnel_level"))
    )
    users = ev.select("user_id").distinct()
    return (
        users.join(lvls, "user_id", "left")
        .groupBy(F.coalesce("funnel_level", F.lit(0)).alias("funnel_level"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "agg_window_funnel_increase",
    """
    WITH h AS (
      SELECT user_id, event_type, date_trunc('hour', ts) AS th FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    h1 AS (SELECT user_id, th AS t1 FROM h WHERE event_type = 'view'),
    i12 AS (
      SELECT h1.user_id, t1, MIN(h2.th) AS t2
      FROM h1 JOIN h h2 ON h1.user_id = h2.user_id
        AND h2.event_type = 'click'
        AND h2.th > t1 AND h2.th <= t1 + INTERVAL 6 HOUR
      GROUP BY 1, 2
    ),
    lvl AS (
      SELECT user_id, MAX(l) AS funnel_level FROM (
        SELECT user_id, 1 AS l FROM h1
        UNION ALL SELECT user_id, 2 FROM i12
        UNION ALL SELECT i12.user_id, 3 FROM i12
          JOIN h h3 ON i12.user_id = h3.user_id
          AND h3.event_type = 'purchase'
          AND h3.th > t2 AND h3.th <= t1 + INTERVAL 6 HOUR
      ) GROUP BY 1
    )
    SELECT COALESCE(funnel_level, 0) AS funnel_level, COUNT(*) AS n_users
    FROM (SELECT DISTINCT user_id FROM events) u
    LEFT JOIN lvl USING (user_id)
    GROUP BY 1
    """,
)
def agg_window_funnel_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`windowFunnel(strict_increase)` (VERDICT r13 #5): chain steps
    must carry STRICTLY increasing timestamps. The mode exists for
    coarse clocks — second/minute/hour-resolution event times where
    ties are common and the base funnel would chain same-tick events
    — so this key pins event time to ``date_trunc('hour', ts)``
    (the fixture carries 12/106/1040 cross-type same-hour tie groups
    at sf0.001/0.01/0.1; raw µs timestamps have zero ties and would
    make the mode vacuous). Semantics: exists-chain like
    agg_window_funnel with ``>`` on the truncated time — a chain
    needing a tie to advance does not; greedy MIN(t2) is complete
    (the earliest click maximizes the remaining window, same argument
    as the base key). Verified against a brute-force per-user replay
    in tests/test_round14_keys.py.

    Plan: identical join shape to agg_window_funnel — two equi-joins
    on user_id with range residuals, one level rollup; the hour
    truncation folds into the scan projection."""
    ev = load_table(spark, sf_dir, "events")
    win = F.expr("INTERVAL 6 HOURS")
    h = ev.filter(F.col("event_type").isin(*FUNNEL_TYPES)).select(
        "user_id", "event_type", F.date_trunc("hour", "ts").alias("th")
    )
    h1 = h.filter(F.col("event_type") == "view").select(
        "user_id", F.col("th").alias("t1")
    )
    h2 = h.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u2"), F.col("th").alias("tc")
    )
    h3 = h.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u3"), F.col("th").alias("tp")
    )
    i12 = (
        h1.join(
            h2,
            (F.col("user_id") == F.col("u2"))
            & (F.col("tc") > F.col("t1"))
            & (F.col("tc") <= F.col("t1") + win),
        )
        .groupBy("user_id", "t1")
        .agg(F.min("tc").alias("t2"))
    )
    i123 = i12.join(
        h3,
        (F.col("user_id") == F.col("u3"))
        & (F.col("tp") > F.col("t2"))
        & (F.col("tp") <= F.col("t1") + win),
        "left_semi",
    )
    lvls = (
        h1.select("user_id", F.lit(1).alias("l"))
        .unionByName(i12.select("user_id", F.lit(2).alias("l")))
        .unionByName(i123.select("user_id", F.lit(3).alias("l")))
        .groupBy("user_id")
        .agg(F.max("l").alias("funnel_level"))
    )
    users = ev.select("user_id").distinct()
    return (
        users.join(lvls, "user_id", "left")
        .groupBy(F.coalesce("funnel_level", F.lit(0)).alias("funnel_level"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "agg_sequence_next_node",
    """
    WITH fe AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rnd
      FROM events
    ),
    per_user AS (
      SELECT user_id,
             MAX(CASE WHEN rn = 1 THEN event_type END) AS f1,
             MAX(CASE WHEN rn = 2 THEN event_type END) AS f2,
             MAX(CASE WHEN rn = 3 THEN event_type END) AS f3,
             MAX(CASE WHEN rnd = 1 THEN event_type END) AS l1,
             MAX(CASE WHEN rnd = 2 THEN event_type END) AS l2,
             MAX(CASE WHEN rnd = 3 THEN event_type END) AS l3
      FROM fe GROUP BY user_id
    )
    SELECT direction, next_node, COUNT(*) AS n_users FROM (
      SELECT 'forward_head' AS direction,
             CASE WHEN f1 = 'view' AND f2 = 'click' THEN f3 END AS next_node
      FROM per_user
      UNION ALL
      SELECT 'backward_tail',
             CASE WHEN l1 = 'purchase' AND l2 = 'click' THEN l3 END
      FROM per_user
    ) GROUP BY 1, 2
    """,
)
def agg_sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceNextNode`` — "what happens AFTER the
    funnel": per user, if the chain matches at the stream's head
    (forward/head mode: first event 'view', second 'click'), return
    the THIRD event's type — the node users flow to next; NULL when
    the chain doesn't match or the stream ends. The backward/tail
    mode mirrors it from the stream's end (last event 'purchase'
    preceded by 'click' → the event before those). Rolled up to
    (direction, next_node) → user counts, NULL buckets included —
    the flow-analysis shape CH users feed into Sankey charts. (The
    per-user row form — next event after the first base-event anchor,
    no chain precondition — is the separate seq_next_node key in
    reports_behavior.py; this one requires the 2-step chain MATCH and
    adds the tail-anchored direction.)

    Ordering is pinned by (ts, event_id) both ways, so both engines
    see identical head/tail triples. Plan: ONE shuffle on user_id
    shared by both row_number specs (same partition key), a per-user
    conditional aggregate collapsing to 6 columns, then a stack +
    tiny count agg — per-user state is 6 strings regardless of
    history length, the bounded-state form of the CH aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w_fwd = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_bwd = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    fe = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w_fwd).alias("rn"),
        F.row_number().over(w_bwd).alias("rnd"),
    ).filter((F.col("rn") <= 3) | (F.col("rnd") <= 3))
    per_user = fe.groupBy("user_id").agg(
        *[
            F.max(F.when(F.col(col) == i, F.col("event_type"))).alias(f"{pre}{i}")
            for col, pre in (("rn", "f"), ("rnd", "l"))
            for i in (1, 2, 3)
        ]
    )
    fwd = per_user.select(
        F.lit("forward_head").alias("direction"),
        F.when(
            (F.col("f1") == "view") & (F.col("f2") == "click"), F.col("f3")
        ).alias("next_node"),
    )
    bwd = per_user.select(
        F.lit("backward_tail").alias("direction"),
        F.when(
            (F.col("l1") == "purchase") & (F.col("l2") == "click"), F.col("l3")
        ).alias("next_node"),
    )
    return (
        fwd.unionByName(bwd)
        .groupBy("direction", "next_node")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "agg_sequence_match_time",
    """
    SELECT matched, COUNT(*) AS n_users FROM (
      SELECT u.user_id,
             CASE WHEN EXISTS (
               SELECT 1 FROM events s
               JOIN events p ON s.user_id = p.user_id
               WHERE s.user_id = u.user_id
                 AND s.event_type = 'signup' AND p.event_type = 'purchase'
                 AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
             ) THEN 1 ELSE 0 END AS matched
      FROM (SELECT DISTINCT user_id FROM events) u
    ) GROUP BY 1
    """,
)
def agg_sequence_match_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1)(?t<=3600)(?2)')(ts, signup,
    purchase)`` — the TIME-CONDITIONED pattern: a signup followed by a
    purchase within one hour (any events may interleave; only the
    step pair carries the time bound). Per user matched/unmatched,
    rolled up to counts. Where the unconditioned agg_sequence_match
    collapses to a min/max comparison, the time bound genuinely needs
    the pair search — expressed as ONE semi-join between the signup
    and purchase slices (equi on user_id, the bound as the join
    residual) instead of a per-user event-list fold.

    Plan: two filtered scans → user_id-keyed semi-join → distinct
    users left-join → one tiny count agg; per-user state is bounded
    by the type slices, never the history."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("su"), F.col("ts").alias("st")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pt")
    )
    hit = (
        s.join(
            p,
            (F.col("su") == F.col("pu"))
            & (F.col("pt") > F.col("st"))
            & (F.col("pt") <= F.col("st") + F.expr("INTERVAL 1 HOUR")),
            "left_semi",
        )
        .select(F.col("su").alias("user_id"))
        .distinct()
        .withColumn("matched", F.lit(1))
    )
    users = ev.select("user_id").distinct()
    return (
        users.join(hit, "user_id", "left")
        .groupBy(F.coalesce("matched", F.lit(0)).alias("matched"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
