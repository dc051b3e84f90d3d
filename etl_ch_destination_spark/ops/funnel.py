"""Behavioral-analytics operators: windowFunnel / retention /
sequenceMatch — ClickHouse's signature event-chain aggregates
(SURVEY §2 extras; `[D]` events fixture).

``funnel_levels`` computes exact ``windowFunnel(W)(ts, c1..cN)``
semantics — the max k such that SOME chain of events matching steps
1..k, strictly increasing in time, fits inside ``(t_anchor, t_anchor
+ W]`` — via an exists-chain join, not a per-user fold:

    c_1 = events matching step 1                  (anchor rows)
    c_k = c_{k-1} ⋈ step_k  on user, ts > t_{k-1}, ts ≤ anchor + W
          → group by (user, anchor), keep MIN(ts)

Keeping only the EARLIEST valid step-k time per anchor is exact by a
greedy-exchange argument: a later choice can only shrink the candidate
set for step k+1 (which needs ts > t_k and ts ≤ anchor + W). So state
stays bounded at one row per (user, anchor) — never a combinatorial
chain explosion.

Scale (100 TB): every join is an equi-join on ``user_id`` (the range
condition is a post-join filter on co-partitioned rows), so each level
is one shuffle bounded by |step-k events|; per-user-per-window event
counts bound the join fan-out. Skewed power users salt like any hot
key (ops/salting.py). This beats the collect-per-user fold form, whose
state is unbounded per user and whose fold runs interpreted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_levels(
    events: DataFrame,
    steps: list[Column],
    window_expr: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel level: ``(user_id, funnel_level)`` with level in
    ``0..len(steps)``; level 0 = user has events but none match step 1.

    ``steps`` are boolean Columns over the events schema (evaluated per
    event); ``window_expr`` is a SQL interval literal, e.g.
    ``"INTERVAL 6 HOURS"``.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = events.select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"), *[
        s.alias(f"__s{i}") for i, s in enumerate(steps)
    ])
    # map-side partial agg → one cheap shuffle of distinct user ids
    users = ev.select("user_id").distinct()

    # Shuffle accounting (asserted with a per-key allowance in
    # tests/test_plan_audit): every hash exchange moves only a step's
    # FILTERED rows or per-user/per-anchor aggregates — never the whole
    # events table, and never anything quadratic. At fixture scale
    # Catalyst broadcasts the small chain sides (so the per-anchor and
    # per-user reductions each pay their own exchange); at real scale
    # the stats flip to sort-merge joins on user_id, whose partitioning
    # the downstream reductions then reuse.
    deadline = F.col("__t1") + F.expr(window_expr)
    # chains: one row per (user, anchor) = earliest chain reaching level k.
    # groupBy(user_id, __t1) is satisfied by the user_id partitioning —
    # no re-shuffle.
    chains = (
        ev.filter(F.col("__s0"))
        .select("user_id", F.col("ts").alias("__t1"))
    )
    # level sets are monotone (reaching k implies reaching k-1), so the
    # per-user level is a SUM of membership flags — co-partitioned left
    # joins, no union + re-aggregation.
    flags = [chains.select("user_id").distinct().withColumn("__l0", F.lit(1))]
    prev_t = "__t1"
    for k in range(1, len(steps)):
        step_k = ev.filter(F.col(f"__s{k}")).select(
            "user_id", F.col("ts").alias("__tk")
        )
        chains = (
            chains.join(step_k, "user_id")
            .filter((F.col("__tk") > F.col(prev_t)) & (F.col("__tk") <= deadline))
            .groupBy("user_id", "__t1")
            .agg(F.min("__tk").alias(f"__t{k + 1}"))
        )
        prev_t = f"__t{k + 1}"
        flags.append(
            chains.select("user_id").distinct().withColumn(f"__l{k}", F.lit(1))
        )
    out = users
    for frame in flags:
        out = out.join(frame, "user_id", "left")
    level = F.lit(0)
    for k in range(len(steps)):
        level = level + F.coalesce(F.col(f"__l{k}"), F.lit(0))
    return out.select("user_id", level.alias("funnel_level"))


def retention_flags(
    events: DataFrame,
    conditions: list[Column],
    user_col: str = "user_id",
) -> DataFrame:
    """ClickHouse ``retention(c1, c2, ..)`` per user: ``r1 = c1 ever
    held``; ``rk = r1 AND ck ever held`` (k ≥ 2). One hash aggregate —
    map-side partial keeps shuffle at one row per user."""
    if not conditions:
        raise ValueError("retention needs at least one condition")
    per_user = events.groupBy(F.col(user_col).alias("user_id")).agg(
        *[
            F.max(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(f"__c{i}")
            for i, c in enumerate(conditions)
        ]
    )
    cols = [F.col("__c0").alias("r1")] + [
        (F.col("__c0") * F.col(f"__c{i}")).alias(f"r{i + 1}")
        for i in range(1, len(conditions))
    ]
    return per_user.select("user_id", *cols)


def sequence_match_2(
    events: DataFrame,
    first: Column,
    then: Column,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2)')`` per user: 1 iff some
    event matching ``first`` strictly precedes some event matching
    ``then``. min/max formulation — one aggregate, no join:
    ``min ts(first) < max ts(then)``."""
    return events.groupBy(F.col(user_col).alias("user_id")).agg(
        (
            F.min(F.when(first, F.col(ts_col)))
            < F.max(F.when(then, F.col(ts_col)))
        )
        .cast("int")
        .alias("matched")
    ).select("user_id", F.coalesce("matched", F.lit(0)).alias("matched"))
