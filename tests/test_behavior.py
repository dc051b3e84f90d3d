"""Behavioral-analytics operator invariants (ops/funnel.py): funnel
levels partition the user base and agree with a brute-force per-user
chain check; retention cohorts are monotone; sequenceMatch agrees with
a brute-force ordering check."""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import functions as F

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.ops.funnel import (
    funnel_levels,
    retention_flags,
    sequence_match_2,
)

STEPS = ["view", "click", "purchase"]
WINDOW = timedelta(hours=6)


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _brute_funnel_level(rows, window):
    """Reference windowFunnel: try every anchor, greedy chain walk."""
    rows = sorted(rows, key=lambda r: r[0])
    best = 0
    for i, (t0, ty) in enumerate(rows):
        if ty != STEPS[0]:
            continue
        level, prev_t, deadline = 1, t0, t0 + window
        for t, typ in rows[i + 1 :]:
            if t > deadline:
                break
            if level < len(STEPS) and typ == STEPS[level] and t > prev_t:
                level, prev_t = level + 1, t
        best = max(best, level)
    return best


def test_funnel_levels_match_brute_force_per_user(spark, sf_dir):
    ev = _events(spark, sf_dir)
    lv = funnel_levels(
        ev,
        steps=[F.col("event_type") == s for s in STEPS],
        window_expr="INTERVAL 6 HOURS",
    )
    got = {r["user_id"]: r["funnel_level"] for r in lv.collect()}
    per_user: dict[int, list] = {}
    for r in ev.select("user_id", "ts", "event_type").collect():
        per_user.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
    assert set(got) == set(per_user)
    for uid, rows in per_user.items():
        assert got[uid] == _brute_funnel_level(rows, WINDOW), f"user {uid}"


def test_funnel_levels_partition_the_user_base(spark, sf_dir):
    ev = _events(spark, sf_dir)
    lv = funnel_levels(
        ev,
        steps=[F.col("event_type") == s for s in STEPS],
        window_expr="INTERVAL 6 HOURS",
    )
    n_users = ev.select("user_id").distinct().count()
    assert lv.count() == n_users  # exactly one level per user
    assert lv.agg(F.min("funnel_level")).first()[0] >= 0
    assert lv.agg(F.max("funnel_level")).first()[0] <= len(STEPS)


def test_retention_cohorts_monotone(spark, sf_dir):
    ev = _events(spark, sf_dir)
    flags = retention_flags(
        ev,
        conditions=[
            F.to_date("ts") == F.lit(f"2024-01-0{d}").cast("date") for d in (1, 2, 3)
        ],
    )
    row = flags.agg(F.sum("r1"), F.sum("r2"), F.sum("r3")).first()
    n0, n1, n2 = row
    assert n0 >= n1 >= 0 and n0 >= n2 >= 0  # returning ⊆ day-0 cohort
    # rk is only set when r1 is (the CH retention contract)
    assert flags.filter((F.col("r2") > F.col("r1")) | (F.col("r3") > F.col("r1"))).count() == 0


def test_sequence_match_agrees_with_brute_force(spark, sf_dir):
    ev = _events(spark, sf_dir)
    m = sequence_match_2(
        ev,
        first=F.col("event_type") == "signup",
        then=F.col("event_type") == "purchase",
    )
    got = {r["user_id"]: r["matched"] for r in m.collect()}
    per_user: dict[int, list] = {}
    for r in ev.select("user_id", "ts", "event_type").collect():
        per_user.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
    for uid, rows in per_user.items():
        signups = [t for t, ty in rows if ty == "signup"]
        purchases = [t for t, ty in rows if ty == "purchase"]
        want = int(bool(signups and purchases and min(signups) < max(purchases)))
        assert got[uid] == want, f"user {uid}"


def test_sessionize_agrees_with_session_window_op(spark, sf_dir):
    """The lag+cumsum batch sessionizer and Spark's session_window
    (stream_session_gap's engine, same 30-min gap) must find the same
    sessions: identical count and identical (user, start, n_events)
    triples."""
    from etl_ch_destination_spark.queries.windows import win_sessionize
    from etl_ch_destination_spark.streaming import pipeline

    ours = win_sessionize(spark, sf_dir)
    theirs = pipeline.session_gap(_events(spark, sf_dir))
    a = sorted(
        (r["user_id"], r["session_start"], r["n_events"]) for r in ours.collect()
    )
    b = sorted(
        (r["user_id"], r["session_start"], r["n_events"]) for r in theirs.collect()
    )
    assert a == b
