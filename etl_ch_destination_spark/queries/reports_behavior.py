"""SURVEY §2.12 extension — behavioral/product-analytics composed
reports over the events stream (the ClickHouse-for-analytics workload
class: cohort retention matrices).

Determinism: all outputs are integer counts over integer month
indexes (year*12 + month) — no float anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.registry import query


@query(
    "rpt_cohort_retention",
    """
    WITH act AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
        FROM events
    ),
    coh AS (
        SELECT user_id, d,
               MIN(d) OVER (PARTITION BY user_id) AS cohort_d
        FROM act
    )
    SELECT CAST(DATE '1970-01-01' + to_days(CAST(cohort_d AS INT)) AS DATE) AS cohort_day,
           CAST(d - cohort_d AS INT) AS days_since,
           COUNT(*) AS n_users
    FROM coh
    GROUP BY cohort_d, d
    """,
)
def rpt_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity DAY,
    counted on every day they return — the canonical product-analytics
    retention triangle (day granularity because the events fixture
    spans one month; the month form is the same plan). The day index
    is integer days-since-epoch, so cohort assignment and offsets are
    exact; the label column converts back to a DATE.

    Plan: distinct (user, day) — one exchange whose output feeds BOTH
    the per-user MIN window (cohort assignment — Catalyst keeps it on
    the user-hash partitioning, no second shuffle of the same data)
    and the final (cohort, day) count. Collapsing to user-day rows
    BEFORE any wide state is the only viable layout at 100 TB of raw
    events; COUNT(*) downstream is correct because rows are already
    user-unique within (cohort_d, d)."""
    e = load_table(spark, sf_dir, "events")
    act = e.select(
        "user_id", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d")
    ).distinct()
    coh = act.select(
        "user_id",
        "d",
        F.min("d").over(Window.partitionBy("user_id")).alias("cohort_d"),
    )
    return (
        coh.groupBy("cohort_d", "d")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("cohort_d").cast("int")).alias(
                "cohort_day"
            ),
            (F.col("d") - F.col("cohort_d")).cast("int").alias("days_since"),
            "n_users",
        )
    )
