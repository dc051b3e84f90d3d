"""Time-series gap handling beyond ORDER BY WITH FILL (`sort_with_fill`
in sorts.py fills missing rank rows with constants): LINEAR
INTERPOLATION across time-bucket gaps — ClickHouse
`WITH FILL ... INTERPOLATE` / TimescaleDB `interpolate()` analog.

Scale notes (100 TB): the heavy stage is the per-bucket aggregate
(map-side partial, one shuffle). The interpolation itself runs on the
AGGREGATED bucket spine, whose cardinality is time-span/bucket-width
(~4.3k for the fixture's 30 days of 10-minute buckets) — independent
of row count — so the unpartitioned ordered window over it is bounded
by construction (same documented exception as agg_topk_freq). For
multi-entity interpolation, partition the window by the entity key and
the bound is per-entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.registry import query


@query(
    "ts_resample_ohlc",
    """
    WITH r AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, value,
        ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                           ORDER BY ts, event_id) AS rn_a,
        ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                           ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, bucket,
           MIN(CASE WHEN rn_a = 1 THEN value END) AS open_value,
           MIN(CASE WHEN rn_d = 1 THEN value END) AS close_value,
           MAX(value) AS high_value,
           MIN(value) AS low_value,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS volume
    FROM r GROUP BY 1, 2
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC time-bucket downsample — the classic time-series rollup
    (ClickHouse `argMin`/`argMax` over `toStartOfHour`, TimescaleDB
    `time_bucket` + `first`/`last`): per (series, hour) the opening /
    closing / extreme values and exact-decimal volume.

    Determinism: open/close pick the row with the unique
    (ts, event_id) order via ROW_NUMBER on both engines — never a
    bare `first()` whose tie-breaking is engine-defined.

    Scale: ONE shuffle on (series, bucket); both window sorts and the
    final aggregate reuse that partitioning (grouping keys = window
    partition keys), and each window partition is one bucket of one
    series — bounded by bucket width, never by table size."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    w_asc = Window.partitionBy("event_type", "bucket").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("event_type", "bucket").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    r = b.select(
        "event_type",
        "bucket",
        "value",
        F.row_number().over(w_asc).alias("rn_a"),
        F.row_number().over(w_desc).alias("rn_d"),
    )
    return r.groupBy("event_type", "bucket").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open_value"),
        F.min(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close_value"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("volume"),
    )


@query(
    "ts_interpolate",
    """
    WITH base AS (
      SELECT time_bucket(INTERVAL '10 minutes', ts) AS ws,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    spine AS (
      SELECT unnest(generate_series((SELECT MIN(ws) FROM base),
                                    (SELECT MAX(ws) FROM base),
                                    INTERVAL '10 minutes')) AS ws
    ),
    j AS (SELECT s.ws, base.v FROM spine s LEFT JOIN base ON s.ws = base.ws),
    f AS (
      SELECT ws, v,
        last_value(v IGNORE NULLS) OVER
          (ORDER BY ws ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN ws END IGNORE NULLS) OVER
          (ORDER BY ws ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
        first_value(v IGNORE NULLS) OVER
          (ORDER BY ws ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN ws END IGNORE NULLS) OVER
          (ORDER BY ws ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
      FROM j
    )
    SELECT ws,
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                  pv + (nv - pv) * ((epoch(ws) - epoch(pb)) / (epoch(nb) - epoch(pb)))
                ELSE COALESCE(pv, nv) END AS value_interp,
           v IS NULL AS was_filled
    FROM f
    """,
)
def ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over 10-minute purchase-value buckets: the
    dense bucket spine is generated from the aggregated min/max (1-row
    broadcast + sequence explode, never a driver collect), empty
    buckets get pv + (nv−pv)·Δt-fraction between their known
    neighbors (IEEE-identical to the oracle: exact-decimal bucket
    averages, then the same double expression tree both sides)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    base = (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("v")
        )
        .select(F.col("w.start").alias("ws"), "v")
    )
    bounds = base.agg(F.min("ws").alias("lo"), F.max("ws").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 10 MINUTES"))).alias("ws")
    )
    j = spine.join(base, "ws", "left")
    # bounded window: spine cardinality = span/width, not row count
    w_prev = Window.orderBy("ws").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = Window.orderBy("ws").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    known_ws = F.when(F.col("v").isNotNull(), F.col("ws"))
    f = j.select(
        "ws",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(known_ws, ignorenulls=True).over(w_prev).alias("pb"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(known_ws, ignorenulls=True).over(w_next).alias("nb"),
    )
    # whole-second epoch is EXACT here: ws/pb/nb are 10-minute-aligned
    # bucket starts (zero sub-second part), unlike raw event times
    ep = lambda c: F.unix_timestamp(F.col(c)).cast("double")  # noqa: E731
    frac = (ep("ws") - ep("pb")) / (ep("nb") - ep("pb"))
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        )
        .otherwise(F.coalesce("pv", "nv"))
    )
    return f.select(
        "ws",
        interp.alias("value_interp"),
        F.col("v").isNull().alias("was_filled"),
    )


MOVMED_FRAME = 4  # window = 4 preceding rows + current (5-point median)


@query(
    "ts_moving_median",
    f"""
    WITH q AS (
      SELECT user_id, event_id, ts,
             CAST(floor(value * 1000000.0) AS BIGINT) AS vq,
             list(CAST(floor(value * 1000000.0) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {MOVMED_FRAME} PRECEDING AND CURRENT ROW)
               AS l
      FROM events
    )
    SELECT user_id, event_id,
           CAST(len(l) AS INT) AS n_window,
           list_sort(l)[CAST(floor((len(l) + 1) / 2.0) AS INT)]
             AS median_micros,
           CAST(list_sort(l)[CAST(floor((len(l) + 1) / 2.0) AS INT)] AS DOUBLE)
             / 1000000.0 AS median_value
    FROM q
    """,
)
def ts_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving median over a bounded row frame ({MOVMED_FRAME} preceding
    + current, per user, (ts, event_id) total order) — the robust
    smoother a metrics pipeline runs where a moving AVERAGE would let
    one spike poison the window. Median = the LOWER middle element of
    the sorted frame, picked by explicit floor((n+1)/2) on BOTH
    engines — a bare int cast would diverge (Spark truncates 1.5 -> 1,
    DuckDB rounds 1.5 -> 2, probed), the same cross-engine cast trap
    as deltaSum's quantization. Values are micro-quantized integers
    (the deltaSum policy), so sorting and selection are exact; the
    double form is one final division.

    Plan: one shuffle on user_id; the frame is ROWS-bounded so state
    per row is O({MOVMED_FRAME}+1) — no whole-partition buffering, and
    the window sort is the partition's (ts, event_id) sort reused by
    any other per-user window in the same stage. At 100 TB this is the
    sessionize cost model, not the global-sort one."""
    e = load_table(spark, sf_dir, "events")
    vq = F.floor(F.col("value") * 1000000.0).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-MOVMED_FRAME, 0)
    )
    lst = F.collect_list(vq).over(w)
    pick = F.floor((F.size(lst) + 1) / 2.0).cast("int")
    med = F.element_at(F.sort_array(lst), pick)
    return e.select(
        "user_id",
        "event_id",
        F.size(lst).alias("n_window"),
        med.alias("median_micros"),
        (med.cast("double") / 1000000.0).alias("median_value"),
    )


GAP_MICROS = 86_400_000_000  # 1 day: flag silences longer than this


@query(
    "ts_gap_report",
    f"""
    WITH q AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS tq,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_tq
      FROM events
    )
    SELECT user_id, event_id,
           prev_tq, tq,
           tq - prev_tq AS gap_micros,
           CAST((tq - prev_tq) // {GAP_MICROS} AS BIGINT) AS gap_days
    FROM q
    WHERE prev_tq IS NOT NULL AND tq - prev_tq > {GAP_MICROS}
    """,
)
def ts_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap detection — the diagnostic twin of sessionization: instead
    of grouping events INTO sessions, report the silences BETWEEN
    them (every inter-event gap over one day per user, with the event
    that ended it). This is the data-freshness/outage report a
    monitoring pipeline derives from the same lag() machinery
    win_sessionize uses for its gap-threshold session ids.

    Pure integer arithmetic end to end (epoch microseconds, integer
    division for whole days) — nothing to quantize, the oracle is
    exact by construction. Plan: one shuffle on user_id for the
    ordered lag, then a map-side filter; at scale identical to the
    sessionize cost model."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tq = F.unix_micros("ts")
    q = e.select(
        "user_id",
        "event_id",
        tq.alias("tq"),
        F.lag(tq).over(w).alias("prev_tq"),
    )
    gap = F.col("tq") - F.col("prev_tq")
    return q.filter(F.col("prev_tq").isNotNull() & (gap > GAP_MICROS)).select(
        "user_id",
        "event_id",
        "prev_tq",
        "tq",
        gap.alias("gap_micros"),
        F.expr(f"(tq - prev_tq) div {GAP_MICROS}").cast("bigint").alias("gap_days"),
    )


@query(
    "ts_vwap",
    """
    WITH t AS (
      SELECT event_type,
             date_trunc('hour', ts) AS hb,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
             user_id % 5 + 1 AS qty
      FROM events
    )
    SELECT event_type, hb,
           CAST(SUM(cents * qty) AS BIGINT) AS pv_cents,
           CAST(SUM(qty) AS BIGINT) AS volume,
           CAST(SUM(cents * qty) AS DOUBLE) / CAST(SUM(qty) AS DOUBLE)
             AS vwap_cents
    FROM t
    GROUP BY event_type, hb
    """,
)
def ts_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per (series, hour) — the finance
    resampling companion to ts_resample_ohlc: VWAP = sum(price·qty) /
    sum(qty), with the numerator and denominator kept as EXACT int64
    (cents × synthetic integer quantity) and one final IEEE division —
    the repo's standard exact-ratio recipe. One partial-aggregable
    hash aggregate on (series, bucket); at 100 TB the hour bucket is
    derived map-side so the exchange is the aggregate's own."""
    e = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    t = e.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hb"),
        cents.alias("cents"),
        (F.col("user_id") % 5 + 1).alias("qty"),
    )
    return t.groupBy("event_type", "hb").agg(
        F.sum(F.col("cents") * F.col("qty")).cast("bigint").alias("pv_cents"),
        F.sum("qty").cast("bigint").alias("volume"),
        (
            F.sum(F.col("cents") * F.col("qty")).cast("double")
            / F.sum("qty").cast("double")
        ).alias("vwap_cents"),
    )
