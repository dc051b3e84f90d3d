"""Shared batch/stream transformations (SURVEY §2.9).

Each function takes an events-shaped DataFrame — batch OR streaming —
and returns the transformed frame. Batch invocations feed the DuckDB
oracle gate (queries/streaming_batch.py); streaming invocations run
under `availableNow` replay in tests/test_streaming.py and must
produce the same final table (stream-vs-batch equivalence).

ClickHouse analog: Kafka engine → materialized view with
`toStartOfInterval` bucketing → MergeTree destination.

Scale notes (100 TB/day ingest): windowed aggs keep state per
(window, key) — watermarks bound that state and let the store evict;
RocksDB state store (`spark.sql.streaming.stateStore.providerClass`)
moves state off-heap for hot key spaces; `foreach_batch_load` writes
idempotently (epoch-stamped batches) so a replayed micro-batch cannot
double-count downstream — the same replay contract ClickHouse's
insert-block dedup provides natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_ch_destination_spark.sink.clickhouse import stamp_batch

MONEY = "decimal(12,2)"  # events.value is 2-dp money-like (FIXTURES.md)


def tumbling_counts(ev: DataFrame) -> DataFrame:
    """10-minute tumbling counts/sums per event_type (CH: MV with
    toStartOfInterval)."""
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(MONEY)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_avg(ev: DataFrame) -> DataFrame:
    """10-minute windows sliding every 5 — each event lands in two
    windows; avg = exact-decimal sum / count (hash-stable)."""
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("value").cast(MONEY)).cast("double") / F.count(F.lit(1))).alias(
                "avg_value"
            ),
        )
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "n", "avg_value")
    )


def session_gap(ev: DataFrame) -> DataFrame:
    """Session windows: 30-minute inactivity gap per user. Session end =
    last event + gap (Spark session_window semantics; the oracle's
    gaps-and-islands SQL reproduces it exactly, with a new session at
    diff >= gap)."""
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def watermark_late(ev: DataFrame, delay: str = "15 minutes") -> DataFrame:
    """Tumbling per-window totals with a 15-minute watermark: streaming
    drops rows later than the watermark and finalizes windows; in batch
    the watermark is a no-op (all data is 'on time'), which is exactly
    the oracle-comparable form. Late-drop behavior is asserted under
    replay in tests/test_streaming.py."""
    return (
        ev.withWatermark("ts", delay)
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "n_events")
    )


def first_arrival_dedup(ev: DataFrame) -> DataFrame:
    """Batch-deterministic form of streaming dedup: the FIRST event (by
    event time, id tiebreak) per (user_id, event_type). The streaming
    form is dropDuplicatesWithinWatermark — arrival-order dependent, so
    it is equivalence-tested under ordered replay rather than oracled."""
    from etl_ch_destination_spark.ops.dedup import latest_by_key

    return latest_by_key(
        ev.select("user_id", "event_type", "event_id", "ts"),
        ["user_id", "event_type"],
        [F.asc("ts"), F.asc("event_id")],
    )


def dedup_within_watermark(ev: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Streaming dedup of event_id within the watermark horizon —
    bounded state (ids older than the watermark are evicted), the
    idempotent-ingest front door."""
    return ev.withWatermark("ts", delay).dropDuplicatesWithinWatermark(["event_id"])


def foreach_batch_load(stream_df: DataFrame, out_path: str, checkpoint: str):
    """THE reference pattern: stream → per-micro-batch batched insert.
    Each epoch is stamped (`_batch_id`) before the append, so a
    re-delivered epoch is deduplicable downstream — pair with
    `dropDuplicates(['_batch_id', key])` at read time. Returns the
    started StreamingQuery (availableNow: drains all input, then
    stops)."""

    def load_fn(batch_df: DataFrame, epoch_id: int) -> None:
        stamp_batch(batch_df, f"epoch-{epoch_id:05d}").write.mode("append").parquet(
            out_path
        )

    return (
        stream_df.writeStream.foreachBatch(load_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def interval_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream interval join: purchases attributed to a view by
    the same user within the following hour (ad-attribution shape).

    Works on batch frames (oracle form) and on two watermarked streams:
    the equality on user_id makes it a hash join, and the event-time
    band [view_ts, view_ts + 1h] lets the state store evict a view row
    once the purchase-side watermark passes its horizon — bounded state,
    the condition Spark requires for unbounded stream-stream joins.
    Pass frames already ``withWatermark``-ed in streaming callers; the
    renames here preserve the watermark column.
    """
    v = views.select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (v.user_id == p.p_user_id)
        & (p.purchase_ts >= v.view_ts)
        & (p.purchase_ts <= v.view_ts + F.expr("INTERVAL 1 HOUR"))
    )
    return v.join(p, cond).select(
        "view_id", "purchase_id", "user_id", "view_ts", "purchase_ts", "purchase_value"
    )


def static_enrich(ev: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static dimension enrichment — the most common stateless
    streaming ETL op (CH analog: dictGet inside a Kafka-fed MV). The
    static side broadcasts; each micro-batch joins map-side with ZERO
    state store involvement, so throughput is scan-bound. Inner
    semantics: events without a registered customer drop (the
    quarantine path is scan_csv_badrows's corrupt-record pattern)."""
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return ev.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", "event_type", "value", "segment"
    )


TOPK_PER_WINDOW = 3


def windowed_counts(ev: DataFrame) -> DataFrame:
    """The streamable stage of the per-window leaderboard: 10-minute
    tumbling counts per event_type (rank is not a streaming-supported
    operator over an aggregate, so it runs downstream of the sink)."""
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "n",
        )
    )


def windowed_topk(ev: DataFrame) -> DataFrame:
    """Top-K event types per 10-minute tumbling window by event count
    (count DESC, event_type tiebreak — total order): the windowed
    counts stage plus the downstream rank — exactly how a production
    leaderboard materializes (counts to the sink, rank on read)."""
    return rank_windowed_counts(windowed_counts(ev))


def rank_windowed_counts(counts: DataFrame) -> DataFrame:
    """The downstream-of-the-sink ranking stage, shared by the batch
    key and the stream-equivalence test (which applies it to the
    re-read streaming sink)."""
    from pyspark.sql.window import Window as W

    rnk = F.row_number().over(
        W.partitionBy("ws").orderBy(F.desc("n"), F.asc("event_type"))
    )
    return (
        counts.withColumn("rnk", rnk.cast("bigint"))
        .filter(F.col("rnk") <= TOPK_PER_WINDOW)
    )


def cdc_latest(ev: DataFrame) -> DataFrame:
    """CDC apply: treat events as a keyed changelog (user_id is the
    primary key; (ts, event_id) the monotone version) and keep the
    LATEST row per key plus the update count — ReplacingMergeTree's
    final state. The streaming form applies the same reduction per
    micro-batch via foreachBatch merge into a versioned parquet state
    table; the batch form is the direct window reduction."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.floor(F.col("value") * 1000000).cast("bigint").alias("value_micros"),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_updates",
            F.count(F.lit(1)).over(W.partitionBy("user_id")).cast("bigint"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value_micros").alias("last_value_micros"),
            "n_updates",
        )
    )


def merge_cdc_state(state: DataFrame | None, batch: DataFrame) -> DataFrame:
    """One foreachBatch CDC merge step: union the previous latest-state
    with the new batch's per-key latest, keep the later version per
    key, and re-sum the update counts — the associative form that
    makes micro-batch slicing irrelevant to the final state."""
    from pyspark.sql.window import Window as W

    batch_latest = cdc_latest(
        batch.select("user_id", "ts", "event_id", "event_type", "value")
    )
    if state is None:
        return batch_latest
    u = state.unionByName(batch_latest)
    w = W.partitionBy("user_id").orderBy(
        F.desc("last_ts"), F.desc("last_event_id")
    )
    return (
        u.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "total_updates",
            F.sum("n_updates").over(W.partitionBy("user_id")).cast("bigint"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn", "n_updates")
        .withColumnRenamed("total_updates", "n_updates")
    )


def interval_join_outer(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream interval join — interval_join's
    attribution shape, but every view row survives: views with no
    same-user purchase in the following hour emit with NULL purchase
    columns. In the streaming form Spark holds a view row in state
    until the purchase-side watermark passes view_ts + 1h, then emits
    the unmatched row — the time bound is what makes outer
    stream-stream joins legal at all (unbounded outer state cannot
    know "no match yet" from "no match ever"). Batch frames compute
    the same result directly; replay equivalence is asserted in
    tests/test_streaming.py on the flushable region — views inside the
    final watermark horizon (band + delay past the stream's max event
    time) correctly remain in state, the semantics' honest tail."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (v.user_id == p.p_user_id)
        & (p.purchase_ts >= v.view_ts)
        & (p.purchase_ts <= v.view_ts + F.expr("INTERVAL 1 HOUR"))
    )
    return v.join(p, cond, "left_outer").select(
        "view_id",
        "user_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
