"""Stream-vs-batch equivalence under availableNow replay (SURVEY §5.3
layer 3): the streaming form of each shared pipeline transformation
must converge to the oracle-checked batch result; watermarks must
actually drop late data; the foreachBatch sink must be idempotent
across restarts."""

from __future__ import annotations

import shutil
import time

from pyspark.sql import functions as F

from conftest import rows_set


def _drain(q):
    q.awaitTermination()


def _staged(spark, sf_dir, tag, n_slices=4):
    from etl_ch_destination_spark.streaming.replay import stage_replay

    return stage_replay(spark, sf_dir, n_slices=n_slices, tag=tag)


def _memory_query(df, name, mode):
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


def test_tumbling_counts_stream_equals_batch(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.streaming import pipeline
    from etl_ch_destination_spark.streaming.replay import read_staged_stream

    staged = _staged(spark, sf_dir, "tumbling")
    stream = pipeline.tumbling_counts(read_staged_stream(spark, staged))
    _drain(_memory_query(stream, "t_tumbling", "complete"))
    got = rows_set(spark.table("t_tumbling"))
    want = rows_set(pipeline.tumbling_counts(load_table(spark, sf_dir, "events")))
    assert got == want


def test_session_gap_stream_equals_batch(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.streaming import pipeline
    from etl_ch_destination_spark.streaming.replay import read_staged_stream

    staged = _staged(spark, sf_dir, "session")
    stream = pipeline.session_gap(read_staged_stream(spark, staged))
    _drain(_memory_query(stream, "t_session", "complete"))
    got = rows_set(spark.table("t_session"))
    want = rows_set(pipeline.session_gap(load_table(spark, sf_dir, "events")))
    assert got == want


def test_watermark_drops_late_rows(spark, sf_dir):
    """Three-phase replay: recent events, a small on-time batch, then
    days-older events. Spark filters late input against the PREVIOUS
    batch's watermark (verified empirically: a 2-batch replay drops
    nothing because batch 1's late filter still sees the initial
    watermark), so the old rows arrive in batch 2, where the filter
    already sits 15 min behind phase-1 max event time — every old row
    must be dropped and no old window may emit."""
    from etl_ch_destination_spark.catalog import load_table, scratch_dir
    from etl_ch_destination_spark.streaming import pipeline
    from etl_ch_destination_spark.streaming.replay import read_staged_stream

    ev = load_table(spark, sf_dir, "events")
    cutoff = "2024-01-10 00:00:00"
    recent = ev.filter(F.col("ts") >= cutoff)
    old = ev.filter(F.col("ts") < cutoff)

    path = scratch_dir("events_replay/late_test")
    shutil.rmtree(path, ignore_errors=True)
    recent.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.2)  # file-source ordering is by modification time
    mid = recent.filter(F.col("ts") >= "2024-01-30 18:00:00")  # deterministic few rows
    mid.coalesce(1).write.mode("append").parquet(path)
    time.sleep(1.2)
    old.coalesce(1).write.mode("append").parquet(path)

    stream = pipeline.watermark_late(read_staged_stream(spark, path))
    _drain(_memory_query(stream, "t_late", "append"))
    got = {(str(r["ws"]), r["n_events"]) for r in spark.table("t_late").collect()}
    assert got, "no windows finalized"

    # no emitted window may predate the recent phase (old data dropped)
    assert all(ws >= "2024-01-10" for ws, _ in got)
    # every emitted window's count matches the batch count over the
    # on-time data alone — late rows contributed nothing
    want = {
        (str(r["ws"]), r["n_events"])
        for r in pipeline.watermark_late(recent.unionByName(mid)).collect()
    }
    assert got <= want


def test_dedup_within_watermark_drops_in_batch_duplicates(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table, scratch_dir
    from etl_ch_destination_spark.streaming import pipeline
    from etl_ch_destination_spark.streaming.replay import read_staged_stream

    ev = load_table(spark, sf_dir, "events")
    path = scratch_dir("events_replay/dedup_test")
    shutil.rmtree(path, ignore_errors=True)
    ev.unionByName(ev).coalesce(1).write.mode("append").parquet(path)  # double delivery

    stream = pipeline.dedup_within_watermark(read_staged_stream(spark, path))
    _drain(_memory_query(stream.select("event_id"), "t_dedup", "append"))
    out = spark.table("t_dedup")
    assert out.count() == ev.count()
    assert out.distinct().count() == ev.count()


def test_stateful_counter_converges_to_batch_totals(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.streaming.replay import read_staged_stream
    from etl_ch_destination_spark.streaming.stateful import running_counter

    staged = _staged(spark, sf_dir, "stateful")
    stream = running_counter(read_staged_stream(spark, staged))
    _drain(_memory_query(stream, "t_stateful", "update"))
    # update mode re-emits growing totals; the final state per user is
    # the maximal emission (counts are monotone)
    final = (
        spark.table("t_stateful")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("total_value").alias("tv"))
    )
    want = {
        r["user_id"]: (r["n"], r["tv"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    got = {r["user_id"]: (r["n"], r["tv"]) for r in final.collect()}
    assert set(got) == set(want)
    for uid, (n, tv) in want.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - tv) < 1e-6 * max(1.0, abs(tv))


def test_foreachbatch_sink_idempotent_across_restart(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table, scratch_dir
    from etl_ch_destination_spark.streaming import pipeline
    from etl_ch_destination_spark.streaming.replay import read_staged_stream

    staged = _staged(spark, sf_dir, "febatch")
    out = scratch_dir("febatch_test/out")
    ckpt = scratch_dir("febatch_test/ckpt")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    _drain(pipeline.foreach_batch_load(read_staged_stream(spark, staged), out, ckpt))
    n_events = load_table(spark, sf_dir, "events").count()
    first = spark.read.parquet(out)
    assert first.count() == n_events
    assert first.select("_batch_id").distinct().count() >= 2  # real multi-epoch replay

    # restart against the same checkpoint: no new input → no duplicates
    _drain(pipeline.foreach_batch_load(read_staged_stream(spark, staged), out, ckpt))
    assert spark.read.parquet(out).count() == n_events


def test_stateful_ops_run_on_rocksdb_state_store(spark, sf_dir):
    """The 100 TB state backend the streaming docstrings point at
    (spark.sql.streaming.stateStore.providerClass=RocksDB...) must
    actually run in this Spark build and produce the same result."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.streaming import pipeline
    from etl_ch_destination_spark.streaming.replay import read_staged_stream

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        staged = _staged(spark, sf_dir, "rocksdb")
        stream = pipeline.tumbling_counts(read_staged_stream(spark, staged))
        _drain(_memory_query(stream, "t_rocks", "complete"))
        got = rows_set(spark.table("t_rocks"))
        want = rows_set(pipeline.tumbling_counts(load_table(spark, sf_dir, "events")))
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_static_join_stream_equals_batch(spark, sf_dir):
    """Stateless stream-static enrichment: the streamed micro-batches
    must append exactly the rows the batch join produces."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.streaming import pipeline
    from etl_ch_destination_spark.streaming.replay import read_staged_stream

    dim = load_table(spark, sf_dir, "customer")
    staged = _staged(spark, sf_dir, "static_join")
    stream = pipeline.static_enrich(read_staged_stream(spark, staged), dim)
    _drain(_memory_query(stream, "t_static_join", "append"))
    got = rows_set(spark.table("t_static_join"))
    want = rows_set(pipeline.static_enrich(load_table(spark, sf_dir, "events"), dim))
    assert got == want and len(want) > 0


def test_stream_stream_interval_join_equals_batch(spark, sf_dir):
    """Stream-stream interval join: both sides watermarked, joined on
    user_id + event-time band; availableNow replay must emit exactly
    the batch join's rows (the watermark horizon only evicts state —
    bounded replay means nothing arrives late enough to drop)."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.streaming import pipeline
    from etl_ch_destination_spark.streaming.replay import read_staged_stream

    staged = _staged(spark, sf_dir, "ss_join")
    src = read_staged_stream(spark, staged)
    views = src.filter(F.col("event_type") == "view").withWatermark("ts", "2 hours")
    purchases = src.filter(F.col("event_type") == "purchase").withWatermark("ts", "2 hours")
    stream = pipeline.interval_join(views, purchases)
    _drain(_memory_query(stream, "t_ss_join", "append"))
    got = rows_set(spark.table("t_ss_join"))
    ev = load_table(spark, sf_dir, "events")
    want = rows_set(
        pipeline.interval_join(
            ev.filter(F.col("event_type") == "view"),
            ev.filter(F.col("event_type") == "purchase"),
        )
    )
    assert got == want and len(want) > 0


def test_transform_with_state_converges_to_batch(spark, sf_dir):
    """Spark 4 transformWithStateInPandas running per-user stats must
    converge (max emission per key under Update mode) to the batch
    groupBy aggregate. The API requires the RocksDB state store AND
    protobuf (its state-server wire protocol) — skipped, not failed,
    where protobuf is absent (this container ships no google.protobuf
    and installs are disallowed)."""
    import pytest

    from etl_ch_destination_spark.pbcompat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("no usable google.protobuf runtime: transformWithState "
                    "state protocol unavailable in this environment")
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.streaming.replay import read_staged_stream
    from etl_ch_destination_spark.streaming.stateful import running_user_stats_tws

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        staged = _staged(spark, sf_dir, "tws")
        stream = running_user_stats_tws(read_staged_stream(spark, staged))
        _drain(_memory_query(stream, "t_tws", "update"))
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    final = (
        spark.table("t_tws")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("max_value").alias("mx"))
    )
    want = {
        r["user_id"]: (r["n"], r["mx"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    got = {r["user_id"]: (r["n"], r["mx"]) for r in final.collect()}
    assert got == want


def test_kafka_record_parse_inverts_to_json(spark, sf_dir):
    """parse_event_records must exactly invert to_kafka_records: every
    typed event row survives the JSON encode→binary→decode trip, and
    source-position lineage columns ride along."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.streaming.kafka import (
        parse_event_records,
        to_kafka_records,
    )

    ev = load_table(spark, sf_dir, "events")
    parsed = parse_event_records(to_kafka_records(ev, topic="events-test"))
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    assert rows_set(parsed.select(*cols)) == rows_set(ev.select(*cols))
    assert parsed.filter(F.col("_topic") != "events-test").count() == 0
    assert parsed.filter(F.col("_offset") != F.col("event_id")).count() == 0


def test_kafka_shaped_stream_equals_file_replay(spark, sf_dir, tmp_path):
    """The same pipeline lattice over (a) a kafka-shaped micro-batch
    stream (fixed KAFKA_RECORD_SCHEMA, value-decode via
    parse_event_records) and (b) the plain file replay must converge
    to identical results — the source swap is config, not code."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.streaming import pipeline
    from etl_ch_destination_spark.streaming.kafka import (
        KAFKA_RECORD_SCHEMA,
        parse_event_records,
        to_kafka_records,
    )

    ev = load_table(spark, sf_dir, "events")
    staged = str(tmp_path / "kafka_records")
    # 4 files → 4 real micro-batches under maxFilesPerTrigger=1
    to_kafka_records(ev).repartition(4).write.mode("overwrite").parquet(staged)
    records = (
        spark.readStream.schema(KAFKA_RECORD_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    stream = pipeline.tumbling_counts(
        parse_event_records(records).drop("_topic", "_partition", "_offset")
    )
    _drain(_memory_query(stream, "t_kafka_shaped", "complete"))
    got = rows_set(spark.table("t_kafka_shaped"))
    want = rows_set(pipeline.tumbling_counts(ev))
    assert got == want


def test_kafka_reader_is_configured(spark):
    """Config-only seam: the option map carries the documented source
    options, and building the reader from it succeeds; no
    broker/connector exists here so .load() is the caller's."""
    from etl_ch_destination_spark.streaming.kafka import kafka_options, kafka_reader

    opts = kafka_options(
        "broker-1:9092,broker-2:9092", "events",
        starting_offsets="latest", max_offsets_per_trigger=500_000,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "events",
        "startingOffsets": "latest",
        "maxOffsetsPerTrigger": "500000",
        "failOnDataLoss": "false",
    }
    assert kafka_options("b:9092", "t").get("maxOffsetsPerTrigger") is None
    # constructing the configured reader itself must not touch the network
    kafka_reader(spark, "broker-1:9092", "events")


def test_windowed_topk_stream_counts_plus_rank_equals_batch(spark, sf_dir):
    """The leaderboard split: windowed counts stream to the sink, rank
    applies on read — together they must equal the batch key."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.streaming import pipeline
    from etl_ch_destination_spark.streaming.replay import read_staged_stream

    staged = _staged(spark, sf_dir, "wtopk")
    stream = pipeline.windowed_counts(read_staged_stream(spark, staged))
    _drain(_memory_query(stream, "t_wtopk_counts", "complete"))
    got = rows_set(pipeline.rank_windowed_counts(spark.table("t_wtopk_counts")))
    want = rows_set(pipeline.windowed_topk(load_table(spark, sf_dir, "events")))
    assert got == want


def test_cdc_upsert_foreachbatch_merge_converges_to_batch(spark, sf_dir):
    """CDC apply: replaying the changelog in micro-batches through the
    foreachBatch merge (union previous state + batch latest → keep the
    later version, re-sum update counts) must converge to the batch
    latest-per-key reduction regardless of slicing."""
    from etl_ch_destination_spark.catalog import load_table, scratch_dir
    from etl_ch_destination_spark.streaming import pipeline
    from etl_ch_destination_spark.streaming.replay import read_staged_stream

    staged = _staged(spark, sf_dir, "cdc", n_slices=5)
    state_base = scratch_dir("cdc_state")
    shutil.rmtree(state_base, ignore_errors=True)
    versions = []

    def apply_batch(batch_df, epoch_id):
        prev = (
            batch_df.sparkSession.read.parquet(versions[-1])
            if versions
            else None
        )
        new_state = pipeline.merge_cdc_state(prev, batch_df)
        path = f"{state_base}/v{epoch_id}"
        new_state.write.mode("overwrite").parquet(path)
        versions.append(path)

    q = (
        read_staged_stream(spark, staged)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", f"{state_base}/_chk")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    assert len(versions) >= 2, "replay did not slice into micro-batches"

    got = rows_set(spark.read.parquet(versions[-1]))
    want = rows_set(pipeline.cdc_latest(load_table(spark, sf_dir, "events")))
    assert got == want


def test_stream_outer_interval_join_equals_batch(spark, sf_dir):
    """LEFT OUTER stream-stream interval join: matched rows replay
    exactly; unmatched views flush with NULL purchase columns once the
    final watermark passes their horizon. Views inside the final
    horizon (view_ts + 1h band + 2h watermark delay beyond the
    stream's max event time) legitimately CANNOT flush — "no match
    yet" is indistinguishable from "no match ever" for them — so the
    equality is asserted on the flushable region and the replay must
    emit nothing else."""
    import datetime

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.streaming import pipeline
    from etl_ch_destination_spark.streaming.replay import read_staged_stream

    staged = _staged(spark, sf_dir, "ss_join_outer")
    src = read_staged_stream(spark, staged)
    views = src.filter(F.col("event_type") == "view").withWatermark("ts", "2 hours")
    purchases = src.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", "2 hours"
    )
    stream = pipeline.interval_join_outer(views, purchases)
    _drain(_memory_query(stream, "t_ss_join_outer", "append"))
    got = rows_set(spark.table("t_ss_join_outer"))
    ev = load_table(spark, sf_dir, "events")
    want_df = pipeline.interval_join_outer(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    want = rows_set(want_df)
    assert got <= want and len(want) > 0
    max_ts = ev.agg(F.max("ts")).first()[0]
    cut = max_ts - datetime.timedelta(hours=3)  # 1h band + 2h delay
    flushable = rows_set(
        want_df.filter(
            F.col("purchase_id").isNotNull() | (F.col("view_ts") < F.lit(cut))
        )
    )
    assert flushable <= got
    # and the replay really exercised the outer path
    assert want_df.filter(F.col("purchase_id").isNull()).count() > 0
