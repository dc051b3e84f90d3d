"""Byte-level golden tests for the Kafka record contract
(streaming/kafka.py; VERDICT r3 next-round #7).

A future broker integration must be a CONFIG change only — these
goldens pin everything a broker would see or deliver: exact value
payload bytes (JSON field order, µs timestamp format, quoting), key
bytes, the default-partitioner shape, and timestamp semantics. If any
of these drift, replayed topics and cross-team consumers break even
though Spark-side tests still pass — hence bytes, not row equality.
"""

from __future__ import annotations

import datetime as dt
import json

from tests.conftest import rows_set

GOLDEN_EVENT = {
    "event_id": 7,
    "ts": dt.datetime(2026, 1, 2, 3, 4, 5, 123456),
    "user_id": 42,
    "event_type": "view",
    "value": 1.5,
    "props": '{"plan":"pro"}',
}

# exact bytes a broker receives for GOLDEN_EVENT: field order is the
# struct order in to_kafka_records; ts carries FULL microseconds (the
# default millis format would truncate µs-granular event times)
GOLDEN_VALUE_BYTES = (
    b'{"event_id":7,"ts":"2026-01-02 03:04:05.123456","user_id":42,'
    b'"event_type":"view","value":1.5,"props":"{\\"plan\\":\\"pro\\"}"}'
)
GOLDEN_KEY_BYTES = b"42"


def _golden_df(spark):
    return spark.createDataFrame(
        [tuple(GOLDEN_EVENT.values())],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_value_payload_bytes_golden(spark):
    from etl_ch_destination_spark.streaming.kafka import to_kafka_records

    (rec,) = to_kafka_records(_golden_df(spark), topic="events-golden").collect()
    assert bytes(rec.value) == GOLDEN_VALUE_BYTES
    assert bytes(rec.key) == GOLDEN_KEY_BYTES
    assert rec.topic == "events-golden"
    # offset carries the event id (replay lineage), timestamp the event
    # time, timestampType 0 = CreateTime per the Kafka contract
    assert rec.offset == 7
    assert rec.timestamp == GOLDEN_EVENT["ts"]
    assert rec.timestampType == 0


def test_default_partitioner_shape(spark):
    """partition = pmod(murmur3(user_id), n): stable, key-sticky, in
    range. The exact value is pinned so a silent hash/seed change
    (which would break key co-location across a rolling redeploy)
    fails loudly."""
    from pyspark.sql import functions as F

    from etl_ch_destination_spark.streaming.kafka import to_kafka_records

    (rec,) = to_kafka_records(_golden_df(spark), n_partitions=4).collect()
    expected = spark.range(1).select(
        F.pmod(F.hash(F.lit(42).cast("long")), F.lit(4)).cast("int").alias("p")
    ).collect()[0]["p"]
    assert rec.partition == expected
    assert 0 <= rec.partition < 4
    # pinned literal: Spark's Murmur3 of long 42, seed 42, mod 4
    assert rec.partition == 0


def test_parse_golden_bytes_roundtrip(spark):
    """A broker-delivered record built from raw golden BYTES (not from
    to_kafka_records) must parse into the exact typed event row —
    proving the parse side against the wire contract itself."""
    from etl_ch_destination_spark.streaming.kafka import (
        KAFKA_RECORD_SCHEMA,
        parse_event_records,
    )

    raw = spark.createDataFrame(
        [
            (
                GOLDEN_KEY_BYTES,
                GOLDEN_VALUE_BYTES,
                "events-golden",
                2,
                7,
                GOLDEN_EVENT["ts"],
                0,
            )
        ],
        KAFKA_RECORD_SCHEMA,
    )
    (row,) = parse_event_records(raw).collect()
    for field, want in GOLDEN_EVENT.items():
        assert row[field] == want, (field, row[field], want)
    assert (row._topic, row._partition, row._offset) == ("events-golden", 2, 7)


def test_malformed_payload_dead_letters_not_kills(spark):
    """A corrupt value payload must yield a NULL-field row (dead-letter
    downstream on event_id IS NULL), never a query failure."""
    from etl_ch_destination_spark.streaming.kafka import (
        KAFKA_RECORD_SCHEMA,
        parse_event_records,
    )

    raw = spark.createDataFrame(
        [
            (None, b"not json at all", "t", 0, 0, GOLDEN_EVENT["ts"], 0),
            (None, GOLDEN_VALUE_BYTES, "t", 0, 1, GOLDEN_EVENT["ts"], 0),
        ],
        KAFKA_RECORD_SCHEMA,
    )
    rows = parse_event_records(raw).collect()
    by_offset = {r._offset: r for r in rows}
    assert by_offset[0].event_id is None
    assert by_offset[1].event_id == 7


def test_json_field_set_is_closed(spark):
    """The payload carries exactly the events columns — no extras, none
    missing — so independently-written consumers can rely on the field
    inventory."""
    from etl_ch_destination_spark.streaming.kafka import to_kafka_records

    (rec,) = to_kafka_records(_golden_df(spark)).collect()
    payload = json.loads(bytes(rec.value))
    assert set(payload) == set(GOLDEN_EVENT)


def test_fixture_events_all_roundtrip(spark, sf_dir):
    """Every fixture event row survives encode→bytes→decode unchanged
    (the record-level closure over real data, complementing the
    single-row byte goldens)."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.streaming.kafka import (
        parse_event_records,
        to_kafka_records,
    )

    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    parsed = parse_event_records(to_kafka_records(ev)).select(*cols)
    assert rows_set(parsed) == rows_set(ev.select(*cols))
