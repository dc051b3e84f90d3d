"""ClickHouse Native (columnar) insert-block encoder — the bulk-insert
companion to ``sink/rowbinary.py`` (VERDICT r3 "What's missing" #1:
carry the wire contract as far as the serverless sandbox allows).

``FORMAT Native`` is the format ClickHouse itself prefers for bulk
inserts (column-wise → better compression, zero row-pivot server-side;
documented at clickhouse.com/docs/en/interfaces/formats#native and in
the public clickhouse-driver implementations). Block layout:

    varint n_columns, varint n_rows,
    then per column:
      name   — LEB128-prefixed string
      type   — LEB128-prefixed ClickHouse type text (from ``ch_type``,
               so block header and DDL can never disagree)
      data   — COLUMN-WISE values:
        fixed-width numerics/dates/decimals  back-to-back little-endian
        String                               per value: LEB128 len + bytes
        Nullable(T)                          null mask FIRST (1 byte per
                                             row, 1 = NULL), then T data
                                             for ALL rows with DEFAULT
                                             values in the null slots
                                             (0 / empty string) — unlike
                                             RowBinary, which omits them

Scalar byte encodings are shared with ``rowbinary`` (same type map:
Date32 Int32 days, DateTime64(6) Int64 µs, Decimal scaled-int by
precision) so the two formats cannot drift apart. ``Array(T)`` of a
flat element type is supported via Native's offsets layout (UInt64
cumulative end-offsets, then flattened elements) — the shape the
``embeddings.embedding`` array<float> egress needs. Nested
arrays/maps/structs stay with ``rowbinary_blocks`` (row-wise); this
encoder raises for them explicitly.

Scale notes: same egress shape as rowbinary_blocks — per-partition
encoding, `plan_insert_blocks`-sized blocks, one `dedup_token` per
block; column-wise assembly is a per-block transpose of the Arrow
batch, still embarrassingly parallel.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DataType,
    MapType,
    StringType,
    StructType,
)

from etl_ch_destination_spark.sink.clickhouse import ch_type
from etl_ch_destination_spark.sink.rowbinary import _encode_nonnull, _is_null, varint

# Worker processes may not be able to import this package (the driver
# contract runs from an arbitrary cwd — same reasoning as
# ops/multimodal.py): ship this module and its encoder dependencies BY
# VALUE inside any pickled closure that references them, so
# encode_native_block works in applyInPandas regardless of the
# worker's sys.path.
try:  # pragma: no cover - exercised by the export keys' worker path
    from pyspark import cloudpickle as _cp

    import etl_ch_destination_spark.sink.clickhouse as _ch_mod
    import etl_ch_destination_spark.sink.native as _native_mod
    import etl_ch_destination_spark.sink.rowbinary as _rb_mod

    for _m in (_ch_mod, _rb_mod, _native_mod):
        _cp.register_pickle_by_value(_m)
except Exception:  # noqa: BLE001  (older pickler without the hook)
    pass


def _default_value(dt: DataType):
    """ClickHouse default for a type — fills Nullable null slots."""
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DateType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        TimestampType,
    )

    if isinstance(dt, (StringType, BinaryType)):
        return ""
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return 0
    if isinstance(dt, (FloatType, DoubleType)):
        return 0.0
    if isinstance(dt, BooleanType):
        return False
    if isinstance(dt, DateType):
        import datetime

        return datetime.date(1970, 1, 1)
    if isinstance(dt, TimestampType):
        return 0  # integer tick count → 1970-01-01 00:00:00
    if isinstance(dt, DecimalType):
        import decimal

        return decimal.Decimal(0)
    raise TypeError(f"no Native default for {dt.simpleString()}")


def encode_native_column(dt: DataType, nullable: bool, values: list) -> bytes:
    """One column's data section (null mask + column-wise values).

    ``Array(T)`` of a flat element type uses Native's offsets layout:
    one UInt64 cumulative element count per row, then the flattened
    element data — the shape the ``embeddings.embedding``
    (array<float>) egress needs. Nested arrays / maps / structs stay
    with the row-wise encoder."""
    if isinstance(dt, ArrayType):
        if isinstance(dt.elementType, (ArrayType, MapType, StructType)):
            raise TypeError(
                "Native encoder covers flat array elements only; use "
                f"rowbinary_blocks for {dt.simpleString()}"
            )
        # CH forbids Nullable(Array) (the array itself is never null)
        # but allows Array(Nullable(T)): when the Spark schema's
        # containsNull is set, ch_type declares Nullable elements and
        # the nested column serializes CH-Native-style — null mask for
        # all flattened elements FIRST, then element data with type
        # defaults in the null slots. Non-null element schemas reject
        # null elements loudly (bytes always agree with the type text).
        out = bytearray()
        total = 0
        elems: list = []
        for v in values:
            if _is_null(v):
                raise ValueError("NULL array in Native Array column")
            row = list(v)
            total += len(row)
            out += total.to_bytes(8, "little")  # cumulative end offset
            elems.extend(row)
        if dt.containsNull:
            out += bytes(1 if _is_null(e) else 0 for e in elems)
            default = _default_value(dt.elementType)
            elems = [default if _is_null(e) else e for e in elems]
        else:
            for e in elems:
                if _is_null(e):
                    raise ValueError("NULL element in non-nullable Native Array column")
        for e in elems:
            out += _encode_nonnull(dt.elementType, e)
        return bytes(out)
    if isinstance(dt, (MapType, StructType)):
        raise TypeError(
            f"Native encoder covers flat columns only; use rowbinary_blocks "
            f"for {dt.simpleString()}"
        )
    out = bytearray()
    if nullable:
        out += bytes(1 if _is_null(v) else 0 for v in values)
        default = _default_value(dt)
        values = [default if _is_null(v) else v for v in values]
    else:
        for v in values:
            if _is_null(v):
                raise ValueError(f"NULL in non-nullable {dt.simpleString()} column")
    for v in values:
        out += _encode_nonnull(dt, v)
    return bytes(out)


def encode_native_block(schema: StructType, rows: Iterable) -> bytes:
    """A full Native block: header + per-column name/type/data."""

    mat = [list(r) for r in rows]
    for r in mat:
        if len(r) != len(schema.fields):
            raise ValueError(
                f"row width {len(r)} != schema width {len(schema.fields)}"
            )
    out = bytearray()
    out += varint(len(schema.fields))
    out += varint(len(mat))
    for i, f in enumerate(schema.fields):
        name = f.name.encode("utf-8")
        out += varint(len(name)) + name
        typ = ch_type(f.dataType, f.nullable).encode("utf-8")
        out += varint(len(typ)) + typ
        out += encode_native_column(f.dataType, f.nullable, [r[i] for r in mat])
    return bytes(out)


NATIVE_BLOCK_SCHEMA = "block_rows INT, payload BINARY"


def native_blocks(
    df: DataFrame,
    rows_per_block: int = 100_000,
    wire_schema: StructType | None = None,
) -> DataFrame:
    """Encode ``df`` into Native insert blocks, distributed — the
    column-wise sibling of ``rowbinary_blocks`` with the same
    per-partition slicing and per-block retry/tokenize contract.

    ``wire_schema`` overrides the DataFrame's schema for type-text and
    nullability purposes: parquet reads declare every column and array
    element nullable, but a destination table is usually NOT NULL
    (MergeTree keys, dense vectors) — the override pins the declared
    wire types while the encoder still raises on any value that
    violates them, so a mismatch can never ship silently."""
    if rows_per_block < 1:
        raise ValueError("rows_per_block must be >= 1")
    schema = wire_schema if wire_schema is not None else df.schema
    if len(schema.fields) != len(df.schema.fields):
        raise ValueError("wire_schema width != DataFrame width")
    if wire_schema is not None:
        # Field-by-field dataType equality modulo nullability (relaxing
        # nullability — column or array element — is the override's
        # purpose). Without this, a double column declared Int64 would
        # be silently coerced by _encode_nonnull's int(v), shipping
        # truncated values under a wrong type text (ADVICE r5).
        # simpleString() is the type shape with nullability stripped at
        # every level (array<double> regardless of containsNull).
        for wf, df_f in zip(wire_schema.fields, df.schema.fields):
            if wf.dataType.simpleString() != df_f.dataType.simpleString():
                raise TypeError(
                    f"wire_schema type mismatch for column "
                    f"{df_f.name!r}: DataFrame has "
                    f"{df_f.dataType.simpleString()}, wire_schema declares "
                    f"{wf.dataType.simpleString()}"
                )

    def encode_partition(batches: Iterator) -> Iterator:
        import pandas as pd

        buf: list[tuple] = []

        def flush() -> pd.DataFrame:
            block = encode_native_block(schema, buf)
            n = len(buf)
            buf.clear()
            return pd.DataFrame({"block_rows": [n], "payload": [block]})

        for pdf in batches:
            for row in pdf.itertuples(index=False, name=None):
                buf.append(row)
                if len(buf) >= rows_per_block:
                    yield flush()
        if buf:
            yield flush()

    return df.mapInPandas(encode_partition, schema=NATIVE_BLOCK_SCHEMA)


# ---------------------------------------------------------------------------
# Decoder — inverse of encode_native_block, making the columnar wire
# format bidirectional (the RowBinary module has the row-wise twin).
# ---------------------------------------------------------------------------


def _decode_fixed(dt: DataType, buf: bytes, pos: int):
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DateType,
        DecimalType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        TimestampType,
    )
    import datetime as _dt
    import decimal as _decimal
    import struct as _struct

    if isinstance(dt, ByteType):
        return _struct.unpack_from("<b", buf, pos)[0], pos + 1
    if isinstance(dt, ShortType):
        return _struct.unpack_from("<h", buf, pos)[0], pos + 2
    if isinstance(dt, IntegerType):
        return _struct.unpack_from("<i", buf, pos)[0], pos + 4
    if isinstance(dt, LongType):
        return _struct.unpack_from("<q", buf, pos)[0], pos + 8
    if isinstance(dt, FloatType):
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if isinstance(dt, DoubleType):
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if isinstance(dt, BooleanType):
        return buf[pos] == 1, pos + 1
    if isinstance(dt, (StringType, BinaryType)):
        n, pos = _read_varint(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if isinstance(dt, StringType) else bytes(raw)), pos + n
    if isinstance(dt, DateType):
        days = _struct.unpack_from("<i", buf, pos)[0]
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=days), pos + 4
    if isinstance(dt, TimestampType):
        micros = _struct.unpack_from("<q", buf, pos)[0]
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=micros), pos + 8
    if isinstance(dt, DecimalType):
        w = 4 if dt.precision <= 9 else 8 if dt.precision <= 18 else 16
        raw = int.from_bytes(buf[pos : pos + w], "little", signed=True)
        return _decimal.Decimal(raw).scaleb(-dt.scale), pos + w
    raise TypeError(f"no Native decoding for {dt.simpleString()}")


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def decode_native_block(schema: StructType, payload: bytes) -> list[tuple]:
    """Parse a Native block back into row tuples under ``schema``.

    Validates the embedded column names AND ClickHouse type strings
    against ``ch_type`` of the expected schema (a renamed or retyped
    column is an error, not a silent reinterpretation), re-applies
    null masks, and rebuilds Array(T) columns from the cumulative
    offsets layout. Raises on trailing bytes."""
    pos = 0
    n_cols, pos = _read_varint(payload, pos)
    n_rows, pos = _read_varint(payload, pos)
    if n_cols != len(schema.fields):
        raise ValueError(f"block has {n_cols} columns, schema {len(schema.fields)}")
    cols: list[list] = []
    for f in schema.fields:
        ln, pos = _read_varint(payload, pos)
        name = payload[pos : pos + ln].decode("utf-8")
        pos += ln
        if name != f.name:
            raise ValueError(f"column name {name!r} != schema {f.name!r}")
        lt, pos = _read_varint(payload, pos)
        typ = payload[pos : pos + lt].decode("utf-8")
        pos += lt
        expect = ch_type(f.dataType, f.nullable)
        if typ != expect:
            raise ValueError(f"column {name}: type {typ!r} != {expect!r}")
        if isinstance(f.dataType, ArrayType):
            offsets = []
            for _ in range(n_rows):
                offsets.append(int.from_bytes(payload[pos : pos + 8], "little"))
                pos += 8
            total = offsets[-1] if offsets else 0
            elem_nulls = [False] * total
            if f.dataType.containsNull:
                # Array(Nullable(T)): flattened element null mask
                # sits between the offsets and the element data
                elem_nulls = [payload[pos + i] == 1 for i in range(total)]
                pos += total
            elems = []
            for i in range(total):
                v, pos = _decode_fixed(f.dataType.elementType, payload, pos)
                elems.append(None if elem_nulls[i] else v)
            vals, start = [], 0
            for end in offsets:
                vals.append(elems[start:end])
                start = end
            cols.append(vals)
            continue
        nulls = [False] * n_rows
        if f.nullable:
            nulls = [payload[pos + i] == 1 for i in range(n_rows)]
            pos += n_rows
        vals = []
        for i in range(n_rows):
            v, pos = _decode_fixed(f.dataType, payload, pos)
            vals.append(None if nulls[i] else v)
        cols.append(vals)
    if pos != len(payload):
        raise ValueError(f"trailing {len(payload) - pos} bytes after last column")
    return [tuple(c[i] for c in cols) for i in range(n_rows)]
