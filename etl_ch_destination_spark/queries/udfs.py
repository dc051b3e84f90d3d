"""SURVEY §2.11 — UDF / UDAF / UDTF extension surface.

The extension story, ordered by preference at scale:

1. built-in `pyspark.sql.functions` — JVM codegen, no Python (the
   whole rest of the engine);
2. `@pandas_udf` / `applyInPandas` / `mapInPandas` — Arrow-batched
   vectorized Python, ~10-100× the row UDF (udf_pandas_scalar,
   udaf_pandas_grouped here; mapInPandas in ops/multimodal.py);
3. `@udf` row-at-a-time Python — the escape hatch, one
   serialize/deserialize round trip PER ROW through a forked Python
   worker (udf_python_scalar exists to document exactly this cliff);
4. `@udtf` (PySpark 4 native) — table functions: one row in, many
   rows out, used via SQL LATERAL join (udtf_python).

Every UDF here is re-expressed in plain SQL for the DuckDB oracle, so
the correctness gate covers the full surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.registry import query


@query(
    "udf_python_scalar",
    """
    SELECT doc_id,
           length(text) - length(replace(text, ' ', '')) + 1 AS n_words_udf
    FROM documents
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the documented perf cliff — every row
    crosses the JVM↔Python boundary; same logic is one codegen
    expression as split+size). Kept tiny and off every hot path."""

    @F.udf("int")
    def word_count(text: str) -> int:
        return text.count(" ") + 1

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", word_count("text").alias("n_words_udf"))


@query(
    "udf_pandas_scalar",
    """
    SELECT event_id,
           value / (1.0 + abs(value)) AS squashed
    FROM events
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized Arrow pandas UDF (the idiomatic Python extension
    point): soft-sign squash x/(1+|x|) — abs/add/divide are IEEE-exact
    in both engines, so even a Python-side computation hash-matches."""

    @pandas_udf("double")
    def squash(v: pd.Series) -> pd.Series:
        return v / (1.0 + v.abs())

    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", squash("value").alias("squashed"))


@query(
    "udaf_pandas_grouped",
    """
    SELECT event_type,
           COUNT(*) AS n,
           median(value) AS med_value
    FROM events GROUP BY event_type
    """,
)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: per-type median event value.
    Median is order-insensitive (sort-based), so the Python aggregate
    hash-matches DuckDB's interpolating median exactly — unlike a
    float sum, which would drift with partition order."""

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        return float(v.median())

    # Spark forbids mixing grouped-agg pandas UDFs with built-in
    # aggregates in one .agg(), so the count is a pandas UDAF too.
    @pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        return len(v)

    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        count_udaf("value").alias("n"), median_udaf("value").alias("med_value")
    )


@query(
    "udtf_python",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           array_to_string(list_slice(words, i, i + 2), ' ') AS shingle
    FROM w, UNNEST(range(1, greatest(len(words) - 2, 0) + 1)) AS t(i)
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PySpark 4 native UDTF: text → word-trigram shingles (the
    tokenizing front end of the near-dedup pipeline), applied with a
    SQL LATERAL join. One row in, (n_words − 2) rows out."""

    @udtf(returnType="shingle: string")
    class Shingles:
        def eval(self, text: str):
            words = text.split(" ")
            for i in range(len(words) - 2):
                yield (" ".join(words[i : i + 3]),)

    spark.udtf.register("shingles", Shingles)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.shingle FROM __udtf_docs, LATERAL shingles(text) s"
    )


@query(
    "udf_arrow_batch",
    """
    SELECT event_id,
           CAST(FLOOR(value / 10.0) AS INT) AS value_bucket,
           ABS(value) AS abs_value
    FROM events
    """,
)
def udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow` — the zero-copy end of the extension surface: the
    UDF receives raw `pyarrow.RecordBatch`es (no pandas conversion at
    all), runs vectorized Arrow compute kernels, and yields batches.
    The right tier when the Python logic is itself Arrow-native
    (tokenizers, Arrow-backed model featurizers) — pandas round-trip
    cost disappears. Division/floor/abs are IEEE in both engines, so
    the oracle is exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")

    def buckets(batches):
        for batch in batches:
            value = batch.column("value")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("event_id"),
                    pc.cast(pc.floor(pc.divide(value, pa.scalar(10.0))), pa.int32()),
                    pc.abs(value),
                ],
                ["event_id", "value_bucket", "abs_value"],
            )

    return ev.mapInArrow(buckets, "event_id long, value_bucket int, abs_value double")


@query(
    "udf_apply_in_pandas",
    """
    SELECT user_id, event_id,
           CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
           CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS group_n
    FROM events
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``groupBy().applyInPandas`` — the whole-group Arrow transform
    (each user's events arrive as ONE pandas DataFrame): per-user
    chronological running cent totals + group size, i.e. custom
    full-group logic that windows could also express — which is
    exactly why the oracle CAN hash-check it (the window form is the
    SQL spelling; the pandas form is the escape hatch for logic
    windows cannot express, with identical integer results here).

    Determinism: the group sorts itself by (ts, event_id) inside the
    UDF and sums int64 cents sequentially — no float order
    sensitivity. Scale: one user_id exchange; each group must fit a
    worker's memory (the documented applyInPandas contract — for
    unbounded groups use the window form instead)."""

    def running(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        out = pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "running_cents": pdf["cents"].cumsum().astype("int64"),
                "group_n": len(pdf),
            }
        )
        return out

    e = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    base = e.select("user_id", "event_id", "ts", cents.alias("cents"))
    return base.groupBy("user_id").applyInPandas(
        running,
        schema="user_id long, event_id long, running_cents long, group_n long",
    )


@query(
    "udf_map_in_pandas",
    """
    SELECT event_id,
           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
           CAST(user_id % 7 AS BIGINT) AS shard,
           upper(event_type) AS event_type_uc
    FROM events
    """,
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInPandas`` — the Arrow batch-iterator transform (the same
    primitive ops/multimodal.py builds on, here as its own §2.11
    surface key): a generator receives pandas batches and yields
    derived batches, never materializing the partition. The derivation
    (exact cents via Decimal quantization matching the engine's
    decimal(12,2) HALF_UP cast, shard id, uppercase tag) is
    value-typed so the oracle hash-checks the full path.

    Scale: batch size bounds worker memory
    (spark.sql.execution.arrow.maxRecordsPerBatch); the iterator form
    streams — a partition of any size flows through fixed-size Arrow
    batches."""

    def derive(batches):
        from decimal import ROUND_HALF_UP, Decimal

        for pdf in batches:
            cents = pdf["value"].map(
                lambda v: int(
                    (Decimal(str(v)).quantize(Decimal("0.01"), ROUND_HALF_UP))
                    * 100
                )
            )
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "cents": cents.astype("int64"),
                    "shard": (pdf["user_id"] % 7).astype("int64"),
                    "event_type_uc": pdf["event_type"].str.upper(),
                }
            )

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "value", "user_id", "event_type"
    )
    return e.mapInPandas(
        derive,
        schema="event_id long, cents long, shard long, event_type_uc string",
    )
