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
