"""Spark-only scalar functions (no DuckDB equivalent — excluded from
the hashed queries per module docstrings) and the libm tolerance
cases."""

from __future__ import annotations

import math
import zlib

from pyspark.sql import functions as F


def test_initcap_and_soundex(spark):
    row = spark.range(1).select(
        F.initcap(F.lit("hello spark world")).alias("ic"),
        F.soundex(F.lit("Robert")).alias("sx"),
    ).first()
    assert row["ic"] == "Hello Spark World"
    assert row["sx"] == "R163"


def test_crc32_matches_zlib_and_xxhash64_selfconsistent(spark):
    row = spark.range(1).select(
        F.crc32(F.lit("etl").cast("binary")).alias("crc"),
        F.xxhash64(F.lit("etl")).alias("xx1"),
        F.xxhash64(F.lit("etl")).alias("xx2"),
    ).first()
    assert row["crc"] == zlib.crc32(b"etl")
    assert row["xx1"] == row["xx2"] != 0


def test_exp_log_roundtrip_tolerance(spark, sf_dir):
    """exp/log are excluded from hash-matching (libm last-ulp drift);
    assert the Spark side is numerically sane instead."""
    from etl_ch_destination_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").limit(100)
    rows = li.select(
        "l_extendedprice",
        F.log(F.exp(F.lit(1.0))).alias("lg_e"),
        F.log(F.col("l_extendedprice")).alias("ln_p"),
    ).collect()
    assert math.isclose(rows[0]["lg_e"], 1.0, rel_tol=1e-12)
    for r in rows:
        assert math.isclose(r["ln_p"], math.log(r["l_extendedprice"]), rel_tol=1e-12)


def test_posexplode_and_explode_outer(spark):
    df = spark.createDataFrame([(1, ["a", "b"]), (2, [])], "id int, xs array<string>")
    pos = df.filter("id = 1").select(F.posexplode("xs")).collect()
    assert [(r["pos"], r["col"]) for r in pos] == [(0, "a"), (1, "b")]
    outer = df.select("id", F.explode_outer("xs").alias("x")).collect()
    assert ("2", "None") in {(str(r["id"]), str(r["x"])) for r in outer}


def test_map_values_and_map_from_entries(spark):
    row = spark.range(1).select(
        F.map_values(F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2))).alias("vs"),
        F.map_from_entries(
            F.array(F.struct(F.lit("k").alias("key"), F.lit(9).alias("value")))
        ).alias("m"),
    ).first()
    assert sorted(row["vs"]) == [1, 2]
    assert row["m"] == {"k": 9}


def test_zip_with_and_flatten(spark):
    row = spark.range(1).select(
        F.zip_with(
            F.array(F.lit(1), F.lit(2)), F.array(F.lit(10), F.lit(20)), lambda a, b: a + b
        ).alias("z"),
        F.flatten(F.array(F.array(F.lit(1)), F.array(F.lit(2)))).alias("fl"),
    ).first()
    assert row["z"] == [11, 22]
    assert row["fl"] == [1, 2]


def test_ts_interpolate_bounded_by_neighbors(spark, sf_dir):
    """Interpolated points must lie within [min, max] of their two
    known neighbors (linearity sanity), and the spine must be dense:
    consecutive buckets exactly 10 minutes apart."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from etl_ch_destination_spark.queries.timeseries import ts_interpolate

    df = ts_interpolate(spark, sf_dir).cache()
    assert df.filter("was_filled").count() > 0
    assert df.filter(F.col("value_interp").isNull()).count() == 0
    w = Window.orderBy("ws")
    gaps = df.select(
        (F.unix_timestamp("ws") - F.unix_timestamp(F.lag("ws").over(w))).alias("d")
    ).filter(F.col("d").isNotNull() & (F.col("d") != 600))
    assert gaps.count() == 0
    df.unpersist()


def test_arr_enumerate_ranks_reference(spark, tmp_path):
    """ClickHouse arrayEnumerate/Uniq/Dense semantics on a hand-checked
    array with duplicates (the operator appends word[1], so 'a b a' ->
    'a b a a')."""
    from pyspark.sql import functions as F

    from etl_ch_destination_spark.queries.scalars_complex import arr_enumerate_ranks

    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    spark.createDataFrame(
        [(1, "a b a", "m", "BRAND", 1, "c", 1.0, "x")],
        "p_partkey long, p_type string, p_mfgr string, p_brand string, "
        "p_size int, p_container string, p_retailprice double, p_comment string",
    ).write.parquet(f"{sf}/part.parquet")
    r = arr_enumerate_ranks(spark, sf).collect()[0]
    # w = [a, b, a, a]
    assert r.enum == "1,2,3,4"
    assert r.enum_uniq == "1,1,2,3"   # occurrence index per sighting
    assert r.enum_dense == "1,2,1,1"  # dense first-appearance rank
