"""SURVEY §2.6 — sorts, limits, top-k, sampling.

Scale notes: global ORDER BY is a range-partitioned exchange; ORDER BY
+ LIMIT k is planned as TakeOrderedAndProject (per-partition top-k,
then k-merge on the driver) — O(k) memory, the only safe global sort
at 100 TB. Sort keys in hash-checked queries are made TOTAL with a
unique tiebreaker (SURVEY §7 watch list).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.ops.rank import with_global_rank
from etl_ch_destination_spark.registry import query


@query(
    "sort_multikey",
    """
    SELECT c_custkey, c_acctbal, c_mktsegment,
           ROW_NUMBER() OVER (ORDER BY c_acctbal DESC NULLS LAST,
                              c_mktsegment ASC NULLS FIRST, c_custkey) AS pos
    FROM customer
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort; the hash gate is order-insensitive
    so the sort position is materialized as a rank column over the
    same (total) ordering.

    The rank is computed with the bucketed global-rank op (ops/rank.py):
    percentile-bucket on the leading key, partitioned window within
    buckets, cumulative offsets — never a single-task global window.
    """
    c = load_table(spark, sf_dir, "customer")
    order = [
        F.desc_nulls_last("c_acctbal"),
        F.asc_nulls_first("c_mktsegment"),
        F.asc("c_custkey"),
    ]
    ranked = with_global_rank(c, order, lead="c_acctbal", descending=True, name="pos")
    return ranked.select("c_custkey", "c_acctbal", "c_mktsegment", "pos")


@query(
    "topk_global",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (plan-shape asserted in
    tests). o_orderkey tiebreak makes the top-10 unique."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query("sample_fraction")  # RNG differs across engines → rows-only check
def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``SAMPLE 0.1``: seeded Bernoulli sample — deterministic for a
    fixed seed+partitioning within Spark (asserted in tests), but RNG
    streams differ engine-to-engine, so no value oracle exists."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "sort_with_fill",
    """
    WITH c AS (
      SELECT ts::DATE AS day, COUNT(*) AS n_signups
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    b AS (SELECT min(day) AS d0, max(day) AS d1 FROM c),
    d AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM b)
    SELECT d.day AS day, COALESCE(n_signups, 0) AS n_signups
    FROM d LEFT JOIN c USING (day)
    """,
)
def sort_with_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``ORDER BY day WITH FILL``: daily signup counts with
    every missing calendar day materialized as a 0 row (the fixture has
    a real gap — Jan 5 has no signups at sf0.01).

    Shape: one hash aggregate for the sparse counts, a global min/max
    (Exchange SinglePartition of one row), `sequence()` + `explode` to
    generate the day spine driver-free, broadcast left join back. The
    spine is bounded by the date RANGE, never by row count — at 100 TB
    the counts aggregate dominates and the fill stays O(days).
    """
    ev = load_table(spark, sf_dir, "events")
    c = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_signups"))
    )
    spine = (
        c.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    return spine.join(c, "day", "left").select(
        "day", F.coalesce("n_signups", F.lit(0)).cast("bigint").alias("n_signups")
    )


@query("sample_stratified")  # RNG differs across engines → rows-only check
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (`df.sampleBy`): per-stratum Bernoulli
    fractions over c_mktsegment — downsample dominant classes while
    keeping rare ones (the class-balancing step of a training-data
    pipeline). Seeded for reproducibility within Spark; cross-engine
    RNG differs, so the gate is rows-only (stratum proportions are
    asserted in tests/test_plans.py within binomial tolerance)."""
    c = load_table(spark, sf_dir, "customer")
    fractions = {
        "BUILDING": 0.2,
        "AUTOMOBILE": 0.5,
        "MACHINERY": 0.5,
        "HOUSEHOLD": 0.8,
        "FURNITURE": 1.0,
    }
    return c.sampleBy("c_mktsegment", fractions, seed=42).select(
        "c_custkey", "c_mktsegment"
    )


W_MAX = 50          # l_quantity upper bound in the fixture
W_RATE_NUM = 1      # target base rate = 1/4 at w = W_MAX
W_RATE_DEN = 4
W_DENOM = 268435456  # 2^28 — md5-prefix uniform denominator


@query(
    "sample_weighted_hash",
    f"""
    WITH r AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS BIGINT) AS w,
               CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                                        CAST(l_linenumber AS VARCHAR) || ':ws1'),
                                    1, 7)) AS BIGINT) AS u28
        FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, w, u28
    FROM r
    WHERE u28 * {W_MAX} * {W_RATE_DEN} < w * {W_DENOM} * {W_RATE_NUM}
    """,
)
def sample_weighted_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional deterministic sampling — each row kept with
    probability (w / W_MAX) · (1/4), decided by hash thresholding
    (the llm_mixture_sample recipe: md5-prefix 28-bit uniform), with
    the comparison cleared of ALL division: u·W_MAX·4 < w·2^28 is
    exact int64 arithmetic, so both engines keep the identical row
    set and the draw replays bit-for-bit across reruns, partitionings
    and cluster sizes — the property `sample()` fundamentally lacks.
    This is the per-row importance-sampling primitive (oversample
    heavy rows) next to sample_fraction's uniform draw.

    Zero-shuffle map-side filter; composes into the scan stage at any
    scale."""
    li = load_table(spark, sf_dir, "lineitem")
    u28 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("l_orderkey").cast("string"),
                    F.lit(":"),
                    F.col("l_linenumber").cast("string"),
                    F.lit(":ws1"),
                )
            ),
            1,
            7,
        ),
        16,
        10,
    ).cast("bigint")
    r = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("w"),
        u28.alias("u28"),
    )
    return r.filter(
        F.col("u28") * W_MAX * W_RATE_DEN < F.col("w") * W_DENOM * W_RATE_NUM
    )
