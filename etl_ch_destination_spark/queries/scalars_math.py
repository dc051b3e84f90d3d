"""SURVEY §2.8 — math / safe-arithmetic / hash scalar families
(math_funcs, safe_arith, hash_funcs).

Dialect pins (DuckDB 1.0, probed): floor/ceil return DOUBLE there and
LONG in Spark → both cast to BIGINT; sign() width differs → cast INT;
transcendentals (exp/log) and half-up-vs-half-even rounding edge cases
are NOT hash-compared — libm last-ulp differences across engines make
them tolerance-test material (tests/test_scalars.py). Hash functions:
md5/sha256 are cross-engine identical hex; crc32/xxhash64 are
Spark-only (different polynomial/seed conventions elsewhere) and
pytest-covered — xxhash64 is still the engine's workhorse for dedup
bucketing (ops/salting.py, llm dedup) where only self-consistency
matters.

Scale notes: narrow projections, no shuffle, codegen end to end.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.registry import query


@query(
    "math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25.0) AS abs_c,
           CAST(floor(l_quantity) AS BIGINT) AS floor_c,
           CAST(ceil(l_quantity) AS BIGINT) AS ceil_c,
           sqrt(l_extendedprice) AS sqrt_c,
           CAST(sign(l_quantity - 25.0) AS INT) AS sign_c,
           pow(l_linenumber, 2) AS pow_c,
           l_orderkey % 7 AS mod_c,
           greatest(l_quantity, 25.0) AS gr_c,
           least(l_quantity, 25.0) AS le_c,
           CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS rnd_c
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH math surface. Every hashed expression is IEEE-deterministic
    cross-engine: abs/floor/ceil/greatest/least/% are exact, sqrt is
    IEEE-754 correctly rounded, pow on small integer bases is exact,
    and round runs on DECIMAL (half-up, both engines) before one
    final decimal→double conversion (correctly rounded parse). exp/log
    live in tolerance tests only."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(q - 25.0).alias("abs_c"),
        F.floor(q).cast("long").alias("floor_c"),
        F.ceil(q).cast("long").alias("ceil_c"),
        F.sqrt("l_extendedprice").alias("sqrt_c"),
        F.signum(q - 25.0).cast("int").alias("sign_c"),
        F.pow("l_linenumber", F.lit(2)).alias("pow_c"),
        (F.col("l_orderkey") % 7).alias("mod_c"),
        F.greatest(q, F.lit(25.0)).alias("gr_c"),
        F.least(q, F.lit(25.0)).alias("le_c"),
        F.round(F.col("l_extendedprice").cast("decimal(12,2)"), 1)
        .cast("double")
        .alias("rnd_c"),
    )


@query(
    "safe_arith",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / NULLIF(l_quantity - l_quantity, 0) AS div0,
           l_extendedprice / NULLIF(l_quantity, 0) AS unit_price,
           TRY_CAST(l_returnflag AS INT) AS bad_int,
           TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INT) AS ok_int,
           l_orderkey + 1 AS next_key
    FROM lineitem
    """,
)
def safe_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Failure-safe arithmetic for dirty ETL data: try_divide → NULL on
    zero denominator (oracle mirrors with a NULLIF guard), try_cast →
    NULL on malformed input, try_add for overflow-safe increments."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), q - q).alias("div0"),
        F.try_divide(F.col("l_extendedprice"), q).alias("unit_price"),
        F.col("l_returnflag").try_cast("int").alias("bad_int"),
        F.col("l_linenumber").cast("string").try_cast("int").alias("ok_int"),
        F.try_add(F.col("l_orderkey"), F.lit(1)).alias("next_key"),
    )


@query(
    "hash_funcs",
    """
    SELECT p_partkey,
           md5(p_name) AS md5_name,
           sha256(lower(p_name)) AS sha_name
    FROM part
    """,
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row hashing for dedup/bucketing (CH `MD5`/`SHA256`/`cityHash64`).
    md5/sha256 hex strings are cross-engine identical; xxhash64/crc32
    (seed/polynomial conventions differ) are pytest-covered and remain
    the internal workhorses where only self-consistency matters."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.md5(F.col("p_name").cast("binary")).alias("md5_name"),
        F.sha2(F.lower("p_name").cast("binary"), 256).alias("sha_name"),
    )


@query(
    "math_round_modes",
    """
    WITH t AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS DECIMAL(10,2)) * CAST(0.5 AS DECIMAL(2,1))
               AS half,
             CAST(l_quantity AS DECIMAL(10,2)) * CAST(0.25 AS DECIMAL(3,2))
               AS quarter
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber,
           CAST(half AS DOUBLE) AS half_raw,
           CAST(round(half, 0) AS DOUBLE) AS half_up,
           CAST(round_even(half, 0) AS DOUBLE) AS half_even,
           CAST(round(quarter, 1) AS DOUBLE) AS quarter_up_1dp,
           CAST(round_even(quarter, 1) AS DOUBLE) AS quarter_even_1dp,
           CAST(floor(half) AS BIGINT) AS half_floor,
           CAST(ceil(half) AS BIGINT) AS half_ceil
    FROM t
    """,
)
def math_round_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rounding-mode semantics surface — ClickHouse ``round`` /
    ``roundBankers`` / ``floor`` / ``ceil``: HALF_UP (Spark ``round``,
    DuckDB ``round`` — identical on the positive domain) vs HALF_EVEN
    banker's rounding (Spark ``bround``, DuckDB ``round_even``), at
    whole and 1-dp precision, over EXACT decimal inputs constructed to
    sit on ties (quantity × 0.5 → .0/.5; × 0.25 → .0/.25/.5/.75).
    Exact decimals make the mode difference the ONLY signal — float
    inputs would blur ties with representation error. All map-side
    codegen; no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    half = (
        F.col("l_quantity").cast("decimal(10,2)")
        * F.lit("0.5").cast("decimal(2,1)")
    )
    quarter = (
        F.col("l_quantity").cast("decimal(10,2)")
        * F.lit("0.25").cast("decimal(3,2)")
    )
    t = li.select(
        "l_orderkey", "l_linenumber", half.alias("half"), quarter.alias("quarter")
    )
    return t.select(
        "l_orderkey",
        "l_linenumber",
        F.col("half").cast("double").alias("half_raw"),
        F.round("half", 0).cast("double").alias("half_up"),
        F.bround("half", 0).cast("double").alias("half_even"),
        F.round("quarter", 1).cast("double").alias("quarter_up_1dp"),
        F.bround("quarter", 1).cast("double").alias("quarter_even_1dp"),
        F.floor("half").cast("bigint").alias("half_floor"),
        F.ceil("half").cast("bigint").alias("half_ceil"),
    )


@query(
    "num_radix_conv",
    """
    SELECT event_id,
           hex(event_id) AS hex_str,
           bin(event_id) AS bin_str,
           to_base(event_id, 8) AS oct_str,
           CAST(('0x' || hex(event_id)) AS BIGINT) AS hex_roundtrip
    FROM events
    WHERE event_id >= 0
    """,
)
def num_radix_conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``hex``/``bin``/math-base conversions (and Spark's ``conv``)
    — radix rendering of non-negative int64 ids plus the hex→int
    roundtrip proving the encodings agree byte-for-byte across
    engines (both emit minimal-width uppercase hex / minimal binary;
    the WHERE pins the shared non-negative domain, since two's-
    complement rendering of negatives is 64-bit-width-dependent).
    Map-side codegen projection, zero shuffles, column-pruned scan."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") >= 0)
    return e.select(
        "event_id",
        F.hex("event_id").alias("hex_str"),
        F.bin("event_id").alias("bin_str"),
        F.conv(F.col("event_id").cast("string"), 10, 8).alias("oct_str"),
        F.conv(F.hex("event_id"), 16, 10).cast("bigint").alias("hex_roundtrip"),
    )


# Integer-vertex test polygon (non-convex pentagon) and the derived
# deterministic point grid. The SQL fragment below is GENERATED from
# these constants and shared verbatim by the Spark query and the
# DuckDB oracle, so the two engines run the identical integer test.
GEO_POLY = [(100, 100), (900, 150), (700, 500), (500, 350), (200, 600)]
GEO_PX = "(c_custkey % 1000)"
GEO_PY = "((c_custkey * 37 + 11) % 1000)"


def _geo_crossing_terms() -> str:
    """Even-odd ray-cast crossing count as exact int64 SQL: for each
    polygon edge, the ray from (px, py) to x = +inf crosses iff the
    edge spans py and the x-intersection lies right of px — the
    comparison cross-multiplied by (y2 − y1), with the inequality
    direction resolved PER EDGE at generation time (the sign of the
    multiplier is a compile-time constant), so no division and no
    floats ever enter."""
    terms = []
    n = len(GEO_POLY)
    for i in range(n):
        x1, y1 = GEO_POLY[i]
        x2, y2 = GEO_POLY[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge never crosses a horizontal ray
        op = "<" if y2 > y1 else ">"
        terms.append(
            f"(CASE WHEN (({y1} > {GEO_PY}) <> ({y2} > {GEO_PY}))"
            f" AND ({GEO_PX} - {x1}) * {y2 - y1} {op}"
            f" ({GEO_PY} - {y1}) * {x2 - x1}"
            " THEN 1 ELSE 0 END)"
        )
    return " + ".join(terms)


GEO_INSIDE_SQL = f"(({_geo_crossing_terms()}) % 2 = 1)"


@query(
    "geo_point_in_polygon",
    f"""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN {GEO_INSIDE_SQL} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_inside,
           CAST(SUM(CASE WHEN {GEO_INSIDE_SQL} THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS inside_share
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``pointInPolygon`` — the geo-fence membership test —
    in EXACT INTEGER arithmetic: customers project onto a
    deterministic integer grid (px = key mod 1000, py an affine hash)
    and the even-odd ray cast against a fixed non-convex pentagon is
    evaluated with per-edge cross-multiplied comparisons (no division,
    no floats; the inequality direction per edge is resolved at
    generation time from the sign of y2 − y1). A float ray cast can
    flip points near edges between engines; the integer form cannot.
    The SAME generated SQL fragment runs on both engines.

    Plan: pure map-side arithmetic (|polygon| CASE terms fused into
    whole-stage codegen) + one small hash agg — embarrassingly
    parallel at any scale; real geo pipelines swap the literal pentagon
    for a broadcast polygon table and the same per-edge math."""
    c = load_table(spark, sf_dir, "customer")
    inside = F.expr(GEO_INSIDE_SQL)
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(inside, 1).otherwise(0)).cast("bigint").alias("n_inside"),
        (
            F.sum(F.when(inside, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("inside_share"),
    )


@query(
    "math_gcd_lcm",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_quantity AS BIGINT) AS BIGINT) AS a,
           CAST(l_linenumber * 6 + 4 AS BIGINT) AS b,
           CAST(gcd(CAST(l_quantity AS BIGINT), l_linenumber * 6 + 4)
                AS BIGINT) AS g,
           CAST(lcm(CAST(l_quantity AS BIGINT), l_linenumber * 6 + 4)
                AS BIGINT) AS l
    FROM lineitem
    """,
)
def math_gcd_lcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``gcd`` / ``lcm`` — integer lattice arithmetic the
    JVM engine has no builtin for: an Arrow-batched pandas UDF over
    ``math.gcd`` supplies it (numpy's vectorized ``np.gcd`` under
    pandas map — the vectorized-Python path at a legitimate gap in the
    builtin surface; DuckDB has both natively, so the oracle is
    builtin-vs-UDF). Operands are the quantity and an affine
    linenumber spread so the gcd distribution is non-trivial;
    lcm is computed INSIDE the UDF via ``np.lcm`` so it is int64-exact
    by construction for any operand domain — the previous
    (a·b)/g used Spark's ``/`` (double division), exact only while
    a·b stays within 2^53 (ADVICE r9).

    Plan: map-side UDFs, zero shuffles — the Arrow transfer is the
    cost, amortized per batch."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def pd_gcd(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.gcd(a.to_numpy(), b.to_numpy()))

    @pandas_udf("bigint")
    def pd_lcm(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.lcm(a.to_numpy(), b.to_numpy()))

    li = load_table(spark, sf_dir, "lineitem")
    a = F.col("l_quantity").cast("bigint")
    b = (F.col("l_linenumber") * 6 + 4).cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        a.alias("a"),
        b.alias("b"),
        pd_gcd(a, b).alias("g"),
        pd_lcm(a, b).alias("l"),
    )
