"""SURVEY §2.4 — aggregations.

ClickHouse-surface analogs: uniqExact/uniq, argMax/argMin, quantile,
topK, groupArray, countIf/any, WITH ROLLUP/CUBE/TOTALS, and
SummingMergeTree merge-time collapse. All run as Catalyst
HashAggregate partial→final (map-side combine), which is the
two-phase aggregation ClickHouse does at merge/query time — no custom
agg engine needed (SURVEY §4.1). At 100 TB these scale as
shuffle-by-group-key with partial aggregation cutting shuffle volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.queries._util import (
    SQL_CHARGE,
    SQL_DISC_PRICE,
    charge,
    davg,
    disc_price,
    dsum,
    money,
    nz,
    pos,
    rate,
    sql_davg,
    sql_dsum,
)
from etl_ch_destination_spark.registry import query


def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary — the engine's flagship query.

    Exercises scan → filter (pushed to parquet) → derived measures →
    hash agg partial+final → sort: the spine of the ETL reporting
    surface (SURVEY §7 Phase 1).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(money("l_quantity"), "sum_qty"),
            dsum(money("l_extendedprice"), "sum_base_price"),
            dsum(disc_price(), "sum_disc_price"),
            dsum(charge(), "sum_charge"),
            davg(money("l_quantity"), "avg_qty"),
            davg(money("l_extendedprice"), "avg_price"),
            davg(rate("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


FLAGSHIP_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('CAST(l_quantity AS DECIMAL(12,2))', 'sum_qty')},
       {sql_dsum('CAST(l_extendedprice AS DECIMAL(12,2))', 'sum_base_price')},
       {sql_dsum(SQL_DISC_PRICE, 'sum_disc_price')},
       {sql_dsum(SQL_CHARGE, 'sum_charge')},
       {sql_davg('CAST(l_quantity AS DECIMAL(12,2))', 'avg_qty')},
       {sql_davg('CAST(l_extendedprice AS DECIMAL(12,2))', 'avg_price')},
       {sql_davg('CAST(l_discount AS DECIMAL(4,2))', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

query("agg_groupby_multi", FLAGSHIP_ORACLE)(flagship_pricing_summary)


@query(
    "agg_global",
    f"""
    SELECT COUNT(*) AS n_rows,
           {sql_dsum('CAST(l_quantity AS DECIMAL(12,2))', 'sum_qty')},
           {sql_davg('CAST(l_extendedprice AS DECIMAL(12,2))', 'avg_price')},
           MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped (whole-table) aggregation — one partial-agg pass, single-row result, no exchange of row data."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(money("l_quantity"), "sum_qty"),
        davg(money("l_extendedprice"), "avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_extendedprice").alias("max_price"),
    )


@query(
    "agg_having",
    """
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend
    FROM orders GROUP BY o_custkey HAVING COUNT(*) > 10
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING: the post-aggregation filter runs on the aggregated frame, never the fact rows."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(money("o_totalprice"), "total_spend"),
        )
        .filter(F.col("n_orders") > 10)
    )


@query(
    "agg_count_distinct",
    """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqExact``. Expand-exchange under the hood; at scale
    prefer agg_approx_distinct (HLL) when exactness isn't required."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query("agg_approx_distinct")  # approx values differ engine-to-engine → rows-only
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniq``/``uniqHLL12`` analog: HyperLogLog++ sketch.

    The 100 TB path for distinct-count: constant memory per group, no
    expand-exchange. Accuracy vs exact is asserted in tests (±5%).
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
    )


@query(
    "agg_argmax",
    """
    SELECT o_custkey,
           arg_max(o_orderkey, o_totalprice) AS best_order,
           arg_min(o_orderkey, o_totalprice) AS worst_order,
           CAST(MAX(o_totalprice) AS DOUBLE) AS best_price
    FROM orders GROUP BY o_custkey
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``argMax(a, b)`` / ``argMin``: native in Spark 3.3+ as
    max_by/min_by. Ties broken identically (o_totalprice values are
    distinct per customer in fixtures; asserted in tests)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("best_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("worst_order"),
        F.max("o_totalprice").alias("best_price"),
    )


@query(
    "agg_quantiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           CAST(quantile_disc(l_extendedprice, 0.9) AS DOUBLE) AS p90_price_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantile``/``median``. Exact forms for the oracle:
    continuous median over integer-valued l_quantity (interpolation at
    .5 is exact in double), discrete p90 (no interpolation at all).
    The sketch form (percentile_approx) is the 100 TB path; tested
    with tolerance in pytest, not oracle-hashed."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)")
        .cast("double")
        .alias("p90_price_disc"),
    )


@query(
    "agg_topk_freq",
    """
    SELECT p_brand, n FROM (
      SELECT p_brand, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, p_brand) AS rk
      FROM part GROUP BY p_brand
    ) WHERE rk <= 5
    """,
)
def agg_topk_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topK(5)`` heavy hitters, exact form: count + total-order
    top-k (brand tiebreak makes the sort total → hash-stable).

    The unpartitioned window below runs over the POST-AGGREGATION rows:
    cardinality is bounded by distinct p_brand (25 in the fixture domain,
    and similarly small for any categorical heavy-hitter input), so the
    single-task window is safe regardless of base-table scale.
    """
    p = load_table(spark, sf_dir, "part")
    counts = p.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("n"), F.asc("p_brand"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("p_brand", "n")
    )


@query(
    "agg_stats",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
              * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
           / (COUNT(*) - 1) AS var_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``varSamp`` family. Built-in var_samp accumulates in
    doubles (order-sensitive), so the oracle-hashed form computes the
    textbook sums-of-squares formula over EXACT decimal sums with
    identical double ops on both sides; native F.var_samp/stddev/corr
    are covered by tolerance tests in pytest."""
    li = load_table(spark, sf_dir, "lineitem")
    q = money("l_quantity")
    n = F.count(F.lit(1))
    sum_q = F.sum(q).cast("double")
    sum_q2 = F.sum(q * q).cast("double")
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        ((sum_q2 - sum_q * sum_q / n) / (n - F.lit(1))).alias("var_qty"),
    )


@query(
    "agg_collect",
    """
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS nations,
           array_to_string(list_sort(list(DISTINCT n_regionkey + 0)), ',') AS keys_distinct
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``groupArray``/``groupUniqArray``; array_sort pinned for
    cross-engine determinism (collect order is partition-dependent).

    The hashed form serializes the arrays to a joined string because the
    driver's pandas hasher cannot hash list cells (VERDICT r1 "What's
    wrong" #1); the native array form stays available via collect_list
    directly and is covered in tests/test_aggregations.py.
    """
    na = load_table(spark, sf_dir, "nation")
    return na.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.array_join(
            F.array_sort(F.collect_set(F.col("n_regionkey") + F.lit(0))).cast("array<string>"),
            ",",
        ).alias("keys_distinct"),
    )


@query(
    "agg_count_if_any",
    """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def agg_count_if_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``countIf`` (+ ``any`` covered via max determinism note:
    any_value is non-deterministic, so the hashed query sticks to
    count_if; any_value is exercised in pytest only)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_rollup",
    """
    SELECT r_name, n_name, COUNT(*) AS n,
           GROUPING(r_name) + 2 * GROUPING(n_name) AS grp
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``WITH ROLLUP`` / ``WITH TOTALS`` (the all-NULL row is
    the TOTALS row)."""
    na = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = na.join(F.broadcast(r), na.n_regionkey == r.r_regionkey)
    return j.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n"),
        (F.grouping("r_name") + F.lit(2) * F.grouping("n_name")).cast("int").alias("grp"),
    )


@query(
    "agg_cube",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse WITH CUBE: all 2^k grouping-set combinations in one expand pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(money("l_quantity"), "sum_qty"),
    )


@query(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS list (the generalization of rollup/cube) with grouping-id disambiguation of the NULL rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "agg_pivot",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_F,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra distinct-scan job —
    the 100 TB-friendly form)."""
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(money("l_quantity")).cast("double"))
    )
    return piv.select(
        "l_returnflag",
        F.col("F").alias("qty_F"),
        F.col("O").alias("qty_O"),
    )


@query(
    "agg_summing_merge",
    """
    SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
           COUNT(*) AS n_rows
    FROM orders GROUP BY o_custkey
    """,
)
def agg_summing_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SummingMergeTree semantics: collapse rows sharing the sorting key,
    summing measure columns — expressed query-side as groupBy+sum
    (merge-time behavior made explicit; SURVEY §2.4)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        dsum(money("o_totalprice"), "total"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_sum_map",
    """
    SELECT l_returnflag, 'qty' AS metric,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total
    FROM lineitem GROUP BY 1
    UNION ALL
    SELECT l_returnflag, 'tax_cents' AS metric,
           CAST(SUM(CAST(round(l_tax * 100) AS BIGINT)) AS BIGINT) AS total
    FROM lineitem GROUP BY 1
    """,
)
def agg_sum_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sumMap``: key-wise sum of a map column per group,
    returned in relational long form ``(group, metric, total)`` — the
    map-typed result itself can't cross the driver's scalar-only hash
    gate, and long form is what a downstream join wants anyway.

    The Spark side genuinely exercises the map machinery — build a
    per-row map, ``explode`` it, hash-aggregate ``(group, key)`` — so
    arbitrary/ragged key sets work (the oracle enumerates the two fixed
    fixture metrics for value comparison). Exploding multiplies rows by
    map size before the map-side partial agg collapses them: shuffle
    volume stays |groups| × |distinct keys|.

    Metrics are exact integers (quantity is integral, tax scaled to
    cents) so parallel summation is bit-stable in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    m = li.select(
        "l_returnflag",
        F.create_map(
            F.lit("qty"),
            F.col("l_quantity").cast("bigint"),
            F.lit("tax_cents"),
            F.round(F.col("l_tax") * 100).cast("bigint"),
        ).alias("__m"),
    )
    exploded = m.select("l_returnflag", F.explode("__m").alias("metric", "__v"))
    return exploded.groupBy("l_returnflag", "metric").agg(
        F.sum("__v").cast("bigint").alias("total")
    )


@query(
    "agg_collapsing_merge",
    """
    WITH log AS (
      SELECT o_orderstatus, o_totalprice, 1 AS sign FROM orders
      UNION ALL
      SELECT o_orderstatus, o_totalprice, -1 FROM orders WHERE o_orderkey % 3 = 0
    )
    SELECT o_orderstatus,
           CAST(SUM(sign) AS BIGINT) AS n_live,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * sign) AS DOUBLE) AS net_price
    FROM log GROUP BY 1
    """,
)
def agg_collapsing_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree semantics: a signed changelog (insert = +1,
    cancel = −1) collapses at query time by summing signs and
    sign-weighted measures — cancelled rows net to zero without ever
    locating their partners. The fixture synthesizes cancels for every
    third order.

    This is THE ClickHouse mutable-state idiom (sign column instead of
    updates); the Spark form is a plain hash aggregate over the
    changelog union — map-side partials make the collapse linear, no
    join back to the insert stream. Exact-decimal sign-weighted sums
    keep the hash bit-stable."""
    o = load_table(spark, sf_dir, "orders")
    ins = o.select("o_orderstatus", "o_totalprice", F.lit(1).alias("sign"))
    canc = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .select("o_orderstatus", "o_totalprice", F.lit(-1).alias("sign"))
    )
    log = ins.unionByName(canc)
    return log.groupBy("o_orderstatus").agg(
        F.sum("sign").cast("bigint").alias("n_live"),
        F.sum(money("o_totalprice") * F.col("sign")).cast("double").alias("net_price"),
    )


@query(
    "agg_state_merge",
    f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           {sql_dsum("CAST(l_quantity AS DECIMAL(12,2))", "sum_qty")},
           min(l_shipdate) AS min_ship,
           max(l_shipdate) AS max_ship,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) AS avg_qty
    FROM lineitem GROUP BY 1
    """,
)
def agg_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregatingMergeTree ``-State``/``-Merge`` combinators: ingest
    shards each hold PARTIAL aggregate state (count, decimal sum,
    min/max); a later merge pass combines states into finals — the
    incremental idiom behind CH materialized views and micro-batch
    rollups. The Spark side actually runs the two-level path (partials
    per synthetic shard ``l_orderkey % 8``, then merge); the oracle
    computes the DIRECT one-pass aggregate, so the hash match proves
    merge ≡ direct for these states.

    Scale: partials collapse each shard map-side; the merge shuffles
    |keys| × |shards| tiny state rows, never raw data — the same reason
    CH pre-aggregates at insert time. avg is derived from merged
    (sum, n), the canonical mergeable-moments form (plain avg-of-avgs
    would be wrong and would fail the hash)."""
    li = load_table(spark, sf_dir, "lineitem")
    partials = (
        li.withColumn("__shard", F.col("l_orderkey") % 8)
        .groupBy("l_returnflag", "__shard")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(money("l_quantity")).alias("__sum_qty"),
            F.min("l_shipdate").alias("__min_ship"),
            F.max("l_shipdate").alias("__max_ship"),
        )
    )
    merged = partials.groupBy("l_returnflag").agg(
        F.sum("__n").alias("n"),
        F.sum("__sum_qty").alias("__sum_qty"),
        F.min("__min_ship").alias("min_ship"),
        F.max("__max_ship").alias("max_ship"),
    )
    return merged.select(
        "l_returnflag",
        "n",
        F.col("__sum_qty").cast("double").alias("sum_qty"),
        "min_ship",
        "max_ship",
        # divide as double/double — decimal-division scale rules differ
        # between engines and would shift the low mantissa bits
        (F.col("__sum_qty").cast("double") / F.col("n").cast("double")).alias(
            "avg_qty"
        ),
    )


@query("agg_sketch_state")  # approximate — rows-only; tolerance gate in tests
def agg_sketch_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-SKETCH state — the ClickHouse ``uniqState`` /
    ``uniqMerge`` counterpart that `agg_state_merge` (exact moments)
    doesn't cover: per-shard Apache DataSketches HLL partials
    (`hll_sketch_agg`, a binary, persistable column), merged across
    shards with `hll_union_agg`, finalized with `hll_sketch_estimate`.

    Unlike exact count-distinct, the partial state is CONSTANT-SIZE
    (~KB per group-shard regardless of cardinality) and closed under
    union — so shards/batches/days can be aggregated independently,
    persisted, and rolled up later, which is exactly how a CH
    materialized view maintains `uniqState` columns. Scale: the merge
    shuffles |keys|×|shards| kilobyte sketches, never user ids.

    Rows-only in the driver gate (estimates are approximate by
    construction, and DuckDB's approx_count_distinct uses a different
    sketch); tests/test_aggregations.py gates the estimate within 5%
    of exact and proves the parquet persist→reload→merge round-trip
    equals the single-pass estimate."""
    ev = load_table(spark, sf_dir, "events")
    partials = (
        ev.withColumn("__shard", F.to_date("ts"))
        .groupBy("event_type", "__shard")
        .agg(F.hll_sketch_agg("user_id").alias("__sketch"))
    )
    return partials.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sketch")).alias("approx_users")
    )


KLL_K = 200  # sketch size parameter: ~1.3% normalized rank error


@query("agg_quantile_kll")  # approximate — rows-only; error-bound gate in tests
def agg_quantile_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE sketch — the ClickHouse ``quantileTDigest``
    counterpart (VERDICT r4 #7), completing the sketch family next to
    `agg_sketch_state` (HLL) and `agg_quantile_state` (exact mergeable
    histogram partials): per-shard Apache DataSketches KLL doubles
    sketches (`kll_sketch_agg_double`, a constant-size binary,
    persistable column), merged across shards with
    `kll_merge_agg_double`, then p50/p90/p99 extracted from the merged
    state.

    Like the HLL key, the partial state is closed under merge and
    ~KB-sized regardless of row count, so shards/batches/days roll up
    independently — the CH `quantileState`/`quantileMerge` idiom. At
    100 TB the merge shuffles |keys|×|shards| kilobyte sketches, never
    the raw measure column.

    Rows-only in the driver gate (KLL estimates are approximate and
    DuckDB has no KLL); tests/test_aggregations.py bounds each
    estimate's TRUE rank within the k=200 sketch's ±2.5% normalized
    rank error of the target, asserts exact n, and proves the
    persist→reload→merge round trip equals the single-pass sketch."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    partials = (
        li.withColumn("__shard", F.col("l_orderkey") % 8)
        .groupBy("l_returnflag", "__shard")
        .agg(F.kll_sketch_agg_double(price, F.lit(KLL_K)).alias("__sk"))
    )
    merged = partials.groupBy("l_returnflag").agg(
        F.kll_merge_agg_double("__sk", F.lit(KLL_K)).alias("__sk")
    )
    return merged.select(
        "l_returnflag",
        F.kll_sketch_get_n_double("__sk").cast("bigint").alias("n"),
        F.kll_sketch_get_quantile_double("__sk", F.lit(0.5)).alias("q50"),
        F.kll_sketch_get_quantile_double("__sk", F.lit(0.9)).alias("q90"),
        F.kll_sketch_get_quantile_double("__sk", F.lit(0.99)).alias("q99"),
    )


QSTATE_BINS = 2048
QSTATE_HI = 110000.0  # l_extendedprice < 104950 at every fixture SF
QSTATE_WIDTH = QSTATE_HI / QSTATE_BINS  # 53.7109375, exactly representable


@query(
    "agg_quantile_state",
    f"""
    WITH b AS (
      SELECT l_returnflag,
             LEAST(CAST(FLOOR(l_extendedprice / {QSTATE_WIDTH!r}) AS BIGINT),
                   {QSTATE_BINS - 1}) AS bin,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT l_returnflag, bin,
             SUM(n) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum,
             SUM(n) OVER (PARTITION BY l_returnflag) AS total
      FROM b
    ),
    q AS (
      -- thresholds as DOUBLE on both engines: DuckDB would otherwise
      -- run 0.90*total in exact DECIMAL while Spark rounds 0.9 to
      -- binary — a cum exactly on the boundary would then diverge
      SELECT l_returnflag,
             MIN(CASE WHEN cum >= CAST(0.50 AS DOUBLE) * total THEN bin END) AS b50,
             MIN(CASE WHEN cum >= CAST(0.90 AS DOUBLE) * total THEN bin END) AS b90,
             MIN(CASE WHEN cum >= CAST(0.99 AS DOUBLE) * total THEN bin END) AS b99
      FROM c GROUP BY 1
    )
    SELECT l_returnflag,
           CAST((b50 + 0.5) * {QSTATE_WIDTH!r} AS DOUBLE) AS p50_est,
           CAST((b90 + 0.5) * {QSTATE_WIDTH!r} AS DOUBLE) AS p90_est,
           CAST((b99 + 0.5) * {QSTATE_WIDTH!r} AS DOUBLE) AS p99_est
    FROM q
    """,
)
def agg_quantile_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE state — the ClickHouse ``quantileState`` /
    T-Digest counterpart, completing the sketch-state pair with
    `agg_sketch_state` (HLL). State = a fixed equi-width histogram in
    LONG FORM (group, bin, count): closed under addition, so shards /
    batches / days aggregate independently and merge by summing bin
    counts — never re-reading raw values. Estimate = mid-point of the
    first bin whose cumulative count crosses q·total.

    Unlike the HLL key, the ESTIMATOR here is fully deterministic
    (integer bin math + IEEE division by an exactly-representable
    width), so the DuckDB oracle replays it bit for bit — a sketch
    with a hash-match gate. Accuracy vs exact quantiles (bounded by
    half a bin width) is separately gated in pytest.

    Scale: partials collapse map-side per (key, shard, bin); the merge
    shuffles ≤ |keys|×|shards|×|bins| counter rows, never raw data;
    the cumulative window runs over ≤ {QSTATE_BINS} rows per key."""
    li = load_table(spark, sf_dir, "lineitem")
    bin_col = F.least(
        F.floor(F.col("l_extendedprice") / QSTATE_WIDTH).cast("bigint"),
        F.lit(QSTATE_BINS - 1),
    )
    # two-level path: per-shard histogram partials, then the state merge
    partials = (
        li.withColumn("__shard", F.col("l_orderkey") % 8)
        .withColumn("bin", bin_col)
        .groupBy("l_returnflag", "__shard", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    merged = partials.groupBy("l_returnflag", "bin").agg(F.sum("n").alias("n"))
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("l_returnflag")
    c = merged.select(
        "l_returnflag",
        "bin",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_all).alias("total"),
    )
    q = c.groupBy("l_returnflag").agg(
        *[
            F.min(
                F.when(F.col("cum") >= frac * F.col("total"), F.col("bin"))
            ).alias(name)
            for frac, name in [(0.50, "b50"), (0.90, "b90"), (0.99, "b99")]
        ]
    )
    return q.select(
        "l_returnflag",
        *[
            ((F.col(b) + 0.5) * QSTATE_WIDTH).alias(p)
            for b, p in [("b50", "p50_est"), ("b90", "p90_est"), ("b99", "p99_est")]
        ],
    )


@query(
    "agg_unpivot",
    """
    WITH wide AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM wide
    UNION ALL
    SELECT o_orderpriority, 'sum_total' AS metric, sum_total AS value FROM wide
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long reshape (`df.unpivot`, the inverse of agg_pivot;
    ANSI UNPIVOT / pandas melt): per-priority metrics melted to
    (key, metric, value) rows — the shape metric stores and plotting
    layers ingest. Narrow transform, no extra shuffle beyond the
    feeding aggregate; the oracle is the portable UNION ALL form."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        dsum(money("o_totalprice"), "sum_total"),
    )
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "sum_total"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "agg_distinct_windowed",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY 1
    """,
)
def agg_distinct_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per hourly bucket — the DAU/uniques shape. Exact
    COUNT(DISTINCT) expands to Spark's two-phase distinct aggregate
    (partial distinct per partition, exchange on (bucket, user), final
    count); at 100 TB swap in approx_count_distinct per bucket
    (agg_approx_distinct pattern) to keep the exchange bounded."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("w.start").alias("ws"), "n_users", "n_events")
    )


@query(
    "agg_corr_exact",
    """
    WITH cents AS (
      SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS DECIMAL(18,0)) AS xc,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS DECIMAL(18,0)) AS yc
      FROM lineitem
    ),
    s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(xc) AS DOUBLE) AS sx,
             CAST(SUM(yc) AS DOUBLE) AS sy,
             CAST(SUM(xc * yc) AS DOUBLE) AS sxy,
             CAST(SUM(xc * xc) AS DOUBLE) AS sxx,
             CAST(SUM(yc * yc) AS DOUBLE) AS syy
      FROM cents GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (n * sxy - sx * sy)
             / NULLIF(sqrt(GREATEST(0.0, n * sxx - sx * sx))
                      * sqrt(GREATEST(0.0, n * syy - sy * sy)), 0)
             AS corr_qty_price
    FROM s
    """,
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation WITHOUT the usual parallel-nondeterminism:
    built-in `corr()` merges co-moments in partition order (ulp drift
    across engines/partitionings), so this computes five exact INTEGER
    sums (order-insensitive) and applies the closed form in IEEE once —
    bit-identical to the oracle and to itself under any partitioning.

    Why integer CENTS (scale-0 decimals), not (12,2) decimals: casting
    a scale-k decimal to double is value/10^k — once the integer part
    exceeds 2^53 that is TWO roundings in DuckDB (int→double, then the
    division) vs one correctly-rounded BigDecimal conversion in Spark,
    and the engines can disagree by 1 ulp (observed at sf0.001).
    Scale-0 sums make both engines do a single int→double conversion,
    and correlation is invariant to the ×100 rescaling of both axes.
    Sums stay under DECIMAL(38,0): (18,0)×(18,0) products summed over
    ≤1e7 rows ≈ 1e21 ≪ 1e38."""
    li = load_table(spark, sf_dir, "lineitem")
    xc = (F.col("l_quantity").cast("decimal(12,2)") * 100).cast("decimal(18,0)")
    yc = (money("l_extendedprice") * 100).cast("decimal(18,0)")
    cents = li.select("l_returnflag", xc.alias("xc"), yc.alias("yc"))
    x, y = F.col("xc"), F.col("yc")
    s = cents.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    # nz: NULL on both engines when an axis is constant in a group
    # (ANSI throw otherwise) — see queries/_util.nz
    corr = (n * F.col("sxy") - sx * sy) / nz(
        F.sqrt(pos(n * F.col("sxx") - sx * sx))
        * F.sqrt(pos(n * F.col("syy") - sy * sy))
    )
    return s.select("l_returnflag", "n", corr.alias("corr_qty_price"))


@query(
    "agg_weighted_median",
    """
    WITH cum AS (
      SELECT l_returnflag, l_extendedprice,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
               PARTITION BY l_returnflag ORDER BY l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
               PARTITION BY l_returnflag) AS tw
      FROM lineitem
    )
    SELECT l_returnflag,
           MIN(l_extendedprice) AS weighted_median_price
    FROM cum
    WHERE 2 * cw >= tw
    GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (ClickHouse `quantileExactWeighted(0.5)`):
    smallest price whose cumulative quantity-weight reaches half the
    group total. The crossing test is `2·cumsum ≥ total` in EXACT
    decimals — no division, no epsilon, so ties and partitioning cannot
    move the answer (rows tied on price accumulate in any order without
    changing the crossing value).

    Plan: one shuffle on the group key; the running sum is a per-group
    ordered window (frame = each return-flag class; at 100 TB weighted
    quantiles over high-cardinality groups stay per-group-bounded, and
    a global weighted median uses the same two-pass trick as the
    bucketed global rank)."""
    li = load_table(spark, sf_dir, "lineitem")
    wq = F.col("l_quantity").cast("decimal(12,2)")
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum(wq).over(w_cum).alias("cw"),
        F.sum(wq).over(w_tot).alias("tw"),
    )
    return (
        cum.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("weighted_median_price"))
    )


@query(
    "agg_mad_robust",
    """
    WITH med AS (
      SELECT l_returnflag AS m_flag, quantile_cont(l_quantity, 0.5) AS med_qty
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, med_qty,
           quantile_cont(abs(l_quantity - med_qty), 0.5) AS mad_qty
    FROM lineitem JOIN med ON l_returnflag = m_flag
    GROUP BY l_returnflag, med_qty
    """,
)
def agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation — the robust spread statistic outlier
    filters use where stddev is skew-poisoned. Two-pass shape: exact
    per-group median (interpolation over the half-integer grid of
    l_quantity is exact in double), broadcast the ≤3-row median table
    back, then the median of absolute deviations. Same double-exact
    interpolation argument as agg_quantiles, so both passes hash-match
    the oracle. At 100 TB swap pass 1 for percentile_approx and keep
    pass 2 exact over the residuals."""
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy(F.col("l_returnflag").alias("m_flag")).agg(
        F.expr("percentile(l_quantity, 0.5)").alias("med_qty")
    )
    return (
        li.join(F.broadcast(med), li.l_returnflag == F.col("m_flag"))
        .groupBy("l_returnflag", "med_qty")
        .agg(
            F.expr("percentile(abs(l_quantity - med_qty), 0.5)").alias("mad_qty")
        )
        .select("l_returnflag", "med_qty", "mad_qty")
    )


@query(
    "agg_histogram",
    """
    SELECT CAST(FLOOR(l_extendedprice / 12000.0) AS INT) AS bucket,
           CAST(CAST(FLOOR(l_extendedprice / 12000.0) AS INT) * 12000.0 AS DOUBLE)
             AS bucket_lo,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (CH `histogram()` fixed-bin form): price
    bucketed into 12k-wide bins with per-bin counts and quantity
    totals. The bin id is a pure projection, so this is an ordinary
    partial+final agg with |bins| cardinality — the constant-memory way
    to sketch a distribution at 100 TB (vs exact quantiles' sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 12000.0).cast("int")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("l_quantity").cast("decimal(12,2)"), "sum_qty"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 12000.0).alias("bucket_lo"),
            "n",
            "sum_qty",
        )
    )


TD_DELTA = 128  # t-digest compression: ≤ TD_DELTA centroids per digest
TD_SHARDS = 8   # independent per-shard digests, merged afterwards


def _td_pred_est(q: str) -> tuple[str, str]:
    """SQL fragments of the pinned t-digest estimator for quantile
    ``q`` (a SQL double literal): the selection predicate picking
    exactly one centroid segment per group, and the interpolated
    estimate on that segment. Shared by the oracle text below so the
    three quantiles stay character-identical in policy."""
    p = f"CAST({q} AS DOUBLE) * total"
    pred = (
        f"((m <= {p} AND (m2 IS NULL OR {p} < m2))"
        f" OR (ci = 1 AND {p} < m))"
    )
    est = (
        f"CASE WHEN {p} < m THEN mean WHEN m2 IS NULL THEN mean"
        f" ELSE mean + (mean2 - mean) * ({p} - m) / (m2 - m) END"
    )
    return pred, est


def _td_oracle() -> str:
    sel = ",\n           ".join(
        f"CAST(MAX(CASE WHEN {_td_pred_est(q)[0]} THEN {_td_pred_est(q)[1]} END)"
        f" / 100.0 AS DOUBLE) AS p{tag}"
        for tag, q in (("50", "0.50"), ("90", "0.90"), ("99", "0.99"))
    )
    return f"""
    WITH v AS (
      SELECT l_returnflag AS grp, l_orderkey % {TD_SHARDS} AS shard,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents
      FROM lineitem
    ),
    r AS (
      SELECT grp, shard, cents,
             ROW_NUMBER() OVER (PARTITION BY grp, shard ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY grp, shard) AS n
      FROM v
    ),
    state AS (  -- per-shard digest: scale-function bucket -> (sum, weight)
      SELECT grp, shard,
             CAST(({TD_DELTA} * (2 * rn - 1)) // (2 * n) AS BIGINT) AS bucket,
             SUM(cents) AS s, COUNT(*) AS w
      FROM r GROUP BY 1, 2, 3
    ),
    ordered AS (  -- pinned merge order: mean asc, (shard, bucket) tiebreak
      SELECT grp, s, w,
             SUM(w) OVER (PARTITION BY grp
                          ORDER BY CAST(s AS DOUBLE) / w, shard, bucket) AS cum,
             SUM(w) OVER (PARTITION BY grp) AS total
      FROM state
    ),
    merged AS (
      SELECT grp,
             CAST(({TD_DELTA} * (2 * cum - w)) // (2 * total) AS BIGINT)
               AS mbucket,
             SUM(s) AS s, SUM(w) AS w, MAX(total) AS total
      FROM ordered GROUP BY 1, 2
    ),
    posn AS (
      SELECT grp, mbucket, total, CAST(s AS DOUBLE) / w AS mean,
             CAST(SUM(w) OVER (PARTITION BY grp ORDER BY mbucket) AS DOUBLE)
               - CAST(w AS DOUBLE) / 2 AS m
      FROM merged
    ),
    seg AS (
      SELECT grp, total, mean, m,
             LEAD(mean) OVER (PARTITION BY grp ORDER BY mbucket) AS mean2,
             LEAD(m) OVER (PARTITION BY grp ORDER BY mbucket) AS m2,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY mbucket) AS ci
      FROM posn
    )
    SELECT grp AS l_returnflag,
           CAST(MAX(total) AS BIGINT) AS n,
           {sel}
    FROM seg GROUP BY grp
    """


@query("agg_quantile_tdigest", _td_oracle())
def agg_quantile_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable CENTROID quantile sketch — the ClickHouse
    ``quantileTDigest`` role (Dunning & Ertl, "Computing Extremely
    Accurate Quantiles Using t-Digests"), completing the quantile-
    sketch ladder: exact (`agg_quantiles`), equi-width histogram state
    (`agg_quantile_state`), KLL (`agg_quantile_kll`, rows-only), and
    now a centroid digest with a PINNED DETERMINISTIC policy so the
    DuckDB oracle replays it bit for bit — the property that lets a
    sketch carry a full hash gate (VERDICT r12 #3).

    Pinned policy (every choice the paper leaves open is fixed):
    - scale function k0(q) = δ·q (the paper's uniform scale; δ =
      TD_DELTA = 128). Buckets are assigned by INTEGER math —
      bucket = ⌊δ·(2·rank−1) / (2·n)⌋ over the per-shard sort — so
      no libm call can diverge between engines.
    - per-shard build (shard = l_orderkey % 8, the batch "buffer,
      sort, cluster" form of the paper's merging digest §3.1): state
      is ≤ δ centroids of (sum_cents, weight) per group×shard —
      constant-size, persistable, closed under merge.
    - merge: all shard centroids weighted-point-sorted by mean
      (CAST(s AS DOUBLE)/w — one IEEE op, identical both engines)
      with (shard, bucket) as the deterministic tiebreak, then
      re-clustered by the same k0 rule on the cumulative-weight
      midpoint: mbucket = ⌊δ·(2·cum−w) / (2·total)⌋, integer.
    - estimate: standard t-digest interpolation between adjacent
      centroid means at cumulative-midpoint positions m_i = C_i −
      w_i/2, CLAMPED to the first/last centroid mean beyond the
      outermost midpoints (the paper extrapolates to min/max; the
      clamp is the pinned choice because it needs no extra state).

    Why rank error stays bounded: each centroid holds ≤ ~total/δ
    weight, so the estimate's true rank is within ~1/δ of the target
    (gated ≤ 2.5/δ in tests/test_round13_keys.py alongside the
    persist→reload→merge exactness and merged-vs-direct gates).

    Scale: the per-shard rank is a window over group×shard partitions
    (shard count would be O(cluster) in production; pinned to 8 for
    the fixture), the shuffle after the build moves only
    |groups|×|shards|×δ centroid rows — kilobytes — never raw data,
    exactly the CH `quantileTDigestState`/`Merge` rollup idiom. Sums
    stay < 2^53 through the double casts at fixture scales; at true
    100 TB group sums the hi/lo int64 split policy (NOTES_r04) would
    apply.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        (F.col("l_orderkey") % TD_SHARDS).alias("shard"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    w_rank = Window.partitionBy("grp", "shard").orderBy("cents")
    r = li.select(
        "grp",
        "shard",
        "cents",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("grp", "shard")).alias("n"),
    )
    state = (
        r.withColumn(
            "bucket",
            F.expr(
                # rn is IntegerType (row_number): widen BEFORE the
                # multiply or the product overflows int32 at ~8.39M
                # rows per (grp, shard) — ANSI Spark would throw where
                # the BIGINT-native DuckDB oracle succeeds
                f"CAST(({TD_DELTA} * (2 * CAST(rn AS BIGINT) - 1))"
                f" div (2 * n) AS BIGINT)"
            ),
        )
        .groupBy("grp", "shard", "bucket")
        .agg(F.sum("cents").alias("s"), F.count(F.lit(1)).alias("w"))
    )
    return td_merge_quantiles(state, ["shard", "bucket"]).withColumnRenamed(
        "grp", "l_returnflag"
    )


def td_merge_state(
    state: DataFrame, tie_cols: list[str], part_cols: list[str] | None = None
) -> DataFrame:
    """The pinned t-digest MERGE as a state→state step over a centroid
    table ``(grp, *part_cols, *tie_cols, s, w)``: weighted points
    sorted by mean with ``tie_cols`` as the deterministic tiebreak,
    re-clustered by k0 on cumulative weight within each
    (grp, *part_cols) partition. Returns (grp, *part_cols, mbucket,
    s, w, total) — ≤ TD_DELTA rows per partition, the closure under
    merging that makes digests COMPACTABLE (stream_tdigest_compact
    merges closed micro-batches with exactly this step)."""
    part_cols = part_cols or []
    mean = F.col("s").cast("double") / F.col("w")
    w_cum = Window.partitionBy("grp", *part_cols).orderBy(mean, *tie_cols)
    ordered = state.select(
        "grp",
        *part_cols,
        "s",
        "w",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(Window.partitionBy("grp", *part_cols)).alias("total"),
    )
    return (
        ordered.withColumn(
            "mbucket",
            F.expr(
                f"CAST(({TD_DELTA} * (2 * cum - w)) div (2 * total) AS BIGINT)"
            ),
        )
        .groupBy("grp", *part_cols, "mbucket")
        .agg(
            F.sum("s").alias("s"),
            F.sum("w").alias("w"),
            F.max("total").alias("total"),
        )
    )


def td_merge_quantiles(state: DataFrame, tie_cols: list[str]) -> DataFrame:
    """The pinned t-digest MERGE + ESTIMATE over a centroid state table
    ``(grp, *tie_cols, s, w)`` — the single source of the policy, used
    by both the batch key above (tie = shard, bucket) and the streaming
    state key (tie = batch tag, bucket): weighted points sorted by mean
    with ``tie_cols`` as the deterministic tiebreak, re-clustered by k0
    on cumulative weight (td_merge_state), midpoint interpolation
    clamped at the outermost centroids. Returns (grp, n, p50, p90,
    p99); the cents → unit division by 100 happens here."""
    merged = td_merge_state(state, tie_cols)
    w_ord = Window.partitionBy("grp").orderBy("mbucket")
    posn = merged.select(
        "grp",
        "mbucket",
        "total",
        (F.col("s").cast("double") / F.col("w")).alias("mean"),
        (
            F.sum("w").over(w_ord).cast("double")
            - F.col("w").cast("double") / 2
        ).alias("m"),
    )
    seg = posn.select(
        "grp",
        "total",
        "mean",
        "m",
        F.lead("mean").over(w_ord).alias("mean2"),
        F.lead("m").over(w_ord).alias("m2"),
        F.row_number().over(w_ord).alias("ci"),
    )
    aggs = [F.max("total").cast("bigint").alias("n")]
    for tag, q in (("50", "0.50"), ("90", "0.90"), ("99", "0.99")):
        pred, est = _td_pred_est(q)
        aggs.append(
            (F.max(F.when(F.expr(pred), F.expr(est))) / 100.0)
            .cast("double")
            .alias(f"p{tag}")
        )
    return seg.groupBy("grp").agg(*aggs)


def _tdw_oracle() -> str:
    sel = ",\n           ".join(
        f"CAST(MAX(CASE WHEN {_td_pred_est(q)[0]} THEN {_td_pred_est(q)[1]} END)"
        f" / 100.0 AS DOUBLE) AS p{tag}"
        for tag, q in (("50", "0.50"), ("90", "0.90"), ("99", "0.99"))
    )
    return f"""
    WITH v AS (
      SELECT l_returnflag AS grp, l_orderkey % {TD_SHARDS} AS shard,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents,
             CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) AS wt,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    r AS (
      SELECT grp, shard, cents, wt,
             SUM(wt) OVER (PARTITION BY grp, shard
                           ORDER BY cents, l_orderkey, l_linenumber
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cumw,
             SUM(wt) OVER (PARTITION BY grp, shard) AS tw
      FROM v
    ),
    state AS (
      SELECT grp, shard,
             CAST(({TD_DELTA} * (2 * cumw - wt)) // (2 * tw) AS BIGINT)
               AS bucket,
             CAST(SUM(cents * wt) AS BIGINT) AS s,
             CAST(SUM(wt) AS BIGINT) AS w
      FROM r GROUP BY 1, 2, 3
    ),
    ordered AS (
      SELECT grp, s, w,
             SUM(w) OVER (PARTITION BY grp
                          ORDER BY CAST(s AS DOUBLE) / w, shard, bucket) AS cum,
             SUM(w) OVER (PARTITION BY grp) AS total
      FROM state
    ),
    merged AS (
      SELECT grp,
             CAST(({TD_DELTA} * (2 * cum - w)) // (2 * total) AS BIGINT)
               AS mbucket,
             SUM(s) AS s, SUM(w) AS w, MAX(total) AS total
      FROM ordered GROUP BY 1, 2
    ),
    posn AS (
      SELECT grp, mbucket, total, CAST(s AS DOUBLE) / w AS mean,
             CAST(SUM(w) OVER (PARTITION BY grp ORDER BY mbucket) AS DOUBLE)
               - CAST(w AS DOUBLE) / 2 AS m
      FROM merged
    ),
    seg AS (
      SELECT grp, total, mean, m,
             LEAD(mean) OVER (PARTITION BY grp ORDER BY mbucket) AS mean2,
             LEAD(m) OVER (PARTITION BY grp ORDER BY mbucket) AS m2,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY mbucket) AS ci
      FROM posn
    )
    SELECT grp AS l_returnflag,
           CAST(MAX(total) AS BIGINT) AS n,
           {sel}
    FROM seg GROUP BY grp
    """


@query("agg_quantile_tdigest_weighted", _tdw_oracle())
def agg_quantile_tdigest_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileTDigestWeighted`` — the weighted form of
    agg_quantile_tdigest: each price observation carries its QUANTITY
    as weight, so the digest answers "the price quantile of the units
    sold", not "of the order lines" (the distinction CH ships a whole
    second function for). Same pinned policy, one generalization: the
    per-shard build buckets on CUMULATIVE WEIGHT midpoints —
    bucket = ⌊δ·(2·cumw − w) / (2·W)⌋ over the (value, orderkey,
    linenumber)-ordered shard — which is exactly the pinned merge's
    k0 rule applied at build time (a weighted point IS a centroid of
    weight w; the build is the merge of singleton centroids, the
    closure the unweighted key's docstring pins). Centroids carry
    (Σ value·weight, Σ weight); merge and estimate are the shared
    td_merge_quantiles, so the two keys can never drift; n = Σ
    weights, checked by value.

    Determinism: weights are exact integers (whole-unit quantities
    via the decimal cast), cumulative weights ride int64 windows with
    a unique (value, orderkey, linenumber) order, and the only floats
    are the shared mean/estimate ops. Rank-error gate (weighted CDF)
    ≤ 2.5/δ in tests/test_round14_keys.py, plus the ≤ δ-per-shard
    state bound.

    Scale: identical plan shape to the unweighted key — one
    group×shard window sort, then centroid-only exchanges."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        (F.col("l_orderkey") % TD_SHARDS).alias("shard"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.col("l_quantity").cast("decimal(12,2)").cast("bigint").alias("wt"),
        "l_orderkey",
        "l_linenumber",
    )
    w_ord = (
        Window.partitionBy("grp", "shard")
        .orderBy("cents", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = li.select(
        "grp",
        "shard",
        "cents",
        "wt",
        F.sum("wt").over(w_ord).alias("cumw"),
        F.sum("wt")
        .over(Window.partitionBy("grp", "shard"))
        .alias("tw"),
    )
    state = (
        r.withColumn(
            "bucket",
            F.expr(
                f"CAST(({TD_DELTA} * (2 * cumw - wt))"
                f" div (2 * tw) AS BIGINT)"
            ),
        )
        .groupBy("grp", "shard", "bucket")
        .agg(
            F.sum(F.col("cents") * F.col("wt")).cast("bigint").alias("s"),
            F.sum("wt").cast("bigint").alias("w"),
        )
    )
    return td_merge_quantiles(state, ["shard", "bucket"]).withColumnRenamed(
        "grp", "l_returnflag"
    )


EQD_BUCKETS = 8  # equi-depth bucket count


@query(
    "agg_histogram_eqdepth",
    f"""
    WITH v AS (
      SELECT l_returnflag AS grp,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents,
             NTILE({EQD_BUCKETS}) OVER (
               PARTITION BY l_returnflag
               ORDER BY CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                             AS BIGINT), l_orderkey, l_linenumber
             ) AS bucket
      FROM lineitem
    )
    SELECT grp AS l_returnflag, CAST(bucket AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM v GROUP BY 1, 2
    """,
)
def agg_histogram_eqdepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH histogram — the optimizer-statistics workhorse
    (ClickHouse `quantileExact`-boundary stats, Spark's own CBO
    column histograms): per group, {EQD_BUCKETS} buckets holding
    (near-)equal ROW COUNTS with data-dependent value boundaries —
    the complement of agg_histogram (equi-WIDTH: fixed boundaries,
    varying counts) and agg_histogram_log2 (exponential widths).
    Boundaries are pinned deterministically: NTILE over (value,
    orderkey, linenumber) — the unique tiebreak makes the bucket of
    every tied value identical on both engines, so lo/hi/sum per
    bucket hash-match exactly (ntile distributes the remainder to
    the leading buckets identically in Spark and DuckDB).

    Per bucket: count (equal ±1 by construction — asserted in
    tests), the value range [lo, hi] (adjacent buckets may share a
    boundary value when ties straddle), and the exact cents mass.

    Plan/scale: ONE shuffle on the group key shared by the NTILE
    window and the (grp, bucket) aggregate (same partition key —
    Catalyst reuses the exchange); the sort is per-group, the same
    cost any exact-quantile statistic pays. Output is
    |groups|×{EQD_BUCKETS} rows."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast(
        "bigint"
    )
    w = Window.partitionBy("grp").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    v = li.select(
        F.col("l_returnflag").alias("grp"),
        cents.alias("cents"),
        "l_orderkey",
        "l_linenumber",
    ).withColumn("bucket", F.ntile(EQD_BUCKETS).over(w))
    return (
        v.groupBy("grp", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        .select(
            F.col("grp").alias("l_returnflag"),
            F.col("bucket").cast("bigint").alias("bucket"),
            "n",
            "lo_cents",
            "hi_cents",
            "sum_cents",
        )
    )


# ------------------------------------------------------------------
# agg_quantile_ddsketch: DDSketch (Masson/Rim/Lee, VLDB 2019 — the
# public Datadog relative-error quantile sketch) with gamma = 2^(1/4),
# bucketing made EXACT-INTEGER so the whole sketch hash-oracles:
# boundaries b_i = ceil(2^(i/4)) and geometric-mid representatives
# m_i = round(2^((2i+1)/8)) are computed offline with integer
# nth-roots (no float pow anywhere near a boundary decision), and
# bucket(x) = |{i : b_i <= x}| - 1 is a pure int comparison fold.
# ------------------------------------------------------------------

def _iroot(n: int, k: int) -> int:
    """floor(n^(1/k)) by Newton + exact adjust (ints only)."""
    if n == 0:
        return 0
    r = int(round(n ** (1.0 / k)))
    while (r + 1) ** k <= n:
        r += 1
    while r ** k > n:
        r -= 1
    return r


def _dds_tables(n_buckets: int = 104):
    bounds, mids = [], []
    for i in range(n_buckets):
        n4 = 2 ** i
        r = _iroot(n4, 4)
        bounds.append(r if r ** 4 == n4 else r + 1)
        # round(2^((2i+1)/8)): r8 = floor(..), pick r8 / r8+1 by exact
        # comparison of 2^(2i+1) * 2^8 vs (2*r8+1)^8
        n8 = 2 ** (2 * i + 1)
        r8 = _iroot(n8, 8)
        mids.append(r8 if n8 * 256 < (2 * r8 + 1) ** 8 else r8 + 1)
    return bounds, mids


DDS_BOUNDS, DDS_MIDS = _dds_tables()


@query(
    "agg_quantile_ddsketch",
    f"""
    WITH x AS (
      SELECT event_type,
             list_sum(list_transform({DDS_BOUNDS},
                 b -> CASE WHEN CAST(CAST(value AS DECIMAL(12,2)) * 100
                                AS BIGINT) >= b THEN 1 ELSE 0 END)) - 1
               AS bucket
      FROM events
    ),
    b AS (
      SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS n_b
      FROM x GROUP BY event_type, bucket
    ),
    c AS (
      SELECT event_type, bucket, n_b,
             SUM(n_b) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
             SUM(n_b) OVER (PARTITION BY event_type) AS n
      FROM b
    ),
    est AS (
      SELECT event_type,
             CAST(MAX(n) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_buckets,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN bucket END) AS k50,
             MIN(CASE WHEN cum >= (9 * n + 9) // 10 THEN bucket END) AS k90,
             MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN bucket END) AS k99
      FROM c GROUP BY event_type
    )
    SELECT event_type, n, n_buckets,
           CAST({DDS_MIDS}[CAST(k50 AS INT) + 1] AS BIGINT) AS p50_est,
           CAST({DDS_MIDS}[CAST(k90 AS INT) + 1] AS BIGINT) AS p90_est,
           CAST({DDS_MIDS}[CAST(k99 AS INT) + 1] AS BIGINT) AS p99_est
    FROM est
    """,
)
def agg_quantile_ddsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch quantiles (public Datadog sketch, VLDB 2019) per
    event_type — the RELATIVE-error companion to the rank-error
    t-digest family: γ-geometric buckets guarantee every estimate is
    within (γ−1)/(γ+1) ≈ 9.5% of the true value at ANY quantile
    (γ = 2^(1/4)), and the sketch is a plain bucket→count map, so
    MERGE is exact bucket-count addition — order-free, associative,
    the ideal distributed-aggregate algebra (sharded-merge ≡ direct is
    gated in tests/test_round14b_keys.py, alongside the relative-error
    bound against exact quantiles).

    The hash-oracle trick: γ-bucketing normally needs log(x)/log(γ) —
    libm, not bit-reproducible across engines. Here boundaries
    b_i = ceil(2^(i/4)) and representatives m_i = round(2^((2i+1)/8))
    are EXACT INTEGERS computed offline with integer nth-roots and
    inlined into both plans; bucket(x) is a ≤104-comparison integer
    fold (whole-stage codegen HOF — the ts_ema_dyadic device), so no
    transcendental function executes at query time and the full
    sketch — counts, bucket set, all three estimates — matches
    bit-for-bit.

    Plan/scale: one map-side fold per row, one (type, bucket) hash
    aggregate bounded by |types| × 104 rows, window + final rollup
    over that bounded frame. At 100 TB the exchange carries bucket
    counts, never values — the same centroid-not-data shape as
    agg_quantile_tdigest, with an even simpler merge."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    barr = F.array(*[F.lit(b).cast("bigint") for b in DDS_BOUNDS])
    marr = F.array(*[F.lit(m).cast("bigint") for m in DDS_MIDS])
    bucket = (
        F.aggregate(
            barr,
            F.lit(0).cast("bigint"),
            lambda acc, b: acc
            + F.when(F.col("cents") >= b, F.lit(1)).otherwise(F.lit(0)),
        )
        - 1
    )
    x = ev.select("event_type", cents.alias("cents")).select(
        "event_type", bucket.alias("bucket")
    )
    b = x.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b")
    )
    w_cum = Window.partitionBy("event_type").orderBy("bucket")
    w_all = Window.partitionBy("event_type")
    c = b.select(
        "event_type",
        "bucket",
        "n_b",
        F.sum("n_b").over(w_cum).alias("cum"),
        F.sum("n_b").over(w_all).alias("n"),
    )
    est = c.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.min(
            F.when(
                F.col("cum") >= F.floor((F.col("n") + 1) / 2), F.col("bucket")
            )
        ).alias("k50"),
        F.min(
            F.when(
                F.col("cum") >= F.floor((9 * F.col("n") + 9) / 10),
                F.col("bucket"),
            )
        ).alias("k90"),
        F.min(
            F.when(
                F.col("cum") >= F.floor((99 * F.col("n") + 99) / 100),
                F.col("bucket"),
            )
        ).alias("k99"),
    )
    return est.select(
        "event_type",
        "n",
        "n_buckets",
        F.element_at(marr, F.col("k50").cast("int") + 1)
        .cast("bigint")
        .alias("p50_est"),
        F.element_at(marr, F.col("k90").cast("int") + 1)
        .cast("bigint")
        .alias("p90_est"),
        F.element_at(marr, F.col("k99").cast("int") + 1)
        .cast("bigint")
        .alias("p99_est"),
    )


# ------------------------------------------------------------------
# agg_hll_deterministic: HyperLogLog (Flajolet et al. 2007) made
# fully HASH-ORACLED. Everything nondeterministic in a stock HLL is
# pinned: the hash is md5 (the repo's stable device), the register
# harmonic sum folds an ORDERED 256-slot list (identical IEEE
# sequence both engines), and the small-range correction's ln() comes
# from a 256-entry literal table computed once here (the AA_W / MSS_C
# device) — no libm call at query time.
# ------------------------------------------------------------------

HLL_M = 256          # registers (b = 8 index bits)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256)  # alpha_256, computed once
import math as _math

HLL_LN = [0.0] + [_math.log(z) for z in range(1, HLL_M + 1)]
HLL_LN_M = _math.log(HLL_M)


def _hll_sql() -> str:
    ln_list = ", ".join(repr(x) for x in HLL_LN)
    return f"""
    WITH x AS (
      SELECT o_orderstatus AS grp,
             md5(CAST(o_custkey AS VARCHAR) || ':hll') AS h
      FROM orders
    ),
    rw AS (
      SELECT grp,
             CAST(('0x' || substr(h, 1, 2)) AS BIGINT) AS j,
             CAST(('0x' || substr(h, 3, 13)) AS BIGINT) AS w
      FROM x
    ),
    regs AS (
      SELECT grp, j,
             CAST(MAX(CASE WHEN w = 0 THEN 53
                           ELSE 52 - length(bin(w)) + 1 END) AS BIGINT)
               AS rho
      FROM rw GROUP BY grp, j
    ),
    folded AS (
      SELECT grp,
             CAST(COUNT(*) AS BIGINT) AS m_used,
             list_reduce(
               list(pow(2.0, -CAST(rho AS DOUBLE)) ORDER BY j),
               (a, b) -> a + b) AS s_present
      FROM regs GROUP BY grp
    ),
    est AS (
      SELECT grp, m_used,
             CAST({HLL_M} - m_used AS BIGINT) AS z,
             CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M}.0 * {HLL_M}.0
               / (s_present + CAST({HLL_M} - m_used AS DOUBLE)) AS e_raw
      FROM folded
    ),
    corrected AS (
      SELECT grp, z,
             CASE WHEN e_raw <= 2.5 * {HLL_M} AND z > 0
                  THEN {HLL_M}.0 * (CAST({HLL_LN_M!r} AS DOUBLE)
                        - CAST(([{ln_list}])[CAST(z AS INT) + 1] AS DOUBLE))
                  ELSE e_raw END AS estimate
      FROM est
    ),
    exact AS (
      SELECT o_orderstatus AS grp,
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
      FROM orders GROUP BY o_orderstatus
    )
    SELECT c.grp, z, estimate, exact_distinct,
           (estimate - CAST(exact_distinct AS DOUBLE))
             / CAST(exact_distinct AS DOUBLE) AS rel_err
    FROM corrected c JOIN exact ON exact.grp = c.grp
    """


@query("agg_hll_deterministic", _hll_sql())
def agg_hll_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count (Flajolet-Fuchs-Gandouet-Meunier
    2007, public literature) with a FULL HASH ORACLE — the
    demonstration that even the classic "approximate" sketch is a
    deterministic function once its degrees of freedom are pinned
    (the registry's rows-only sketch keys are rows-only because their
    engines' internal hashes differ, not because sketching is
    inherently unhashable): md5 supplies the 64 hashed bits (8 index
    + 52 rank bits), registers are exact integer maxima, the harmonic
    denominator folds the ORDERED register list (256 dyadic terms —
    identical IEEE sequence both engines), and the small-range
    linear-counting correction m·ln(m/z) reads ln(z) from a literal
    256-entry table computed once at import — no libm at query time.
    The output carries the exact distinct count and relative error
    alongside, so the oracle hash simultaneously pins the ESTIMATE
    and documents its accuracy (pytest bounds |rel_err| by the
    1.04/√m ≈ 6.5% theory band ×3).

    Plan/scale: one map-side hash projection, one (grp, register)
    aggregate bounded by |groups|×256 rows, then 256-element folds —
    the exchange carries registers, never values; merge across
    shards/batches is register-wise MAX (associative, order-free),
    the same algebra CH's uniqCombined state relies on. The exact
    count rides along only for the self-documenting report."""
    ev = load_table(spark, sf_dir, "orders")
    h = F.md5(F.concat(F.col("o_custkey").cast("string"), F.lit(":hll")))
    rw = ev.select(
        F.col("o_orderstatus").alias("grp"),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint").alias("j"),
        F.conv(F.substring(h, 3, 13), 16, 10).cast("bigint").alias("w"),
    )
    regs = rw.groupBy("grp", "j").agg(
        F.max(
            F.when(F.col("w") == 0, F.lit(53)).otherwise(
                52 - F.length(F.bin("w")) + 1
            )
        )
        .cast("bigint")
        .alias("rho")
    )
    folded = regs.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("m_used"),
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct("j", "rho"))
            ),
            F.lit(0.0),
            lambda acc, s: acc
            + F.pow(F.lit(2.0), -s["rho"].cast("double")),
        ).alias("s_present"),
    )
    z = (F.lit(HLL_M) - F.col("m_used")).cast("bigint")
    e_raw = (
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M))
        * F.lit(float(HLL_M))
        / (F.col("s_present") + z.cast("double"))
    )
    ln_arr = F.array(*[F.lit(x) for x in HLL_LN])
    estimate = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (z > 0),
        F.lit(float(HLL_M))
        * (F.lit(HLL_LN_M) - F.element_at(ln_arr, z.cast("int") + 1)),
    ).otherwise(e_raw)
    est = folded.select("grp", z.alias("z"), estimate.alias("estimate"))
    exact = ev.groupBy(F.col("o_orderstatus").alias("grp")).agg(
        F.count_distinct("o_custkey").cast("bigint").alias("exact_distinct")
    )
    return est.join(exact, "grp").select(
        "grp",
        "z",
        "estimate",
        "exact_distinct",
        (
            (F.col("estimate") - F.col("exact_distinct").cast("double"))
            / F.col("exact_distinct").cast("double")
        ).alias("rel_err"),
    )
