"""Aggregation behaviors the oracle can't hash-check (SURVEY §5.3):
native array collects, any_value domain membership, argMax tie
uniqueness, approximate-aggregate tolerances."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_collect_list_native_arrays(spark, sf_dir):
    """The hashed query serializes arrays; the native array form must
    itself be correct."""
    from etl_ch_destination_spark.catalog import load_table

    n = load_table(spark, sf_dir, "nation")
    got = {
        r["n_regionkey"]: r["nations"]
        for r in n.groupBy("n_regionkey")
        .agg(F.array_sort(F.collect_list("n_name")).alias("nations"))
        .collect()
    }
    expected: dict[int, list[str]] = {}
    for r in n.collect():
        expected.setdefault(r["n_regionkey"], []).append(r["n_name"])
    assert got == {k: sorted(v) for k, v in expected.items()}


def test_any_value_is_member_of_group(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table

    c = load_table(spark, sf_dir, "customer")
    rows = c.groupBy("c_mktsegment").agg(F.any_value("c_name").alias("any_name")).collect()
    names_by_seg = {}
    for r in c.collect():
        names_by_seg.setdefault(r["c_mktsegment"], set()).add(r["c_name"])
    for r in rows:
        assert r["any_name"] in names_by_seg[r["c_mktsegment"]]


def test_argmax_ties_are_unique_in_fixture(spark, sf_dir):
    """agg_argmax's determinism rests on o_totalprice being unique per
    customer (aggregations.py docstring) — assert that holds."""
    from etl_ch_destination_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    dup = (
        o.groupBy("o_custkey", "o_totalprice")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0


def test_approx_count_distinct_tolerance(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", 0.05)).first()[0]
    assert abs(approx - exact) <= 0.05 * exact + 2


def test_percentile_approx_tolerance(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.expr("percentile(l_extendedprice, 0.5)")).first()[0]
    approx = li.select(F.percentile_approx("l_extendedprice", 0.5, 10_000)).first()[0]
    assert abs(approx - exact) / exact < 0.01


def test_var_stddev_corr_tolerance(spark, sf_dir):
    """Native var_samp/stddev/corr vs Python-computed references
    (the hashed query uses the exact-decimal sums-of-squares form)."""
    from etl_ch_destination_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    vals = [(r["l_quantity"], r["l_extendedprice"]) for r in
            li.select("l_quantity", "l_extendedprice").collect()]
    q = [v[0] for v in vals]
    n = len(q)
    mean = sum(q) / n
    var_ref = sum((x - mean) ** 2 for x in q) / (n - 1)
    got = li.select(
        F.var_samp("l_quantity"), F.stddev_samp("l_quantity"),
        F.corr("l_quantity", "l_extendedprice"),
    ).first()
    assert math.isclose(got[0], var_ref, rel_tol=1e-6)
    assert math.isclose(got[1], math.sqrt(var_ref), rel_tol=1e-6)
    assert -1.0 <= got[2] <= 1.0


def test_sample_fraction_seed_stable(spark, sf_dir):
    """sample(seed=42) must return the identical row set across runs
    with identical partitioning (sorts.py docstring claim)."""
    from etl_ch_destination_spark.queries.sorts import sample_fraction

    a = sorted(r["l_orderkey"] for r in sample_fraction(spark, sf_dir).collect())
    b = sorted(r["l_orderkey"] for r in sample_fraction(spark, sf_dir).collect())
    assert a == b and len(a) > 0


def test_state_merge_equals_direct_aggregation(spark, sf_dir):
    """The -State/-Merge two-level path must be indistinguishable from
    the direct one-pass aggregate (exact decimal sums make this an
    equality, not a tolerance)."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries._util import dsum, money
    from etl_ch_destination_spark.queries.aggregations import agg_state_merge

    merged = {
        r["l_returnflag"]: (r["n"], r["sum_qty"], r["min_ship"], r["max_ship"], r["avg_qty"])
        for r in agg_state_merge(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        r["l_returnflag"]: (
            r["n"],
            r["sum_qty"],
            r["min_ship"],
            r["max_ship"],
            r["sum_qty"] / r["n"],
        )
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(money("l_quantity"), "sum_qty"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
        )
        .collect()
    }
    assert merged == direct


def test_sketch_state_estimate_within_tolerance_and_merges_from_disk(
    spark, sf_dir, tmp_path
):
    """agg_sketch_state gates: (a) HLL estimate within 5% of exact
    per-group distinct counts; (b) sketch partials survive a parquet
    persist→reload→merge round-trip with the identical estimate —
    the property that makes the state MERGEABLE (CH uniqState)."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations import agg_sketch_state

    est = {r["event_type"]: r["approx_users"]
           for r in agg_sketch_state(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type")
                       .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(1, 0.05 * n), (k, est[k], n)

    partials = (
        ev.withColumn("__shard", F.to_date("ts"))
        .groupBy("event_type", "__shard")
        .agg(F.hll_sketch_agg("user_id").alias("__sketch"))
    )
    path = str(tmp_path / "sketch_partials")
    partials.write.mode("overwrite").parquet(path)  # binary state column
    merged_from_disk = {
        r["event_type"]: r["approx_users"]
        for r in spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("__sketch")).alias("approx_users"))
        .collect()
    }
    assert merged_from_disk == est


def test_quantile_state_within_half_bin_of_exact(spark, sf_dir):
    """agg_quantile_state accuracy gate: each estimate within half a
    bin width of the exact quantile (the histogram estimator's bound),
    and the shard-merged histogram equals the direct one-pass one."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations import (
        QSTATE_WIDTH,
        agg_quantile_state,
    )

    est = {r["l_returnflag"]: r for r in agg_quantile_state(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    # nearest-rank order statistic x_(ceil(q*n)) — the value whose bin
    # the estimator is guaranteed to land in (interpolated percentile
    # can sit between sparse tail order stats, outside any one bin)
    vals = {
        r["l_returnflag"]: r["v"]
        for r in li.groupBy("l_returnflag")
        .agg(F.sort_array(F.collect_list("l_extendedprice")).alias("v"))
        .collect()
    }
    assert set(est) == set(vals)
    for k, v in vals.items():
        import math

        for q, p in [(0.50, "p50"), (0.90, "p90"), (0.99, "p99")]:
            idx = min(len(v) - 1, max(0, math.ceil(q * len(v)) - 1))
            nearest_rank = v[idx]
            assert abs(est[k][f"{p}_est"] - nearest_rank) <= QSTATE_WIDTH / 2, (
                k, p, est[k][f"{p}_est"], nearest_rank,
            )


def test_quantile_kll_rank_error_and_merges_from_disk(spark, sf_dir, tmp_path):
    """agg_quantile_kll gates: (a) each estimated quantile's TRUE rank
    in the exact sorted data is within the k=200 KLL sketch's ±2.5%
    normalized rank error of the target rank; (b) n is exact; (c)
    sketch partials survive a parquet persist → reload → merge with the
    same accuracy guarantee (the CH quantileState/quantileMerge
    materialized-view idiom)."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations import (
        KLL_K,
        agg_quantile_kll,
    )

    rep = {r.l_returnflag: r for r in agg_quantile_kll(spark, sf_dir).collect()}

    li = load_table(spark, sf_dir, "lineitem")
    pdf = li.select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("p")
    ).toPandas()

    def check(flag_rows):
        for flag, r in flag_rows.items():
            vals = sorted(pdf[pdf["l_returnflag"] == flag]["p"])
            assert r.n == len(vals)
            for target, est in ((0.5, r.q50), (0.9, r.q90), (0.99, r.q99)):
                true_rank = sum(v <= est for v in vals) / len(vals)
                assert abs(true_rank - target) <= 0.025, (flag, target, true_rank)

    check(rep)

    # partials → parquet → reload → merge must hold the same bound
    price = F.col("l_extendedprice").cast("double")
    partials = (
        li.withColumn("__shard", F.col("l_orderkey") % 8)
        .groupBy("l_returnflag", "__shard")
        .agg(F.kll_sketch_agg_double(price, F.lit(KLL_K)).alias("__sk"))
    )
    path = str(tmp_path / "kll_partials")
    partials.write.mode("overwrite").parquet(path)
    merged = (
        spark.read.parquet(path)
        .groupBy("l_returnflag")
        .agg(F.kll_merge_agg_double("__sk", F.lit(KLL_K)).alias("__sk"))
        .select(
            "l_returnflag",
            F.kll_sketch_get_n_double("__sk").cast("bigint").alias("n"),
            F.kll_sketch_get_quantile_double("__sk", F.lit(0.5)).alias("q50"),
            F.kll_sketch_get_quantile_double("__sk", F.lit(0.9)).alias("q90"),
            F.kll_sketch_get_quantile_double("__sk", F.lit(0.99)).alias("q99"),
        )
    )
    check({r.l_returnflag: r for r in merged.collect()})
