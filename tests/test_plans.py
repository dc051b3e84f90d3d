"""Plan-shape assertions (SURVEY §5.3 layer 1): the optimizations the
engine relies on must actually fire — a correct result with the wrong
plan is a 100 TB failure waiting."""

from __future__ import annotations

from conftest import plan_of


def test_broadcast_dim_uses_broadcast_hash_join(spark, sf_dir):
    from etl_ch_destination_spark.queries.joins import join_broadcast_dim

    plan = plan_of(join_broadcast_dim(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_topk_global_plans_take_ordered(spark, sf_dir):
    from etl_ch_destination_spark.queries.sorts import topk_global

    plan = plan_of(topk_global(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_limit_by_plans_window_group_limit(spark, sf_dir):
    from etl_ch_destination_spark.queries.windows import limit_by

    plan = plan_of(limit_by(spark, sf_dir))
    assert "WindowGroupLimit" in plan


def test_scan_parquet_prunes_columns(spark, sf_dir):
    from etl_ch_destination_spark.queries.sources_sinks import scan_parquet

    plan = plan_of(scan_parquet(spark, sf_dir))
    read_schema_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema_lines, plan
    schema = " ".join(read_schema_lines)
    assert "l_quantity" in schema
    # unreferenced wide columns must NOT reach the parquet scan
    assert "l_extendedprice" not in schema
    assert "l_comment" not in schema


def test_filter_pushes_down_to_scan(spark, sf_dir):
    from etl_ch_destination_spark.queries.projection import filter_compare

    plan = plan_of(filter_compare(spark, sf_dir))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, plan
    assert "LessThan" in " ".join(pushed)


def test_flagship_aggregate_is_partial_then_final(spark, sf_dir):
    """The Q1-shape agg must show two-phase hash aggregation (map-side
    partial combine before the exchange — CH-style two-phase agg)."""
    from etl_ch_destination_spark.queries.aggregations import flagship_pricing_summary

    plan = plan_of(flagship_pricing_summary(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_no_cartesian_in_theta_range_join(spark, sf_dir):
    """The range join keeps its equi prefix: hash/sort-merge join, never
    BroadcastNestedLoop/Cartesian over the fact side."""
    from etl_ch_destination_spark.queries.joins import join_theta_range

    plan = plan_of(join_theta_range(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_proportions(spark, sf_dir):
    """sampleBy must honor per-stratum fractions (within a loose
    binomial band) and never emit a stratum it wasn't given."""
    from pyspark.sql import functions as F

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.sorts import sample_stratified

    base = {
        r["c_mktsegment"]: r["n"]
        for r in load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {
        r["c_mktsegment"]: r["n"]
        for r in sample_stratified(spark, sf_dir)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    fractions = {
        "BUILDING": 0.2,
        "AUTOMOBILE": 0.5,
        "MACHINERY": 0.5,
        "HOUSEHOLD": 0.8,
        "FURNITURE": 1.0,
    }
    assert set(got) <= set(fractions)
    for seg, p in fractions.items():
        n = base.get(seg, 0)
        if n == 0:
            continue
        k = got.get(seg, 0)
        sigma = (n * p * (1 - p)) ** 0.5
        assert abs(k - n * p) <= max(5 * sigma, 5), (seg, k, n, p)


def test_repetition_filter_is_zero_shuffle(spark, sf_dir):
    """The round-4 sorted-run-fold rewrite must stay shuffle-free: the
    whole operator is one map-side projection over the scan (the
    first-draft explode→groupBy→join plan would show 2+ Exchanges)."""
    from etl_ch_destination_spark.queries.llm_text import llm_repetition_filter

    plan = plan_of(llm_repetition_filter(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_chunk_overlap_is_zero_shuffle(spark, sf_dir):
    """Chunking is explode+slice over one split array — map-side only;
    the fan-out must not introduce an exchange."""
    from etl_ch_destination_spark.queries.llm_text import llm_chunk_overlap

    plan = plan_of(llm_chunk_overlap(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode is the plan's one fan-out
