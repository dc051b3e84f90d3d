"""Supply-chain report shapes (SURVEY §2.12 part 2): plan and
invariant gates for queries/reports_supply.py. The fleet audit covers
cartesian/shuffle regressions; these pin the positive shapes."""

from __future__ import annotations

from conftest import plan_of


def test_min_cost_supplier_keeps_all_minima(spark, sf_dir):
    from etl_ch_destination_spark.queries.reports_supply import rpt_min_cost_supplier

    rows = rpt_min_cost_supplier(spark, sf_dir).collect()
    best = {}
    for r in rows:
        best.setdefault(r.p_partkey, set()).add(r.best_price)
    # per part there is exactly ONE winning price (ties share it)
    assert all(len(v) == 1 for v in best.values())


def test_nation_inventory_value_threshold(spark, sf_dir):
    """Every reported nation holds >4% of the total — and the total is
    computed from the same cached frame, not recomputed."""
    from pyspark.sql import functions as F

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.reports_supply import rpt_nation_inventory_value

    df = rpt_nation_inventory_value(spark, sf_dir)
    rows = df.collect()
    li = load_table(spark, sf_dir, "lineitem")
    total = (
        li.agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_quantity").cast("decimal(12,2)")
            ).cast("double")
        ).collect()[0][0]
    )
    assert all(r.value > total * 0.04 for r in rows)


def test_shipping_delay_classes_partition_rows(spark, sf_dir):
    """The three buckets partition the joined rows exactly."""
    from pyspark.sql import functions as F

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.reports_supply import rpt_shipping_delay_classes

    df = rpt_shipping_delay_classes(spark, sf_dir)
    total = df.agg(F.sum(F.col("high_line_count") + F.col("low_line_count"))).collect()[0][0]
    n_li = load_table(spark, sf_dir, "lineitem").count()
    assert total == n_li  # every lineitem has an order parent


def test_excess_shipments_semi_join(spark, sf_dir):
    from etl_ch_destination_spark.queries.reports_supply import rpt_excess_shipments

    plan = plan_of(rpt_excess_shipments(spark, sf_dir))
    assert "LeftSemi" in plan


def test_waiting_orders_semi_and_anti(spark, sf_dir):
    from etl_ch_destination_spark.queries.reports_supply import rpt_waiting_orders

    plan = plan_of(rpt_waiting_orders(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_supplier_part_counts_anti_exclusion(spark, sf_dir):
    from etl_ch_destination_spark.queries.reports_supply import rpt_supplier_part_counts

    plan = plan_of(rpt_supplier_part_counts(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
