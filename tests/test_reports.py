"""Composed-report suite (SURVEY §2.12): plan shapes + business
invariants for the TPC-H-shaped reports in queries/reports.py.

The fleet audit (test_plan_audit.py) already guarantees no report
plans a cartesian or a shuffle explosion; these tests pin the
*positive* properties — the broadcasts and top-k operators the
docstrings promise actually fire, and the numbers mean what the
report says they mean."""

from __future__ import annotations

from conftest import plan_of


def test_shipping_priority_take_ordered_and_broadcast(spark, sf_dir):
    from etl_ch_destination_spark.queries.reports import rpt_shipping_priority

    df = rpt_shipping_priority(spark, sf_dir)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan  # top-10, O(k) driver memory
    assert "BroadcastHashJoin" in plan  # segment-filtered customer dim
    rows = df.collect()
    assert len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_returned_items_take_ordered(spark, sf_dir):
    from etl_ch_destination_spark.queries.reports import rpt_returned_items

    plan = plan_of(rpt_returned_items(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_revenue_forecast_pushes_all_predicates(spark, sf_dir):
    """Q6 shape is the scan-efficiency benchmark: every predicate must
    reach the parquet scan and only 4 columns may be read."""
    from etl_ch_destination_spark.queries.reports import rpt_revenue_forecast

    plan = plan_of(rpt_revenue_forecast(spark, sf_dir))
    pushed = " ".join(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "l_shipdate" in pushed and "l_quantity" in pushed and "l_discount" in pushed
    schema = " ".join(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_extendedprice" in schema
    assert "l_orderkey" not in schema  # unreferenced columns pruned


def test_local_supplier_volume_broadcasts_all_dims(spark, sf_dir):
    """Q5 shape: 6-table star must resolve with ONE fact-fact shuffle
    join; supplier/nation/region/customer all ride broadcasts."""
    from etl_ch_destination_spark.queries.reports import rpt_local_supplier_volume

    plan = plan_of(rpt_local_supplier_volume(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3
    df = rpt_local_supplier_volume(spark, sf_dir)
    # co-location predicate: every surviving nation is in ASIA
    assert df.count() <= 5  # at most the 5 nations of one region


def test_large_volume_orders_threshold_holds(spark, sf_dir):
    from etl_ch_destination_spark.queries.reports import rpt_large_volume_orders

    rows = rpt_large_volume_orders(spark, sf_dir).collect()
    assert all(r.sum_qty > 300 for r in rows)


def test_customer_order_distribution_keeps_zero_customers(spark, sf_dir):
    """The LEFT join is the point of Q13: customers without a matching
    order must appear in the c_count=0 bucket, and total customers must
    be conserved across the histogram."""
    from pyspark.sql import functions as F

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.reports import rpt_customer_order_distribution

    dist = rpt_customer_order_distribution(spark, sf_dir)
    total = dist.agg(F.sum("custdist")).collect()[0][0]
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert total == n_cust


def test_top_supplier_returns_all_maxima(spark, sf_dir):
    from etl_ch_destination_spark.queries.reports import rpt_top_supplier

    rows = rpt_top_supplier(spark, sf_dir).collect()
    assert rows, "quarter has revenue"
    assert len({r.total_revenue for r in rows}) == 1  # all tied at max


def test_market_share_bounded(spark, sf_dir):
    from etl_ch_destination_spark.queries.reports import rpt_market_share

    for r in rpt_market_share(spark, sf_dir).collect():
        assert 0.0 <= r.mkt_share <= 1.0


def test_promo_share_bounded(spark, sf_dir):
    from etl_ch_destination_spark.queries.reports import rpt_promo_revenue_share

    rows = rpt_promo_revenue_share(spark, sf_dir).collect()
    assert len(rows) == 1
    assert 0.0 <= rows[0].promo_revenue_pct <= 100.0


def test_order_priority_check_semi_join(spark, sf_dir):
    """Existence check plans as a semi join — lineitem payload columns
    must not survive past it."""
    from etl_ch_destination_spark.queries.reports import rpt_order_priority_check

    plan = plan_of(rpt_order_priority_check(spark, sf_dir))
    assert "LeftSemi" in plan or "left_semi" in plan.lower()


def test_idle_customers_anti_join_and_threshold(spark, sf_dir):
    """Every reported nation bucket only counts above-average balances;
    the plan uses LEFT ANTI for the dormancy check."""
    from etl_ch_destination_spark.queries.reports import rpt_idle_customers

    plan = plan_of(rpt_idle_customers(spark, sf_dir))
    assert "LeftAnti" in plan or "left_anti" in plan.lower()
