"""SQL entry point (SURVEY §3.2): the fixture views registered by
catalog.register_views make each operator reachable via spark.sql too.

For keys whose DuckDB oracle is plain ANSI (no list_*/::-cast
dialect), the very same SQL string must run on Spark SQL and produce
the DataFrame-form result — parser → analyzer → identical Catalyst
pipeline from there."""

from __future__ import annotations

import math
from decimal import Decimal

import pytest

from etl_ch_destination_spark.catalog import register_views
from etl_ch_destination_spark.registry import all_oracles, all_queries

# Oracles that are pure ANSI: both DuckDB and Spark SQL parse them.
ANSI_PORTABLE_KEYS = [
    "agg_having",
    "agg_count_distinct",
    "agg_retention",
    "agg_sequence_match",
    "agg_window_funnel",
    "join_inner_equi",
    "join_semi",
    "join_anti",
    "set_union_all",
    "set_intersect",
    "filter_compare",
    "topk_global",
    "rpt_shipping_priority",
    "rpt_revenue_forecast",
    "rpt_local_supplier_volume",
    "rpt_returned_items",
    "rpt_order_priority_check",
]


def _canon(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 9)
    return v


def _rows(df, cols):
    return sorted(tuple(_canon(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("key", ANSI_PORTABLE_KEYS)
def test_oracle_sql_runs_on_spark_and_matches_dataframe_form(spark, sf_dir, key):
    register_views(spark, sf_dir)
    df_form = all_queries()[key](spark, sf_dir)
    sql_form = spark.sql(all_oracles()[key])
    cols = sorted(df_form.columns)
    assert sorted(sql_form.columns) == cols
    assert _rows(sql_form, cols) == _rows(df_form, cols), key
