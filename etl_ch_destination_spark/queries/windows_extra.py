"""SURVEY §2.5 extension — positional window value functions
(`nth_value`, `first_value`/`last_value` with IGNORE NULLS), the CH
`nth_value` / `first_value`/`last_value` (RESPECT|IGNORE NULLS)
surface not yet covered by win_first_last / win_ranking.

Determinism: frame is ROWS-bounded over a total order
(o_orderdate, o_orderkey) so every positional lookup is unique;
the NULL-injection is keyed (o_orderkey % 5) so both engines null the
same rows.

Scale notes: one shuffle on o_custkey, streaming frame evaluation —
the standard partitioned-window cost envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.registry import query


@query(
    "win_nth_value",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           first_value(CASE WHEN o_orderkey % 5 = 0 THEN NULL
                            ELSE o_totalprice END IGNORE NULLS) OVER w AS first_nn,
           last_value(CASE WHEN o_orderkey % 5 = 0 THEN NULL
                           ELSE o_totalprice END IGNORE NULLS) OVER w AS last_nn
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value + IGNORE NULLS first/last over each customer's order
    history in date order: "the customer's 2nd-ever order value as of
    each row" and "the latest non-null value so far" (the gap-filling
    idiom behind CH's `last_value RESPECT/IGNORE NULLS` and Spark's
    `F.last(ignorenulls=True)`)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nullable = F.when(F.col("o_orderkey") % 5 == 0, F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.first(nullable, ignorenulls=True).over(w).alias("first_nn"),
        F.last(nullable, ignorenulls=True).over(w).alias("last_nn"),
    )
