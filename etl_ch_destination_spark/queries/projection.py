"""SURVEY §2.2 — projection, filters, predicates, dedup.

The ETL column-mapping surface of a ClickHouse destination: rename,
cast (failure-safe), derive, predicate filtering, conditional
projection, null plumbing, DISTINCT, and ReplacingMergeTree-FINAL
dedup. All pure narrow transformations except the dedups (one
shuffle); every filter/projection here is pushed into the parquet
scan by Catalyst (verified via .explain in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.ops.dedup import dedup_exact, latest_by_key
from etl_ch_destination_spark.queries._util import money, one, rate
from etl_ch_destination_spark.registry import query


@query(
    "project_rename",
    """
    SELECT o_orderkey AS order_key, o_custkey AS customer_key,
           o_orderstatus AS status
    FROM orders
    """,
)
def project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection + rename — the minimal SELECT ... AS surface; pruned scan reads only the three projected columns."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("customer_key"),
        F.col("o_orderstatus").alias("status"),
    )


@query(
    "cast_types",
    """
    SELECT o_orderkey,
           CAST(o_orderkey % 1000 AS INTEGER) AS key_mod,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS priority_num,
           TRY_CAST(o_orderstatus AS INTEGER) AS status_as_int,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_2dp
    FROM orders
    """,
)
def cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source→destination type mapping incl. failure-safe TRY_CAST
    (ClickHouse ``toInt32OrNull`` analog) — the core of a destination
    connector's schema normalization (SURVEY §1.2)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderkey") % 1000).cast("int").alias("key_mod"),
        F.substring("o_orderpriority", 1, 1).try_cast("int").alias("priority_num"),
        F.col("o_orderstatus").try_cast("int").alias("status_as_int"),
        money("o_totalprice").cast("double").alias("price_2dp"),
    )


@query(
    "derive_column",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS net,
           CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS qty_value
    FROM lineitem
    """,
)
def derive_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns from arithmetic over existing ones (ClickHouse SELECT expression surface), all JVM-side codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (money("l_extendedprice") * (one() - rate("l_discount")))
        .cast("double")
        .alias("net"),
        (money("l_quantity") * money("l_extendedprice")).cast("double").alias("qty_value"),
    )


@query(
    "filter_compare",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < 24 AND l_extendedprice >= 1000 AND l_linenumber != 7",
)
def filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive comparison predicates (<, >=, =) pushed to the parquet scan as PushedFilters."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 24)
        & (F.col("l_extendedprice") >= 1000)
        & (F.col("l_linenumber") != 7)
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "filter_between_in",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
      AND l_returnflag IN ('A', 'R')
    """,
)
def filter_between_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN range + IN-list predicates, both pushdown-eligible scan filters."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("1996-01-01 00:00:00", "1996-12-31 00:00:00")
        & F.col("l_returnflag").isin("A", "R")
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")


@query(
    "filter_like_regex",
    """
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE 'PROMO%' OR regexp_matches(p_name, 'gr.en')
    """,
)
def filter_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``LIKE`` / ``match``; POSIX-safe pattern so Java and RE2-style
    engines agree (SURVEY §2.2 dialect note)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("PROMO%") | F.col("p_name").rlike("gr.en")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "filter_null_logic",
    """
    SELECT o_orderkey, status_or_null FROM (
      SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_or_null, o_totalprice
      FROM orders
    ) WHERE (status_or_null IS NULL AND o_totalprice > 100000)
         OR (status_or_null IS NOT NULL AND NOT (o_totalprice > 150000))
    """,
)
def filter_null_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic over a derived nullable column."""
    o = load_table(spark, sf_dir, "orders")
    withn = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        "o_totalprice",
    )
    return withn.filter(
        (F.col("status_or_null").isNull() & (F.col("o_totalprice") > 100000))
        | (F.col("status_or_null").isNotNull() & ~(F.col("o_totalprice") > 150000))
    ).select("o_orderkey", "status_or_null")


@query(
    "case_when",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'large'
                WHEN o_totalprice >= 50000 THEN 'medium'
                ELSE 'small' END AS size_class,
           CASE o_orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open' ELSE 'other' END AS status_name
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``multiIf`` / ``transform``."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_name"),
    )


@query(
    "null_funcs",
    """
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_filled,
           IFNULL(NULLIF(o_orderpriority, '5-LOW'), 'LOWEST') AS prio_filled,
           NULLIF(o_orderstatus, 'P') AS status_no_p
    FROM orders
    """,
)
def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar surface: coalesce / nullif / nvl2-shaped CASE over nullable columns."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_filled"
        ),
        F.nvl(F.nullif("o_orderpriority", F.lit("5-LOW")), F.lit("LOWEST")).alias(
            "prio_filled"
        ),
        F.nullif("o_orderstatus", F.lit("P")).alias("status_no_p"),
    )


@query(
    "distinct_rows",
    "SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate FROM lineitem",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT over a projected column set (hash-aggregate exchange on the projected key)."""
    li = load_table(spark, sf_dir, "lineitem")
    return dedup_exact(li.select("l_returnflag", "l_linestatus", "l_shipdate"))


@query(
    "dedup_by_key_latest",
    """
    SELECT event_id, user_id, ts, event_type
    FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def dedup_by_key_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ReplacingMergeTree/FINAL: latest event per user, version = ts,
    tiebreak = event_id → fully deterministic (ops/dedup.py)."""
    e = load_table(spark, sf_dir, "events")
    return latest_by_key(
        e, ["user_id"], [F.desc("ts"), F.desc("event_id")]
    ).select("event_id", "user_id", "ts", "event_type")
