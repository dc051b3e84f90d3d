"""SURVEY §2.7 — set operations (CH UNION ALL/DISTINCT, INTERSECT, EXCEPT).

Scale notes: UNION ALL is a zero-shuffle concatenation of scans;
DISTINCT/INTERSECT/EXCEPT each shuffle once on the full row. Column
resolution is by NAME (unionByName), never by position — positional
union is a classic silent-corruption bug in ETL pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.registry import query


def _cust_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
    )


def _supp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "set_union_all",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union, no dedup exchange) of two conformed projections."""
    return _cust_nations(spark, sf_dir).unionByName(_supp_nations(spark, sf_dir))


@query(
    "set_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT: bag union + one dedup exchange on the full row."""
    return (
        _cust_nations(spark, sf_dir)
        .unionByName(_supp_nations(spark, sf_dir))
        .distinct()
    )


@query(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): rows present in both inputs."""
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@query(
    "set_except",
    """
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers that never ordered (non-empty in TPC-H-shaped data)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey")
    )
    ordered = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    return cust.subtract(ordered)


@query(
    "set_bag_ops",
    """
    WITH a AS (
        SELECT l_suppkey AS k, l_linenumber % 3 AS tag
        FROM lineitem WHERE l_returnflag = 'R'
    ),
    b AS (
        SELECT l_suppkey AS k, l_linenumber % 3 AS tag
        FROM lineitem WHERE l_linestatus = 'F'
    )
    SELECT 'intersect_all' AS op, k, tag FROM (
        SELECT k, tag FROM a INTERSECT ALL SELECT k, tag FROM b
    )
    UNION ALL
    SELECT 'except_all' AS op, k, tag FROM (
        SELECT k, tag FROM a EXCEPT ALL SELECT k, tag FROM b
    )
    """,
)
def set_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — the BAG-semantics set operations
    (each row kept min(m, n) / max(m - n, 0) times), which the
    distinct-flavored set_intersect/set_except keys deliberately do
    not cover. Spark's intersectAll/exceptAll implement the multiset
    algebra directly (a count-aggregate + generate under the hood —
    no row-pairing join), matching SQL INTERSECT ALL/EXCEPT ALL.

    Plan: each branch is one hash shuffle on the full row (the same
    budget as DISTINCT); the duplicate multiplicities never explode
    because replication is bounded by the input's own counts. Scales
    exactly like the distinct forms at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("k"), (F.col("l_linenumber") % 3).alias("tag")
    )
    b = li.filter(F.col("l_linestatus") == "F").select(
        F.col("l_suppkey").alias("k"), (F.col("l_linenumber") % 3).alias("tag")
    )
    inter = a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "k", "tag")
    exc = a.exceptAll(b).select(F.lit("except_all").alias("op"), "k", "tag")
    return inter.unionAll(exc)


@query(
    "set_union_by_name",
    """
    WITH u AS (
      SELECT o_orderkey, o_custkey, o_totalprice, NULL AS o_orderpriority
      FROM orders WHERE o_orderstatus = 'O'
      UNION ALL BY NAME
      SELECT o_orderkey, o_orderpriority, NULL AS o_custkey
      FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT o_orderkey,
           o_custkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           o_orderpriority
    FROM u
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligned union — ``unionByName(allowMissingColumns=True)``
    (DuckDB: ``UNION ALL BY NAME``): two projections with DIFFERENT
    column sets union by column NAME, absent columns null-filled —
    the schema-evolution-tolerant append every multi-source ingest
    needs (positional UNION would silently misalign). One side carries
    (custkey, totalprice), the other (orderpriority); each column
    survives with nulls where its source lacked it.

    Zero-shuffle: both branches are map-side projections and the union
    is a partition concatenation — free at any scale."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("double")
    )
    b = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderpriority"
    )
    return a.unionByName(b, allowMissingColumns=True).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
