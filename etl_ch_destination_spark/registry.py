"""Query/oracle registry feeding the driver contract in __spark_entry__.py.

Each operator from SURVEY.md §2 registers exactly one ``queries()`` key
here, plus (when DuckDB can express it) the equivalent ANSI SQL oracle.

Determinism policy for hash-matched oracles (SURVEY §4.2):
- money arithmetic in exact DECIMAL in BOTH engines, final cast to
  DOUBLE → order-insensitive bit-identical sums;
- aggregate/computed columns aliased identically on both sides;
- session timezone UTC; naive timestamps end-to-end;
- no bare ``dropDuplicates`` after ``orderBy`` — always window forms.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a SURVEY §2 operator under its contract key.

    ``oracle`` is DuckDB SQL over the pre-registered fixture views;
    omit it for non-SQL-expressible ops (driver then does a rows-only
    check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    import etl_ch_destination_spark.queries  # noqa: F401  (registers on import)

    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    import etl_ch_destination_spark.queries  # noqa: F401

    return dict(ORACLES)
