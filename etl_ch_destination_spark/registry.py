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


def promote(keys: list[str]) -> None:
    """Reorder the registry so ``keys`` come first, in the given order.

    The driver's correctness harness samples the FIRST 50 keys of
    ``queries()`` each round; rounds rotate never-driver-sampled keys
    into that window. Before this existed the window was controlled by
    module import order in ``queries/__init__``, which is whole-module
    granularity — this makes the rotation an explicit, testable key
    list instead. Keys not listed keep their registration order after
    the promoted block.
    """
    missing = [k for k in keys if k not in QUERIES]
    if missing:
        raise KeyError(f"promote() of unregistered keys: {missing}")
    if len(set(keys)) != len(keys):
        raise ValueError("promote() list contains duplicates")
    promoted = set(keys)
    rest = [k for k in QUERIES if k not in promoted]
    reordered = {k: QUERIES[k] for k in [*keys, *rest]}
    QUERIES.clear()
    QUERIES.update(reordered)


def all_queries() -> dict[str, QueryFn]:
    import etl_ch_destination_spark.queries  # noqa: F401  (registers on import)

    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    import etl_ch_destination_spark.queries  # noqa: F401

    return dict(ORACLES)
