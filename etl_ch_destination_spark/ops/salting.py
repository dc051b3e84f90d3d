"""Skew-resistant salted join (SURVEY §2.3 `join_skew_salted`).

At 100 TB a handful of hot join keys can pin a whole stage on one
task. First line of defense is AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py), which
needs no code. This module is the MANUAL fallback for known-hot key
spaces or for engines/joins AQE doesn't cover:

- the probe (fact) side gets a salt in ``[0, n)`` derived by hashing a
  set of high-cardinality columns — NOT the join key (hashing the key
  would put every copy of a hot key in the same salt bucket, defeating
  the purpose) and NOT ``rand()`` (partition-replay nondeterminism);
- the build (dim) side is exploded n ways, one copy per salt;
- the equi-join runs on (key, salt), spreading each hot key over n
  tasks; the result is row-identical to the unsalted join because
  every (key, salt) pair exists on the build side.

Cost: build side × n shuffle volume — use for small-to-medium build
sides, and prefer plain ``F.broadcast`` when the dim fits in memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_cols: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``fact_key == dim_key``, salted ``n_salts`` ways.

    ``salt_cols``: high-cardinality fact columns whose hash spreads the
    salt (e.g. the fact table's primary key). Result is identical to
    the plain join; both key columns are kept (mirroring df.join with
    an expression condition).
    """
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts)).cast("int")
    )
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = fact_s.join(
        dim_s, (fact_s[fact_key] == dim_s[dim_key]) & (fact_s["__salt"] == dim_s["__salt"]), how
    )
    return joined.drop("__salt")
