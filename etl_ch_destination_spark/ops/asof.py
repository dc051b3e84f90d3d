"""ASOF join — a headline ClickHouse join type (SURVEY §2.3 `join_asof`).

Semantics: for each left row, attach the LATEST right row whose
timestamp is <= the left row's timestamp, within the same key group
(ClickHouse ``ASOF JOIN ... ON l.k = r.k AND l.ts >= r.ts``); a
``direction="forward"`` mode attaches the EARLIEST right row with
ts >= left.ts instead, ``"nearest"`` picks whichever of the two is
closer in time (tie → backward, as pandas), and ``tolerance_seconds``
bounds the match horizon — the full pandas ``merge_asof`` surface
(equivalence asserted against pandas itself in tests/test_ops.py).

Spark has no native DataFrame asof join, so the engine implements the
sort-merge-shaped union idiom:

1. union left and right rows into one frame, tagging sides, carrying
   the right payload as a struct (null on left rows);
2. one window per key ordered by (ts, side) — side=0 (right) sorts
   before side=1 (left) at equal ts, giving the inclusive ``<=``;
3. ``last(payload, ignorenulls=True)`` over the unbounded-preceding
   frame picks each left row's latest right match;
4. keep only left rows, unpack the struct.

Scale (100 TB): exactly one shuffle of EACH side on the join keys and
a linear per-partition window scan — the same cost shape as a
sort-merge join, with no range-explosion. Never a cross/BNL join.
Skewed keys are split by AQE; the window itself streams, holding only
one struct of state per row.

Determinism: the right side must be unique per (keys, ts) — pre-dedup
with ``ops.dedup.latest_by_key`` otherwise — or ties make the winner
partition-order-dependent (same caveat ClickHouse resolves
arbitrarily).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts: str,
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    how: str = "left",
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    strict: bool = False,
) -> DataFrame:
    """ASOF-join ``right`` onto ``left`` (pandas ``merge_asof`` surface):
    per key group, ``direction="backward"`` attaches the LATEST right
    row with ``right.ts <= left.ts``; ``"forward"`` the EARLIEST right
    row with ``right.ts >= left.ts``. ``tolerance_seconds`` nulls the
    match when |left.ts − matched.ts| exceeds it (applied after
    matching, exactly like pandas). ``strict=True`` makes the bound
    EXCLUSIVE (``<`` / ``>`` — ClickHouse ASOF JOIN's strict
    comparators, pandas ``allow_exact_matches=False``): a same-
    timestamp right row no longer matches, which is the correct form
    whenever the right frame is a cause of the left one (a quote that
    must precede the trade, a feature snapshot that must not leak the
    label instant). Implemented as a sort-order flip on the tie-break
    — identical plan and cost, no timestamp arithmetic.

    Returns all left columns plus ``{prefix}{ts}`` (the matched right
    timestamp) and ``{prefix}{c}`` for each of ``right_cols``.
    ``how``: "left" keeps unmatched left rows (nulls), "inner" drops them.

    The forward direction is the same union+window scan run in
    descending time order — identical one-shuffle-per-side cost; the
    tolerance is a post-match null-out, never a range-join explosion.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: how must be 'left' or 'inner', got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    rts = right_ts or ts
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in set(keys) | {rts}
    ]

    payload = F.struct(
        F.col(rts).alias(f"{prefix}{ts}"), *[F.col(c).alias(f"{prefix}{c}") for c in rcols]
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("__asof_ts"),
        F.lit(0).alias("__asof_side"),
        payload.alias("__asof_rv"),
    )
    l = left.withColumn("__asof_ts", F.col(ts)).withColumn("__asof_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    # backward scans time ascending (last right seen = latest <= lts);
    # forward scans descending (last right seen = earliest >= lts).
    # Inclusive bound: side 0 (right) sorts before side 1 (left) at
    # equal ts, so the running `last` has already seen a same-ts right
    # row. Strict bound: flip the tie-break so left rows sort FIRST at
    # equal ts — the scan then matches only strictly-earlier (resp.
    # strictly-later) right rows. Same window, same single shuffle.
    def scan(dirn: str) -> F.Column:
        ts_order = F.asc("__asof_ts") if dirn == "backward" else F.desc("__asof_ts")
        side_order = F.desc("__asof_side") if strict else F.asc("__asof_side")
        w = (
            Window.partitionBy(*keys)
            .orderBy(ts_order, side_order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__asof_rv", ignorenulls=True).over(w)

    def gap_of(m: F.Column, dirn: str) -> F.Column:
        # exact µs gaps — cast-to-long truncates to whole seconds and
        # mis-classifies matches within 1s of the tolerance boundary
        mts = F.unix_micros(m.getField(f"{prefix}{ts}"))
        lts = F.unix_micros(F.col("__asof_ts"))
        return (lts - mts) if dirn == "backward" else (mts - lts)

    def bounded(m: F.Column, dirn: str) -> F.Column:
        if tolerance_seconds is None:
            return m
        return F.when(gap_of(m, dirn) <= F.lit(tolerance_seconds * 1_000_000), m)

    if direction == "nearest":
        # both scans share ONE shuffle on the keys (same partitioning,
        # two in-partition sorts); tie at equal distance -> backward,
        # matching pandas merge_asof.
        mb = bounded(scan("backward"), "backward")
        mf = bounded(scan("forward"), "forward")
        matched = (
            u.withColumn("__asof_mb", mb)
            .withColumn("__asof_mf", mf)
            .withColumn(
                "__asof_m",
                F.when(F.col("__asof_mf").isNull(), F.col("__asof_mb"))
                .when(F.col("__asof_mb").isNull(), F.col("__asof_mf"))
                .when(
                    gap_of(F.col("__asof_mb"), "backward")
                    <= gap_of(F.col("__asof_mf"), "forward"),
                    F.col("__asof_mb"),
                )
                .otherwise(F.col("__asof_mf")),
            )
            .drop("__asof_mb", "__asof_mf")
        )
    else:
        matched = u.withColumn("__asof_m", bounded(scan(direction), direction))
    out = matched.filter(F.col("__asof_side") == 1)
    if how == "inner":
        out = out.filter(F.col("__asof_m").isNotNull())
    for name in [f"{prefix}{ts}", *[f"{prefix}{c}" for c in rcols]]:
        out = out.withColumn(name, F.col("__asof_m").getField(name))
    return out.drop("__asof_ts", "__asof_side", "__asof_rv", "__asof_m")
