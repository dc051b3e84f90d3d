"""SURVEY §2.3 extension — interval-overlap self-join via bucket
binning: the scale-safe relational form of "which pairs of time
ranges intersect", the join shape behind conflict detection, resource
double-booking, and session-overlap audits.

A naive theta self-join (a.s < b.e AND b.s < a.e) is a per-key
nested-loop — quadratic per priority class. The binned form explodes
each interval into the week buckets it covers and equi-joins on
(key, bucket): candidate pairs are only those sharing a bucket, the
residual overlap predicate runs on candidates, and a distinct
collapses multi-bucket duplicates. Bucket width trades fan-out
(intervals spanning many buckets) against candidate precision — the
classic interval-join binning from the spatial-join literature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.registry import query

WEEK_DAYS = 7


@query(
    "join_interval_bins",
    """
    WITH iv AS (
        SELECT o_orderkey AS k, o_orderpriority AS p,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS s,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                 + o_orderkey % 5 + 1 AS e
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1995-04-01'
    )
    SELECT a.p AS o_orderpriority,
           COUNT(*) AS n_overlapping_pairs,
           CAST(SUM(LEAST(a.e, b.e) - GREATEST(a.s, b.s)) AS BIGINT)
             AS sum_overlap_days
    FROM iv a JOIN iv b
      ON a.p = b.p AND a.k < b.k AND a.s < b.e AND b.s < a.e
    GROUP BY a.p
    """,
)
def join_interval_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-pair census per priority over Q1-1995 fulfilment
    windows [orderdate, orderdate + 1..5 days). The ORACLE states the
    quadratic theta-join truth; the SPARK plan is the binned rewrite —
    explode to covered week buckets, equi-join on (priority, week,
    a.k < b.k), distinct the candidate pairs, then apply the exact
    overlap predicate and aggregate pair count + total overlap days.
    Same result, but the join is a hash equi-join whose fan-in is
    bounded by bucket co-occupancy, not group size — the shape that
    survives 100 TB (bucket width is the skew knob; AQE splits hot
    weeks). Intervals here span <= 6 days so each covers <= 2 week
    buckets — bounded fan-out by construction."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-04-01")
    )
    iv = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("p"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("s"),
        (
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
            + F.col("o_orderkey") % 5
            + 1
        ).alias("e"),
    )
    binned = iv.select(
        "k",
        "p",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / WEEK_DAYS).cast("int"),
                F.floor((F.col("e") - 1) / WEEK_DAYS).cast("int"),
            )
        ).alias("wk"),
    )
    a = binned.alias("a")
    b = binned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p"))
            & (F.col("a.wk") == F.col("b.wk"))
            & (F.col("a.k") < F.col("b.k")),
        )
        .select(
            F.col("a.p").alias("p"),
            F.col("a.k").alias("ka"),
            F.col("b.k").alias("kb"),
            F.col("a.s").alias("sa"),
            F.col("a.e").alias("ea"),
            F.col("b.s").alias("sb"),
            F.col("b.e").alias("eb"),
        )
        .filter((F.col("sa") < F.col("eb")) & (F.col("sb") < F.col("ea")))
        .distinct()
    )
    return pairs.groupBy(F.col("p").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).alias("n_overlapping_pairs"),
        F.sum(
            F.least(F.col("ea"), F.col("eb")) - F.greatest(F.col("sa"), F.col("sb"))
        )
        .cast("bigint")
        .alias("sum_overlap_days"),
    )


@query(
    "subq_correlated",
    """
    SELECT o.o_orderkey, o.o_custkey,
           CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS price_cents
    FROM orders o
    WHERE CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
            * (SELECT COUNT(*) FROM orders o2
               WHERE o2.o_custkey = o.o_custkey)
          > (SELECT SUM(CAST(CAST(o2.o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT))
             FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    """,
)
def subq_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subqueries — the oracle keeps them CORRELATED (a
    scalar aggregate subquery per outer row + an EXISTS), while the
    Spark side is the decorrelated plan Catalyst would produce anyway:
    "orders above their own customer's average, having at least one
    returned line". Demonstrating that the decorrelation rewrite is
    semantics-preserving IS the point of the key.

    The above-average test avoids division entirely: price * n >
    sum(prices), all in int64 cents (exact decimal cast then cents) —
    no float threshold can disagree between engines. The EXISTS is a
    left-semi join on l_orderkey.

    Plan: one hash aggregate on o_custkey (partial+final), an equi
    join back on o_custkey, and a semi join against the filtered
    lineitem scan (filter pushed to the scan). Both joins shuffle on
    their natural keys; at 100 TB the aggregate side is tiny relative
    to orders and AQE will pick broadcast where it fits."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cents = (
        F.col("o_totalprice").cast("decimal(12,2)") * 100
    ).cast("long")
    with_cents = o.select("o_orderkey", "o_custkey", cents.alias("price_cents"))
    per_cust = with_cents.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("price_cents").alias("sum_cents"),
    )
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        with_cents.join(per_cust, "o_custkey")
        .filter(F.col("price_cents") * F.col("n_orders") > F.col("sum_cents"))
        .join(returned, with_cents.o_orderkey == returned.l_orderkey, "left_semi")
        .select("o_orderkey", "o_custkey", "price_cents")
    )


@query(
    "join_null_safe",
    """
    WITH o AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE o_orderkey % 25 END AS bucket
        FROM orders
    ),
    d AS (
        SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
                    ELSE n_nationkey END AS bucket,
               n_name
        FROM nation
    )
    SELECT o.o_orderkey, o.bucket, d.n_name
    FROM o JOIN d ON o.bucket IS NOT DISTINCT FROM d.bucket
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark `<=>` / SQL IS NOT DISTINCT
    FROM) — NULL keys MATCH each other instead of silently dropping,
    the semantics a dimension with an explicit "unknown" member needs.
    The fixture derivation plants NULLs on both sides (every 7th order
    key, every 5th nation key) so the NULL↔NULL match group is real
    and multi-row on both sides.

    Plan note: Spark hash-partitions `<=>` keys like ordinary equi
    keys (NULL hashes to a bucket instead of being filtered), so this
    stays a broadcast/shuffled HASH join — no nested-loop fallback;
    the NULL group is a single hot key, the usual skew knobs apply at
    scale."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderkey") % 25)
        .alias("bucket"),
    )
    d = load_table(spark, sf_dir, "nation").select(
        F.when(F.col("n_nationkey") % 5 == 0, None)
        .otherwise(F.col("n_nationkey"))
        .alias("bucket"),
        "n_name",
    )
    return o.join(
        F.broadcast(d), o["bucket"].eqNullSafe(d["bucket"])
    ).select("o_orderkey", o["bucket"].alias("bucket"), "n_name")


DICT_DEFAULT_NAME = "<unknown>"


@query(
    "dict_get_lookup",
    f"""
    SELECT o.o_orderkey,
           o.o_orderkey % 30 AS lookup_key,
           COALESCE(n.n_name, '{DICT_DEFAULT_NAME}') AS nation_name,
           CAST(n.n_nationkey IS NOT NULL AS BOOLEAN) AS dict_has
    FROM orders o
    LEFT JOIN nation n ON o.o_orderkey % 30 = n.n_nationkey
    """,
)
def dict_get_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH external dictionaries — `dictGetOrDefault` / `dictHas`: a
    small key→value table applied as a per-row FUNCTION rather than a
    join. ClickHouse holds the dictionary in memory on every server;
    the faithful Spark equivalent is a literal map built once on the
    driver (25 nation rows — dictionaries are small by definition)
    and baked into the plan as a codegen expression: ZERO join, zero
    shuffle, exactly how dictGet executes. Keys 25-29 miss, proving
    the OrDefault and dictHas paths.

    At 100 TB the dictionary stays driver-built but broadcast-sized;
    a dictionary too big for a literal map degrades to
    join_broadcast_dim — the documented cliff. The oracle states the
    same semantics relationally (LEFT JOIN + COALESCE)."""
    from itertools import chain

    o = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect()
    mapping = F.create_map(
        *chain.from_iterable(
            (F.lit(int(r.n_nationkey)), F.lit(r.n_name)) for r in nat
        )
    )
    key = (F.col("o_orderkey") % 30).alias("lookup_key")
    looked = mapping[F.col("o_orderkey") % 30]
    return o.select(
        "o_orderkey",
        key,
        F.coalesce(looked, F.lit(DICT_DEFAULT_NAME)).alias("nation_name"),
        looked.isNotNull().alias("dict_has"),
    )


ASOF_TOLERANCE_S = 7200


@query(
    "join_asof_tolerance",
    f"""
    WITH views AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view'
    ),
    purch AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    ),
    matched AS (
      SELECT v.event_id, v.user_id, v.ts, v.value,
             p.ts AS m_ts, p.value AS m_value
      FROM views v ASOF LEFT JOIN purch p
        ON v.user_id = p.user_id AND v.ts >= p.ts
    )
    SELECT event_id, user_id, ts, value,
           CASE WHEN m_ts IS NOT NULL
                     AND ts - m_ts <= INTERVAL {ASOF_TOLERANCE_S} SECOND
                THEN m_ts END AS asof_ts,
           CASE WHEN m_ts IS NOT NULL
                     AND ts - m_ts <= INTERVAL {ASOF_TOLERANCE_S} SECOND
                THEN m_value END AS asof_value
    FROM matched
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASOF join with a max-staleness tolerance (pandas
    ``merge_asof(tolerance=...)`` / the guarded form of ClickHouse
    ASOF JOIN): each view matches the user's latest purchase at-or-
    before it, but a match staler than {ASOF_TOLERANCE_S} s is nulled
    — attaching a price quote or feature snapshot only while it is
    still fresh. Tolerance is a post-match null-out in ops/asof.py
    (never a range-join explosion), so the plan stays the ASOF
    union+window single shuffle per side; the oracle replays the same
    post-filter over DuckDB's native ASOF JOIN."""
    from etl_ch_destination_spark.ops.asof import asof_join
    from etl_ch_destination_spark.ops.dedup import latest_by_key

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    purch = latest_by_key(
        ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        ),
        ["user_id", "ts"],
        [F.desc("event_id")],
    ).select("user_id", "ts", "value")
    return asof_join(
        views,
        purch,
        keys=["user_id"],
        ts="ts",
        how="left",
        tolerance_seconds=ASOF_TOLERANCE_S,
    )


@query(
    "join_asof_strict",
    """
    WITH views AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view'
    ),
    purch AS (
      SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
      ) WHERE rn = 1
    )
    SELECT v.event_id, v.user_id, v.ts, v.value,
           p.ts AS asof_ts, p.value AS asof_value
    FROM views v ASOF LEFT JOIN purch p
      ON v.user_id = p.user_id AND v.ts > p.ts
    """,
)
def join_asof_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT ASOF join (ClickHouse ASOF JOIN with the ``>``
    comparator; pandas ``allow_exact_matches=False``): each view
    matches the user's latest purchase STRICTLY before it — the
    leakage-safe form whenever the right frame must causally precede
    the left (a feature snapshot must not see the label instant).
    ops/asof.py implements strictness as a tie-break flip in the
    union+window scan — identical single-shuffle plan, no timestamp
    arithmetic; DuckDB's native strict ASOF comparator is the
    oracle."""
    from etl_ch_destination_spark.ops.asof import asof_join
    from etl_ch_destination_spark.ops.dedup import latest_by_key

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    purch = latest_by_key(
        ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        ),
        ["user_id", "ts"],
        [F.desc("event_id")],
    ).select("user_id", "ts", "value")
    return asof_join(
        views, purch, keys=["user_id"], ts="ts", how="left", strict=True
    )


# range_hashed dictionary periods: deterministic per-nation rate bands
DICT_RANGE_PERIODS = [
    ("1994-01-01", "1996-01-01", 0),
    ("1996-01-01", "1998-01-01", 1),
    ("1998-01-01", "9999-01-01", 2),
]


@query(
    "dict_get_range",
    """
    WITH periods(p_start, p_end, p_idx) AS (
      VALUES (TIMESTAMP '1994-01-01', TIMESTAMP '1996-01-01', 0),
             (TIMESTAMP '1996-01-01', TIMESTAMP '1998-01-01', 1),
             (TIMESTAMP '1998-01-01', TIMESTAMP '9999-01-01', 2)
    ),
    rates AS (
      SELECT n_nationkey, p_start, p_end,
             CAST((n_nationkey * 7 + p_idx * 13) % 20 AS BIGINT) AS rate_pct
      FROM nation CROSS JOIN periods
    )
    SELECT o.o_orderkey, c.c_nationkey AS nationkey, r.rate_pct
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN rates r ON c.c_nationkey = r.n_nationkey
                AND o.o_orderdate >= r.p_start
                AND o.o_orderdate < r.p_end
    """,
)
def dict_get_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``range_hashed`` dictionary lookup (``dictGet`` with
    a validity interval per key): each order resolves its customer
    nation's rate AS OF the order date from a (key, start, end, value)
    dictionary — the canonical slowly-changing-rate lookup (tax bands,
    FX regimes, tariff schedules). The dictionary is built
    deterministically from the nation dim (25 keys × 3 periods).

    Plan: the fact side equi-joins the BROADCAST dictionary on the
    hash key; the validity window is a residual predicate evaluated on
    the ≤3 candidate rows per key — a range_hashed dictionary is
    small by definition, so this is a map-side lookup at any fact
    scale, exactly like ClickHouse's in-memory dict. The customer dim
    also broadcasts (dict_get_lookup's shape)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    periods = F.array(
        *[
            F.struct(
                F.lit(s).cast("timestamp").alias("p_start"),
                F.lit(e).cast("timestamp").alias("p_end"),
                F.lit(i).alias("p_idx"),
            )
            for s, e, i in DICT_RANGE_PERIODS
        ]
    )
    rates = n.select(
        "n_nationkey", F.explode(periods).alias("p")
    ).select(
        "n_nationkey",
        F.col("p.p_start").alias("p_start"),
        F.col("p.p_end").alias("p_end"),
        ((F.col("n_nationkey") * 7 + F.col("p.p_idx") * 13) % 20)
        .cast("bigint")
        .alias("rate_pct"),
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(rates),
            (F.col("c_nationkey") == F.col("n_nationkey"))
            & (F.col("o_orderdate") >= F.col("p_start"))
            & (F.col("o_orderdate") < F.col("p_end")),
        )
        .select(
            "o_orderkey",
            F.col("c_nationkey").alias("nationkey"),
            "rate_pct",
        )
    )


LATERAL_TOPN = 3


@query(
    "join_lateral_topn",
    f"""
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.price_cents
    FROM customer c,
    LATERAL (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS price_cents
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY price_cents DESC, o_orderkey
      LIMIT {LATERAL_TOPN}
    ) t
    """,
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY + LIMIT — "each
    customer's top {LATERAL_TOPN} orders by value", written as genuine
    SQL LATERAL on BOTH engines (Spark supports correlated lateral
    subqueries since 3.2). The interesting part is what Catalyst does
    with it: the correlated LIMIT decorrelates into
    WindowGroupLimit(row_number <= {LATERAL_TOPN}) with a PARTIAL
    top-k pass BEFORE the shuffle — each map task locally keeps at
    most {LATERAL_TOPN} rows per customer, so the exchange carries
    O(customers x {LATERAL_TOPN}), not all orders. That partial/final
    group-limit is exactly the plan you want at 100 TB; a per-customer
    loop (the literal lateral reading) would be the curse-of-the-
    last-reducer anti-pattern. Ties broken by o_orderkey so the kept
    set is deterministic. Customers with no orders drop (inner
    lateral, matching DuckDB)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "jlt_customer"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("jlt_orders")
    return spark.sql(f"""
      SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.price_cents
      FROM jlt_customer c,
      LATERAL (
        SELECT o_orderkey,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                 AS price_cents
        FROM jlt_orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY price_cents DESC, o_orderkey
        LIMIT {LATERAL_TOPN}
      ) t
    """)


@query(
    "subq_any_all",
    """
    WITH nation_avgs AS (
      SELECT CAST(SUM(CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT))
                  AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS avg_cents
      FROM supplier GROUP BY s_nationkey
    )
    SELECT s_suppkey,
           CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_cents,
           CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
             > ALL (SELECT avg_cents FROM nation_avgs) AS above_all_nations,
           CAST(CAST(s_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
             > ANY (SELECT avg_cents FROM nation_avgs) AS above_any_nation
    FROM supplier
    """,
)
def subq_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified subquery predicates — ``> ALL`` / ``> ANY`` against
    the per-nation average balances. The oracle keeps the quantifiers
    literal; the Spark side is the reduction every optimizer applies
    when the subquery is non-empty and null-free (both hold by
    construction: every nation has suppliers, acctbal is NOT NULL):
    x > ALL S == x > max(S), x > ANY S == x > min(S). The nation-avg
    table collapses to a 1-row (max, min) broadcast, so the quantified
    predicate costs one map-side comparison per supplier — no join
    shuffle at any scale. Averages are single IEEE divisions of exact
    cent sums, identical on both engines."""
    s = load_table(spark, sf_dir, "supplier")
    cents = (F.col("s_acctbal").cast("decimal(12,2)") * 100).cast("bigint")
    avgs = (
        s.select("s_nationkey", cents.alias("c"))
        .groupBy("s_nationkey")
        .agg(
            (
                F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avg_cents")
        )
    )
    bounds = avgs.agg(
        F.max("avg_cents").alias("max_avg"), F.min("avg_cents").alias("min_avg")
    )
    return (
        s.select("s_suppkey", cents.alias("bal_cents"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "s_suppkey",
            "bal_cents",
            (F.col("bal_cents") > F.col("max_avg")).alias("above_all_nations"),
            (F.col("bal_cents") > F.col("min_avg")).alias("above_any_nation"),
        )
    )


# CIDR dictionary for longest-prefix-match enrichment, over the same
# synthetic 10.0.0.0/8 space as ip_funcs (scalars_binary.py). Networks
# are (label, prefix_len, network_int); generated constants keep the
# Spark side and the DuckDB oracle byte-identical.
_CIDR_BLOCKS = [
    ("corp-wan", 8, "10.0.0.0"),
    ("dc-east", 16, "10.3.0.0"),
    ("dc-west", 16, "10.7.0.0"),
    ("branch", 16, "10.12.0.0"),
    ("rack-a", 24, "10.3.5.0"),
    ("rack-b", 24, "10.3.9.0"),
    ("rack-c", 24, "10.7.1.0"),
]


def _ip_int(dotted: str) -> int:
    a, b, c, d = (int(x) for x in dotted.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


_CIDR_ROWS = [
    (label, plen, _ip_int(net) >> (32 - plen)) for label, plen, net in _CIDR_BLOCKS
]
_CIDR_LENS = sorted({plen for _, plen, _ in _CIDR_ROWS})

_SQL_CIDR_DIM = " UNION ALL ".join(
    f"SELECT '{label}' AS label, {plen} AS plen, CAST({key} AS BIGINT) AS net_key"
    for label, plen, key in _CIDR_ROWS
)

# the ip_funcs synthetic address, shared derivation
_SQL_IP = (
    "167772160 + (o_orderkey % 256) * 65536 + (o_custkey % 256) * 256"
    " + (o_orderkey % 251)"
)


@query(
    "join_ip_cidr",
    f"""
    WITH dim AS ({_SQL_CIDR_DIM}),
    ips AS (SELECT o_orderkey, CAST({_SQL_IP} AS BIGINT) AS ip_num FROM orders),
    probes AS (
      SELECT o_orderkey, ip_num, l.plen AS plen,
             ip_num // (1 << (32 - l.plen)) AS net_key
      FROM ips CROSS JOIN (VALUES {", ".join(f"({n})" for n in _CIDR_LENS)})
        AS l(plen)
    ),
    hits AS (
      SELECT p.o_orderkey, p.ip_num, d.label, d.plen,
             ROW_NUMBER() OVER (PARTITION BY p.o_orderkey
                                ORDER BY d.plen DESC, d.label) AS rk
      FROM probes p JOIN dim d ON d.plen = p.plen AND d.net_key = p.net_key
    )
    SELECT o_orderkey, ip_num, label AS cidr_label,
           CAST(plen AS BIGINT) AS prefix_len
    FROM hits WHERE rk = 1
    """,
)
def join_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match CIDR enrichment (the GeoIP / network-zone
    join every clickstream pipeline runs) — CH's
    ``isIPAddressInRange``-over-a-dictionary, expressed in the form
    that scales: NOT a range/theta join. Each probe IP emits one
    masked key per distinct prefix length in the dictionary
    ({_CIDR_LENS!r} → a bounded constant fan-out), the dictionary is
    keyed by (prefix_len, network), and the lookup becomes a BROADCAST
    EQUI-JOIN; the most-specific match wins by a per-IP window over at
    most |lens| candidate rows. A range join on (start, end) would be
    a per-row interval probe; this is the classic LPM decomposition
    routers and BigQuery's own GeoIP recipes use — map-side, O(lens)
    per row, no shuffle of the fact side."""
    o = load_table(spark, sf_dir, "orders")
    ip = (
        F.lit(167772160)
        + (F.col("o_orderkey") % 256) * 65536
        + (F.col("o_custkey") % 256) * 256
        + (F.col("o_orderkey") % 251)
    ).cast("bigint")
    ips = o.select("o_orderkey", ip.alias("ip_num"))
    # the per-length fan-out is a literal-array explode (map-side, no
    # join operator), not a cross join against a dim frame
    probes = ips.select(
        "o_orderkey",
        "ip_num",
        F.explode(F.array(*[F.lit(n) for n in _CIDR_LENS])).alias("plen"),
    ).select(
        "o_orderkey",
        "ip_num",
        "plen",
        F.expr("ip_num div (1 << (32 - plen))").alias("net_key"),
    )
    dim = spark.createDataFrame(
        _CIDR_ROWS, "label string, dplen int, dnet_key long"
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("dplen"), "label")
    return (
        probes.join(
            F.broadcast(dim),
            (F.col("dplen") == F.col("plen"))
            & (F.col("dnet_key") == F.col("net_key")),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderkey",
            "ip_num",
            F.col("label").alias("cidr_label"),
            F.col("dplen").cast("bigint").alias("prefix_len"),
        )
    )


@query(
    "dict_get_hierarchy",
    """
    SELECT c.c_custkey,
           r.r_name || '>' || n.n_name || '>' || c.c_name AS path,
           CAST(3 AS BIGINT) AS depth,
           r.r_name = 'ASIA' AS in_asia
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    """,
)
def dict_get_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH hierarchical dictionaries — ``dictGetHierarchy`` (the full
    ancestry path customer → nation → region) and ``dictIsIn`` (is
    this key under that ancestor?). ClickHouse walks parent pointers
    at lookup time; the scalable relational form is the fixed-depth
    unrolled join — each hierarchy level is one broadcast hash join
    against a dimension that fits in memory at any fact-table scale
    (nation: 25 rows, region: 5). Map-side end to end; the fact side
    never shuffles."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.select("c_custkey", "c_name", "c_nationkey")
        .join(
            F.broadcast(n.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(r.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            "c_custkey",
            F.concat_ws(">", "r_name", "n_name", "c_name").alias("path"),
            F.lit(3).cast("bigint").alias("depth"),
            (F.col("r_name") == "ASIA").alias("in_asia"),
        )
    )


FUZZY_MAX_LEV = 2


@query(
    "join_fuzzy_levenshtein",
    f"""
    WITH clean AS (
      SELECT n_nationkey, n_name,
             substr(n_name, 1, 1) AS blk_c, length(n_name) AS blk_l
      FROM nation
    ),
    dirty AS (
      SELECT n_nationkey AS dirty_key,
             substr(n_name, 1, 2 + CAST(n_nationkey % 5 AS INT))
               || substr(n_name, 4 + CAST(n_nationkey % 5 AS INT))
               AS dirty_name
      FROM nation
    ),
    blocked AS (
      SELECT d.dirty_key, d.dirty_name, c.n_name AS matched_name,
             levenshtein(d.dirty_name, c.n_name) AS lev
      FROM dirty d
      JOIN clean c
        ON c.blk_c = substr(d.dirty_name, 1, 1)
       AND abs(c.blk_l - length(d.dirty_name)) <= {FUZZY_MAX_LEV}
      WHERE levenshtein(d.dirty_name, c.n_name) <= {FUZZY_MAX_LEV}
    )
    SELECT dirty_key, dirty_name, matched_name, CAST(lev AS BIGINT) AS lev
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY dirty_key
                                   ORDER BY lev, matched_name) AS rk
      FROM blocked
    ) WHERE rk = 1
    """,
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dimension matching — join dirty strings (a char deleted at
    a key-derived position) back to the clean dimension under edit
    distance ≤ {FUZZY_MAX_LEV}, the dirty-master-data repair join. The
    scale discipline: levenshtein NEVER runs all-pairs — candidates
    come from BLOCKING (first-char equality + a ±{FUZZY_MAX_LEV}
    length band, both necessary conditions for the distance bound
    given deletions past position 1), so the quadratic distance only
    evaluates on the blocked candidates; the winner per dirty row is a
    bounded window (min distance, name tiebreak). The dim side
    broadcasts at any fact scale.

    Both engines implement plain Wagner-Fischer edit distance —
    integer-valued, hash-exact."""
    nat = load_table(spark, sf_dir, "nation")
    clean = nat.select(
        F.col("n_name").alias("clean_name"),
        F.substring("n_name", 1, 1).alias("blk_c"),
        F.length("n_name").alias("blk_l"),
    )
    # delete one char at key-derived position 3..7 (never position 1,
    # preserving the first-char blocking invariant)
    dirty = nat.select(
        F.col("n_nationkey").alias("dirty_key"),
        F.concat(
            F.expr("substr(n_name, 1, 2 + cast(n_nationkey % 5 as int))"),
            F.expr("substr(n_name, 4 + cast(n_nationkey % 5 as int))"),
        ).alias("dirty_name"),
    )
    blocked = (
        dirty.join(
            F.broadcast(clean),
            (F.col("blk_c") == F.substring("dirty_name", 1, 1))
            & (
                F.abs(F.col("blk_l") - F.length("dirty_name"))
                <= FUZZY_MAX_LEV
            ),
        )
        .withColumn("lev", F.levenshtein("dirty_name", "clean_name"))
        .filter(F.col("lev") <= FUZZY_MAX_LEV)
    )
    w = Window.partitionBy("dirty_key").orderBy("lev", "clean_name")
    return (
        blocked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "dirty_key",
            "dirty_name",
            F.col("clean_name").alias("matched_name"),
            F.col("lev").cast("bigint").alias("lev"),
        )
    )


@query(
    "join_paste_positional",
    """
    WITH a AS (
      SELECT c_custkey AS cust_by_balance, c_acctbal,
             ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS pos
      FROM customer
    ),
    b AS (
      SELECT o_custkey AS cust_by_orders, n_orders,
             ROW_NUMBER() OVER (ORDER BY n_orders DESC, o_custkey) AS pos
      FROM (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY o_custkey)
    )
    SELECT a.pos, a.cust_by_balance, a.c_acctbal, b.cust_by_orders, b.n_orders
    FROM a JOIN b ON a.pos = b.pos
    """,
)
def join_paste_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``PASTE JOIN`` — zip two result sets BY ROW POSITION
    (no key): here the rank-rank pairing behind Q-Q-style analyses —
    the i-th customer by account balance next to the i-th customer by
    order count. Positions are well-defined because each side carries
    an explicit TOTAL order (CH's PASTE JOIN likewise pastes the
    subquery output orders).

    Plan: each side's position comes from ops/rank.with_global_rank —
    percentile-bucketed partitioned ranks + cumulative offsets, never a
    single-task global window (the naive ROW_NUMBER() OVER (ORDER BY)
    serializes the whole table through one partition at 100 TB); the
    paste itself is a hash equi-join on pos."""
    from etl_ch_destination_spark.ops.rank import with_global_rank

    c = load_table(spark, sf_dir, "customer")
    a = with_global_rank(
        c.select(F.col("c_custkey").alias("cust_by_balance"), "c_acctbal"),
        [F.desc("c_acctbal"), F.asc("cust_by_balance")],
        lead="c_acctbal",
        descending=True,
        name="pos",
    )
    ocnt = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("cust_by_orders"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    b = with_global_rank(
        ocnt,
        [F.desc("n_orders"), F.asc("cust_by_orders")],
        lead="n_orders",
        descending=True,
        name="pos",
    )
    return a.join(b, "pos").select(
        "pos", "cust_by_balance", "c_acctbal", "cust_by_orders", "n_orders"
    )


@query(
    "dict_get_composite",
    """
    WITH dict AS (
      SELECT n.n_nationkey AS k_nation, r.r_name AS k_region,
             n.n_name || '/' || r.r_name AS label
      FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
    )
    SELECT c.c_custkey,
           CAST(c.c_nationkey AS INT) AS k_nation,
           c.c_mktsegment AS seg,
           COALESCE(d.label, 'UNKNOWN') AS label,
           CAST(CASE WHEN d.label IS NOT NULL THEN 1 ELSE 0 END AS BOOLEAN)
             AS dict_has
    FROM customer c
    LEFT JOIN dict d
      ON d.k_nation = c.c_nationkey
     AND d.k_region = CASE WHEN c.c_mktsegment IN ('BUILDING', 'MACHINERY')
                           THEN 'AMERICA' ELSE 'ASIA' END
    """,
)
def dict_get_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH COMPLEX_KEY dictionaries — ``dictGet('d', 'attr',
    tuple(k1, k2))``: the dictionary key is a TUPLE, here
    (nationkey, region name). The lookup map is driver-built keyed on
    a canonical composite encoding (int·'\\x1f'·string — the unit
    separator cannot occur in region names) and baked into codegen as
    a literal map: zero join, zero shuffle, exactly how complex-key
    dictGet executes in CH. Misses (nation not in the probed region)
    prove the OrDefault path. The oracle states the same semantics
    relationally (LEFT JOIN on both key parts + COALESCE).

    At 100 TB: same cliff as dict_get_lookup — a composite dictionary
    too big for a literal map degrades to a broadcast join on the
    composite key."""
    from itertools import chain

    c = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    rows = (
        nat.join(reg, nat["n_regionkey"] == reg["r_regionkey"])
        .select("n_nationkey", "r_name", "n_name")
        .collect()
    )
    SEP = "\x1f"
    mapping = F.create_map(
        *chain.from_iterable(
            (
                F.lit(f"{int(r.n_nationkey)}{SEP}{r.r_name}"),
                F.lit(f"{r.n_name}/{r.r_name}"),
            )
            for r in rows
        )
    )
    probe_region = F.when(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY"), F.lit("AMERICA")
    ).otherwise(F.lit("ASIA"))
    key = F.concat(
        F.col("c_nationkey").cast("string"), F.lit(SEP), probe_region
    )
    looked = mapping[key]
    return c.select(
        "c_custkey",
        F.col("c_nationkey").cast("int").alias("k_nation"),
        F.col("c_mktsegment").alias("seg"),
        F.coalesce(looked, F.lit("UNKNOWN")).alias("label"),
        looked.isNotNull().alias("dict_has"),
    )
