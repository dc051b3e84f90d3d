"""SURVEY §2.6 extension — ClickHouse array-sequence functions recast
as partitioned windows (`arrayDifference`/`arrayFill`/`arrayCompact`),
bounded dyadic exponential smoothing (`exponentialMovingAverage`), and
robust MAD-based anomaly flagging (the `quantileExact`-driven outlier
filter).

Determinism: event values quantize to integer micros via floor (the
agg_delta_sum policy); every window order carries the unique event_id
tiebreaker; the EMA weights are dyadic integers so the weighted sum is
int64-exact; medians over integers interpolate on the half-integer
grid (exact in double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.queries._util import nz, pos
from etl_ch_destination_spark.registry import query

EMA_WIN = 16  # lookback; weights 2^0 .. 2^15 (newest highest)


@query(
    "arr_fill_compact",
    """
    WITH seq AS (
        SELECT user_id, event_id,
               CAST(floor(value * 1000000) AS BIGINT) AS x,
               CASE WHEN event_id % 7 = 0 THEN NULL
                    ELSE CAST(floor(value * 1000000) AS BIGINT) END AS x_n,
               ROW_NUMBER() OVER w AS idx,
               lag(CAST(floor(value * 1000000) AS BIGINT)) OVER w AS prev,
               last_value(CASE WHEN event_id % 7 = 0 THEN NULL
                               ELSE CAST(floor(value * 1000000) AS BIGINT) END
                          IGNORE NULLS) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           COUNT(*) AS n,
           md5(string_agg(CAST(COALESCE(x - prev, 0) AS VARCHAR), ','
                          ORDER BY idx)) AS diffs_md5,
           CAST(SUM(CASE WHEN prev IS NULL OR x != prev THEN 1 ELSE 0 END)
                AS BIGINT) AS compact_n,
           md5(string_agg(CAST(COALESCE(filled, -1) AS VARCHAR), ','
                          ORDER BY idx)) AS filled_md5,
           CAST(SUM(abs(COALESCE(x - prev, 0))) AS BIGINT) AS sum_abs_diff
    FROM seq GROUP BY user_id
    """,
)
def arr_fill_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH `arrayDifference` / `arrayCompact` / `arrayFill` over each
    user's chronological value sequence — expressed the Spark-idiomatic
    way: NOT collect-to-array-then-HOF, but lag/last-IGNORE-NULLS
    windows over the row stream (one user-hash exchange, streaming
    frames, no per-user array materialized until the final bounded
    digest). arrayDifference = x - lag(x) (first element 0, the CH
    convention); arrayCompact counts runs (first-or-changed);
    arrayFill forward-fills a keyed null-out (event_id % 7) with the
    last non-null. The per-user sequences are digested to md5 of the
    ordered CSV — order pinned by (ts, event_id) — so the oracle
    hash-compares entire sequences without complex-typed columns.

    At 100 TB: windows stream per user partition; the only per-user
    state is one row (lag/last), not the sequence — the digest
    aggregation is the standard string_agg-shaped reduce."""
    e = load_table(spark, sf_dir, "events")
    x = F.floor(F.col("value") * 1000000).cast("bigint")
    xn = F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("bigint")).otherwise(x)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = e.select(
        "user_id",
        "event_id",
        x.alias("x"),
        F.row_number().over(w).alias("idx"),
        F.lag(x).over(w).alias("prev"),
        F.last(xn, ignorenulls=True).over(wf).alias("filled"),
    )
    diff = F.coalesce(F.col("x") - F.col("prev"), F.lit(0))
    ordered_csv = lambda col: F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", col.alias("v")))),
            lambda s: s["v"].cast("string"),
        ),
        ",",
    )
    return seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.md5(ordered_csv(diff)).alias("diffs_md5"),
        F.sum(
            F.when(F.col("prev").isNull() | (F.col("x") != F.col("prev")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("compact_n"),
        F.md5(ordered_csv(F.coalesce(F.col("filled"), F.lit(-1)))).alias("filled_md5"),
        F.sum(F.abs(diff)).cast("bigint").alias("sum_abs_diff"),
    )


@query(
    "ts_ema_dyadic",
    f"""
    WITH seq AS (
        SELECT user_id, event_id,
               list(CAST(floor(value * 1000000) AS BIGINT)) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN {EMA_WIN - 1} PRECEDING AND CURRENT ROW) AS xs
        FROM events
    )
    SELECT user_id, event_id,
           list_reduce(xs, (acc, x) -> acc * 2 + x) AS wsum,
           CAST(len(xs) AS INT) AS m,
           CAST(list_reduce(xs, (acc, x) -> acc * 2 + x) AS DOUBLE)
             / ((1 << len(xs)) - 1) AS ema
    FROM seq
    """,
)
def ts_ema_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH `exponentialMovingAverage` made hash-exact: truncated
    exponential smoothing over the last {EMA_WIN} points with DYADIC
    weights 2^0..2^(m-1) (newest highest). The weighted sum is the
    Horner fold acc*2 + x over the chronological window — pure int64
    (micros <= 2^43 after 16 doublings, no overflow) — and the EMA is
    that integer divided once by the geometric norm 2^m - 1: one
    correctly-rounded IEEE division, identical in both engines. A
    float recursion ema = a*x + (1-a)*ema could never hash-match
    (error compounds per step); the dyadic form is the same estimator
    with exactly representable weights.

    Plan: one user-hash exchange; the sliding frame streams — Spark
    evaluates collect_list over a ROWS frame incrementally. The fold
    is a codegen HOF on a <= {EMA_WIN}-element array."""
    e = load_table(spark, sf_dir, "events")
    x = F.floor(F.col("value") * 1000000).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EMA_WIN - 1), Window.currentRow)
    )
    seq = e.select(
        "user_id", "event_id", F.collect_list(x).over(w).alias("xs")
    )
    wsum = F.aggregate(
        F.col("xs"), F.lit(0).cast("bigint"), lambda acc, v: acc * 2 + v
    )
    m = F.size("xs")
    return seq.select(
        "user_id",
        "event_id",
        wsum.alias("wsum"),
        m.cast("int").alias("m"),
        (wsum.cast("double") / (F.expr("shiftleft(CAST(1 AS BIGINT), size(xs))") - 1)).alias(
            "ema"
        ),
    )


@query(
    "ts_anomaly_mad",
    """
    WITH q AS (
        SELECT event_id, event_type,
               CAST(floor(value * 1000000) AS BIGINT) AS x
        FROM events
    ),
    stats AS (
        SELECT event_type AS s_type,
               quantile_cont(x, 0.5) AS med
        FROM q GROUP BY event_type
    ),
    mad AS (
        SELECT event_type AS m_type,
               quantile_cont(abs(x - med), 0.5) AS mad_x
        FROM q JOIN stats ON event_type = s_type
        GROUP BY event_type
    )
    SELECT event_id, event_type, x,
           abs(x - med) AS dev,
           abs(x - med) > 3 * mad_x AS is_anomaly
    FROM q JOIN stats ON event_type = s_type
           JOIN mad ON event_type = m_type
    """,
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-point anomaly flags: |x - median| > 3 * MAD per event
    type — the outlier filter stddev-based z-scores get skew-poisoned
    on. Two exact-median passes (the agg_mad_robust shape) over
    integer micros: medians land on the half-integer grid (exact in
    double), 3*MAD and the comparison are exact, so every flag is
    deterministic — no epsilon, no engine drift.

    Plan: tiny per-type stat tables broadcast back against the event
    scan — the stats cost two aggregates over 5 groups; the flagging
    pass is map-side. At 100 TB swap pass 1 to percentile_approx and
    keep the comparison exact."""
    e = load_table(spark, sf_dir, "events")
    q = e.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 1000000).cast("bigint").alias("x"),
    )
    stats = q.groupBy(F.col("event_type").alias("s_type")).agg(
        F.expr("percentile(x, 0.5)").alias("med")
    )
    with_med = q.join(F.broadcast(stats), q.event_type == F.col("s_type")).drop("s_type")
    mad = with_med.groupBy(F.col("event_type").alias("m_type")).agg(
        F.expr("percentile(abs(x - med), 0.5)").alias("mad_x")
    )
    return (
        with_med.join(F.broadcast(mad), with_med.event_type == F.col("m_type"))
        .select(
            "event_id",
            "event_type",
            "x",
            F.abs(F.col("x") - F.col("med")).alias("dev"),
            (F.abs(F.col("x") - F.col("med")) > 3 * F.col("mad_x")).alias("is_anomaly"),
        )
    )


@query(
    "date_business_days",
    """
    WITH d AS (
        SELECT o_orderkey,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS a,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
                 + o_orderkey % 45 + 1 AS b
        FROM orders
    )
    SELECT o_orderkey,
           CAST(b - a AS INT) AS n_days,
           CAST((5 * ((b + 3) // 7) + LEAST((b + 3) % 7, 5))
                - (5 * ((a + 3) // 7) + LEAST((a + 3) % 7, 5)) AS INT)
             AS n_busdays,
           CAST((a + 3) % 7 AS INT) AS start_dow
    FROM d
    """,
)
def date_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Working-day arithmetic (CH `toDayOfWeek` + interval counting,
    the SLA-deadline primitive) without either engine's weekday
    builtin — their numbering conventions differ (Spark 1=Sunday,
    DuckDB isodow 1=Monday), so both sides use pure integer epoch-day
    math: weekday(x) = (x+3) % 7 with Monday=0 (1970-01-01 was a
    Thursday), and business days in [a, b) = B(b) - B(a) where
    B(y) = 5*((y+3) div 7) + least((y+3) mod 7, 5) counts weekdays in
    the Monday-anchored prefix. Closed form, no loops, map-side
    codegen — and the same expression text runs anywhere.

    The synthetic horizon (1..45 days by order key) exercises spans
    shorter and longer than a week."""
    o = load_table(spark, sf_dir, "orders")
    a = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
    b = a + F.col("o_orderkey") % 45 + 1

    def bus_prefix(y):
        m = y + 3
        return 5 * F.floor(m / 7).cast("bigint") + F.least(m % 7, F.lit(5))

    return o.select(
        "o_orderkey",
        (b - a).cast("int").alias("n_days"),
        (bus_prefix(b) - bus_prefix(a)).cast("int").alias("n_busdays"),
        ((a + 3) % 7).cast("int").alias("start_dow"),
    )


@query(
    "date_iso_week",
    """
    WITH d AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
               date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS e
        FROM orders
    )
    SELECT o_orderkey,
           isoyear(od) AS iso_year,
           CAST(weekofyear(od) AS INT) AS iso_week,
           CAST(DATE '1970-01-01' + INTERVAL ((e - (e + 3) % 7)) DAY AS DATE) AS week_start,
           CAST((e + 3) % 7 + 1 AS INT) AS iso_dow
    FROM d
    """,
)
def date_iso_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH `toISOYear` / `toISOWeek` / `toStartOfISOWeek` /
    `toDayOfWeek`. Spark has no ISO-year builtin and its weekday
    numbering differs from DuckDB's, so the Spark side derives ALL
    FOUR fields from pure epoch-day arithmetic — the ISO 8601 rule
    verbatim: a date's ISO week is the week of its Thursday, so
    iso_year = year(thursday) and iso_week = (dayofyear(thursday)-1)
    div 7 + 1; monday0 = (e+3) % 7 since 1970-01-01 was a Thursday —
    while the ORACLE uses DuckDB's native isoyear()/weekofyear()
    builtins. The hash match is therefore a cross-engine proof that
    the closed-form derivation equals an independent implementation
    (the pytest gate adds Python's datetime.isocalendar as a third).

    Map-side codegen only; scales with the scan."""
    o = load_table(spark, sf_dir, "orders")
    epoch0 = F.lit("1970-01-01").cast("date")
    od = F.to_date("o_orderdate")
    e = F.datediff(od, epoch0)
    monday0 = (e + 3) % 7
    thu = F.date_add(epoch0, e - monday0 + 3)
    return o.select(
        "o_orderkey",
        F.year(thu).alias("iso_year"),
        ((F.dayofyear(thu) - 1) / 7 + 1).cast("int").alias("iso_week"),
        F.date_add(epoch0, e - monday0).alias("week_start"),
        (monday0 + 1).cast("int").alias("iso_dow"),
    )


@query(
    "ts_autocorr",
    """
    WITH q AS (
        SELECT user_id, event_id, ts,
               CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS DECIMAL(9,0))
                    AS DECIMAL(38,0)) AS x
        FROM events
    ),
    pairs AS (
        SELECT user_id, x,
               lag(x) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS y
        FROM q
    ),
    s AS (
        SELECT user_id,
               COUNT(*) AS n,
               SUM(x) AS dx, SUM(y) AS dy, SUM(x * y) AS dxy,
               SUM(x * x) AS dxx, SUM(y * y) AS dyy
        FROM pairs WHERE y IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
           (CAST(n AS DOUBLE) * CAST(dxy AS DOUBLE)
              - CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE))
             / NULLIF(sqrt(GREATEST(0.0,
                        CAST(n AS DOUBLE) * CAST(dxx AS DOUBLE)
                        - CAST(dx AS DOUBLE) * CAST(dx AS DOUBLE)))
                * sqrt(GREATEST(0.0,
                        CAST(n AS DOUBLE) * CAST(dyy AS DOUBLE)
                        - CAST(dy AS DOUBLE) * CAST(dy AS DOUBLE))), 0) AS r1
    FROM s
    WHERE n * dxx - dx * dx <> 0 AND n * dyy - dy * dy <> 0
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation per user series (the CH
    `autoRegression`-adjacent seasonality probe): Pearson r between
    consecutive event values. Exact-integer moment sums per the
    agg_corr_exact recipe — cents quantization, scale-0 decimal sums,
    one double conversion each, identical IEEE expression trees — so
    r1 hash-matches bit-for-bit. Degenerate series (zero variance on
    either leg) are filtered with an EXACT decimal predicate, never a
    float compare, so both engines drop identical groups instead of
    disagreeing about inf/NaN.

    Plan: one shuffle on user_id shared by the lag window and the
    aggregate. The lag pairs never materialize off-heap wider than the
    scan; at 100 TB this is a per-series window + partial agg, the
    canonical time-series shape here."""
    ev = load_table(spark, sf_dir, "events")
    x = (
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("decimal(9,0)")
        .cast("decimal(38,0)")
    )
    q = ev.select("user_id", "event_id", "ts", x.alias("x"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = q.select(
        "user_id", "x", F.lag("x").over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    xc, yc = F.col("x"), F.col("y")
    s = pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xc).alias("dx"),
        F.sum(yc).alias("dy"),
        F.sum(xc * yc).alias("dxy"),
        F.sum(xc * xc).alias("dxx"),
        F.sum(yc * yc).alias("dyy"),
    )
    n = F.col("n")
    dx, dy, dxy, dxx, dyy = (F.col(c) for c in ("dx", "dy", "dxy", "dxx", "dyy"))
    nd = n.cast("double")
    # pos/nz (round-12 sqrt clamp): the exact-decimal WHERE filter
    # guarantees true variance > 0, but THIS expression re-derives it
    # in doubles, which can round to -eps past 2^53 — Spark sqrt(-eps)
    # is NaN where DuckDB THROWS; see queries/_util.pos
    r1 = (nd * dxy.cast("double") - dx.cast("double") * dy.cast("double")) / nz(
        F.sqrt(pos(nd * dxx.cast("double")
                   - dx.cast("double") * dx.cast("double")))
        * F.sqrt(pos(nd * dyy.cast("double")
                     - dy.cast("double") * dy.cast("double")))
    )
    return (
        s.filter((n * dxx - dx * dx != 0) & (n * dyy - dy * dy != 0))
        .select("user_id", n.cast("bigint").alias("n_pairs"), r1.alias("r1"))
    )


SLOT_SEC = 1800          # timeSlots default: 30-minute grid
SLOT_DUR_MOD = 3600      # synthetic duration: 600..4199 s by event_id
SLOT_DUR_BASE = 600


@query(
    "date_time_slots",
    f"""
    WITH iv AS (
        SELECT event_id,
               CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS s,
               CAST(floor(epoch_us(ts) / 1000000) AS BIGINT)
                 + event_id % {SLOT_DUR_MOD} + {SLOT_DUR_BASE} AS e
        FROM events
    )
    SELECT event_id,
           make_timestamp(slot * {SLOT_SEC} * 1000000) AS slot_start,
           CAST(e - s AS BIGINT) AS dur_sec
    FROM iv, unnest(range(s // {SLOT_SEC}, (e - 1) // {SLOT_SEC} + 1)) AS u(slot)
    """,
)
def date_time_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH `timeSlots(StartTime, Duration)` — explode each event's
    [start, start+duration) interval into the 30-minute grid slots it
    touches (the fan-out behind slot-wise utilization reports and the
    interval-join binning in join_interval_bins). Slot indices are
    pure integer epoch math (floor-div by 1800 — `//` on BIGINT is
    true integer division in both engines, and s, e > 0), timestamps
    reconstructed from exact micros.

    Map-side explode, zero shuffles; fan-out is bounded by
    duration/1800 + 1 ≤ 4 slots per event. Scales with the scan."""
    ev = load_table(spark, sf_dir, "events")
    s = F.floor(F.unix_micros("ts") / F.lit(1_000_000)).cast("long")
    iv = ev.select(
        "event_id",
        s.alias("s"),
        (s + F.col("event_id") % SLOT_DUR_MOD + SLOT_DUR_BASE).alias("e"),
    )
    slot = F.explode(
        F.sequence(
            F.floor(F.col("s") / SLOT_SEC).cast("long"),
            F.floor((F.col("e") - 1) / SLOT_SEC).cast("long"),
        )
    )
    return iv.select(
        "event_id",
        slot.alias("slot"),
        (F.col("e") - F.col("s")).alias("dur_sec"),
    ).select(
        "event_id",
        F.timestamp_micros(F.col("slot") * SLOT_SEC * 1_000_000).alias("slot_start"),
        "dur_sec",
    )


@query(
    "ts_seasonality_profile",
    """
    SELECT event_type,
           CAST(hour(ts) AS INT) AS hh,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS DOUBLE) AS sum_cents,
           CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                AS DOUBLE) / COUNT(*) AS avg_cents
    FROM events
    GROUP BY event_type, hour(ts)
    """,
)
def ts_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type (the CH
    `toHour`-keyed rollup behind diurnal load curves and
    seasonal-naive baselines). Counts and cent sums are exact ints;
    the mean is one final IEEE division. hour(ts) is taken under the
    UTC session that ensure_session_defaults pins, so it agrees with
    DuckDB's naive-timestamp hour at every session timezone.

    One partial+final hash aggregate over (type, hour) — 120 groups,
    map-side combine does nearly all the work at any scale."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    return (
        ev.groupBy("event_type", F.hour("ts").cast("int").alias("hh"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).cast("double").alias("sum_cents"),
            (F.sum(cents).cast("double") / F.count(F.lit(1))).alias("avg_cents"),
        )
    )


@query(
    "ts_cusum_changepoint",
    """
    WITH q AS (
        SELECT user_id, event_id, ts,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
        FROM events
    ),
    c AS (
        SELECT user_id,
               ROW_NUMBER() OVER w AS k,
               SUM(x) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS sk,
               COUNT(*) OVER (PARTITION BY user_id) AS n,
               SUM(x) OVER (PARTITION BY user_id) AS sn
        FROM q
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    d AS (
        SELECT user_id, k, n,
               abs(n * sk - k * sn) AS dev,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY abs(n * sk - k * sn) DESC, k)
                 AS rk
        FROM c
    )
    SELECT user_id, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_star,
           CAST(dev AS BIGINT) AS peak_dev,
           CAST(k AS DOUBLE) / n AS split_frac
    FROM d WHERE rk = 1
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint locator per user series — the classic
    mean-shift detector: the index k maximizing |n·S_k − k·S_n|
    (cumulative deviation from the series' own mean, cleared of the
    division: n·S_k − k·S_n = n²·(S_k/k − S_n/n)·k/n scaled to stay in
    EXACT int64 — cents · series length² stays ≪ 2^63 up to ~10^6-row
    series). Ties break to the earliest k; the only doubles are the
    final split-fraction division.

    One shuffle on user_id shared by all four windows (same partition
    spec) and the final top-1 filter is a WindowGroupLimit — no second
    shuffle. The standard per-series scan shape at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    x = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    q = ev.select("user_id", "event_id", "ts", x.alias("x"))
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy("user_id")
    c = q.select(
        "user_id",
        F.row_number().over(w_ord).alias("k"),
        F.sum("x").over(w_cum).alias("sk"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("x").over(w_all).alias("sn"),
    )
    dev = F.abs(F.col("n") * F.col("sk") - F.col("k") * F.col("sn"))
    d = c.select(
        "user_id",
        "k",
        "n",
        dev.alias("dev"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy(dev.desc(), "k"))
        .alias("rk"),
    )
    return d.filter(F.col("rk") == 1).select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("k_star"),
        F.col("dev").cast("bigint").alias("peak_dev"),
        (F.col("k").cast("double") / F.col("n")).alias("split_frac"),
    )


@query(
    "gen_date_spine",
    """
    WITH bounds AS (
        SELECT event_type,
               MIN(CAST(ts AS DATE)) AS d0,
               MAX(CAST(ts AS DATE)) AS d1
        FROM events GROUP BY event_type
    ),
    spine AS (
        SELECT event_type, CAST(u.d AS DATE) AS day
        FROM bounds, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(d)
    ),
    daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT s.event_type, s.day,
           CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
           CAST(d.day IS NULL AS BOOLEAN) AS is_gap
    FROM spine s LEFT JOIN daily d
      ON s.event_type = d.event_type AND s.day = d.day
    """,
)
def gen_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine generation + zero-fill — the `generate_series`
    source operator: build the COMPLETE day spine per event type from
    its own min/max bounds, left-join the observed daily counts, and
    emit explicit zero rows for silent days (is_gap flags them). The
    dense-spine form every dashboard and gap-aware aggregate needs;
    ORDER BY WITH FILL (sort_with_fill) is the within-result cousin,
    this one creates rows a scan never produced.

    Plan: bounds is a 5-row aggregate; sequence()+explode generates
    the spine DISTRIBUTED from those 5 rows (≤ |days|·|types| rows —
    tiny at any corpus scale, repartitioned off the single explode
    source); the join back to daily counts is spine-sized. The big
    table is touched exactly twice, both as partial+final aggregates."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    bounds = ev.groupBy("event_type").agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    spine = (
        bounds.select(
            "event_type",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
        .repartition("event_type")
    )
    daily = ev.groupBy("event_type", day.alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
            F.col("n").isNull().alias("is_gap"),
        )
    )


FISCAL_START_MONTH = 7  # fiscal year starts July 1


@query(
    "date_fiscal_calendar",
    f"""
    WITH d AS (
        SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
               year(CAST(o_orderdate AS DATE)) AS y,
               month(CAST(o_orderdate AS DATE)) AS m
        FROM orders
    )
    SELECT o_orderkey,
           CAST(CASE WHEN m >= {FISCAL_START_MONTH} THEN y + 1 ELSE y END
                AS INT) AS fiscal_year,
           CAST(((m - {FISCAL_START_MONTH} + 12) % 12) // 3 + 1 AS INT)
             AS fiscal_quarter,
           CAST((m - {FISCAL_START_MONTH} + 12) % 12 + 1 AS INT) AS fiscal_month,
           CAST(CASE WHEN m >= {FISCAL_START_MONTH}
                     THEN make_date(y, {FISCAL_START_MONTH}, 1)
                     ELSE make_date(y - 1, {FISCAL_START_MONTH}, 1)
                END AS DATE) AS fiscal_year_start
    FROM d
    """,
)
def date_fiscal_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fiscal-calendar derivation (FY starting July 1, the
    US-government/AU convention): fiscal year (labeled by its END
    year), quarter, month index, and the fiscal year's start date —
    pure month arithmetic, identical integer expressions on both
    engines, no calendar-library dependence. The shifted-calendar
    twin of date_iso_week's ISO derivation; together they cover the
    two reporting calendars a warehouse actually meets.

    Map-side codegen; scales with the scan."""
    o = load_table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    y, m = F.year(od), F.month(od)
    after = m >= FISCAL_START_MONTH
    return o.select(
        "o_orderkey",
        F.when(after, y + 1).otherwise(y).cast("int").alias("fiscal_year"),
        (
            F.floor(((m - FISCAL_START_MONTH + 12) % 12) / 3) + 1
        ).cast("int").alias("fiscal_quarter"),
        ((m - FISCAL_START_MONTH + 12) % 12 + 1).cast("int").alias("fiscal_month"),
        F.when(after, F.make_date(y, F.lit(FISCAL_START_MONTH), F.lit(1)))
        .otherwise(F.make_date(y - 1, F.lit(FISCAL_START_MONTH), F.lit(1)))
        .alias("fiscal_year_start"),
    )


LTTB_POINTS = 50  # downsampled points per series


def _wide_float(x: int) -> float:
    """Exact integer → double via the repo-wide hi/lo 2^32 split with
    TRUNCATED division (mirroring DuckDB's ``//``/``%`` on HUGEINT —
    Python's ``//`` floors, DuckDB truncates, so the split is spelled
    out), so a sum wider than 2^53 crosses to float bit-identically on
    both engines."""
    q = abs(x) // 4294967296
    if x < 0:
        q = -q
    r = x - q * 4294967296
    return float(q) * 4294967296.0 + float(r)


def lttb_select(ts_us, cents, n_out: int):
    """Largest-Triangle-Three-Buckets point selection (Steinarsson
    2013; CH `largestTriangleThreeBuckets`): keep the endpoints,
    split the interior into n_out−2 equal buckets, and from each
    bucket take the point with the largest triangle area formed with
    the previously SELECTED point and the NEXT bucket's centroid.
    Pure-Python reference shared verbatim by the operator's worker
    closure, the pytest replay, AND the DuckDB recursive-CTE oracle
    (VERDICT r11 #7) — every float op is pinned: bucket sums cross to
    double through the hi/lo 2^32 split, centroids are one double
    division, the area is one fixed expression tree, and strict `>`
    makes ties resolve to the earliest index, so selection is fully
    deterministic and SQL-replayable."""
    n = len(ts_us)
    if n <= n_out:
        return list(range(n))
    every = (n - 2) / (n_out - 2)
    out = [0]
    a = 0
    for i in range(n_out - 2):
        lo = int(i * every) + 1
        hi = min(int((i + 1) * every) + 1, n - 1)
        nlo = min(int((i + 1) * every) + 1, n - 1)
        nhi = min(int((i + 2) * every) + 1, n)
        if nhi > nlo:
            span = nhi - nlo
            avg_t = _wide_float(sum(ts_us[nlo:nhi])) / span
            avg_v = _wide_float(sum(cents[nlo:nhi])) / span
        else:
            avg_t = float(ts_us[n - 1])
            avg_v = float(cents[n - 1])
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs(
                (ts_us[a] - avg_t) * (cents[j] - cents[a])
                - (ts_us[a] - ts_us[j]) * (avg_v - cents[a])
            )
            if area > best_area:
                best, best_area = j, area
        out.append(best)
        a = best
    out.append(n - 1)
    return out


def _lttb_sql() -> str:
    """DuckDB replay of ``lttb_select`` (VERDICT r11 #7: LTTB is
    deterministic under the pinned tie-break, so it gets a full hash
    oracle). The non-sequential 90% — series order, bucket bounds,
    bucket centroids — is plain SQL; only the selection chain (each
    bucket's argmax depends on the previously selected point) runs in
    a recursive CTE, one state row per series per bucket, with
    MIN(STRUCT(-area, rn)) reproducing the strict-`>` earliest-index
    tie-break. Float ops mirror the Python reference exactly: bucket
    sums cross to double via the truncated hi/lo 2^32 split
    (``_wide_float``), centroids are one double division, the area is
    the same fixed expression tree; and because the OUTPUT columns are
    all integers, the hash contract rides on the selection alone."""
    p, b = LTTB_POINTS, LTTB_POINTS - 2
    hilo = (
        "(CAST(CAST({v} // 4294967296 AS BIGINT) AS DOUBLE) * 4294967296.0"
        " + CAST(CAST({v} % 4294967296 AS BIGINT) AS DOUBLE))"
    )
    st = hilo.format(v="CAST(m.st AS HUGEINT)")
    sv = hilo.format(v="CAST(m.sv AS HUGEINT)")
    return f"""
    WITH RECURSIVE ser AS (
        SELECT event_type,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY epoch_us(ts), event_id) - 1
                    AS BIGINT) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    big AS (SELECT * FROM ser WHERE n > {p}),
    params AS (
        SELECT event_type, MAX(n) AS n,
               CAST(MAX(n) - 2 AS DOUBLE) / {b} AS every
        FROM big GROUP BY event_type
    ),
    buckets AS (
        SELECT p.event_type, t.i,
               CAST(FLOOR(t.i * p.every) AS BIGINT) + 1 AS lo,
               LEAST(CAST(FLOOR((t.i + 1) * p.every) AS BIGINT) + 1,
                     p.n - 1) AS hi,
               LEAST(CAST(FLOOR((t.i + 1) * p.every) AS BIGINT) + 1,
                     p.n - 1) AS nlo,
               LEAST(CAST(FLOOR((t.i + 2) * p.every) AS BIGINT) + 1,
                     p.n) AS nhi,
               p.n AS n
        FROM params p CROSS JOIN range({b}) t(i)
    ),
    sums AS (
        SELECT b.event_type, b.i,
               SUM(s.ts_us) AS st, SUM(s.cents) AS sv
        FROM buckets b
        JOIN ser s ON s.event_type = b.event_type
                  AND s.rn >= b.nlo AND s.rn < b.nhi
        GROUP BY b.event_type, b.i
    ),
    lastpt AS (
        SELECT event_type, ts_us AS lt, cents AS lv FROM big WHERE rn = n - 1
    ),
    cent AS (
        SELECT b.event_type, b.i, b.lo, b.hi,
               CASE WHEN b.nhi > b.nlo
                    THEN {st} / (b.nhi - b.nlo)
                    ELSE CAST(l.lt AS DOUBLE) END AS avg_t,
               CASE WHEN b.nhi > b.nlo
                    THEN {sv} / (b.nhi - b.nlo)
                    ELSE CAST(l.lv AS DOUBLE) END AS avg_v
        FROM buckets b
        LEFT JOIN sums m ON m.event_type = b.event_type AND m.i = b.i
        JOIN lastpt l ON l.event_type = b.event_type
    ),
    sel AS (
        SELECT event_type, CAST(-1 AS BIGINT) AS i,
               CAST(0 AS BIGINT) AS a_rn, ts_us AS a_ts, cents AS a_cents
        FROM big WHERE rn = 0
        UNION ALL
        SELECT event_type, i, (m).rn, (m).ts, (m).cv FROM (
            SELECT s.event_type AS event_type, s.i + 1 AS i,
                   MIN({{'na': -abs(
                            (CAST(s.a_ts AS DOUBLE) - c.avg_t)
                              * CAST(r.cents - s.a_cents AS DOUBLE)
                            - CAST(s.a_ts - r.ts_us AS DOUBLE)
                              * (c.avg_v - CAST(s.a_cents AS DOUBLE))),
                        'rn': r.rn, 'ts': r.ts_us, 'cv': r.cents}}) AS m
            FROM sel s
            JOIN cent c ON c.event_type = s.event_type AND c.i = s.i + 1
            JOIN ser r ON r.event_type = s.event_type
                      AND r.rn >= c.lo AND r.rn < c.hi
            WHERE s.i + 1 < {b}
            GROUP BY s.event_type, s.i
        )
    )
    SELECT event_type, CAST(rn AS BIGINT) AS pos, ts_us, cents
    FROM ser WHERE n <= {p}
    UNION ALL
    SELECT event_type, a_rn AS pos, a_ts AS ts_us, a_cents AS cents FROM sel
    UNION ALL
    SELECT event_type, n - 1 AS pos, ts_us, cents FROM big WHERE rn = n - 1
    """


@query("ts_downsample_lttb", _lttb_sql())
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual time-series downsampling via Largest-Triangle-Three-
    Buckets (CH `largestTriangleThreeBuckets`): each event_type's
    value series collapses to {LTTB_POINTS} visually-representative
    points. The selection is inherently sequential (each choice
    depends on the previous selected point), so it runs per series
    inside an Arrow-batched ``applyInPandas`` — series are the unit
    of parallelism, exactly how a 100 TB dashboard downsample shards
    (thousands of series × bounded points each; no cross-series
    shuffle beyond the one groupBy). The per-series sort is bounded
    by the series length, and the worker closure carries the shared
    pure-Python reference BY VALUE (module registered with
    cloudpickle below) so it runs from any cwd.

    Full hash oracle (VERDICT r11 #7 — LTTB is deterministic given
    the pinned earliest-index tie-break): the DuckDB side replays the
    selection with a recursive CTE over bucket states (``_lttb_sql``),
    every float crossing pinned to the same expression tree; the
    pytest gate additionally replays the identical algorithm on the
    collected series and asserts EXACT index-set equality plus the
    endpoint and bucket-coverage invariants."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("cents"),
        "event_id",
    )

    n_out = LTTB_POINTS
    pick = lttb_select

    def downsample(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        idx = pick(pdf["ts_us"].tolist(), pdf["cents"].tolist(), n_out)
        sel = pdf.iloc[idx]
        return pd.DataFrame(
            {
                "event_type": sel["event_type"],
                "pos": idx,
                "ts_us": sel["ts_us"],
                "cents": sel["cents"],
            }
        )

    return q.groupBy("event_type").applyInPandas(
        downsample, schema="event_type string, pos long, ts_us long, cents long"
    )


# ship this module by value so the lttb closure imports nothing from
# the worker's sys.path (the ops/multimodal.py worker-cwd pattern)
try:  # pragma: no cover - exercised by the key's worker path
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001
    pass


ROLL_CORR_ROWS = 10


@query(
    "ts_rolling_corr",
    f"""
    WITH t AS (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
      FROM lineitem
    ),
    w AS (
      SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(COUNT(*) OVER fr AS BIGINT) AS n,
             CAST(SUM(x) OVER fr AS BIGINT) AS sx,
             CAST(SUM(y) OVER fr AS BIGINT) AS sy,
             CAST(SUM(x * x) OVER fr AS BIGINT) AS sxx,
             CAST(SUM(y * y) OVER fr AS BIGINT) AS syy,
             CAST(SUM(x * y) OVER fr AS BIGINT) AS sxy
      FROM t
      WINDOW fr AS (PARTITION BY l_suppkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber, x, y
                    ROWS BETWEEN {ROLL_CORR_ROWS - 1} PRECEDING
                             AND CURRENT ROW)
    )
    SELECT l_suppkey, l_orderkey, l_linenumber, n AS n_window,
           CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
           END AS corr_qty_price
    FROM w
    """,
)
def ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling Pearson correlation between quantity and price over a
    trailing {ROLL_CORR_ROWS}-row window per supplier — the
    co-movement monitor shape (ClickHouse corr() over a sliding
    frame). Hash-exact despite being a correlation of doubles: both
    series are lifted to integers (quantity is integral; price in
    exact cents via DECIMAL(12,2)·100), all five window moments are
    int64 sums, and the correlation is assembled from those exact
    moments with one division and two correctly-rounded sqrts in a
    fixed order. Degenerate windows (zero variance) are NULL in both
    engines. The frame order carries (x, y) as final tiebreakers:
    sf0.1 holds one duplicate (suppkey, shipdate, orderkey,
    linenumber) tuple, and without them the two engines could
    order that tie differently and shift every later frame in the
    partition (caught by the r7 three-SF sweep; fully-tied rows
    are frame-equivalent under any order, so this IS total for
    the computation). Plan: single hash exchange on l_suppkey, one sort, all
    six moments from ONE window frame (no self-join)."""
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.col("l_quantity").cast("bigint").alias("x"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("y"),
    )
    fr = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "x", "y")
        .rowsBetween(-(ROLL_CORR_ROWS - 1), 0)
    )
    w = t.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.count(F.lit(1)).over(fr).cast("bigint").alias("n"),
        F.sum("x").over(fr).cast("bigint").alias("sx"),
        F.sum("y").over(fr).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(fr).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(fr).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(fr).cast("bigint").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    varx = n * F.col("sxx") - sx * sx
    vary = n * F.col("syy") - sy * sy
    cov = n * F.col("sxy") - sx * sy
    corr = F.when(
        (varx > 0) & (vary > 0),
        cov.cast("double")
        / (F.sqrt(varx.cast("double")) * F.sqrt(vary.cast("double"))),
    )
    return w.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        n.alias("n_window"),
        corr.alias("corr_qty_price"),
    )


DECAY_HALF_LIFE_S = 7 * 86400  # one integer halving per week of age


@query(
    "ts_time_decayed_sum",
    f"""
    WITH base AS (
      SELECT user_id,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
             epoch_us(ts) AS tus,
             MAX(epoch_us(ts)) OVER () AS tmax
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(cents >> CAST(LEAST(
                 (tmax - tus) // {DECAY_HALF_LIFE_S * 1_000_000},
                 40) AS INT)) AS BIGINT)
             AS decayed_cents,
           CAST(SUM(cents) AS BIGINT) AS raw_cents
    FROM base
    GROUP BY user_id
    """,
)
def ts_time_decayed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``exponentialTimeDecayedSum`` in the repo's dyadic-exact
    form: each event's value is halved once per {DECAY_HALF_LIFE_S}-
    second half-life of age (integer right-shift — floor semantics on
    non-negative cents, capped at 40 shifts where the contribution is
    already zero), so recency-weighted engagement sums are EXACT
    integers that hash-match (a float 2^(-dt/hl) would drift across
    libms, the same reason the repo's entropy keys are whole-bit).
    Ages are µs-exact (unix_micros / epoch_us) — whole-second epochs
    would FLOOR Spark-side but keep fractions DuckDB-side, shifting
    events that sit on a half-life boundary into different buckets.

    Plan: the reference time is one window MAX over the scan (at
    100 TB you would pass it as a literal watermark instead — the
    docstring of ts_ema_dyadic records the same pattern), then a
    single map-side shift and one hash aggregate on user_id."""
    e = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    base = e.select(
        "user_id",
        cents.alias("cents"),
        F.unix_micros("ts").alias("tus"),
    ).withColumn("tmax", F.max("tus").over(Window.partitionBy()))
    decayed = F.expr(
        "shiftright(cents, cast(least((tmax - tus) div "
        f"{DECAY_HALF_LIFE_S * 1_000_000}, 40) as int))"
    )
    return (
        base.select("user_id", "cents", decayed.alias("dc"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("dc").cast("bigint").alias("decayed_cents"),
            F.sum("cents").cast("bigint").alias("raw_cents"),
        )
    )


@query(
    "gen_calendar_dim",
    """
    WITH bounds AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
             MAX(CAST(o_orderdate AS DATE)) AS hi
      FROM orders
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
      FROM bounds
    )
    SELECT d,
           CAST(isodow(d) AS BIGINT) AS iso_dow,
           CAST(CAST(strftime(d, '%Y') AS INT) AS BIGINT) AS yr,
           CAST(CAST(strftime(d, '%m') AS INT) AS BIGINT) AS mon,
           CAST(quarter(d) AS BIGINT) AS qtr,
           d = date_trunc('month', d) AS is_month_start,
           d = last_day(d) AS is_month_end,
           CAST(date_part('day', last_day(d)) AS BIGINT) AS days_in_month,
           isodow(d) >= 6 AS is_weekend
    FROM spine
    """,
)
def gen_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension generator — the warehouse utility table
    (one row per day over the fact table's date span: ISO weekday,
    year/month/quarter, month-start/end flags, days-in-month,
    weekend flag) that date-logic joins against instead of
    recomputing per row. Generated with sequence()/generate_series
    from the fact bounds — a 1-row aggregate fans out to ~2400 days;
    at any fact scale the dimension stays calendar-sized.

    Every attribute is integer/date arithmetic shared by both
    engines; weekday uses the ISO numbering (Monday=1) both sides."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("d")
    )
    iso_dow = F.expr("((dayofweek(d) + 5) % 7) + 1")  # Mon=1..Sun=7
    return spine.select(
        "d",
        iso_dow.cast("bigint").alias("iso_dow"),
        F.year("d").cast("bigint").alias("yr"),
        F.month("d").cast("bigint").alias("mon"),
        F.quarter("d").cast("bigint").alias("qtr"),
        (F.col("d") == F.trunc("d", "month")).alias("is_month_start"),
        (F.col("d") == F.last_day("d")).alias("is_month_end"),
        F.dayofmonth(F.last_day("d")).cast("bigint").alias("days_in_month"),
        (iso_dow >= 6).alias("is_weekend"),
    )


@query(
    "ts_outlier_iqr",
    """
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
             ) AS rn
      FROM events
    ),
    n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM v GROUP BY event_type),
    q AS (
      SELECT n.event_type, n.n,
             q1lo.cents * (4 - (n.n - 1) % 4)
               + COALESCE(q1hi.cents, q1lo.cents) * ((n.n - 1) % 4) AS q1_num,
             q3lo.cents * (4 - (3 * (n.n - 1)) % 4)
               + COALESCE(q3hi.cents, q3lo.cents) * ((3 * (n.n - 1)) % 4)
               AS q3_num
      FROM n
      JOIN v q1lo ON q1lo.event_type = n.event_type
                 AND q1lo.rn = (n.n - 1) // 4 + 1
      LEFT JOIN v q1hi ON q1hi.event_type = n.event_type
                      AND q1hi.rn = (n.n - 1) // 4 + 2
                      AND (n.n - 1) % 4 > 0
      JOIN v q3lo ON q3lo.event_type = n.event_type
                 AND q3lo.rn = (3 * (n.n - 1)) // 4 + 1
      LEFT JOIN v q3hi ON q3hi.event_type = n.event_type
                      AND q3hi.rn = (3 * (n.n - 1)) // 4 + 2
                      AND (3 * (n.n - 1)) % 4 > 0
    )
    SELECT q.event_type, q.n,
           CAST(q.q1_num AS DOUBLE) / 400.0 AS q1,
           CAST(q.q3_num AS DOUBLE) / 400.0 AS q3,
           CAST(q.q3_num - q.q1_num AS DOUBLE) / 400.0 AS iqr,
           CAST(2 * q.q1_num - 3 * (q.q3_num - q.q1_num) AS DOUBLE) / 800.0
             AS fence_lo,
           CAST(2 * q.q3_num + 3 * (q.q3_num - q.q1_num) AS DOUBLE) / 800.0
             AS fence_hi,
           CAST(SUM(CASE WHEN 8 * v.cents <
                              2 * q.q1_num - 3 * (q.q3_num - q.q1_num)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN 8 * v.cents >
                              2 * q.q3_num + 3 * (q.q3_num - q.q1_num)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM q JOIN v ON v.event_type = q.event_type
    GROUP BY q.event_type, q.n, q.q1_num, q.q3_num
    """,
)
def ts_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier census — per event_type, exact interpolated
    Q1/Q3 (the quantile_cont definition in PURE INTEGER arithmetic:
    q·4 = lo·(4−rem) + hi·rem, the agg_quantile_interp_exact device)
    and counts of points beyond the 1.5·IQR fences (Tukey's boxplot
    rule, EDA 1977 — public literature). The fence test is cleared of
    all division — 8·x < 2·Q1num − 3·(Q3num−Q1num) is int64-exact — so
    a point ON a fence classifies identically in both engines; floats
    appear only in the display columns (single divisions of exact
    integers).

    Plan: one per-group sort for the ranked spine (the cost any exact
    quantile pays). The quartile rows are then harvested in ONE pass —
    the tiny (group → probe-rank) frame broadcasts onto the spine and
    a conditional MAX picks each probe row — instead of four rank-probe
    joins; the census then broadcasts the per-group fence frame back
    onto the (still event_type-partitioned) spine, so the whole key
    costs the sort exchange plus one count agg. No collect, no
    all-pairs, state O(|event_type|)."""
    e = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    v = e.select("event_type", cents.alias("cents"))
    w = Window.partitionBy("event_type").orderBy("cents")
    ranked = v.select(
        "event_type", "cents", F.row_number().over(w).alias("rn")
    )
    n = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    probes = n.select(
        "event_type",
        "n",
        (F.expr("(n - 1) div 4") + 1).alias("q1_lo_rn"),
        F.expr("(n - 1) % 4").alias("q1_rem"),
        (F.expr("(3 * (n - 1)) div 4") + 1).alias("q3_lo_rn"),
        F.expr("(3 * (n - 1)) % 4").alias("q3_rem"),
    )

    def pick(rn_col: str) -> F.Column:
        return F.max(F.when(F.col("rn") == F.col(rn_col), F.col("cents")))

    j = (
        ranked.join(F.broadcast(probes), "event_type")
        .groupBy("event_type", "n", "q1_rem", "q3_rem")
        .agg(
            pick("q1_lo_rn").alias("c1lo"),
            F.max(
                F.when(F.col("rn") == F.col("q1_lo_rn") + 1, F.col("cents"))
            ).alias("c1hi"),
            pick("q3_lo_rn").alias("c3lo"),
            F.max(
                F.when(F.col("rn") == F.col("q3_lo_rn") + 1, F.col("cents"))
            ).alias("c3hi"),
        )
    )
    q = j.select(
        "event_type",
        "n",
        (
            F.col("c1lo") * (F.lit(4) - F.col("q1_rem"))
            + F.coalesce(F.col("c1hi"), F.col("c1lo")) * F.col("q1_rem")
        ).alias("q1_num"),
        (
            F.col("c3lo") * (F.lit(4) - F.col("q3_rem"))
            + F.coalesce(F.col("c3hi"), F.col("c3lo")) * F.col("q3_rem")
        ).alias("q3_num"),
    )
    dq = F.col("q3_num") - F.col("q1_num")
    lo_num = F.lit(2) * F.col("q1_num") - F.lit(3) * dq
    hi_num = F.lit(2) * F.col("q3_num") + F.lit(3) * dq
    cen = v.join(F.broadcast(q), "event_type")
    return cen.groupBy("event_type", "n", "q1_num", "q3_num").agg(
        F.sum(F.when(F.lit(8) * F.col("cents") < lo_num, 1).otherwise(0))
        .cast("bigint")
        .alias("n_low"),
        F.sum(F.when(F.lit(8) * F.col("cents") > hi_num, 1).otherwise(0))
        .cast("bigint")
        .alias("n_high"),
    ).select(
        "event_type",
        "n",
        (F.col("q1_num").cast("double") / 400.0).alias("q1"),
        (F.col("q3_num").cast("double") / 400.0).alias("q3"),
        (dq.cast("double") / 400.0).alias("iqr"),
        (lo_num.cast("double") / 800.0).alias("fence_lo"),
        (hi_num.cast("double") / 800.0).alias("fence_hi"),
        "n_low",
        "n_high",
    )


PEAK_HALF = 2  # strict-greater neighborhood half-width


@query(
    "ts_peak_detect",
    f"""
    WITH v AS (
      SELECT event_type, event_id, epoch_us(ts) AS tus,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    st AS (
      SELECT event_type, CAST(SUM(cents) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM v GROUP BY event_type
    ),
    nb AS (
      SELECT v.event_type, v.event_id, v.cents, st.s, st.n,
             LAG(cents, 1) OVER w AS l1, LAG(cents, 2) OVER w AS l2,
             LEAD(cents, 1) OVER w AS r1, LEAD(cents, 2) OVER w AS r2
      FROM v JOIN st ON st.event_type = v.event_type
      WINDOW w AS (PARTITION BY v.event_type ORDER BY tus, event_id)
    )
    SELECT event_type, event_id, cents
    FROM nb
    WHERE l1 IS NOT NULL AND l2 IS NOT NULL
      AND r1 IS NOT NULL AND r2 IS NOT NULL
      AND cents > l1 AND cents > l2 AND cents > r1 AND cents > r2
      AND cents * n > s
    """,
)
def ts_peak_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-peak detection — the alerting primitive behind "flag the
    spikes": a point is a peak iff it STRICTLY exceeds its
    ±{PEAK_HALF} ordered neighbors (interior points only — edges have
    no full neighborhood) AND sits above its series' mean, the
    amplitude guard cross-multiplied (cents·n > s) so no division
    enters the decision. Strict inequalities make plateaus peakless —
    the pinned deterministic convention (a plateau's "peak" is
    order-ambiguous).

    Plan: one event_type exchange, one window pass (4 lag/lead reads
    off one sort), the per-series stats broadcast onto the stream —
    O(1) per-row state at any scale."""
    e = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    v = e.select(
        "event_type", "event_id",
        F.expr("unix_micros(ts)").alias("tus"), cents.alias("cents"),
    )
    st = v.groupBy("event_type").agg(
        F.sum("cents").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    w = Window.partitionBy("event_type").orderBy("tus", "event_id")
    nb = v.join(F.broadcast(st), "event_type").select(
        "event_type",
        "event_id",
        "cents",
        "s",
        "n",
        F.lag("cents", 1).over(w).alias("l1"),
        F.lag("cents", 2).over(w).alias("l2"),
        F.lead("cents", 1).over(w).alias("r1"),
        F.lead("cents", 2).over(w).alias("r2"),
    )
    c = F.col("cents")
    return nb.filter(
        F.col("l1").isNotNull()
        & F.col("l2").isNotNull()
        & F.col("r1").isNotNull()
        & F.col("r2").isNotNull()
        & (c > F.col("l1"))
        & (c > F.col("l2"))
        & (c > F.col("r1"))
        & (c > F.col("r2"))
        & (c * F.col("n") > F.col("s"))
    ).select("event_type", "event_id", "cents")


SMA_SHORT, SMA_LONG = 20, 50


@query(
    "ts_sma_crossover",
    f"""
    WITH daily AS (
      SELECT n_name AS nation, o_orderdate AS day,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ),
    sums AS (
      SELECT nation, day,
             ROW_NUMBER() OVER w AS rn,
             CAST(SUM(rev_cents) OVER (PARTITION BY nation ORDER BY day
                   ROWS BETWEEN {SMA_SHORT - 1} PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS s_short,
             CAST(SUM(rev_cents) OVER (PARTITION BY nation ORDER BY day
                   ROWS BETWEEN {SMA_LONG - 1} PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS s_long
      FROM daily
      WINDOW w AS (PARTITION BY nation ORDER BY day)
    ),
    full_win AS (
      SELECT nation, day, s_short, s_long,
             CASE WHEN CAST(s_short AS HUGEINT) * {SMA_LONG}
                       - CAST(s_long AS HUGEINT) * {SMA_SHORT} > 0 THEN 1
                  WHEN CAST(s_short AS HUGEINT) * {SMA_LONG}
                       - CAST(s_long AS HUGEINT) * {SMA_SHORT} < 0 THEN -1
                  ELSE 0 END AS sgn
      FROM sums WHERE rn >= {SMA_LONG}
    ),
    flagged AS (
      SELECT nation, day, s_short AS s_short_cents, s_long AS s_long_cents,
             sgn,
             LAG(sgn) OVER (PARTITION BY nation ORDER BY day) AS prev_sgn
      FROM full_win
    )
    SELECT nation, day, s_short_cents, s_long_cents,
           CASE WHEN sgn > prev_sgn THEN 'golden' ELSE 'death' END AS signal
    FROM flagged
    WHERE prev_sgn IS NOT NULL AND sgn <> prev_sgn
    """,
)
def ts_sma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover detection (the golden/death-cross
    signal of every monitoring and trading dashboard) on each
    nation's daily revenue series: emit the days where the short
    (SMA_SHORT = 20-day) SMA crosses the long (SMA_LONG = 50-day)
    SMA, labeled by direction. Hash-exact with NO float anywhere:
    SMAs are never divided out — the comparison cross-multiplies the
    rolling sums (s_short·50 vs s_long·20), widened through
    decimal(38,0)/HUGEINT so a 100 TB-scale daily total cannot wrap
    before the sign test; only full-50-row windows emit, and
    the crossover is a sign CHANGE against the previous full-window
    row (lag computed after the full-window filter on both engines).

    Plan: same fact→dim join + nation×day hash aggregate as
    win_drawdown (~25·days rows), then three window passes over the
    same tiny per-nation sort (two ROWS-frame prefix-style sums + one
    lag) — the window never sees fact cardinality."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    daily = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("o_orderdate").alias("day"),
        )
        .agg(F.sum("cents").cast("bigint").alias("rev_cents"))
    )
    w = Window.partitionBy("nation").orderBy("day")
    sums = daily.select(
        "nation",
        "day",
        F.row_number().over(w).alias("rn"),
        F.sum("rev_cents")
        .over(w.rowsBetween(-(SMA_SHORT - 1), 0))
        .cast("bigint")
        .alias("s_short"),
        F.sum("rev_cents")
        .over(w.rowsBetween(-(SMA_LONG - 1), 0))
        .cast("bigint")
        .alias("s_long"),
    )
    d = F.col("s_short").cast("decimal(38,0)") * SMA_LONG - F.col(
        "s_long"
    ).cast("decimal(38,0)") * SMA_SHORT
    full_win = sums.filter(F.col("rn") >= SMA_LONG).select(
        "nation",
        "day",
        "s_short",
        "s_long",
        F.when(d > 0, 1).when(d < 0, -1).otherwise(0).alias("sgn"),
    )
    flagged = full_win.select(
        "nation",
        "day",
        F.col("s_short").alias("s_short_cents"),
        F.col("s_long").alias("s_long_cents"),
        "sgn",
        F.lag("sgn").over(w).alias("prev_sgn"),
    )
    return flagged.filter(
        F.col("prev_sgn").isNotNull() & (F.col("sgn") != F.col("prev_sgn"))
    ).select(
        "nation",
        "day",
        "s_short_cents",
        "s_long_cents",
        F.when(F.col("sgn") > F.col("prev_sgn"), F.lit("golden"))
        .otherwise(F.lit("death"))
        .alias("signal"),
    )


# seasonal decomposition knobs: centered 25-hour trend window (odd, so
# no half-weight endpoints) over the dense hourly spine, hour-of-day
# seasonality (period 24)
SD_HALF = 12          # trend window = 2*SD_HALF + 1 = 25 buckets
SD_W = 2 * SD_HALF + 1


@query(
    "ts_seasonal_decompose",
    f"""
    WITH b AS (
      SELECT date_trunc('hour', ts) AS bkt,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    agg AS (SELECT bkt, CAST(SUM(cents) AS BIGINT) AS x FROM b GROUP BY 1),
    bounds AS (SELECT MIN(bkt) AS lo, MAX(bkt) AS hi FROM agg),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bkt
      FROM bounds
    ),
    dense AS (
      SELECT spine.bkt, COALESCE(agg.x, 0) AS x
      FROM spine LEFT JOIN agg ON spine.bkt = agg.bkt
    ),
    t AS (
      SELECT bkt, x,
             CAST(SUM(x) OVER w AS BIGINT) AS tnum,
             COUNT(*) OVER w AS cnt
      FROM dense
      WINDOW w AS (ORDER BY bkt
                   ROWS BETWEEN {SD_HALF} PRECEDING AND {SD_HALF} FOLLOWING)
    ),
    d AS (
      SELECT bkt, x, CAST(hour(bkt) AS INT) AS hh,
             CASE WHEN cnt = {SD_W} THEN tnum END AS tnum,
             CASE WHEN cnt = {SD_W} THEN {SD_W} * x - tnum END AS dnum
      FROM t
    ),
    s AS (
      SELECT hh, CAST(SUM(dnum) AS BIGINT) AS snum,
             CAST({SD_W} * COUNT(dnum) AS BIGINT) AS sden
      FROM d WHERE dnum IS NOT NULL GROUP BY 1
    )
    SELECT d.bkt AS bucket, d.hh, d.x AS x_cents,
           CAST(d.tnum AS DOUBLE) / {SD_W}.0 AS trend,
           CAST(s.snum AS DOUBLE) / CAST(s.sden AS DOUBLE) AS seasonal,
           CASE WHEN d.tnum IS NOT NULL THEN
             CAST(d.x AS DOUBLE) - CAST(d.tnum AS DOUBLE) / {SD_W}.0
               - CAST(s.snum AS DOUBLE) / CAST(s.sden AS DOUBLE)
           END AS residual
    FROM d LEFT JOIN s ON d.hh = s.hh
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical ADDITIVE SEASONAL DECOMPOSITION (the moving-average
    `decompose` every forecasting workflow starts with): the hourly
    revenue series splits into trend (centered {SD_W}-bucket moving
    mean over a DENSE hourly spine — gaps count as zero-revenue
    hours, not missing rows), hour-of-day seasonal means of the
    detrended series, and the residual. ts_seasonality_profile is the
    raw diurnal rollup; this is the model-grade decomposition —
    seasonal effects measured AFTER the trend is removed, the
    difference between "evenings are busy" and "evenings are busy
    beyond the week's growth".

    Exactness discipline: all sums stay integer cents — the trend is
    carried as (numerator, fixed denominator {SD_W}) and the
    detrended series as the EXACT integer {SD_W}·x − Σwindow, so the
    seasonal means are ratios of exact ints; each output component is
    ONE final IEEE division / subtraction in identical expression
    order on both engines (parallel double summation never occurs —
    the order-sensitivity that would break the hash). The trend is
    NULL at the first/last {SD_HALF} buckets (incomplete window —
    stated, not faked with a shrunken mean).

    Plan/scale: one hash aggregate collapses events to the bucket
    spine (span/width rows — the same bounded-by-construction frame
    ts_interpolate pins), so the ordered windows and the 24-row
    seasonal aggregate never see event rows; the spine join is
    broadcast-sized. At 100 TB the event→bucket aggregate is the only
    stage that scales with data."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    agg = (
        ev.select(F.date_trunc("hour", "ts").alias("bkt"), cents.alias("c"))
        .groupBy("bkt")
        .agg(F.sum("c").cast("bigint").alias("x"))
    )
    bounds = agg.agg(F.min("bkt").alias("lo"), F.max("bkt").alias("hi"))
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("bkt")
    )
    dense = spine.join(agg, "bkt", "left").select(
        "bkt", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
    )
    w = Window.orderBy("bkt").rowsBetween(-SD_HALF, SD_HALF)
    t = dense.select(
        "bkt",
        "x",
        F.sum("x").over(w).cast("bigint").alias("tnum_raw"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    d = t.select(
        "bkt",
        "x",
        F.hour("bkt").cast("int").alias("hh"),
        F.when(F.col("cnt") == SD_W, F.col("tnum_raw")).alias("tnum"),
        F.when(
            F.col("cnt") == SD_W, SD_W * F.col("x") - F.col("tnum_raw")
        ).alias("dnum"),
    )
    s = (
        d.filter(F.col("dnum").isNotNull())
        .groupBy("hh")
        .agg(
            F.sum("dnum").cast("bigint").alias("snum"),
            (SD_W * F.count("dnum")).cast("bigint").alias("sden"),
        )
    )
    seasonal = F.col("snum").cast("double") / F.col("sden").cast("double")
    trend = F.col("tnum").cast("double") / float(SD_W)
    return d.join(s, "hh", "left").select(
        F.col("bkt").alias("bucket"),
        "hh",
        F.col("x").alias("x_cents"),
        trend.alias("trend"),
        seasonal.alias("seasonal"),
        F.when(
            F.col("tnum").isNotNull(),
            F.col("x").cast("double") - trend - seasonal,
        ).alias("residual"),
    )


HW_M = 24  # Holt-Winters season length: hour-of-day over the hourly spine


@query(
    "ts_holt_winters",
    f"""
    WITH RECURSIVE bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    groups AS (SELECT DISTINCT event_type AS g FROM events),
    spine AS (
      SELECT g, CAST(u.t AS BIGINT) AS t
      FROM groups, bounds,
           UNNEST(range(0, CAST(date_diff('hour', lo, hi) AS BIGINT) + 1))
             AS u(t)
    ),
    agg AS (
      SELECT event_type AS g,
             CAST(date_diff('hour', (SELECT lo FROM bounds),
                            date_trunc('hour', ts)) AS BIGINT) AS t,
             CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT s.g, s.t, COALESCE(a.y, 0) AS y
      FROM spine s LEFT JOIN agg a USING (g, t)
    ),
    init_l AS (
      SELECT g, CAST(SUM(y) // {HW_M} AS BIGINT) AS l
      FROM series WHERE t < {HW_M} GROUP BY g
    ),
    init AS (
      SELECT series.g, FIRST(l) AS l, list(y - l ORDER BY t) AS sv
      FROM series JOIN init_l USING (g) WHERE t < {HW_M} GROUP BY series.g
    ),
    rec(g, t, l, b, sv, y, fitted, resid, s_new) AS (
      SELECT g, CAST({HW_M} - 1 AS BIGINT), l, CAST(0 AS BIGINT), sv,
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
             CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
      FROM init
      UNION ALL
      SELECT q.g, q.t, q.l_new,
             q.b + (q.l_new - q.l - q.b) // 16,
             list_transform(q.sv, (x, i) -> CASE WHEN i = q.idx
               THEN q.s_old + (q.y - q.l_new - q.s_old) // 8 ELSE x END),
             q.y,
             q.l + q.b + q.s_old,
             q.y - (q.l + q.b + q.s_old),
             q.s_old + (q.y - q.l_new - q.s_old) // 8
      FROM (
        SELECT p.*, p.l + p.b + (p.y - p.s_old - p.l - p.b) // 4 AS l_new
        FROM (
          SELECT r.g, r.t + 1 AS t, r.l, r.b, r.sv, ser.y,
                 CAST(((r.t + 1) % {HW_M}) + 1 AS INT) AS idx,
                 r.sv[CAST(((r.t + 1) % {HW_M}) + 1 AS INT)] AS s_old
          FROM rec r JOIN series ser ON ser.g = r.g AND ser.t = r.t + 1
        ) p
      ) q
    )
    SELECT g, t, y, l AS level, b AS trend, s_new AS seasonal, fitted, resid
    FROM rec WHERE t >= {HW_M}
    """,
)
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple exponential smoothing (additive HOLT-WINTERS — the
    classical level/trend/seasonal forecaster) over per-event-type
    hourly revenue, HASH-EXACT by construction: the recursion runs in
    pure int64 cents with DYADIC smoothing in error-correction form
    — α=1/4, β=1/16, γ=1/8, each update one truncating
    power-of-two division (the ts_ema_dyadic
    no-compounding-float-error discipline, extended from a fold to a
    full three-state recursion) — so both engines replay the
    identical integer sequence and every level, trend, seasonal,
    one-step-ahead fit and residual matches bit-for-bit. The
    parameters sit INSIDE the additive-HW stability region
    (α=β=γ=1/2 provably DIVERGES on a clean trend+seasonal
    series — measured while building the gate; high β is the
    classic HW instability) and lock a structured series to the
    cents-scale truncation floor (tests/test_round14b_keys.py).
    Initialization is the textbook one, integer-exact: level = mean
    of the first season (truncated), trend = 0, seasonals = first-
    season deviations. The DuckDB oracle replays all ~{HW_M}×29 steps
    per series in ONE recursive CTE carrying the {HW_M}-slot seasonal
    vector as a list (the BPE-merge replay device, state upgraded
    from scalars to a vector via an indexed list_transform).

    Plan/scale: events collapse to the dense (group × hour) spine in
    one hash aggregate — after that the sequential recursion runs
    per-series inside ``applyInPandas``, the honest shape for an
    inherently order-dependent model: series are independent, so a
    100 TB deployment with millions of (product, region) series is
    embarrassingly parallel across groups while each series pays its
    own O(T) loop over ALREADY-AGGREGATED buckets (T ≈ hours, not
    events). The 1-row bounds frame rides a broadcast; no stage ever
    sees event rows after the first aggregate."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    agg = (
        ev.select(
            F.col("event_type").alias("g"),
            F.date_trunc("hour", "ts").alias("bkt"),
            cents.alias("c"),
        )
        .groupBy("g", "bkt")
        .agg(F.sum("c").cast("bigint").alias("y"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    agg_t = agg.crossJoin(F.broadcast(bounds)).select(
        "g",
        F.expr("CAST(timestampdiff(HOUR, lo, bkt) AS BIGINT)").alias("t"),
        "y",
    )
    spine = (
        ev.select(F.col("event_type").alias("g"))
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "g",
            F.explode(
                F.expr(
                    "sequence(CAST(0 AS BIGINT),"
                    " CAST(timestampdiff(HOUR, lo, hi) AS BIGINT))"
                )
            ).alias("t"),
        )
    )
    series = spine.join(agg_t, ["g", "t"], "left").select(
        "g", "t", F.coalesce("y", F.lit(0)).cast("bigint").alias("y")
    )

    m = HW_M

    def hw(pdf):
        import pandas as pd

        def tdiv(a: int, d: int) -> int:  # truncate-toward-zero div
            return -((-a) // d) if a < 0 else a // d

        pdf = pdf.sort_values("t")
        g = pdf["g"].iloc[0]
        ys = [int(v) for v in pdf["y"]]
        lvl = sum(ys[:m]) // m
        sv = [ys[i] - lvl for i in range(m)]
        b = 0
        rows = []
        for t in range(m, len(ys)):
            y = ys[t]
            idx = t % m
            s_old = sv[idx]
            fitted = lvl + b + s_old
            l_new = lvl + b + tdiv(y - s_old - lvl - b, 4)
            b_new = b + tdiv(l_new - lvl - b, 16)
            s_new = s_old + tdiv(y - l_new - s_old, 8)
            rows.append((g, t, y, l_new, b_new, s_new, fitted, y - fitted))
            lvl, b, sv[idx] = l_new, b_new, s_new
        return pd.DataFrame(
            rows,
            columns=["g", "t", "y", "level", "trend", "seasonal",
                     "fitted", "resid"],
        )

    return series.groupBy("g").applyInPandas(
        hw,
        schema="g string, t bigint, y bigint, level bigint, trend bigint,"
        " seasonal bigint, fitted bigint, resid bigint",
    )
