"""Semantic gates for the round-4 ClickHouse aggregate signatures
(queries/aggregations_ch.py): uniqUpTo saturation, topKWeighted
ranking vs a Python reference, deltaSum vs a sequential replay."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_uniq_upto_caps_against_exact(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import (
        UNIQ_UPTO_N,
        agg_uniq_upto,
    )

    e = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rows = agg_uniq_upto(spark, sf_dir).collect()
    assert {r.event_type for r in rows} == set(exact)
    for r in rows:
        assert r.users_upto == min(exact[r.event_type], UNIQ_UPTO_N + 1)
        assert r.users_upto_5 == min(exact[r.event_type], 6)
    # the fixture must exercise the saturated branch of the small cap
    assert any(r.users_upto_5 == 6 for r in rows)


def test_topk_weighted_matches_python_reference(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import (
        TOPK_W,
        agg_topk_weighted,
    )

    li = load_table(spark, sf_dir, "lineitem")
    sums = (
        li.groupBy("l_returnflag", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("w")
        )
        .collect()
    )
    by_group: dict = {}
    for r in sums:
        by_group.setdefault(r.l_returnflag, []).append((r.l_suppkey, r.w))
    want = {
        g: [
            s
            for s, _ in sorted(items, key=lambda t: (-t[1], t[0]))[:TOPK_W]
        ]
        for g, items in by_group.items()
    }
    got: dict = {}
    for r in agg_topk_weighted(spark, sf_dir).collect():
        got.setdefault(r.l_returnflag, {})[r.rank] = r.l_suppkey
        assert 1 <= r.rank <= TOPK_W
    assert {g: [d[i] for i in sorted(d)] for g, d in got.items()} == want


def test_delta_sum_matches_sequential_replay(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import agg_delta_sum

    e = load_table(spark, sf_dir, "events")
    sample_users = [r.user_id for r in e.select("user_id").distinct().limit(5).collect()]
    rows = (
        e.filter(F.col("user_id").isin(sample_users))
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series: dict = {}
    for r in rows:
        series.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    want = {}
    for u, evs in series.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        vq = [math.floor(v * 1_000_000.0) for _, _, v in evs]
        want[u] = sum(max(b - a, 0) for a, b in zip(vq, vq[1:]))
    got = {
        r.user_id: r.delta_sum_micros
        for r in agg_delta_sum(spark, sf_dir).collect()
        if r.user_id in series
    }
    assert got == want
    # a counter that resets must report only its increases
    for u, evs in series.items():
        if any(b < a for (_, _, a), (_, _, b) in zip(evs, evs[1:])):
            assert got[u] >= 0
            break


def test_linreg_matches_python_reference(spark, sf_dir):
    """Slope/intercept equal a least-squares replay over the SAME
    cent-quantized series (exact integer moments in Python)."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import agg_linreg

    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select("l_returnflag", "l_quantity", "l_extendedprice").collect()
    mom: dict = {}
    for r in rows:
        xq = math.floor(r.l_quantity * 100.0)
        yq = math.floor(r.l_extendedprice * 100.0)
        m = mom.setdefault(r.l_returnflag, [0, 0, 0, 0, 0])
        m[0] += 1
        m[1] += xq
        m[2] += yq
        m[3] += xq * xq
        m[4] += xq * yq
    got = {r.l_returnflag: r for r in agg_linreg(spark, sf_dir).collect()}
    assert set(got) == set(mom)
    for flag, (n, sx, sy, sxx, sxy) in mom.items():
        nd, sxd, syd, sxxd, sxyd = float(n), float(sx), float(sy), float(sxx), float(sxy)
        slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
        intercept = (syd - slope * sxd) / (100.0 * nd)
        assert got[flag].n == n
        assert got[flag].slope == slope
        assert got[flag].intercept == intercept
        # the fit is non-degenerate (denominator nonzero, finite result)
        assert math.isfinite(got[flag].slope)


def test_bounding_ratio_matches_endpoint_replay(spark, sf_dir):
    """Endpoints and slope equal a sequential per-user replay over the
    same (ts, event_id) total order and micro-quantized values."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import agg_bounding_ratio

    e = load_table(spark, sf_dir, "events")
    rows = e.select("user_id", "ts", "event_id", "value").collect()
    series: dict = {}
    for r in rows:
        series.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    want = {}
    for u, evs in series.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        t0, t1 = evs[0][0], evs[-1][0]
        span = int((t1 - t0).total_seconds() * 1_000_000)
        if span <= 0:
            continue
        dv = math.floor(evs[-1][2] * 1e6) - math.floor(evs[0][2] * 1e6)
        want[u] = (span, dv, float(dv) / (float(span) / 1e6))
    got = {
        r.user_id: (r.span_micros, r.dv_micros, r.rate_per_sec)
        for r in agg_bounding_ratio(spark, sf_dir).collect()
    }
    assert got == want


def test_moving_median_matches_sequential_replay(spark, sf_dir):
    """Window medians equal a per-user sequential replay (lower middle
    of the sorted 5-point frame, micro-quantized)."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.timeseries import (
        MOVMED_FRAME,
        ts_moving_median,
    )

    e = load_table(spark, sf_dir, "events")
    sample = [r.user_id for r in e.select("user_id").distinct().limit(4).collect()]
    rows = (
        e.filter(F.col("user_id").isin(sample))
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series: dict = {}
    for r in rows:
        series.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    want = {}
    for u, evs in series.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        vq = [math.floor(v * 1e6) for _, _, v in evs]
        for i, (_, eid, _) in enumerate(evs):
            frame = sorted(vq[max(0, i - MOVMED_FRAME): i + 1])
            want[(u, eid)] = (len(frame), frame[(len(frame) + 1) // 2 - 1])
    got = {
        (r.user_id, r.event_id): (r.n_window, r.median_micros)
        for r in ts_moving_median(spark, sf_dir).collect()
        if r.user_id in sample
    }
    assert got == want


def test_entropy_gini_matches_counter_replay(spark, sf_dir):
    """Gini and whole-bit entropy equal a Counter replay, and both
    move the right way: a uniform distribution scores higher than a
    concentrated one on both measures."""
    from collections import Counter

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import agg_entropy_gini

    e = load_table(spark, sf_dir, "events")
    counts: dict = {}
    for r in e.select("event_type", "user_id").collect():
        counts.setdefault(r.event_type, Counter())[r.user_id] += 1
    got = {r.event_type: r for r in agg_entropy_gini(spark, sf_dir).collect()}
    assert set(got) == set(counts)
    for et, c in counts.items():
        n = sum(c.values())
        gini = 1.0 - float(sum(v * v for v in c.values())) / (float(n) * float(n))
        bits = float(sum(v * ((n // v).bit_length() - 1) for v in c.values())) / float(n)
        assert got[et].n_events == n
        assert got[et].n_users == len(c)
        assert got[et].gini == gini
        assert got[et].entropy_bits == bits
        # bounds: gini in [0, 1), dyadic entropy within 1 bit of Shannon
        assert 0.0 <= gini < 1.0
        shannon = -sum(
            (v / n) * math.log2(v / n) for v in c.values()
        )
        assert bits <= shannon + 1e-9 and bits >= shannon - 1.0


def test_gap_report_matches_sequential_replay(spark, sf_dir):
    """Reported gaps equal a per-user sequential scan: every silence
    over the threshold, attributed to the event that ended it."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.timeseries import GAP_MICROS, ts_gap_report

    e = load_table(spark, sf_dir, "events")
    rows = e.select("user_id", "ts", "event_id").collect()
    series: dict = {}
    for r in rows:
        series.setdefault(r.user_id, []).append((r.ts, r.event_id))
    epoch = __import__("datetime").datetime(1970, 1, 1)
    want = {}
    for u, evs in series.items():
        evs.sort()
        tqs = [int((t - epoch).total_seconds() * 1_000_000) for t, _ in evs]
        for (t_prev, (_, _)), (t_cur, (_, eid)) in zip(
            zip(tqs, evs), zip(tqs[1:], evs[1:])
        ):
            gap = t_cur - t_prev
            if gap > GAP_MICROS:
                want[(u, eid)] = (gap, gap // GAP_MICROS)
    got = {
        (r.user_id, r.event_id): (r.gap_micros, r.gap_days)
        for r in ts_gap_report(spark, sf_dir).collect()
    }
    assert got == want
    assert all(g > GAP_MICROS for g, _ in got.values())


def test_heavy_hitters_cms_bounds_and_merge_equals_single_pass(spark, sf_dir):
    """agg_heavy_hitters_cms gates: (a) CMS never underestimates
    (overcount >= 0) and stays within eps*N with margin; (b) per-day
    shard sketches merged by the pure-Python ops/cms.py merger are
    BYTE-IDENTICAL to the one-pass sketch over the same data (CMS merge
    is exact counter addition — the rollup-forever property); (c) the
    reported true counts match an exact recount; (d) the Python V1
    reader's estimates equal the JVM's own estimateCount bit-exactly
    (pins the byte-format assumption against Spark's implementation)."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.ops.cms import SparkCMS
    from etl_ch_destination_spark.queries.aggregations_ch import (
        CMS_CONF,
        CMS_EPS,
        CMS_SEED,
        agg_heavy_hitters_cms,
    )

    rep = agg_heavy_hitters_cms(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_total = ev.count()
    exact = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rep:
        assert r.true_n == exact[r.user_id]
        assert r.overcount >= 0
        assert r.overcount <= CMS_EPS * n_total  # the eps*N guarantee

    cms_agg = F.count_min_sketch(
        "user_id", F.lit(CMS_EPS), F.lit(CMS_CONF), F.lit(CMS_SEED)
    )
    single_bytes = bytes(ev.agg(cms_agg.alias("sk")).head().sk)
    single = SparkCMS.from_bytes(single_bytes)
    for r in rep:
        assert single.estimate_long(int(r.user_id)) == r.est_n

    # (b) shard-and-merge == one pass, byte-for-byte
    shards = (
        ev.withColumn("__shard", F.to_date("ts"))
        .groupBy("__shard")
        .agg(cms_agg.alias("sk"))
        .collect()
    )
    assert len(shards) > 1, "fixture should span multiple days"
    parsed = [SparkCMS.from_bytes(bytes(s.sk)) for s in shards]
    merged = parsed[0]
    for p in parsed[1:]:
        merged = merged.merge(p)
    assert merged.to_bytes() == single_bytes

    # (d) reader matches the JVM's own estimates on raw heavy/light ids
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(single_bytes)
    jsk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    assert int(jsk.totalCount()) == single.total_count == n_total
    probe_ids = [int(r.user_id) for r in rep] + [-1, 0, 10**12 + 7]
    for uid in probe_ids:
        assert single.estimate_long(uid) == int(jsk.estimateCount(uid))


def test_cms_reader_roundtrip_and_guards(spark, sf_dir):
    """ops/cms.py unit gates: byte round-trip, geometry-mismatch merge
    refusal, and the operator's empty-input guard (ADVICE r5: no
    AttributeError when the source yields no rows)."""
    import pytest as _pytest

    from etl_ch_destination_spark.ops.cms import SparkCMS
    from etl_ch_destination_spark.queries.aggregations_ch import (
        agg_heavy_hitters_cms,
    )

    df = spark.range(0, 500).select((F.col("id") % 11).alias("v"))
    b1 = bytes(
        df.agg(
            F.count_min_sketch("v", F.lit(0.01), F.lit(0.9), F.lit(7)).alias("sk")
        ).head().sk
    )
    sk1 = SparkCMS.from_bytes(b1)
    assert sk1.to_bytes() == b1
    for v in range(11):
        assert sk1.estimate_long(v) >= 500 // 11

    b2 = bytes(
        df.agg(
            F.count_min_sketch("v", F.lit(0.1), F.lit(0.9), F.lit(7)).alias("sk")
        ).head().sk
    )
    with _pytest.raises(ValueError, match="incompatible"):
        sk1.merge(SparkCMS.from_bytes(b2))

    # empty-input guard: declared schema, zero rows, no crash
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        import pyarrow.parquet as pq

        # single-file parquet like the driver fixtures (load_table
        # sniffs the footer of a plain file, not a Spark directory)
        src = pq.read_table(os.path.join(sf_dir, "events.parquet"))
        pq.write_table(src.slice(0, 0), os.path.join(td, "events.parquet"))
        out = agg_heavy_hitters_cms(spark, td)
        assert out.columns == ["user_id", "true_n", "est_n", "overcount"]
        assert out.count() == 0
