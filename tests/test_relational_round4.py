"""Invariant gates for the round-4 relational-algebra continuation
batch: bit aggregates, interval-union length, correlated-subquery
decorrelation, and array set algebra. Each test replays the operator's
defining property with an independent Python computation; oracle
parity pins the value-level rest.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F


def test_group_bit_python_replay(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import agg_group_bit

    got = {r.event_type: r for r in agg_group_bit(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "event_id"
    ).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert set(got) == set(by_type)
    for et, rs in by_type.items():
        uids = [r.user_id for r in rs]
        los = [r.event_id % 256 for r in rs]
        g = got[et]
        assert g.band == reduce(lambda x, y: x & y, uids)
        assert g.bor == reduce(lambda x, y: x | y, uids)
        assert g.bxor == reduce(lambda x, y: x ^ y, uids)
        assert g.band_lo == reduce(lambda x, y: x & y, los)
        assert g.bxor_lo == reduce(lambda x, y: x ^ y, los)
        assert g.n == len(rs)


def test_interval_length_sum_equals_merged_union(spark, sf_dir):
    """covered_sec must equal the length of the union of the user's
    intervals computed by the classic sort-and-merge sweep; island
    count must match the number of merged runs."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import (
        IVL_BASE_SEC,
        IVL_MOD_SEC,
        agg_interval_length_sum,
    )

    got = {r.user_id: r for r in agg_interval_length_sum(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    ).collect()
    ivs: dict[int, list] = {}
    for r in ev:
        s = r.us // 1_000_000
        ivs.setdefault(r.user_id, []).append(
            (s, s + r.event_id % IVL_MOD_SEC + IVL_BASE_SEC)
        )
    assert set(got) == set(ivs)
    for uid, pairs in ivs.items():
        pairs.sort()
        merged = []
        for s, e in pairs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        assert got[uid].covered_sec == sum(e - s for s, e in merged)
        assert got[uid].n_islands == len(merged)


def test_subq_correlated_matches_python_decorrelation(spark, sf_dir):
    from decimal import Decimal

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.joins_extra import subq_correlated

    got = {r.o_orderkey: r.price_cents for r in subq_correlated(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).collect()
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey").collect()
    returned = {r.l_orderkey for r in li}
    cents = {
        r.o_orderkey: int(
            Decimal(str(r.o_totalprice)).quantize(Decimal("0.01")) * 100
        )
        for r in orders
    }
    by_cust: dict[int, list] = {}
    for r in orders:
        by_cust.setdefault(r.o_custkey, []).append(r.o_orderkey)
    expect = {}
    for cust, oks in by_cust.items():
        total = sum(cents[k] for k in oks)
        n = len(oks)
        for k in oks:
            if cents[k] * n > total and k in returned:
                expect[k] = cents[k]
    assert got == expect


def test_arr_set_ops_python_set_replay(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.scalars_complex import (
        ARRSET_HEAD,
        arr_set_ops,
    )

    got = {r.doc_id: r for r in arr_set_ops(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    n_checked = 0
    for r in docs:
        toks = r.text.split(" ")
        if len(toks) < 2 * ARRSET_HEAD:
            assert r.doc_id not in got
            continue
        a = set(toks[:ARRSET_HEAD])
        b = set(toks[-ARRSET_HEAD:])
        g = got[r.doc_id]
        assert g.inter == "|".join(sorted(a & b))
        assert g.uni == "|".join(sorted(a | b))
        assert g.exc == "|".join(sorted(a - b))
        assert (g.n_inter, g.n_union, g.n_except) == (
            len(a & b), len(a | b), len(a - b),
        )
        n_checked += 1
    assert n_checked > 0


def test_iso_week_matches_python_isocalendar(spark, sf_dir):
    """Third engine: Python's datetime.isocalendar() must agree with
    the Spark arithmetic derivation on every order date (the oracle
    already pins DuckDB's isoyear/weekofyear as the second)."""
    from etl_ch_destination_spark.queries.timeseries_extra import date_iso_week
    from etl_ch_destination_spark.catalog import load_table

    got = {r.o_orderkey: r for r in date_iso_week(spark, sf_dir).collect()}
    dates = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    ).collect()
    import datetime as dt

    for r in dates:
        iso = r.od.isocalendar()
        g = got[r.o_orderkey]
        assert (g.iso_year, g.iso_week, g.iso_dow) == (
            iso[0], iso[1], iso[2],
        ), (r.od, tuple(iso), g)
        assert g.week_start == r.od - dt.timedelta(days=iso[2] - 1)


def test_seq_next_node_python_replay(spark, sf_dir):
    from etl_ch_destination_spark.queries.reports_behavior import (
        SEQ_BASE_EVENT,
        seq_next_node,
    )
    from etl_ch_destination_spark.catalog import load_table

    got = {r.user_id: r for r in seq_next_node(spark, sf_dir).collect()}
    ev = sorted(
        load_table(spark, sf_dir, "events").select(
            "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
        ).collect(),
        key=lambda r: (r.user_id, r.us, r.event_id),
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    expect_users = set()
    for uid, rs in by_user.items():
        anchor_idx = next(
            (i for i, r in enumerate(rs) if r.event_type == SEQ_BASE_EVENT), None
        )
        if anchor_idx is None:
            assert uid not in got
            continue
        expect_users.add(uid)
        g = got[uid]
        assert g.anchor_event_id == rs[anchor_idx].event_id
        if anchor_idx + 1 < len(rs):
            nxt = rs[anchor_idx + 1]
            assert g.next_type == nxt.event_type
            assert g.next_event_id == nxt.event_id
            assert g.gap_sec == nxt.us // 1_000_000 - rs[anchor_idx].us // 1_000_000
        else:
            assert g.next_type is None and g.next_event_id is None
    assert set(got) == expect_users


def test_bitmap_ops_inclusion_exclusion_and_sets(spark, sf_dir):
    from etl_ch_destination_spark.queries.aggregations_ch import (
        BITMAP_BASE_EVENT,
        agg_bitmap_ops,
    )
    from etl_ch_destination_spark.catalog import load_table

    got = {r.event_type: r for r in agg_bitmap_ops(spark, sf_dir).collect()}
    pairs = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id"
    ).distinct().collect()
    sets: dict[str, set] = {}
    for r in pairs:
        sets.setdefault(r.event_type, set()).add(r.user_id)
    base = sets[BITMAP_BASE_EVENT]
    assert set(got) == set(sets)
    for et, s in sets.items():
        g = got[et]
        assert g.card_t == len(s)
        assert g.card_base == len(base)
        assert g.card_and == len(s & base)
        assert g.card_or == len(s | base)
        assert g.card_andnot == len(base - s)
        # inclusion-exclusion closes
        assert g.card_or == g.card_base + g.card_t - g.card_and
    # the base row intersects itself completely
    gb = got[BITMAP_BASE_EVENT]
    assert gb.card_and == gb.card_base and gb.card_andnot == 0


def test_minmax_map_brackets_sum_map(spark, sf_dir):
    """lo <= hi always; per metric the (lo, hi) bracket must contain
    the group's mean implied by agg_sum_map's totals."""
    from etl_ch_destination_spark.queries.aggregations_ch import agg_minmax_map
    from etl_ch_destination_spark.queries.aggregations import agg_sum_map
    from etl_ch_destination_spark.catalog import load_table

    mm = {(r.l_returnflag, r.metric): r for r in agg_minmax_map(spark, sf_dir).collect()}
    sm = {(r.l_returnflag, r.metric): r.total for r in agg_sum_map(spark, sf_dir).collect()}
    n = {
        r.l_returnflag: r.n
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(mm) == set(sm)
    for (flag, metric), r in mm.items():
        assert r.lo <= r.hi
        mean = sm[(flag, metric)] / n[flag]
        assert r.lo <= mean <= r.hi


def test_quantiles_weighted_python_replay(spark, sf_dir):
    from etl_ch_destination_spark.queries.aggregations_ch import (
        QW_MILLE,
        agg_quantiles_weighted,
    )
    from etl_ch_destination_spark.catalog import load_table
    from decimal import Decimal

    got = {r.l_returnflag: r for r in agg_quantiles_weighted(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    groups: dict[str, list] = {}
    for r in rows:
        val = int(Decimal(str(r.l_extendedprice)).quantize(Decimal("0.01")) * 100)
        groups.setdefault(r.l_returnflag, []).append((val, int(r.l_quantity)))
    assert set(got) == set(groups)
    for flag, vw in groups.items():
        vw.sort()
        W = sum(w for _, w in vw)
        g = got[flag]
        assert g.total_weight == W
        for q in QW_MILLE:
            cum = 0
            for v, w in vw:
                cum += w
                if 1000 * cum >= q * W:
                    assert getattr(g, f"q{q}") == v
                    break
        # monotone in q
        qs = [getattr(g, f"q{q}") for q in QW_MILLE]
        assert qs == sorted(qs)


def test_skew_kurt_matches_float_reference(spark, sf_dir):
    """The quantized-moment closed form must agree with a straight
    numpy population skew/kurtosis on the cent-rounded values to
    ~1e-9 relative (numpy sums in float order; ours is exact-integer
    then one IEEE evaluation — tiny drift is expected, sign/magnitude
    agreement is the gate)."""
    import numpy as np

    from etl_ch_destination_spark.queries.aggregations_ch import agg_skew_kurt
    from etl_ch_destination_spark.catalog import load_table

    got = {r.event_type: r for r in agg_skew_kurt(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(round(r.value * 100))
    for et, xs in by_type.items():
        a = np.array(xs, dtype=np.float64)
        m = a.mean()
        m2 = ((a - m) ** 2).mean()
        skew = ((a - m) ** 3).mean() / m2**1.5
        kurt = ((a - m) ** 4).mean() / m2**2 - 3
        g = got[et]
        assert abs(g.skew_pop - skew) <= 1e-9 * max(1, abs(skew))
        assert abs(g.kurt_excess - kurt) <= 1e-9 * max(1, abs(kurt))
        assert g.n == len(xs)


def test_autocorr_matches_numpy_corrcoef(spark, sf_dir):
    import numpy as np

    from etl_ch_destination_spark.queries.timeseries_extra import ts_autocorr
    from etl_ch_destination_spark.catalog import load_table

    got = {r.user_id: r for r in ts_autocorr(spark, sf_dir).collect()}
    ev = sorted(
        load_table(spark, sf_dir, "events").select(
            "user_id", "event_id", "ts", "value"
        ).collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    series: dict[int, list] = {}
    for r in ev:
        series.setdefault(r.user_id, []).append(round(r.value * 100))
    for uid, xs in series.items():
        if len(xs) < 2:
            assert uid not in got
            continue
        x = np.array(xs[1:], dtype=np.float64)
        y = np.array(xs[:-1], dtype=np.float64)
        if x.std() == 0 or y.std() == 0:
            assert uid not in got
            continue
        ref = float(np.corrcoef(x, y)[0, 1])
        g = got[uid]
        assert g.n_pairs == len(x)
        assert abs(g.r1 - ref) <= 1e-9


def test_bag_ops_multiset_algebra(spark, sf_dir):
    """intersectAll keeps min(m, n) copies, exceptAll max(m - n, 0) —
    verified against Counter arithmetic on the raw rows."""
    from collections import Counter

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.setops import set_bag_ops

    rows = set_bag_ops(spark, sf_dir).collect()
    got_inter = Counter((r.k, r.tag) for r in rows if r.op == "intersect_all")
    got_exc = Counter((r.k, r.tag) for r in rows if r.op == "except_all")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_linenumber", "l_returnflag", "l_linestatus"
    ).collect()
    a = Counter((r.l_suppkey, r.l_linenumber % 3) for r in li if r.l_returnflag == "R")
    b = Counter((r.l_suppkey, r.l_linenumber % 3) for r in li if r.l_linestatus == "F")
    exp_inter = Counter({k: min(a[k], b[k]) for k in a if k in b and min(a[k], b[k]) > 0})
    exp_exc = a - b
    assert got_inter == +exp_inter
    assert got_exc == exp_exc


def test_null_safe_join_matches_null_group(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.joins_extra import join_null_safe

    rows = join_null_safe(spark, sf_dir).collect()
    nat = load_table(spark, sf_dir, "nation").collect()
    null_names = sorted(r.n_name for r in nat if r.n_nationkey % 5 == 0)
    ords = load_table(spark, sf_dir, "orders").select("o_orderkey").collect()
    null_orders = [r.o_orderkey for r in ords if r.o_orderkey % 7 == 0]
    # every NULL-bucket order matches every NULL-bucket nation member
    got_null = [r for r in rows if r.bucket is None]
    assert len(got_null) == len(null_orders) * len(null_names)
    # and non-null rows obey plain equality
    for r in rows:
        if r.bucket is not None:
            assert r.o_orderkey % 7 != 0 and r.o_orderkey % 25 == r.bucket


def test_ngram_distance_python_set_replay(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.scalars_complex import (
        NGRAM_HEAD_CHARS,
        str_ngram_distance,
    )

    got = {r.doc_id: r for r in str_ngram_distance(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    n_checked = 0
    for r in docs:
        if len(r.text) < 2 * NGRAM_HEAD_CHARS:
            assert r.doc_id not in got
            continue
        a = r.text[:NGRAM_HEAD_CHARS].lower()
        b = r.text[-NGRAM_HEAD_CHARS:].lower()
        ga = {a[i : i + 3] for i in range(len(a) - 2)}
        gb = {b[i : i + 3] for i in range(len(b) - 2)}
        g = got[r.doc_id]
        assert (g.n_a, g.n_b, g.n_common) == (len(ga), len(gb), len(ga & gb))
        assert abs(g.trigram_dist - (1 - len(ga & gb) / len(ga | gb))) < 1e-12
        assert 0.0 <= g.trigram_dist <= 1.0
        n_checked += 1
    assert n_checked > 0


def test_time_slots_tile_the_interval(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.timeseries_extra import (
        SLOT_DUR_BASE,
        SLOT_DUR_MOD,
        SLOT_SEC,
        date_time_slots,
    )

    rows = date_time_slots(spark, sf_dir).collect()
    by_event: dict[int, list] = {}
    for r in rows:
        by_event.setdefault(r.event_id, []).append(r)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("us")
    ).collect()
    assert set(by_event) == {r.event_id for r in ev}
    for r in ev:
        s = r.us // 1_000_000
        e = s + r.event_id % SLOT_DUR_MOD + SLOT_DUR_BASE
        slots = sorted(
            int(x.slot_start.timestamp()) for x in by_event[r.event_id]
        )
        # consecutive 1800s grid covering [s, e)
        assert slots[0] == (s // SLOT_SEC) * SLOT_SEC
        assert slots[-1] == ((e - 1) // SLOT_SEC) * SLOT_SEC
        assert all(b - a == SLOT_SEC for a, b in zip(slots, slots[1:]))
        assert all(x.dur_sec == e - s for x in by_event[r.event_id])


def test_partition_pruning_reaches_the_scan(spark, sf_dir):
    """The partitioned read must prune at plan time: PartitionFilters
    in the scan node, and inputFiles() confined to the two selected
    event_type directories."""
    import io
    from contextlib import redirect_stdout

    from etl_ch_destination_spark.queries.sources_sinks import (
        PRUNE_TYPES,
        _scratch,
        scan_partition_pruned,
    )

    df = scan_partition_pruned(spark, sf_dir)  # also (re)writes the layout
    path = _scratch(sf_dir, "scan_partition_pruned")
    from pyspark.sql import functions as FF

    back = spark.read.parquet(path).filter(FF.col("event_type").isin(*PRUNE_TYPES))
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain(True)
    phys = buf.getvalue().split("== Physical Plan ==")[-1]
    assert "PartitionFilters" in phys and "event_type" in phys
    files = [
        r[0]
        for r in back.select(FF.input_file_name()).distinct().collect()
    ]
    assert files, "no input files resolved"
    for f in files:
        assert any(f"event_type={t}" in f for t in PRUNE_TYPES), f
    # and the full 5-type layout exists on disk (pruning, not absence)
    all_files = spark.read.parquet(path).inputFiles()
    assert len({f.split("event_type=")[1].split("/")[0] for f in all_files}) == 5
    assert df.count() > 0


def test_group_array_moving_python_replay(spark, sf_dir):
    from decimal import Decimal

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import (
        MOV_WIN,
        agg_group_array_moving,
    )

    got = {r.user_id: r for r in agg_group_array_moving(spark, sf_dir).collect()}
    ev = sorted(
        load_table(spark, sf_dir, "events").select(
            "user_id", "event_id", "ts", "value"
        ).collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    series: dict[int, list] = {}
    for r in ev:
        cents = int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
        series.setdefault(r.user_id, []).append(cents)
    assert set(got) == set(series)
    for uid, xs in series.items():
        mov = [sum(xs[max(0, i - MOV_WIN + 1) : i + 1]) for i in range(len(xs))]
        assert got[uid].n == len(xs)
        assert got[uid].moving_sums == "|".join(str(v) for v in mov)


def test_code_detect_counts_and_flag(spark, sf_dir):
    import re

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.llm_corpus import llm_code_detect

    got = {r.doc_id: r for r in llm_code_detect(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    pat = re.compile(r"[{}();=<>\[\]]")
    for r in docs:
        if not r.text:
            continue
        g = got[r.doc_id]
        n_punct = len(pat.findall(r.text))
        n_digits = sum(ch.isdigit() for ch in r.text)
        assert g.n_code_punct == n_punct
        assert g.n_digits == n_digits
        assert g.is_codey == (100 * n_punct > 2 * len(r.text))


def test_seasonality_profile_exact_counts(spark, sf_dir):
    from decimal import Decimal

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.timeseries_extra import (
        ts_seasonality_profile,
    )

    got = {(r.event_type, r.hh): r for r in ts_seasonality_profile(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    acc: dict[tuple, list] = {}
    for r in ev:
        cents = int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
        acc.setdefault((r.event_type, r.ts.hour), []).append(cents)
    assert set(got) == set(acc)
    for k, xs in acc.items():
        g = got[k]
        assert g.n_events == len(xs) and g.sum_cents == float(sum(xs))


def test_cusum_changepoint_python_replay(spark, sf_dir):
    from decimal import Decimal

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.timeseries_extra import (
        ts_cusum_changepoint,
    )

    got = {r.user_id: r for r in ts_cusum_changepoint(spark, sf_dir).collect()}
    ev = sorted(
        load_table(spark, sf_dir, "events").select(
            "user_id", "event_id", "ts", "value"
        ).collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    series: dict[int, list] = {}
    for r in ev:
        series.setdefault(r.user_id, []).append(
            int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
        )
    assert set(got) == set(series)
    for uid, xs in series.items():
        n, sn = len(xs), sum(xs)
        best = None
        sk = 0
        for k, x in enumerate(xs, start=1):
            sk += x
            dev = abs(n * sk - k * sn)
            if best is None or dev > best[0]:
                best = (dev, k)
        g = got[uid]
        assert (g.peak_dev, g.k_star, g.n) == (best[0], best[1], n)


def test_merge_upsert_state_algebra(spark, sf_dir):
    """Updated keys carry status U and +5 cents; inserted keys are the
    offset set; untouched keys match base exactly; no key lost."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.sources_sinks import (
        UPSERT_MOD,
        UPSERT_NEW,
        sink_merge_upsert,
    )
    from decimal import Decimal

    got = {r.o_orderkey: r for r in sink_merge_upsert(spark, sf_dir).collect()}
    base = {
        r.o_orderkey: (
            r.o_orderstatus,
            int(Decimal(str(r.o_totalprice)).quantize(Decimal("0.01")) * 100),
        )
        for r in load_table(spark, sf_dir, "orders").collect()
    }
    expected_keys = set(base) | {
        k + UPSERT_NEW for k in base if k % UPSERT_MOD == 3
    }
    assert set(got) == expected_keys
    for k, (status, cents) in base.items():
        g = got[k]
        if k % UPSERT_MOD == 0:
            assert (g.o_orderstatus, g.price_cents, g.from_update) == ("U", cents + 5, True)
        else:
            assert (g.o_orderstatus, g.price_cents, g.from_update) == (status, cents, False)
        if k % UPSERT_MOD == 3:
            gi = got[k + UPSERT_NEW]
            assert (gi.o_orderstatus, gi.price_cents, gi.from_update) == ("I", cents, True)


def test_weighted_sample_rate_tracks_weight(spark, sf_dir):
    """Keep-rate per weight bucket must track w/(4*W_MAX) (binomial
    tolerance), and the draw must be idempotent."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.sorts import (
        W_MAX,
        W_RATE_DEN,
        sample_weighted_hash,
    )

    kept = sample_weighted_hash(spark, sf_dir)
    k1 = {(r.l_orderkey, r.l_linenumber) for r in kept.collect()}
    k2 = {(r.l_orderkey, r.l_linenumber) for r in sample_weighted_hash(spark, sf_dir).collect()}
    assert k1 == k2
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    ).collect()
    from collections import Counter

    tot = Counter()
    for r in li:
        tot[int(r.l_quantity)] += 1
    got_w = Counter()
    for r in kept.collect():
        got_w[r.w] += 1
    import math

    for w, n in tot.items():
        if n < 200:
            continue
        p = w / (W_MAX * W_RATE_DEN)
        k = got_w.get(w, 0)
        sd = math.sqrt(n * p * (1 - p))
        assert abs(k - n * p) <= 5 * sd + 3, (w, k, n * p)


def test_peak_concurrency_consistent_with_slots(spark, sf_dir):
    """Peak per type must equal the max slot coverage computed from
    the raw intervals in Python."""
    from collections import Counter

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.reports_behavior import (
        PEAK_SLOT_SEC,
        rpt_peak_concurrency,
    )

    got = {r.event_type: r for r in rpt_peak_concurrency(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.unix_micros("ts").alias("us")
    ).collect()
    per_type: dict[str, Counter] = {}
    for r in ev:
        s = r.us // 1_000_000
        e = s + r.event_id % 600 + 60
        c = per_type.setdefault(r.event_type, Counter())
        for slot in range(s // PEAK_SLOT_SEC, (e - 1) // PEAK_SLOT_SEC + 1):
            c[slot] += 1
    assert set(got) == set(per_type)
    for et, c in per_type.items():
        peak = max(c.values())
        earliest = min(slot for slot, n in c.items() if n == peak)
        g = got[et]
        assert g.peak_live == peak
        assert int(g.peak_slot.timestamp()) == earliest * PEAK_SLOT_SEC
        assert g.n_slots_used == len(c)


def test_rank_corr_matches_scipy_free_reference(spark, sf_dir):
    """Spearman rho must equal Pearson-on-average-ranks computed in
    Python (tie-aware), to float tolerance."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import agg_rank_corr
    from decimal import Decimal

    got = {r.l_returnflag: r for r in agg_rank_corr(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    groups: dict[str, list] = {}
    for r in rows:
        groups.setdefault(r.l_returnflag, []).append(
            (
                int(r.l_quantity),
                int(Decimal(str(r.l_extendedprice)).quantize(Decimal("0.01")) * 100),
            )
        )

    def avg_ranks(xs):
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        ranks = [0.0] * len(xs)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and xs[order[j]] == xs[order[i]]:
                j += 1
            avg = (i + j - 1) / 2 + 1
            for t in range(i, j):
                ranks[order[t]] = avg
            i = j
        return ranks

    import math

    for flag, vw in groups.items():
        xs = [v for v, _ in vw]
        ys = [w for _, w in vw]
        rx, ry = avg_ranks(xs), avg_ranks(ys)
        n = len(vw)
        mx, my = sum(rx) / n, sum(ry) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        vx = sum((a - mx) ** 2 for a in rx)
        vy = sum((b - my) ** 2 for b in ry)
        ref = cov / math.sqrt(vx * vy)
        g = got[flag]
        assert g.n == n
        assert abs(g.spearman_rho - ref) < 1e-9


def test_if_combinators_python_replay(spark, sf_dir):
    from decimal import Decimal

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import (
        IF_CENTS_CUT,
        agg_if_combinators,
    )

    got = {r.event_type: r for r in agg_if_combinators(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "value"
    ).collect()
    acc: dict[str, list] = {}
    for r in ev:
        cents = int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
        acc.setdefault(r.event_type, []).append((cents, r.user_id))
    for et, xs in acc.items():
        big = [(c, u) for c, u in xs if c > IF_CENTS_CUT]
        g = got[et]
        assert g.n == len(xs) and g.n_big == len(big)
        if big:
            cs = [c for c, _ in big]
            assert g.sum_big == sum(cs)
            assert g.min_big == min(cs) and g.max_big == max(cs)
            assert abs(g.avg_big - sum(cs) / len(cs)) < 1e-9
            assert g.uniq_big_users == len({u for _, u in big})
        else:
            assert g.sum_big == 0 and g.min_big is None


def test_readable_format_python_replay(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.scalars_string import (
        str_readable_format,
    )

    got = {r.doc_id: r for r in str_readable_format(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    units = [(1073741824, "GiB"), (1048576, "MiB"), (1024, "KiB"), (1, "B")]
    seen_units = set()
    for r in docs:
        nb = r.n_chars * (r.doc_id % 1000 + 1)
        for div, name in units:
            if nb >= div or name == "B":
                h = nb * 100 // div
                exp = f"{h // 100}.{h % 100:02d} {name}"
                seen_units.add(name)
                break
        g = got[r.doc_id]
        assert g.nbytes == nb and g.readable == exp, (nb, exp, g.readable)
    assert len(seen_units) >= 2  # multiple unit branches exercised


def test_conversion_lag_python_replay(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.reports_behavior import (
        rpt_conversion_lag,
    )

    got = {r.user_id: r for r in rpt_conversion_lag(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    ).collect()
    views: dict[int, int] = {}
    purchases: dict[int, list] = {}
    for r in ev:
        s = r.us // 1_000_000
        if r.event_type == "view":
            views[r.user_id] = min(views.get(r.user_id, s), s)
        elif r.event_type == "purchase":
            purchases.setdefault(r.user_id, []).append(s)
    assert set(got) == set(views)
    for uid, fv in views.items():
        after = [s for s in purchases.get(uid, []) if s >= fv]
        g = got[uid]
        assert g.first_view == fv
        if after:
            assert g.converted and g.first_purchase_after == min(after)
            assert g.lag_sec == min(after) - fv
        else:
            assert not g.converted and g.lag_sec is None


def test_welch_t_matches_scipy_formula(spark, sf_dir):
    from decimal import Decimal

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import (
        TT_GROUP_A,
        TT_GROUP_B,
        agg_welch_ttest,
    )

    g = agg_welch_ttest(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    a = [int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
         for r in ev if r.event_type == TT_GROUP_A]
    b = [int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
         for r in ev if r.event_type == TT_GROUP_B]
    import math

    def stats(xs):
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        return n, m, v

    na, ma, va = stats(a)
    nb, mb, vb = stats(b)
    ref = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert (g.n_a, g.n_b) == (na, nb)
    assert abs(g.welch_t - ref) < 1e-9


def test_mannwhitney_auc_matches_pair_counting(spark, sf_dir):
    """AUC = P(a > b) + 0.5·P(a == b), verified by exact pair counting
    over value multiplicities."""
    from collections import Counter
    from decimal import Decimal

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import (
        TT_GROUP_A,
        TT_GROUP_B,
        agg_mannwhitney_u,
    )

    g = agg_mannwhitney_u(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    ca, cb = Counter(), Counter()
    for r in ev:
        c = int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
        if r.event_type == TT_GROUP_A:
            ca[c] += 1
        elif r.event_type == TT_GROUP_B:
            cb[c] += 1
    wins = ties = 0
    bvals = sorted(cb)
    import bisect

    prefix = [0]
    for v in bvals:
        prefix.append(prefix[-1] + cb[v])
    for v, m in ca.items():
        i = bisect.bisect_left(bvals, v)
        wins += m * prefix[i]
        if i < len(bvals) and bvals[i] == v:
            ties += m * cb[v]
    na, nb = sum(ca.values()), sum(cb.values())
    assert (g.na, g.nb) == (na, nb)
    auc_ref = (wins + 0.5 * ties) / (na * nb)
    assert abs(g.auc - auc_ref) < 1e-12
    # doubled-U identity: U = wins + ties/2, so u_x2 == 2·wins + ties
    assert g.u_x2 == 2 * wins + ties


def test_native_import_round_trips_embeddings(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.sources_sinks import (
        scan_native_import,
    )

    got = {r.vec_id: r for r in scan_native_import(spark, sf_dir).collect()}
    src = load_table(spark, sf_dir, "embeddings").collect()
    assert len(got) == len(src)
    for r in src:
        g = got[r.vec_id]
        assert g.label == r.label and g.n_dims == len(r.embedding)
        assert g.first_val == r.embedding[0] and g.last_val == r.embedding[-1]
        s = 0.0
        for x in r.embedding:
            s += float(x)
        assert g.emb_sum == s  # identical sequential fold


def test_native_decoder_rejects_renamed_or_retyped_columns():
    import pytest

    from etl_ch_destination_spark.sink.native import (
        decode_native_block,
        encode_native_block,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("a", LongType(), False)])
    payload = encode_native_block(schema, [(1,), (2,)])
    renamed = StructType([StructField("b", LongType(), False)])
    with pytest.raises(ValueError, match="column name"):
        decode_native_block(renamed, payload)
    retyped = StructType([StructField("a", LongType(), True)])  # Nullable drift
    with pytest.raises(ValueError, match="type"):
        decode_native_block(retyped, payload)
    with pytest.raises(ValueError, match="trailing"):
        decode_native_block(schema, payload + b"\x00")


def test_strict_funnel_dominated_by_loose_funnel(spark, sf_dir):
    """Strict levels can never exceed the base exists-chain funnel's
    reach: sum of users at level >= L is <= the loose key's for every
    L, and total user counts agree."""
    from etl_ch_destination_spark.queries.behavior import (
        agg_window_funnel,
        agg_window_funnel_strict,
    )

    loose = {r.funnel_level: r.n_users for r in agg_window_funnel(spark, sf_dir).collect()}
    strict = {r.funnel_level: r.n_users for r in agg_window_funnel_strict(spark, sf_dir).collect()}
    assert sum(loose.values()) == sum(strict.values())
    for lv in (2, 3):
        loose_ge = sum(n for l, n in loose.items() if l >= lv)
        strict_ge = sum(n for l, n in strict.items() if l >= lv)
        assert strict_ge <= loose_ge, (lv, strict_ge, loose_ge)


def test_strict_funnel_python_replay(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.behavior import (
        FUNNEL_TYPES,
        agg_window_funnel_strict,
    )

    got = {r.funnel_level: r.n_users for r in agg_window_funnel_strict(spark, sf_dir).collect()}
    ev = sorted(
        load_table(spark, sf_dir, "events").select(
            "user_id", "event_type", "ts", "event_id"
        ).collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    import datetime

    win = datetime.timedelta(hours=6)
    seqs: dict[int, list] = {}
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type in FUNNEL_TYPES:
            seqs.setdefault(r.user_id, []).append((r.event_type, r.ts))
    levels: dict[int, int] = {}
    for uid, s in seqs.items():
        best = 0
        for i, (et, t1) in enumerate(s):
            if et != "view":
                continue
            lvl = 1
            if i + 1 < len(s) and s[i + 1][0] == "click" and s[i + 1][1] <= t1 + win:
                lvl = 2
                if (
                    i + 2 < len(s)
                    and s[i + 2][0] == "purchase"
                    and s[i + 2][1] <= t1 + win
                ):
                    lvl = 3
            best = max(best, lvl)
        levels[uid] = best
    from collections import Counter

    exp = Counter(levels.get(u, 0) for u in users)
    assert got == dict(exp)


def test_date_spine_dense_and_zero_filled(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.timeseries_extra import gen_date_spine

    rows = gen_date_spine(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day")
    ).collect()
    from collections import Counter
    import datetime

    counts: dict[str, Counter] = {}
    for r in ev:
        counts.setdefault(r.event_type, Counter())[r.day] += 1
    assert set(by_type) == set(counts)
    for et, rs in by_type.items():
        days = sorted(r.day for r in rs)
        # DENSE: every day between min and max exactly once
        assert days[0] == min(counts[et]) and days[-1] == max(counts[et])
        assert len(days) == (days[-1] - days[0]).days + 1
        assert len(set(days)) == len(days)
        for r in rs:
            assert r.n_events == counts[et].get(r.day, 0)
            assert r.is_gap == (r.day not in counts[et])
        assert all(
            b - a == datetime.timedelta(days=1)
            for a, b in zip(days, days[1:])
        )


def test_frame_exclusion_equals_leave_one_out(spark, sf_dir):
    from decimal import Decimal

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.windows_extra import (
        EXCL_HALF,
        win_frame_exclude_current,
    )

    got = {(r.user_id, r.event_id): r for r in win_frame_exclude_current(spark, sf_dir).collect()}
    ev = sorted(
        load_table(spark, sf_dir, "events").select(
            "user_id", "event_id", "ts", "value"
        ).collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    series: dict[int, list] = {}
    for r in ev:
        series.setdefault(r.user_id, []).append(
            (r.event_id, int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100))
        )
    for uid, xs in series.items():
        for i, (eid, c) in enumerate(xs):
            lo, hi = max(0, i - EXCL_HALF), min(len(xs), i + EXCL_HALF + 1)
            neigh = [v for j, (_, v) in enumerate(xs[lo:hi], start=lo) if j != i]
            g = got[(uid, eid)]
            assert g.neighbor_sum == sum(neigh)
            assert g.n_neighbors == len(neigh)
            if neigh:
                assert abs(g.neighbor_avg - sum(neigh) / len(neigh)) < 1e-9
            else:
                assert g.neighbor_avg is None


def test_vocab_prune_python_replay(spark, sf_dir):
    from collections import Counter

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.llm_corpus import (
        VOCAB_MAX_DF_PCT,
        VOCAB_MIN_DF,
        llm_vocab_prune,
    )

    got = {r.doc_id: r for r in llm_vocab_prune(spark, sf_dir).collect()}
    docs = [
        (r.doc_id, set(r.text.split(" ")))
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
        if r.text
    ]
    df = Counter()
    for _, ws in docs:
        for w in ws:
            df[w] += 1
    nd = len(docs)
    kept = {w for w, d in df.items() if d >= VOCAB_MIN_DF and d * 100 <= nd * VOCAB_MAX_DF_PCT}
    for did, ws in docs:
        g = got[did]
        assert g.n_distinct_words == len(ws)
        assert g.n_kept_words == len(ws & kept)


def test_dict_get_zero_join_plan_and_semantics(spark, sf_dir):
    """dictGet must compile to a pure projection (no join operator in
    the physical plan) and miss keys 25-29 with the default."""
    import io
    from contextlib import redirect_stdout

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.joins_extra import (
        DICT_DEFAULT_NAME,
        dict_get_lookup,
    )

    df = dict_get_lookup(spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(True)
    phys = buf.getvalue().split("== Physical Plan ==")[-1]
    assert "Join" not in phys and "join" not in phys
    names = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    for r in df.collect():
        if r.lookup_key in names:
            assert r.dict_has and r.nation_name == names[r.lookup_key]
        else:
            assert not r.dict_has and r.nation_name == DICT_DEFAULT_NAME
            assert r.lookup_key >= 25


def test_with_totals_non_additive_distinct(spark, sf_dir):
    """The totals row's distinct-user count must be <= the sum of the
    per-group distincts (strictly less when any user spans types) and
    equal to the true corpus-wide distinct count."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import (
        TOTALS_SENTINEL,
        agg_with_totals,
    )

    rows = agg_with_totals(spark, sf_dir).collect()
    groups = [r for r in rows if r.event_type != TOTALS_SENTINEL]
    totals = [r for r in rows if r.event_type == TOTALS_SENTINEL]
    assert len(totals) == 1
    t = totals[0]
    assert t.n == sum(r.n for r in groups)
    assert t.sum_cents == sum(r.sum_cents for r in groups)
    ev = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert t.n_users == ev
    assert t.n_users <= sum(r.n_users for r in groups)


def test_sort_by_key_python_replay(spark, sf_dir):
    import re

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.scalars_complex import (
        SORTKEY_WORDS,
        arr_sort_by_key,
    )

    got = {r.doc_id: r for r in arr_sort_by_key(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    alnum = re.compile(r"^[A-Za-z0-9]+$")
    for r in docs:
        ws = r.text.split(" ")[:SORTKEY_WORDS]
        if len(r.text.split(" ")) < SORTKEY_WORDS:
            assert r.doc_id not in got
            continue
        assert all(alnum.match(w) for w in ws), "separator-safety premise broke"
        g = got[r.doc_id]
        assert g.by_len == "|".join(sorted(ws, key=lambda w: (len(w), w)))
        assert g.by_suffix == "|".join(sorted(ws, key=lambda w: w[::-1]))


def test_matview_refresh_equals_full_recompute_and_tracks_delta(spark, sf_dir):
    """The refreshed durable state must equal the from-scratch
    aggregate (the MV invariant), and the v1 state must differ (the
    refresh really merged batch 2)."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.sources_sinks import (
        _scratch,
        job_matview_refresh,
    )

    got = {(r.event_type, r.day): (r.n, r.sum_cents) for r in job_matview_refresh(spark, sf_dir).collect()}
    from decimal import Decimal

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.to_date("ts").alias("day"), "value"
    ).collect()
    full: dict[tuple, list] = {}
    v1: dict[tuple, int] = {}
    for r in ev:
        c = int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
        k = (r.event_type, r.day)
        acc = full.setdefault(k, [0, 0])
        acc[0] += 1
        acc[1] += c
        if r.event_id % 3 != 0:
            v1[k] = v1.get(k, 0) + 1
    assert got == {k: tuple(v) for k, v in full.items()}
    state_v1 = {
        (r.event_type, r.day): r.n
        for r in spark.read.parquet(_scratch(sf_dir, "job_matview_refresh")).collect()
    }
    assert state_v1 == v1
    assert state_v1 != {k: v[0] for k, v in full.items()}


def test_user_paths_python_replay(spark, sf_dir):
    from collections import Counter

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.reports_behavior import (
        PATH_STEPS,
        rpt_user_paths,
    )

    got = {r.path: r for r in rpt_user_paths(spark, sf_dir).collect()}
    ev = sorted(
        load_table(spark, sf_dir, "events").select(
            "user_id", "event_type", "ts", "event_id"
        ).collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    seqs: dict[int, list] = {}
    for r in ev:
        s = seqs.setdefault(r.user_id, [])
        if len(s) < PATH_STEPS:
            s.append(r.event_type[0])
    paths = {uid: ">".join(s) for uid, s in seqs.items()}
    exp = Counter(paths.values())
    assert {p: r.n_users for p, r in got.items()} == dict(exp)
    for p, r in got.items():
        assert r.sample_user == min(u for u, q in paths.items() if q == p)


def test_global_cumsum_op_equals_sequential(spark, sf_dir):
    """with_global_cumsum must equal the sequential prefix sum under
    the same total order, at several bucket counts (bucket boundaries
    must never change the result)."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.ops.rank import with_global_cumsum

    rev = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    rows = sorted(rev.collect(), key=lambda r: (-r.n, r.l_suppkey))
    acc, exp = 0, {}
    for r in rows:
        acc += r.n
        exp[r.l_suppkey] = acc
    for buckets in (1, 7, 64):
        got = {
            r.l_suppkey: r.cum
            for r in with_global_cumsum(
                rev,
                order=[F.col("n").desc(), F.col("l_suppkey")],
                lead="n",
                value="n",
                descending=True,
                buckets=buckets,
            ).collect()
        }
        assert got == exp, buckets


def test_pareto_flag_boundary(spark, sf_dir):
    """in_top80 must be a prefix of the revenue-descending order, and
    flipping exactly at the first supplier whose cumulative share
    exceeds 80%."""
    from etl_ch_destination_spark.queries.reports_supply import (
        PARETO_PCT,
        rpt_pareto_suppliers,
    )

    rows = sorted(
        rpt_pareto_suppliers(spark, sf_dir).collect(),
        key=lambda r: (-r.rev_cents, r.l_suppkey),
    )
    total = rows[-1].cum_cents
    seen_false = False
    prev_cum = 0
    for r in rows:
        assert r.cum_cents == prev_cum + r.rev_cents
        prev_cum = r.cum_cents
        expect = 100 * r.cum_cents <= PARETO_PCT * total
        assert r.in_top80 == expect
        if not r.in_top80:
            seen_false = True
        else:
            assert not seen_false  # flag is a prefix
    assert seen_false  # boundary actually exercised


def test_covar_exact_matches_numpy(spark, sf_dir):
    import numpy as np

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import agg_covar_exact

    got = {r.l_returnflag: r for r in agg_covar_exact(spark, sf_dir).collect()}
    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    groups: dict[str, list] = {}
    for r in rows:
        groups.setdefault(r.l_returnflag, []).append(
            (round(r.l_quantity * 100), round(r.l_extendedprice * 100))
        )
    for flag, vw in groups.items():
        x = np.array([a for a, _ in vw], dtype=np.float64)
        y = np.array([b for _, b in vw], dtype=np.float64)
        g = got[flag]
        assert g.n == len(vw)
        ref_pop = float(np.cov(x, y, bias=True)[0, 1])
        ref_samp = float(np.cov(x, y, bias=False)[0, 1])
        assert abs(g.covar_pop - ref_pop) <= 1e-6 * abs(ref_pop)
        assert abs(g.covar_samp - ref_samp) <= 1e-6 * abs(ref_samp)


def test_active_users_python_replay(spark, sf_dir):
    import datetime

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.reports_behavior import (
        MAU_DAYS,
        WAU_DAYS,
        rpt_active_users,
    )

    got = {r.day: r for r in rpt_active_users(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    ).collect()
    ud = {(r.user_id, r.day) for r in ev}
    days = sorted({d for _, d in ud})
    d0, d1 = days[0], days[-1]
    # spine density
    assert set(got) == {
        d0 + datetime.timedelta(days=i) for i in range((d1 - d0).days + 1)
    }
    for day, g in got.items():
        dau = {u for u, d in ud if d == day}
        wau = {u for u, d in ud if 0 <= (day - d).days < WAU_DAYS}
        mau = {u for u, d in ud if 0 <= (day - d).days < MAU_DAYS}
        assert (g.dau, g.wau, g.mau) == (len(dau), len(wau), len(mau))
        assert g.dau <= g.wau <= g.mau  # monotone containment


def test_brand_affinity_python_replay(spark, sf_dir):
    from collections import Counter
    from itertools import combinations

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.reports_behavior import (
        rpt_brand_affinity,
    )

    got = {(r.brand_a, r.brand_b): r for r in rpt_brand_affinity(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    parts = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, sf_dir, "part").collect()
    }
    baskets: dict[int, set] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(parts[r.l_partkey])
    n_orders = len(baskets)
    brand_n = Counter()
    pair_n = Counter()
    for bs in baskets.values():
        for b in bs:
            brand_n[b] += 1
        for x, y in combinations(sorted(bs), 2):
            pair_n[(x, y)] += 1
    assert set(got) == set(pair_n)
    for k, n in pair_n.items():
        g = got[k]
        assert g.n_pair == n
        assert (g.n_a, g.n_b) == (brand_n[k[0]], brand_n[k[1]])
        lift = n * n_orders / (brand_n[k[0]] * brand_n[k[1]])
        assert abs(g.lift - lift) < 1e-9


def test_containment_python_replay_and_subset_property(spark, sf_dir):
    from collections import Counter

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.llm_dedup_extra import (
        CONTAIN_MIN,
        DF_CAP,
        llm_dedup_containment,
    )

    got = {(r.id_a, r.id_b): r for r in llm_dedup_containment(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    sh: dict[int, set] = {}
    for r in docs:
        ws = r.text.split(" ")
        if len(ws) >= 3:
            sh[r.doc_id] = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
    df = Counter()
    for s in sh.values():
        for g in s:
            df[g] += 1
    kept = {g for g, d in df.items() if d <= DF_CAP}
    expect = {}
    ids = sorted(sh)
    inv: dict[str, list] = {}
    for did in ids:
        for g in sh[did] & kept:
            inv.setdefault(g, []).append(did)
    common = Counter()
    for g, ds in inv.items():
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                common[(ds[i], ds[j])] += 1
    for (a, b), n in common.items():
        mn = min(len(sh[a]), len(sh[b]))
        if 2 * n >= mn:
            expect[(a, b)] = (n, n / mn)
    assert set(got) == set(expect)
    for k, (n, c) in expect.items():
        g = got[k]
        assert g.n_common == n and abs(g.containment - c) < 1e-12
        assert 0 < g.containment <= 1 + 1e-12
        assert CONTAIN_MIN <= g.containment + 1e-12


def test_log2_histogram_bucket_invariants(spark, sf_dir):
    from decimal import Decimal

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import (
        agg_histogram_log2,
    )

    rows = agg_histogram_log2(spark, sf_dir).collect()
    total = 0
    for r in rows:
        total += r.n
        if r.bucket >= 0:
            assert r.bucket_lo == 1 << r.bucket
            assert r.bucket_lo <= r.min_cents <= r.max_cents < 2 * r.bucket_lo
        else:
            assert r.max_cents <= 0
    n_events = load_table(spark, sf_dir, "events").count()
    assert total == n_events
    # replay a few buckets exactly
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    from collections import Counter

    exp = Counter()
    for r in ev:
        c = int(Decimal(str(r.value)).quantize(Decimal("0.01")) * 100)
        b = -1 if c <= 0 else c.bit_length() - 1
        exp[(r.event_type, b)] += 1
    assert {(r.event_type, r.bucket): r.n for r in rows} == dict(exp)


def test_cumsum_scan_python_replay(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.scalars_complex import (
        CUMSUM_WORDS,
        arr_cumsum_scan,
    )

    got = {r.doc_id: r for r in arr_cumsum_scan(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    checked = 0
    for r in docs:
        ws = r.text.split(" ")
        if len(ws) < CUMSUM_WORDS:
            assert r.doc_id not in got
            continue
        lens = [len(w) for w in ws[:CUMSUM_WORDS]]
        cs, acc = [], 0
        for v in lens:
            acc += v
            cs.append(acc)
        diffs = [lens[0]] + [lens[i] - lens[i - 1] for i in range(1, len(lens))]
        g = got[r.doc_id]
        assert g.cumsum == "|".join(map(str, cs))
        assert g.diffs == "|".join(map(str, diffs))
        assert g.total == sum(lens) == cs[-1]
        checked += 1
    assert checked > 0


def test_fiscal_calendar_python_replay(spark, sf_dir):
    import datetime

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.timeseries_extra import (
        FISCAL_START_MONTH,
        date_fiscal_calendar,
    )

    got = {r.o_orderkey: r for r in date_fiscal_calendar(spark, sf_dir).collect()}
    for r in load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    ).collect():
        d = r.od
        fy = d.year + 1 if d.month >= FISCAL_START_MONTH else d.year
        fm = (d.month - FISCAL_START_MONTH + 12) % 12 + 1
        g = got[r.o_orderkey]
        assert g.fiscal_year == fy
        assert g.fiscal_month == fm
        assert g.fiscal_quarter == (fm - 1) // 3 + 1
        assert g.fiscal_year_start == datetime.date(fy - 1, FISCAL_START_MONTH, 1)
        # the fiscal year start is at most a year before the date
        assert g.fiscal_year_start <= d < datetime.date(fy, FISCAL_START_MONTH, 1)
