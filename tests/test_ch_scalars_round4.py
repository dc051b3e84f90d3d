"""Invariant gates for the round-4 continuation batch (bit/encoding/IP
scalar families, weighted mean, interval sweep-line, sequence counts,
positional windows). Each key gets the property that breaks first if
its implementation drifts; oracle parity covers the value-level rest.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def test_bit_funcs_algebraic_identities(spark, sf_dir):
    """a + b == (a & b) + (a | b); xor == or - and; ~x == -x - 1;
    x << 4 == x * 16; bit test lands in {0, 1}. Checked against the
    source columns directly ((orderkey, linenumber) is NOT unique in
    the fixture, so a key-join would fan out) — oracle parity already
    pins the emitted values."""
    from etl_ch_destination_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    a, b = F.col("l_orderkey"), F.col("l_partkey")
    derived = li.select(
        a.alias("a"),
        b.alias("b"),
        F.col("l_suppkey").alias("s"),
        F.col("l_linenumber").cast("long").alias("ln"),
        a.bitwiseAND(b).alias("and_c"),
        a.bitwiseOR(b).alias("or_c"),
        a.bitwiseXOR(b).alias("xor_c"),
        F.bitwise_not(F.col("l_suppkey")).alias("not_c"),
        F.shiftleft(F.col("l_linenumber").cast("long"), 4).alias("shl_c"),
        F.getbit(a, F.lit(2)).cast("int").alias("test_c"),
    )
    bad = derived.filter(
        (F.col("a") + F.col("b") != F.col("and_c") + F.col("or_c"))
        | (F.col("xor_c") != F.col("or_c") - F.col("and_c"))
        | (~F.col("test_c").isin(0, 1))
        | (F.col("not_c") != -F.col("s") - 1)
        | (F.col("shl_c") != F.col("ln") * 16)
    )
    assert bad.count() == 0
    # and the registered key itself emits the same expression set
    from etl_ch_destination_spark.queries.scalars_binary import bit_funcs

    out = bit_funcs(spark, sf_dir)
    assert out.filter(F.col("xor_c") != F.col("or_c") - F.col("and_c")).count() == 0


def test_enc_funcs_roundtrips(spark, sf_dir):
    from etl_ch_destination_spark.queries.scalars_binary import enc_funcs
    from etl_ch_destination_spark.catalog import load_table

    df = enc_funcs(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name", "p_brand")
    j = df.join(p, "p_partkey")
    bad = j.filter(
        (F.col("unhex_rt") != F.col("p_name"))
        | (F.col("b64_rt") != F.col("p_brand"))
        | (F.length("hex_c") != 2 * F.col("byte_len"))
    )
    assert bad.count() == 0


def test_ip_funcs_roundtrip_and_format(spark, sf_dir):
    from etl_ch_destination_spark.queries.scalars_binary import ip_funcs

    rows = ip_funcs(spark, sf_dir).collect()
    pat = re.compile(r"^10\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
    for r in rows:
        assert r.ip_rt == r.ip_num, (r.ip_str, r.ip_rt, r.ip_num)
        assert pat.match(r.ip_str), r.ip_str
        octets = [int(x) for x in r.ip_str.split(".")]
        assert all(0 <= o <= 255 for o in octets)


def test_avg_weighted_bounds_and_partition_stability(spark, sf_dir):
    from etl_ch_destination_spark.queries.aggregations_ch import agg_avg_weighted
    from etl_ch_destination_spark.catalog import load_table

    res = {r.l_returnflag: r for r in agg_avg_weighted(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    rng = {
        r.l_returnflag: (r.lo, r.hi)
        for r in li.groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi"))
        .collect()
    }
    for flag, r in res.items():
        lo, hi = rng[flag]
        assert lo <= r.avg_w_price <= hi

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        again = {r.l_returnflag: r.avg_w_price for r in agg_avg_weighted(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert {k: v.avg_w_price for k, v in res.items()} == again  # bit-exact


def test_max_intersections_matches_bruteforce(spark, sf_dir):
    """Sweep-line result equals a day-by-day brute force over the same
    synthetic intervals (sf0.001 scale)."""
    from etl_ch_destination_spark.queries.aggregations_ch import agg_max_intersections
    from etl_ch_destination_spark.catalog import load_table
    import datetime as dt

    got = {r.o_orderpriority: r.max_open for r in agg_max_intersections(spark, sf_dir).collect()}

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderdate", "o_orderkey"
    ).collect()
    by_prio: dict[str, list[tuple[dt.datetime, dt.datetime]]] = {}
    for r in orders:
        days = r.o_orderkey % 30 + 1
        by_prio.setdefault(r.o_orderpriority, []).append(
            (r.o_orderdate, r.o_orderdate + dt.timedelta(days=days))
        )
    for prio, ivs in by_prio.items():
        best = 0
        starts = sorted(s for s, _ in ivs)
        for s0 in starts:  # max overlap is attained at some interval start
            best = max(best, sum(1 for s, e in ivs if s <= s0 < e))
        assert got[prio] == best, (prio, got[prio], best)


def test_sequence_count_matches_re_scan(spark, sf_dir):
    """Per-user counts equal a Python re scan over the same ordered
    event string (the leftmost non-overlapping contract)."""
    from etl_ch_destination_spark.queries.aggregations_ch import agg_sequence_count
    from etl_ch_destination_spark.catalog import load_table

    got = {r.user_id: r for r in agg_sequence_count(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type").collect()
    seqs: dict[int, list] = {}
    for r in ev:
        seqs.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type[0]))
    for uid, items in seqs.items():
        s = "".join(c for _, _, c in sorted(items))
        r = got[uid]
        assert r.seq_len == len(s)
        assert r.n_view_click == len(re.findall("vc", s))
        assert r.n_view_then_purchase == len(re.findall("v.*?p", s))
        assert r.n_signup_clicks_purchase == len(re.findall("sc*p", s))


def test_nth_value_positional_contract(spark, sf_dir):
    """second_price is NULL on each customer's first row and constant
    (= the 2nd order's price) afterwards; last_nn carries the latest
    non-null forward."""
    from etl_ch_destination_spark.queries.windows_extra import win_nth_value

    rows = win_nth_value(spark, sf_dir).collect()
    from collections import defaultdict

    by_cust = defaultdict(list)
    for r in rows:
        by_cust[r.o_custkey].append(r)
    # reconstruct order via the key used in the query: need orderdate;
    # rely on second_price semantics instead: group rows, check that
    # NULL second_price appears exactly once per customer (the first
    # row) when the customer has >= 2 orders, and all non-null
    # second_price values within a customer are identical.
    for cust, rs in by_cust.items():
        nn = [r.second_price for r in rs if r.second_price is not None]
        nulls = [r for r in rs if r.second_price is None]
        if len(rs) == 1:
            assert len(nulls) == 1
        else:
            assert len(nulls) == 1  # only the first row lacks a 2nd value
            assert len(set(nn)) == 1  # constant once defined
        # last_nn is null only while no non-null has been seen; if any
        # row has last_nn set, the customer has a non-null price row
        if any(r.last_nn is not None for r in rs):
            assert any(r.o_orderkey % 5 != 0 for r in rs)


def test_bigram_surprisal_repetitive_text_scores_low(spark, sf_dir):
    """A doc that is one repeated bigram has deterministic successors
    -> (near-)zero bits; and every doc's mean is sum/count exactly."""
    from etl_ch_destination_spark.queries.llm_corpus import llm_bigram_surprisal

    rows = llm_bigram_surprisal(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_bigrams >= 1 and r.sum_bits >= 0
        assert r.mean_bits == r.sum_bits / r.n_bigrams

    # planted-duplicate docs exist in the fixture; dupes of the same
    # text must score identically
    from etl_ch_destination_spark.catalog import load_table

    d = {r.doc_id: r for r in rows}
    texts = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    by_text: dict[str, list] = {}
    for t in texts:
        if t.doc_id in d:
            by_text.setdefault(t.text, []).append(d[t.doc_id])
    for grp in by_text.values():
        assert len({(g.n_bigrams, g.sum_bits) for g in grp}) == 1


def test_top_bottom_k_against_python_sort(spark, sf_dir):
    import math

    from etl_ch_destination_spark.queries.aggregations_ch import agg_top_bottom_k
    from etl_ch_destination_spark.catalog import load_table

    got = {r.event_type: r for r in agg_top_bottom_k(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").collect()
    vals: dict[str, list[int]] = {}
    for r in ev:
        vals.setdefault(r.event_type, []).append(math.floor(r.value * 1000000))
    for et, v in vals.items():
        v.sort()
        assert got[et].bottom5 == ",".join(str(x) for x in v[:5])
        assert got[et].top5 == ",".join(str(x) for x in sorted(v, reverse=True)[:5])
        assert got[et].n == len(v)


def test_split_tokens_counts_vs_python(spark, sf_dir):
    import re as _re

    from etl_ch_destination_spark.queries.scalars_binary import str_split_tokens
    from etl_ch_destination_spark.catalog import load_table

    got = {r.doc_id: r for r in str_split_tokens(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    for d in docs:
        r = got[d.doc_id]
        assert r.n_space_tokens == len(d.text.split(" ")) if d.text else True
        assert r.n_alpha_tokens == len(_re.findall("[A-Za-z]+", d.text))
        assert r.n_parts_e == d.text.count("e") + 1
        low = d.text.lower()
        assert r.n_char3_distinct == len({low[i : i + 3] for i in range(max(0, len(low) - 2))})


def test_cohort_retention_conservation(spark, sf_dir):
    """Day-0 cohort sizes sum to the total distinct-user count, and no
    later day of a cohort exceeds its day 0."""
    from etl_ch_destination_spark.queries.reports_behavior import rpt_cohort_retention
    from etl_ch_destination_spark.catalog import load_table

    rows = rpt_cohort_retention(spark, sf_dir).collect()
    day0 = {r.cohort_day: r.n_users for r in rows if r.days_since == 0}
    total_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(day0.values()) == total_users  # every user lands in exactly one cohort
    for r in rows:
        assert r.n_users <= day0[r.cohort_day]
        assert r.days_since >= 0


def test_arr_fill_compact_sequence_laws(spark, sf_dir):
    """diffs reconstruct the series (sum of diffs = last - first);
    compact_n <= n; forward-fill digest changes iff nulls exist."""
    from etl_ch_destination_spark.queries.timeseries_extra import arr_fill_compact
    from etl_ch_destination_spark.catalog import load_table
    import math

    got = {r.user_id: r for r in arr_fill_compact(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    seqs: dict[int, list] = {}
    for r in ev:
        seqs.setdefault(r.user_id, []).append((r.ts, r.event_id, math.floor(r.value * 1000000)))
    for uid, items in seqs.items():
        items.sort()
        xs = [v for _, _, v in items]
        r = got[uid]
        assert r.n == len(xs)
        diffs = [0] + [b - a for a, b in zip(xs, xs[1:])]
        assert r.sum_abs_diff == sum(abs(d) for d in diffs)
        runs = 1 + sum(1 for a, b in zip(xs, xs[1:]) if a != b)
        assert r.compact_n == runs


def test_ema_dyadic_exactness_and_bounds(spark, sf_dir):
    """wsum replays exactly via Horner in Python; ema lies within the
    window's [min, max]."""
    from etl_ch_destination_spark.queries.timeseries_extra import ts_ema_dyadic, EMA_WIN
    from etl_ch_destination_spark.catalog import load_table
    import math

    got = {r.event_id: r for r in ts_ema_dyadic(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    seqs: dict[int, list] = {}
    for r in ev:
        seqs.setdefault(r.user_id, []).append((r.ts, r.event_id, math.floor(r.value * 1000000)))
    for uid, items in seqs.items():
        items.sort()
        xs = [v for _, _, v in items]
        for i, (_, eid, _) in enumerate(items):
            win = xs[max(0, i - EMA_WIN + 1) : i + 1]
            acc = 0
            for v in win:
                acc = acc * 2 + v
            r = got[eid]
            assert r.wsum == acc and r.m == len(win)
            assert min(win) - 1e-9 <= r.ema <= max(win) + 1e-9


def test_mad_anomaly_flags_are_minority_and_consistent(spark, sf_dir):
    from etl_ch_destination_spark.queries.timeseries_extra import ts_anomaly_mad

    rows = ts_anomaly_mad(spark, sf_dir).collect()
    n_anom = sum(1 for r in rows if r.is_anomaly)
    assert 0 <= n_anom < len(rows) / 2  # MAD flags a minority by construction
    for r in rows:
        assert r.dev >= 0
        assert isinstance(r.is_anomaly, bool)


def test_csv_export_roundtrip_loses_nothing(spark, sf_dir):
    """Row counts and char sums after the CSV round-trip equal the
    source table exactly (the oracle already pins the content hash)."""
    from etl_ch_destination_spark.queries.sources_sinks import sink_csv_export
    from etl_ch_destination_spark.catalog import load_table

    got = {r.source: r for r in sink_csv_export(spark, sf_dir).collect()}
    src = {
        r.source: r
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("c"))
        .collect()
    }
    assert set(got) == set(src)
    for s in src:
        assert got[s].n_docs == src[s].n
        assert got[s].sum_chars == src[s].c


def test_embedding_outliers_match_numpy_argmax(spark, sf_dir):
    """The rank-1 outlier per label is the true argmax of the exact
    quantized distance, replayed in integer arithmetic."""
    import math

    from etl_ch_destination_spark.queries.llm_corpus import (
        Q_SCALE,
        llm_embedding_outliers,
    )
    from etl_ch_destination_spark.catalog import load_table

    got = llm_embedding_outliers(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings").collect()
    by_label: dict[int, list] = {}
    for r in emb:
        q = [math.floor(float(v) * Q_SCALE) for v in r.embedding]
        by_label.setdefault(r.label, []).append((r.vec_id, q))
    for label, vecs in by_label.items():
        n = len(vecs)
        dim = len(vecs[0][1])
        s = [sum(q[i] for _, q in vecs) for i in range(dim)]
        dists = {
            vid: sum((q[i] * n - s[i]) ** 2 for i in range(dim)) for vid, q in vecs
        }
        expect = sorted(dists, key=lambda v: (-dists[v], v))[:3]
        mine = [r.vec_id for r in sorted(got, key=lambda r: r.rk) if r.label == label]
        assert mine == expect, (label, mine, expect)


def test_cramers_v_range_and_python_replay(spark, sf_dir):
    import math

    from etl_ch_destination_spark.queries.aggregations_ch import agg_cramers_v
    from etl_ch_destination_spark.catalog import load_table

    r = agg_cramers_v(spark, sf_dir).collect()[0]
    assert 0.0 <= r.cramers_v <= 1.0
    assert r.chi2_e6 >= 0

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    from collections import Counter

    o = Counter((e.event_type, e.user_id % 4) for e in ev)
    ra = Counter()
    cb = Counter()
    for (a, b), c in o.items():
        ra[a] += c
        cb[b] += c
    n = sum(o.values())
    chi2_e6 = sum(
        math.floor(
            float((c * n - ra[a] * cb[b]) ** 2) / float(ra[a] * cb[b] * n) * 1e6
        )
        for (a, b), c in o.items()
    )
    assert r.chi2_e6 == chi2_e6
    assert r.n == n and r.n_rows_dim == len(ra) and r.n_cols_dim == len(cb)


def test_interval_bins_equals_bruteforce_pairs(spark, sf_dir):
    from etl_ch_destination_spark.queries.joins_extra import join_interval_bins
    from etl_ch_destination_spark.catalog import load_table
    import datetime as dt

    got = {r.o_orderpriority: r for r in join_interval_bins(spark, sf_dir).collect()}
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-04-01")
        )
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .collect()
    )
    epoch = dt.datetime(1970, 1, 1)
    by_p: dict[str, list] = {}
    for r in orders:
        s = (r.o_orderdate - epoch).days
        by_p.setdefault(r.o_orderpriority, []).append((r.o_orderkey, s, s + r.o_orderkey % 5 + 1))
    for p, ivs in by_p.items():
        n_pairs = 0
        overlap = 0
        for i in range(len(ivs)):
            for j in range(i + 1, len(ivs)):
                (ka, sa, ea), (kb, sb, eb) = ivs[i], ivs[j]
                if sa < eb and sb < ea:
                    n_pairs += 1
                    overlap += min(ea, eb) - max(sa, sb)
        if n_pairs:
            assert got[p].n_overlapping_pairs == n_pairs
            assert got[p].sum_overlap_days == overlap
        else:
            assert p not in got


def test_ngram_novelty_python_replay(spark, sf_dir):
    from etl_ch_destination_spark.queries.llm_corpus import llm_ngram_novelty
    from etl_ch_destination_spark.catalog import load_table

    got = {r.doc_id: r for r in llm_ngram_novelty(spark, sf_dir).collect()}
    docs = sorted(
        load_table(spark, sf_dir, "documents").select("doc_id", "text").collect(),
        key=lambda r: r.doc_id,
    )
    owner: dict[str, int] = {}
    per_doc: dict[int, set] = {}
    for r in docs:
        toks = r.text.split(" ")
        if len(toks) < 3:
            continue
        sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        per_doc[r.doc_id] = sh
        for s in sh:
            owner.setdefault(s, r.doc_id)
    for did, sh in per_doc.items():
        r = got[did]
        novel = sum(1 for s in sh if owner[s] == did)
        assert r.n_shingles == len(sh) and r.n_novel == novel

    # a planted duplicate that is NOT the first copy must have novelty 0
    texts: dict[str, list[int]] = {}
    for r in docs:
        texts.setdefault(r.text, []).append(r.doc_id)
    laters = [ids[1] for ids in texts.values() if len(ids) > 1 and ids[1] in got]
    # (exact-text dupes exist only at some SFs — the planted dupes are
    # near-dupes; when present, later copies must contribute nothing)
    assert all(got[d].n_novel == 0 for d in laters)


def test_template_detect_groups_are_real(spark, sf_dir):
    from etl_ch_destination_spark.queries.llm_corpus import (
        TEMPLATE_PREFIX_WORDS,
        llm_template_detect,
    )
    from etl_ch_destination_spark.catalog import load_table
    from collections import Counter

    got = llm_template_detect(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    prefixes = Counter(
        " ".join(r.text.split(" ")[:TEMPLATE_PREFIX_WORDS])
        for r in docs
        if len(r.text.split(" ")) >= TEMPLATE_PREFIX_WORDS
    )
    expect = {p: c for p, c in prefixes.items() if c >= 2}
    assert len(got) == len(expect)
    assert sorted(r.n_docs for r in got) == sorted(expect.values())


def test_business_days_matches_loop(spark, sf_dir):
    import datetime as dt

    from etl_ch_destination_spark.queries.timeseries_extra import date_business_days
    from etl_ch_destination_spark.catalog import load_table

    got = {r.o_orderkey: r for r in date_business_days(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate").collect()
    for r in orders:
        start = r.o_orderdate.date()
        n = r.o_orderkey % 45 + 1
        bus = sum(
            1
            for i in range(n)
            if (start + dt.timedelta(days=i)).weekday() < 5
        )
        g = got[r.o_orderkey]
        assert g.n_days == n
        assert g.n_busdays == bus, (r.o_orderkey, start, n, g.n_busdays, bus)
        assert g.start_dow == start.weekday()


def test_dedup_audit_consistency_with_components(spark, sf_dir):
    """Audit totals agree with the standalone exact/near-dup keys."""
    from etl_ch_destination_spark.queries.reports_behavior import rpt_dedup_audit
    from etl_ch_destination_spark.ops.neardup import near_duplicate_pairs
    from etl_ch_destination_spark.catalog import load_table

    audit = rpt_dedup_audit(spark, sf_dir).collect()
    d = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in audit) == d.count()
    pairs = near_duplicate_pairs(d, max_jaccard_distance=0.8)
    n_pair_docs = (
        pairs.select(F.col("id_a").alias("x"))
        .unionAll(pairs.select(F.col("id_b").alias("x")))
        .distinct()
        .count()
    )
    assert sum(r.n_neardup_docs for r in audit) == n_pair_docs
    for r in audit:
        assert 0 <= r.n_exact_extra < r.n_docs
        assert r.n_unique_texts + r.n_exact_extra == r.n_docs
