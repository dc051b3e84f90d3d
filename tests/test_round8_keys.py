"""Semantic gates for the round-8 key batch — invariants the DuckDB
parity hash cannot express (known-graph truths, formulation
equivalences, filter complements)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def _q(key):
    return all_queries()[key]


# ---------- graph ----------


def test_triangle_counts_on_known_graphs(spark):
    """K4 has 4 triangles, every node in 3; attaching a pendant path
    adds none; a square (C4) has none at all."""
    from etl_ch_destination_spark.queries.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    path = [(3, 4), (4, 5)]  # pendant path off node 3
    e = spark.createDataFrame(k4 + path, "u long, v long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(e).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # path nodes absent

    c4 = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (0, 3)], "u long, v long")
    assert triangle_counts(c4).count() == 0


def test_triangle_query_total_matches_brute_force(spark):
    """On the sf0.001 co-purchase graph, the degree-ordered enumeration
    finds exactly the triangles a brute-force canonical triple join
    finds."""
    from etl_ch_destination_spark.queries.graph import (
        _copurchase_edges,
        triangle_counts,
    )

    e = _copurchase_edges(spark, SF).cache()
    total_fast = (
        triangle_counts(e).agg(F.sum("n_triangles")).collect()[0][0] or 0
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    brute = (
        e1.join(e2, F.col("e1.u") == F.col("e2.u"))
        .filter(F.col("e1.v") < F.col("e2.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.v")) & (F.col("e3.v") == F.col("e2.v")),
        )
        .count()
    )
    assert total_fast == brute * 3  # each triangle counted at 3 corners
    e.unpersist()


def test_degree_stats_buckets_partition_nodes(spark):
    out = _q("graph_degree_stats")(spark, SF).collect()
    assert all(r["min_degree"] >= 2 ** r["degree_log2_bucket"] for r in out)
    assert all(r["max_degree"] < 2 ** (r["degree_log2_bucket"] + 1) for r in out)


# ---------- llm filters ----------


def test_contamination_pairs_containment_bounds(spark):
    rows = _q("llm_contamination_pairs")(spark, SF).collect()
    for r in rows:
        assert 1 <= r["n_overlap"] <= r["n_bench_grams"]
        assert 0.0 < r["containment"] <= 1.0
        assert r["bench_id"] % 97 == 0 and r["train_id"] % 97 != 0


def test_keyword_tag_terms_belong_to_category(spark):
    from etl_ch_destination_spark.queries.llm_filters import _KEYWORDS

    rows = _q("llm_keyword_tag")(spark, SF).collect()
    assert rows
    for r in rows:
        terms = r["terms_csv"].split(",")
        assert len(terms) == r["n_distinct_terms"]
        assert len(set(terms)) == len(terms)
        assert set(terms) <= set(_KEYWORDS[r["category"]])


def test_lang_confusion_shares_sum_to_one(spark):
    rows = _q("llm_lang_confusion")(spark, SF).collect()
    by_lang: dict[str, float] = {}
    for r in rows:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0.0) + r["frac_of_lang"]
    assert by_lang and all(abs(v - 1.0) < 1e-9 for v in by_lang.values())


def test_filter_funnel_is_monotone(spark):
    rows = sorted(
        _q("rpt_filter_funnel")(spark, SF).collect(),
        key=lambda r: r["stage_idx"],
    )
    assert [r["stage"] for r in rows][:2] == ["raw", "nonempty"]
    docs = [r["n_docs"] for r in rows]
    toks = [r["n_tokens"] for r in rows]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    from etl_ch_destination_spark.catalog import load_table

    assert docs[0] == load_table(spark, SF, "documents").count()


# ---------- CH aggregates ----------


def test_group_array_sorted_equals_windowed_topn(spark):
    """The docstring's 100 TB claim: collect_list+sort+slice equals the
    windowed rank<=N collect (the form that never materializes a whole
    group)."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.aggregations_ch import GAS_K

    o = load_table(spark, SF, "orders")
    cents = (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
    base = o.select("o_orderpriority", cents.alias("cents"))
    w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderpriority")
    windowed = (
        base.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GAS_K)
        .groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("cents")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("csv")
        )
    )
    got = {
        r["o_orderpriority"]: r[f"low{GAS_K}_cents_csv"]
        for r in _q("agg_group_array_sorted")(spark, SF).collect()
    }
    want = {r["o_orderpriority"]: r["csv"] for r in windowed.collect()}
    assert got == want


def test_meanztest_antisymmetry(spark):
    """Swapping the two populations negates the statistic and mirrors
    the CI — pinned by recomputing from the emitted means."""
    r = _q("agg_meanztest")(spark, SF).collect()[0]
    d = r["mean_x"] - r["mean_y"]
    se = d / r["z_stat"]
    assert se > 0
    assert abs((r["ci_hi"] - r["ci_lo"]) / 2 - 1.959963984540054 * se) < 1e-6
    assert abs((r["ci_hi"] + r["ci_lo"]) / 2 - d) < 1e-9


def test_quantile_interp_matches_duckdb_quantile_cont(spark):
    import duckdb

    out = {
        (r["flag"], r["q_num"], r["q_den"]): r["quantile_value"]
        for r in _q("agg_quantile_interp_exact")(spark, SF).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF}/lineitem.parquet')"
    )
    ref = con.execute(
        """
        SELECT l_returnflag,
               quantile_cont(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100
                             AS BIGINT), [0.25, 0.5, 0.75]) AS qs
        FROM lineitem GROUP BY l_returnflag
        """
    ).fetchall()
    for flag, qs in ref:
        for (num, den), got_q in zip([(1, 4), (2, 4), (3, 4)], qs):
            assert abs(out[(flag, num, den)] - got_q / 100.0) < 1e-9


# ---------- relational ----------


def test_lateral_topn_shape_and_order(spark):
    from collections import defaultdict

    from etl_ch_destination_spark.queries.joins_extra import LATERAL_TOPN

    rows = _q("join_lateral_topn")(spark, SF).collect()
    per_cust = defaultdict(list)
    for r in rows:
        per_cust[r["c_custkey"]].append((r["price_cents"], r["o_orderkey"]))
    for got in per_cust.values():
        assert len(got) <= LATERAL_TOPN
        # descending by price, ascending orderkey on ties
        assert got == sorted(got, key=lambda t: (-t[0], t[1]))


def test_lateral_topn_plan_uses_window_group_limit(spark):
    """The decorrelation claim in the docstring: Catalyst turns the
    correlated LIMIT into WindowGroupLimit with a partial pre-shuffle
    pass."""
    plan = _q("join_lateral_topn")(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert plan.count("WindowGroupLimit") >= 2  # partial + final


def test_subq_any_all_flags_consistent(spark):
    rows = _q("subq_any_all")(spark, SF).collect()
    assert any(r["above_any_nation"] for r in rows)
    for r in rows:
        # above ALL implies above ANY (non-empty subquery)
        assert not r["above_all_nations"] or r["above_any_nation"]


def test_filter_qualify_complement(spark):
    """Kept rows satisfy the window predicate; kept+dropped = all."""
    from etl_ch_destination_spark.catalog import load_table

    kept = _q("filter_qualify")(spark, SF).collect()
    n_all = load_table(spark, SF, "events").count()
    assert 0 < len(kept) < n_all
    for r in kept:
        assert r["cents"] * r["n_user"] > r["total_cents"]


def test_percent_of_total_sums_to_one(spark):
    rows = _q("win_percent_of_total")(spark, SF).collect()
    assert abs(sum(r["pct_of_total"] for r in rows) - 1.0) < 1e-9
    by_region: dict[str, float] = {}
    for r in rows:
        by_region[r["region"]] = by_region.get(r["region"], 0.0) + r["pct_of_region"]
    assert all(abs(v - 1.0) < 1e-9 for v in by_region.values())
    assert sorted(r["rk"] for r in rows) == list(range(1, len(rows) + 1))


def test_readable_timedelta_spot_values(spark):
    rows = {
        r["secs"]: r["readable"]
        for r in _q("str_readable_timedelta")(spark, SF).collect()
    }

    def render(secs):
        d, rem = divmod(secs, 86400)
        h, rem = divmod(rem, 3600)
        m, s = divmod(rem, 60)
        parts = []
        for n, name in [(d, "day"), (h, "hour"), (m, "minute")]:
            if n > 0:
                parts.append(f"{n} {name}" + ("" if n == 1 else "s"))
        if s > 0 or secs == 0:
            parts.append(f"{s} second" + ("" if s == 1 else "s"))
        return ", ".join(parts)

    assert rows
    for secs, got in rows.items():
        assert got == render(secs), (secs, got)


def test_mattr_matches_python_reference(spark):
    """MATTR recomputed in plain Python on a sample of docs."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.llm_filters import MATTR_W

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents").limit(40).collect()
    }
    out = {
        r["doc_id"]: r
        for r in _q("llm_mattr_diversity")(spark, SF).collect()
        if r["doc_id"] in docs
    }
    for doc_id, text in docs.items():
        toks = [w for w in text.split(" ") if w]
        if not toks:
            assert doc_id not in out
            continue
        if len(toks) >= MATTR_W:
            wins = [toks[i : i + MATTR_W] for i in range(len(toks) - MATTR_W + 1)]
            sum_d = sum(len(set(w)) for w in wins)
            n_win = len(wins)
            denom = n_win * MATTR_W
        else:
            sum_d, n_win, denom = len(set(toks)), 1, len(toks)
        r = out[doc_id]
        assert (r["sum_distinct"], r["n_windows"]) == (sum_d, n_win)
        assert abs(r["mattr"] - sum_d / denom) < 1e-12


def test_radix_conv_roundtrip(spark):
    rows = _q("num_radix_conv")(spark, SF).collect()
    assert rows
    for r in rows[:200]:
        assert r["hex_str"] == format(r["event_id"], "X")
        assert r["bin_str"] == format(r["event_id"], "b")
        assert r["oct_str"] == format(r["event_id"], "o")
        assert r["hex_roundtrip"] == r["event_id"]


def test_scan_text_lines_reassembles_documents(spark):
    """Concatenating a file's scanned lines (wrapped at W words) must
    reproduce the source document's token stream exactly."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.sources_sinks import (
        TEXT_FILES_N,
        TEXT_WRAP_W,
    )

    out = _q("scan_text_lines")(spark, SF).collect()
    by_file: dict[str, list[str]] = {}
    for r in out:
        by_file.setdefault(r["file_name"], []).append(r["line"])
        assert r["line_len"] == len(r["line"])
        assert len(r["line"].split(" ")) <= TEXT_WRAP_W
    docs = {
        r["doc_id"]: [w for w in r["text"].split(" ") if w]
        for r in load_table(spark, SF, "documents")
        .filter(f"doc_id < {TEXT_FILES_N} AND length(text) > 0")
        .collect()
    }
    assert len(by_file) == len(docs)
    for doc_id, toks in docs.items():
        lines = by_file[f"doc_{doc_id}.txt"]
        # multiset of tokens matches even though line order is unordered
        got = sorted(w for ln in lines for w in ln.split(" "))
        assert got == sorted(toks)


# ---------- round-9 staged batch ----------


def test_ip_cidr_longest_prefix_matches_python(spark):
    from etl_ch_destination_spark.queries.joins_extra import _CIDR_ROWS

    rows = _q("join_ip_cidr")(spark, SF).collect()
    assert rows
    for r in rows[:300]:
        ip = r["ip_num"]
        # most-specific prefix wins; label tiebreak is ORDER BY label
        want = sorted(
            [
                (plen, label)
                for label, plen, key in _CIDR_ROWS
                if ip >> (32 - plen) == key
            ],
            key=lambda t: (-t[0], t[1]),
        )[0]
        assert (r["prefix_len"], r["cidr_label"]) == want


def test_hierarchy_path_depth_and_membership(spark):
    rows = _q("dict_get_hierarchy")(spark, SF).collect()
    assert rows
    for r in rows:
        parts = r["path"].split(">")
        assert len(parts) == r["depth"] == 3
        assert r["in_asia"] == (parts[0] == "ASIA")


def test_zorder_value_matches_python_interleave(spark):
    from etl_ch_destination_spark.queries.sources_sinks import zorder_value

    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 130, 255) for b in (0, 3, 77, 255)],
        "a int, b int",
    ).withColumn("z", zorder_value())

    def interleave(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    for r in df.collect():
        assert r["z"] == interleave(r["a"], r["b"]), (r["a"], r["b"])


def test_zorder_files_have_disjoint_z_ranges(spark):
    """repartitionByRange(z) + sortWithinPartitions(z) must yield
    between-file disjoint z-ranges — the property box-scan pruning
    relies on."""
    import glob

    from etl_ch_destination_spark.queries.sources_sinks import _scratch

    _q("sink_zorder_layout")(spark, SF).collect()  # materialize the layout
    path = _scratch(SF, "sink_zorder_layout")
    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        part = spark.read.parquet(f)
        lo, hi = part.agg(F.min("z"), F.max("z")).collect()[0]
        if lo is not None:
            spans.append((lo, hi))
    spans.sort()
    assert len(spans) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file z-ranges overlap"


def test_monthly_yoy_lag_relation(spark):
    rows = {r["ym"]: r for r in _q("rpt_monthly_yoy")(spark, SF).collect()}
    for ym, r in rows.items():
        y, m = ym.split("-")
        prev = f"{int(y) - 1}-{m}"
        if prev in rows:
            assert r["rev_cents_prev_year"] == rows[prev]["rev_cents"]
            want = (r["rev_cents"] - rows[prev]["rev_cents"]) / rows[prev][
                "rev_cents"
            ]
            assert abs(r["yoy_growth"] - want) < 1e-12
        else:
            assert r["rev_cents_prev_year"] is None


def test_time_decayed_sum_bounds_and_reference(spark):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.timeseries_extra import (
        DECAY_HALF_LIFE_S,
    )

    out = {r["user_id"]: r for r in _q("ts_time_decayed_sum")(spark, SF).collect()}
    ev = load_table(spark, SF, "events").select("user_id", "ts", "value").collect()
    tmax = max(int(r["ts"].timestamp() * 1_000_000) for r in ev)
    from collections import defaultdict
    from decimal import Decimal

    want = defaultdict(int)
    for r in ev:
        cents = int(
            (Decimal(str(r["value"])).quantize(Decimal("0.01"))) * 100
        )
        k = min(
            (tmax - int(r["ts"].timestamp() * 1_000_000))
            // (DECAY_HALF_LIFE_S * 1_000_000),
            40,
        )
        want[r["user_id"]] += cents >> k
    for uid, r in out.items():
        assert r["decayed_cents"] <= r["raw_cents"]
        assert r["decayed_cents"] == want[uid], uid


def test_temperature_mixture_properties(spark):
    rows = _q("llm_temperature_mixture")(spark, SF).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    # sqrt flattening: the largest source downsamples, the smallest
    # upsamples (relative to natural proportions)
    big = max(rows, key=lambda r: r["n_tok"])
    small = min(rows, key=lambda r: r["n_tok"])
    if big["n_tok"] != small["n_tok"]:
        assert big["upsample_factor"] < 1.0 < small["upsample_factor"]


def test_url_hierarchy_prefix_ladder(spark):
    by_doc: dict[int, dict[int, str]] = {}
    for r in _q("url_hierarchy")(spark, SF).collect():
        by_doc.setdefault(r["doc_id"], {})[r["level"]] = r["url_prefix"]
    assert by_doc
    for doc_id, lv in by_doc.items():
        assert sorted(lv) == [1, 2, 3]
        assert lv[2].startswith(lv[1]) and lv[3].startswith(lv[2])
        assert lv[3].endswith(f"/docs/{doc_id}")


def test_perplexity_buckets_total_matches_surprisal(spark):
    per_doc = _q("llm_bigram_surprisal")(spark, SF).collect()
    buckets = _q("llm_perplexity_buckets")(spark, SF).collect()
    assert sum(r["n_docs"] for r in buckets) == len(per_doc)
    assert sum(r["n_bigrams_total"] for r in buckets) == sum(
        r["n_bigrams"] for r in per_doc
    )
    from collections import Counter

    want = Counter(r["sum_bits"] // r["n_bigrams"] for r in per_doc)
    got = {r["bits_bucket"]: r["n_docs"] for r in buckets}
    assert got == dict(want)


def test_dedup_normalized_group_invariants(spark):
    norm = _q("llm_dedup_normalized")(spark, SF).collect()
    n_norm_groups = len({r["norm_hash"] for r in norm})
    kept_norm = sum(1 for r in norm if r["is_kept"])
    assert kept_norm == n_norm_groups <= len(norm)
    # every group: exactly one keeper, the minimum doc_id
    from collections import defaultdict

    groups = defaultdict(list)
    for r in norm:
        groups[r["norm_hash"]].append(r)
    for rs in groups.values():
        keepers = [r for r in rs if r["is_kept"]]
        assert len(keepers) == 1
        assert keepers[0]["doc_id"] == min(r["doc_id"] for r in rs)
        assert all(r["group_size"] == len(rs) for r in rs)


def test_streaks_python_reference(spark):
    from collections import defaultdict
    from datetime import timedelta

    from etl_ch_destination_spark.catalog import load_table

    ev = load_table(spark, SF, "events").select("user_id", "ts").collect()
    days = defaultdict(set)
    for r in ev:
        days[r["user_id"]].add(r["ts"].date())
    want = set()
    for uid, ds in days.items():
        run = []
        for d in sorted(ds):
            if run and d == run[-1] + timedelta(days=1):
                run.append(d)
            else:
                if run:
                    want.add((uid, run[0], run[-1], len(run)))
                run = [d]
        want.add((uid, run[0], run[-1], len(run)))
    got = {
        (r["user_id"], r["streak_start"], r["streak_end"], r["streak_days"])
        for r in _q("win_streaks")(spark, SF).collect()
    }
    assert got == want


def test_mode_exact_brute_force(spark):
    from collections import Counter
    from decimal import Decimal

    from etl_ch_destination_spark.catalog import load_table

    li = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity"
    ).collect()
    by_flag = {}
    for r in li:
        cents = int(Decimal(str(r["l_quantity"])).quantize(Decimal("0.01")) * 100)
        by_flag.setdefault(r["l_returnflag"], Counter())[cents] += 1
    got = {
        r["l_returnflag"]: (r["mode_cents"], r["mode_count"])
        for r in _q("agg_mode_exact")(spark, SF).collect()
    }
    for flag, cnt in by_flag.items():
        best = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[0]
        assert got[flag] == best


def test_us_precision_roundtrip(spark):
    rows = _q("date_us_precision")(spark, SF).collect()
    assert any(r["us_in_second"] > 0 for r in rows), "fixture lost sub-second"
    for r in rows[:500]:
        assert int(r["ts_roundtrip"].timestamp() * 1_000_000) == r["tus"]
        assert r["ts_ms"].microsecond % 1000 == 0
        assert 0 <= r["us_in_second"] < 1_000_000


def test_vwap_bounds(spark):
    for r in _q("ts_vwap")(spark, SF).collect():
        assert r["volume"] >= 1
        assert abs(r["vwap_cents"] - r["pv_cents"] / r["volume"]) < 1e-9


def test_char_ngrams_python_reference(spark):
    from collections import Counter

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.scalars_string import (
        CHAR_NGRAM_N,
        CHAR_NGRAM_TOP,
    )

    names = [
        r["p_name"]
        for r in load_table(spark, SF, "part").select("p_name").collect()
    ]
    cnt = Counter()
    for nm in names:
        for i in range(len(nm) - CHAR_NGRAM_N + 1):
            cnt[nm[i : i + CHAR_NGRAM_N]] += 1
    want = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:CHAR_NGRAM_TOP]
    got = [
        (r["gram"], r["n"]) for r in _q("str_char_ngrams")(spark, SF).collect()
    ]
    assert sorted(got, key=lambda t: (-t[1], t[0])) == want


def test_bool_aggs_recompute(spark):
    from etl_ch_destination_spark.catalog import load_table

    ev = load_table(spark, SF, "events").select("event_type", "value").collect()
    from collections import defaultdict

    vals = defaultdict(list)
    for r in ev:
        vals[r["event_type"]].append(r["value"])
    for r in _q("agg_bool_aggs")(spark, SF).collect():
        vs = vals[r["event_type"]]
        assert r["all_above_1"] == all(v > 1.0 for v in vs)
        assert r["any_above_400"] == any(v > 400.0 for v in vs)
        assert r["n_above_100"] == sum(1 for v in vs if v > 100.0)
        assert r["n"] == len(vs)


def test_column_profile_reference(spark):
    from etl_ch_destination_spark.catalog import load_table

    prof = {r["column_name"]: r for r in _q("rpt_column_profile")(spark, SF).collect()}
    o = load_table(spark, SF, "orders")
    n = o.count()
    assert set(prof) == {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice_cents",
        "o_orderdate", "o_orderpriority",
    }
    for r in prof.values():
        assert r["n_rows"] == n and r["n_null"] == 0
        assert 1 <= r["n_distinct"] <= n
        assert r["min_repr"] <= r["max_repr"] or r["n_distinct"] == 1
    assert prof["o_orderkey"]["n_distinct"] == n  # primary key


def test_fk_integrity_clean_fixture(spark):
    rows = {r["relation"]: r for r in _q("rpt_fk_integrity")(spark, SF).collect()}
    assert set(rows) == {"lineitem->orders", "orders->customer",
                         "orders-childless"}
    # the TPC-H-ish fixture is referentially intact
    assert rows["lineitem->orders"]["n_orphans"] == 0
    assert rows["orders->customer"]["n_orphans"] == 0
    assert rows["orders-childless"]["n_orphans"] >= 0


def test_attribution_reference(spark):
    from collections import defaultdict

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.reports_behavior import ATTR_WINDOW_S

    ev = load_table(spark, SF, "events").filter(
        "event_type IN ('view', 'purchase')"
    ).collect()
    views = defaultdict(list)
    for r in ev:
        if r["event_type"] == "view":
            views[r["user_id"]].append(int(r["ts"].timestamp() * 1_000_000))
    out = {r["event_id"]: r for r in _q("rpt_attribution")(spark, SF).collect()}
    purchases = [r for r in ev if r["event_type"] == "purchase"]
    assert len(out) == len(purchases)
    for p in purchases:
        tus = int(p["ts"].timestamp() * 1_000_000)
        in_win = [v for v in views[p["user_id"]]
                  if tus - ATTR_WINDOW_S * 1_000_000 <= v <= tus]
        r = out[p["event_id"]]
        if in_win:
            assert (r["first_touch_us"], r["last_touch_us"]) == (
                min(in_win), max(in_win))
            assert r["n_views_window"] == len(in_win)
        else:
            assert r["first_touch_us"] is None and r["n_views_window"] == 0


def test_parquet_bloom_filter_is_written_and_probe_matches(spark, tmp_path):
    """The probe aggregate must equal the same aggregate on the source,
    and the bloom option must actually reach the files: this pyarrow
    can't surface the footer's bloom offset, so the evidence is the
    size differential — the same frame written with and without the
    option differs by the bloom blob (~kilobytes per row group),
    while an unknown option would be silently ignored and produce
    byte-similar files."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.sources_sinks import BLOOM_PROBE_MOD

    got = _q("sink_parquet_bloom")(spark, SF).collect()[0]
    li = load_table(spark, SF, "lineitem").filter(
        F.col("l_orderkey") % BLOOM_PROBE_MOD == 0
    )
    want = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("no"),
    ).collect()[0]
    assert (got["n_rows"], got["n_orders"]) == (want["n"], want["no"])

    import glob
    import os

    keys = spark.range(0, 20000).selectExpr("id AS k").coalesce(1)
    p_plain = str(tmp_path / "plain")
    p_bloom = str(tmp_path / "bloom")
    keys.write.mode("overwrite").parquet(p_plain)
    (
        keys.write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#k", "true")
        .option("parquet.bloom.filter.expected.ndv#k", "20000")
        .parquet(p_bloom)
    )

    def total(p):
        return sum(os.path.getsize(f) for f in glob.glob(f"{p}/part-*.parquet"))

    assert total(p_bloom) > total(p_plain) + 4096, (
        total(p_bloom), total(p_plain),
        "bloom option produced no filter blob",
    )


def test_event_transitions_probabilities(spark):
    from collections import defaultdict

    rows = _q("rpt_event_transitions")(spark, SF).collect()
    by_from = defaultdict(float)
    for r in rows:
        assert r["n_transitions"] >= 1
        by_from[r["from_type"]] += r["p_transition"]
    assert by_from and all(abs(v - 1.0) < 1e-9 for v in by_from.values())


def test_substring_dedup_detects_planted_copy(spark):
    """Two synthetic docs sharing a long verbatim run must flag each
    other; a unique doc must not."""
    from etl_ch_destination_spark.queries.llm_filters import (
        SUBSTR_GRAM,
        SUBSTR_STEP,
        llm_dedup_substring,
    )

    del llm_dedup_substring  # query fn reads from fixture; test the math
    shared = "x" * 0  # build from distinct words to avoid accidental overlap
    run = " ".join(f"tok{i}" for i in range(40))  # ~240 chars shared run
    docs = [
        (0, "alpha " * 30 + run),
        (1, run + " omega " * 30),
        (2, "unique words only " * 20),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # replicate the key's logic on the synthetic frame
    starts = F.sequence(
        F.lit(1), F.length("text") - (SUBSTR_GRAM - 1), F.lit(SUBSTR_STEP)
    )
    sh = df.filter(F.length("text") >= SUBSTR_GRAM).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    starts,
                    lambda i: F.md5(F.col("text").substr(i, F.lit(SUBSTR_GRAM))),
                )
            )
        ).alias("h"),
    )
    dup = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
    )
    hits = {
        r["doc_id"]
        for r in sh.join(dup.select("h"), "h").select("doc_id").distinct().collect()
    }
    assert hits == {0, 1}
    del shared


def test_rfm_quartiles_are_balanced_and_segment_consistent(spark):
    from collections import Counter

    rows = _q("rpt_rfm_segmentation")(spark, SF).collect()
    n = len(rows)
    assert n > 0
    for dim in ("r_q", "f_q", "m_q"):
        counts = Counter(r[dim] for r in rows)
        assert set(counts) <= {1, 2, 3, 4}
        # ntile balance: sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1
    for r in rows:
        assert r["segment"] == f"{r['r_q']}{r['f_q']}{r['m_q']}"
    # monetary quartile 1 holds the highest spenders
    q1_min = min(r["m_cents"] for r in rows if r["m_q"] == 1)
    q4_max = max(r["m_cents"] for r in rows if r["m_q"] == 4)
    assert q1_min >= q4_max


def test_table_diff_counts_match_construction(spark):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.reports_behavior import (
        DIFF_ADD_MOD,
        DIFF_CHG_MOD,
        DIFF_DEL_MOD,
    )

    keys = [
        r["o_orderkey"]
        for r in load_table(spark, SF, "orders").select("o_orderkey").collect()
    ]
    want = {
        "added": sum(1 for k in keys if k % DIFF_ADD_MOD == 0),
        "removed": sum(1 for k in keys if k % DIFF_DEL_MOD == 0),
        "changed": sum(
            1 for k in keys if k % DIFF_DEL_MOD != 0 and k % DIFF_CHG_MOD == 0
        ),
    }
    want["unchanged"] = len(keys) - want["removed"] - want["changed"]
    got = {r["status"]: r["n_rows"] for r in _q("rpt_table_diff")(spark, SF).collect()}
    for k, v in want.items():
        assert got.get(k, 0) == v, (k, got, want)


def test_calendar_dim_is_dense_and_consistent(spark):
    from datetime import timedelta

    rows = sorted(_q("gen_calendar_dim")(spark, SF).collect(), key=lambda r: r["d"])
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert b["d"] - a["d"] == timedelta(days=1)  # dense spine
    for r in rows:
        assert r["iso_dow"] == r["d"].isoweekday()
        assert r["is_weekend"] == (r["d"].isoweekday() >= 6)
        assert r["is_month_start"] == (r["d"].day == 1)
        assert r["is_month_end"] == (r["d"].day == r["days_in_month"])
        assert r["qtr"] == (r["d"].month - 1) // 3 + 1


def test_slugify_properties(spark):
    import re

    rows = _q("str_slugify")(spark, SF).collect()
    assert rows
    for r in rows:
        assert re.fullmatch(r"[a-z0-9]+(-[a-z0-9]+)*", r["slug"]), r["slug"]
        assert r["slug_len"] == len(r["slug"])


def test_apply_in_pandas_equals_window_form(spark):
    got = {
        (r["user_id"], r["event_id"]): (r["running_cents"], r["group_n"])
        for r in _q("udf_apply_in_pandas")(spark, SF).collect()
    }
    from etl_ch_destination_spark.catalog import load_table

    e = load_table(spark, SF, "events")
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["user_id"], r["event_id"]): (r["rc"], r["gn"])
        for r in e.select(
            "user_id",
            "event_id",
            F.sum(cents).over(w).cast("bigint").alias("rc"),
            F.count(F.lit(1))
            .over(Window.partitionBy("user_id"))
            .cast("bigint")
            .alias("gn"),
        ).collect()
    }
    assert got == want


def test_merge_intervals_spans_are_disjoint_and_cover(spark):
    from collections import defaultdict

    rows = _q("win_merge_intervals")(spark, SF).collect()
    by_user = defaultdict(list)
    total_members = 0
    for r in rows:
        assert r["span_start"] < r["span_end"]
        by_user[r["user_id"]].append((r["span_start"], r["span_end"]))
        total_members += r["n_intervals"]
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2, "merged spans must be disjoint with a gap"
    from etl_ch_destination_spark.catalog import load_table

    assert total_members == load_table(spark, SF, "events").count()


def test_reset_cumsum_restarts_per_session(spark):
    from collections import defaultdict

    rows = _q("win_reset_cumsum")(spark, SF).collect()
    by_sess = defaultdict(list)
    for r in rows:
        by_sess[(r["user_id"], r["sess_id"])].append(
            (r["event_id"], r["session_running_cents"])
        )
    for evs in by_sess.values():
        evs.sort()
        # strictly increasing within a session (cents > 0 in fixture)
        totals = [t for _, t in evs]
        assert totals == sorted(totals)
        assert totals[0] > 0


def test_skyline_matches_brute_force_dominance(spark):
    from etl_ch_destination_spark.catalog import load_table

    pts = [
        (r["p_partkey"], int(round(r["p_retailprice"] * 100)), r["p_size"])
        for r in load_table(spark, SF, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]

    def dominated(a):
        ka, pa, sa = a
        for kb, pb, sb in pts:
            if (pb, sb) == (pa, sa):
                if kb < ka:  # duplicate collapses to lowest key
                    return True
                continue
            if pb <= pa and sb >= sa:
                return True
        return False

    want = {k for (k, p, s) in pts if not dominated((k, p, s))}
    got = {r["p_partkey"] for r in _q("win_skyline_2d")(spark, SF).collect()}
    assert got == want


def test_new_returning_accounting(spark):
    rows = sorted(_q("rpt_new_returning")(spark, SF).collect(), key=lambda r: r["ym"])
    assert rows
    # first month: everyone active is new
    assert rows[0]["n_returning"] == 0
    total_new = sum(r["n_new"] for r in rows)
    from etl_ch_destination_spark.catalog import load_table

    n_customers = (
        load_table(spark, SF, "orders").select("o_custkey").distinct().count()
    )
    # every customer is new exactly once
    assert total_new == n_customers
    for r in rows:
        assert r["n_new"] + r["n_returning"] == r["n_active"]


def test_printf_int_matches_python_format(spark):
    rows = _q("str_printf_int")(spark, SF).collect()
    for r in rows[:200]:
        k = r["p_partkey"]
        assert r["key_padded"] == f"{k:08d}"
        assert r["sku"].startswith(f"SKU-{k:x}-")
        assert r["ratio_repr"].endswith(f"/{k % 10}")


def test_add_business_days_python_reference(spark):
    from datetime import timedelta

    rows = _q("date_add_business")(spark, SF).collect()
    assert rows
    for r in rows[:500]:
        d = r["start_date"]
        # snap weekend starts to Monday, then walk day by day
        while d.isoweekday() > 5:
            d += timedelta(days=1)
        n = r["n_business_days"]
        while n > 0:
            d += timedelta(days=1)
            if d.isoweekday() <= 5:
                n -= 1
        assert r["due_date"] == d, (r["start_date"], r["n_business_days"])
        assert r["due_iso_dow"] <= 5


def test_fuzzy_levenshtein_recovers_every_nation(spark):
    rows = _q("join_fuzzy_levenshtein")(spark, SF).collect()
    # every dirty name (one deleted char) must match back, lev == 1,
    # except where the deletion is a no-op tie resolved to lev 0
    assert len(rows) == 25
    for r in rows:
        assert 0 <= r["lev"] <= 1
        # the match must reinsert exactly the deleted character
        assert len(r["matched_name"]) - len(r["dirty_name"]) in (0, 1)


def test_json_nested_explode_shreds_correctly(spark):
    from collections import defaultdict

    by_doc = defaultdict(set)
    meta = {}
    for r in _q("json_nested_explode")(spark, SF).collect():
        assert r["parsed_id"] == r["doc_id"]
        by_doc[r["doc_id"]].add(r["tag"])
        meta[r["doc_id"]] = r["meta_n"]
    assert by_doc
    for doc_id, tags in by_doc.items():
        want = {f"t{doc_id % 5}", f"t{doc_id % 7}"}
        # duplicate tag values collapse in the set; membership is the gate
        assert tags == want


def test_csv_quoted_fields_roundtrip_exactly(spark):
    """Every tricky field (embedded comma, escaped quote, embedded
    newline) must round-trip byte-identically through the RFC-4180
    staging + multiLine read."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.sources_sinks import CSVQ_N

    src = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF, "documents")
        .filter(f"doc_id < {CSVQ_N}")
        .collect()
    }
    out = {r["doc_id"]: r for r in _q("scan_csv_quoted")(spark, SF).collect()}
    assert set(out) == set(src)
    for doc_id, t in src.items():
        r = out[doc_id]
        assert r["f_comma"] == f"pre,{t[:10]}"
        assert r["f_quote"] == f'say "{t[:5]}"'
        assert r["f_newline"] == f"line1\n{t[:8]}"
        assert "\n" in r["f_newline"]


def test_jsonl_gzip_actually_compresses(spark):
    import glob

    from etl_ch_destination_spark.queries.sources_sinks import _scratch

    _q("sink_jsonl_gzip")(spark, SF).collect()
    path = _scratch(SF, "sink_jsonl_gzip")
    gz = glob.glob(f"{path}/part-*.json.gz")
    assert gz, "gzip codec produced no .gz files"
    import gzip

    with gzip.open(gz[0], "rt") as f:
        line = f.readline()
    assert line.startswith("{") and "event_id" in line
