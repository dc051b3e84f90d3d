"""Round-10 key gates: geohash python-reference replay, PASTE-join
pairing replay, multiLine-JSON / XML round trips, ROUGE clipped-overlap
replay, DPO pairing invariants."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F


def _q(key, spark, sf_dir):
    from etl_ch_destination_spark.registry import all_queries

    return all_queries()[key](spark, sf_dir)


def _ref_geohash(lat_micro: int, lon_micro: int, n_chars: int = 12) -> str:
    """Independent bisection geohash (the classic interval-halving
    algorithm) in EXACT rational arithmetic: cell midpoints are dyadic
    rationals of the range, so Fraction keeps every deep-level
    comparison exact (an integer `(lo+hi)//2` floor-drifts past ~20
    bits; float midpoints drift similarly)."""
    from fractions import Fraction as Fr

    base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi = Fr(-90_000_000), Fr(90_000_000)
    lon_lo, lon_hi = Fr(-180_000_000), Fr(180_000_000)
    out, bits, val, even = [], 0, 0, True
    while len(out) < n_chars:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon_micro >= mid:
                val, lon_lo = val * 2 + 1, mid
            else:
                val, lon_hi = val * 2, mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat_micro >= mid:
                val, lat_lo = val * 2 + 1, mid
            else:
                val, lat_hi = val * 2, mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(base32[val])
            bits, val = 0, 0
    return "".join(out)


def test_geohash_matches_integer_bisection_reference(spark, sf_dir):
    """The generated mod-form subdivision must equal the classic
    bisection geohash on every fixture point (independent algorithm:
    interval halving vs modular bit extraction)."""
    rows = _q("geo_geohash_encode", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["geohash"] == _ref_geohash(r["lat_micro"], r["lon_micro"]), (
            r["c_custkey"], r["lat_micro"], r["lon_micro"], r["geohash"]
        )
        assert r["geohash5"] == r["geohash"][:5]


def test_geohash_prefix_property_on_known_neighbors(spark):
    """Two points in the same small cell share a long prefix; antipodal
    points diverge at character 1 — the property geo GROUP BYs rely on."""
    a = _ref_geohash(48_858_000, 2_294_000)     # Eiffel tower, ~µdeg
    b = _ref_geohash(48_858_100, 2_294_100)     # 15 m away
    c = _ref_geohash(-33_856_800, 151_215_300)  # Sydney
    assert a[:7] == b[:7]
    assert a[0] != c[0]


def test_paste_join_matches_python_zip(spark, sf_dir):
    """join_paste_positional must equal the python zip of the two
    independently sorted sides (the PASTE JOIN contract), with dense
    1..n positions bounded by the shorter side."""
    from etl_ch_destination_spark.catalog import load_table

    got = {
        r["pos"]: (r["cust_by_balance"], r["cust_by_orders"])
        for r in _q("join_paste_positional", spark, sf_dir).collect()
    }
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    ).collect()
    by_bal = [r["c_custkey"] for r in sorted(
        cust, key=lambda r: (-r["c_acctbal"], r["c_custkey"]))]
    ocnt = Counter(
        r["o_custkey"]
        for r in load_table(spark, sf_dir, "orders").select("o_custkey").collect()
    )
    by_ord = [k for k, _ in sorted(ocnt.items(), key=lambda kv: (-kv[1], kv[0]))]
    n = min(len(by_bal), len(by_ord))
    assert sorted(got) == list(range(1, n + 1))
    for pos in range(1, n + 1):
        assert got[pos] == (by_bal[pos - 1], by_ord[pos - 1]), pos


def test_json_multiline_roundtrip_matches_source(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table

    back = _q("scan_json_multiline", spark, sf_dir)
    src = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_xml_roundtrip_matches_source_and_is_schema_first(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table

    back = _q("scan_xml_roundtrip", spark, sf_dir)
    src = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    assert back.schema == src.schema  # explicit schema, never inference
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_rouge_overlap_matches_counter_replay(spark, sf_dir):
    """Clipped unigram overlap must equal the collections.Counter
    replay (the textbook ROUGE-1 definition) on every pair."""
    from etl_ch_destination_spark.catalog import load_table

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text").collect()
    }
    rows = _q("llm_rouge_overlap", spark, sf_dir).collect()
    assert rows
    for r in rows:
        cand = Counter(docs[r["pair_id"]].split(" "))
        ref = Counter(docs[r["pair_id"] + 1].split(" "))
        overlap = sum(min(cand[w], c) for w, c in ref.items())
        total = sum(ref.values())
        assert (r["overlap1"], r["ref_total1"]) == (overlap, total), r["pair_id"]
        assert 0.0 <= r["rouge1_recall"] <= 1.0


def test_dpo_pairs_margins_nonnegative_and_cover_half(spark, sf_dir):
    """Every chosen score >= rejected score (rank r vs r + n/2 under a
    total desc order), pairs per lang = floor(n/2), and no document is
    chosen and rejected at once."""
    from etl_ch_destination_spark.catalog import load_table

    rows = _q("llm_dpo_pairs", spark, sf_dir).collect()
    assert rows
    assert all(r["margin"] >= 0 for r in rows)
    chosen = {r["chosen_id"] for r in rows}
    rejected = {r["rejected_id"] for r in rows}
    assert not (chosen & rejected)
    n_by_lang = {
        r["lang"]: r["n"]
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    pairs_by_lang = Counter(r["lang"] for r in rows)
    for lang, n in n_by_lang.items():
        assert pairs_by_lang[lang] == n // 2, (lang, n)


def test_bfs_known_path_graph_distances(spark):
    """On the path 0-1-2-...-9 with single source 0, the
    convergence-terminated BFS reaches the WHOLE path (diameter 9 <
    BFS_MAX_ROUNDS) and stops itself right after the last improvement
    — exactly ecc+1 = 10 rounds, not the cap."""
    from etl_ch_destination_spark.queries.graph import (
        BFS_MAX_ROUNDS,
        bfs_distances_with_rounds,
    )

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "u long, v long"
    )
    dist, rounds = bfs_distances_with_rounds(e)
    got = {r["node"]: r["dist"] for r in dist.collect()}
    assert got == {i: i for i in range(10)}
    assert rounds == 10 < BFS_MAX_ROUNDS


def test_bfs_multi_source_takes_nearest_seed(spark):
    """Two sources (0 and 97) on a path 0-1-...-97: every node's
    distance is the MIN over seeds — node 96 is 1 hop from seed 97,
    not 96 hops from seed 0. Eccentricity from the nearest seed is 48
    > BFS_MAX_ROUNDS, so the safety cap binds: nodes farther than the
    cap are OMITTED (never faked), and rounds == cap (budget
    exhausted, stated by the counter)."""
    from etl_ch_destination_spark.queries.graph import (
        BFS_MAX_ROUNDS,
        bfs_distances_with_rounds,
    )

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(97)], "u long, v long"
    )
    dist, rounds = bfs_distances_with_rounds(e)
    got = {r["node"]: r["dist"] for r in dist.collect()}
    expected = {
        n: min(n, 97 - n)
        for n in range(98)
        if min(n, 97 - n) <= BFS_MAX_ROUNDS
    }
    assert got == expected
    assert got[96] == 1 and got[0] == 0 and got[97] == 0
    assert rounds == BFS_MAX_ROUNDS


def test_curriculum_phases_are_quartiles_and_difficulty_monotone(spark, sf_dir):
    """Phase sizes per lang differ by at most 1 (exact integer
    quartiles) and max difficulty of phase p never exceeds min
    difficulty of phase p+1 (the curriculum invariant)."""
    from collections import defaultdict

    from etl_ch_destination_spark.catalog import load_table

    diff = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars").collect()
    }
    rows = _q("llm_curriculum_order", spark, sf_dir).collect()
    by_lang_phase = defaultdict(list)
    for r in rows:
        by_lang_phase[(r["lang"], r["phase"])].append(diff[r["doc_id"]])
    langs = {lang for lang, _ in by_lang_phase}
    for lang in langs:
        sizes = [len(by_lang_phase.get((lang, p), [])) for p in range(4)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        for p in range(3):
            assert max(by_lang_phase[(lang, p)]) <= min(
                by_lang_phase[(lang, p + 1)]
            ), (lang, p)
    # pos_in_phase is dense 1..|phase|
    pos = defaultdict(list)
    for r in rows:
        pos[(r["lang"], r["phase"])].append(r["pos_in_phase"])
    for key, ps in pos.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), key


def test_hard_negatives_are_argmax_over_mismatched_labels(spark, sf_dir):
    """Each mined negative must (a) carry a different label than its
    query and (b) be the true cosine argmax over ALL mismatched-label
    candidates — verified against a numpy replay."""
    import numpy as np

    from etl_ch_destination_spark.catalog import load_table

    emb = {
        r["vec_id"]: (r["label"], np.array(r["embedding"], dtype=np.float64))
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    rows = _q("llm_hard_negatives", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["negative_label"] != r["query_label"]
        ql, qv = emb[r["query_id"]]
        qn = np.sqrt(qv @ qv)
        best = max(
            (
                ((cv @ qv) / (qn * np.sqrt(cv @ cv)), -cid)
                for cid, (cl, cv) in emb.items()
                if cl != ql
            ),
        )
        assert -best[1] == r["negative_id"], (r["query_id"], best)
        assert abs(best[0] - r["cos_sim"]) < 1e-9


def test_proportions_ztest_matches_python_replay(spark, sf_dir):
    """The z statistic and CI must equal the pooled/unpooled formulas
    recomputed in python from the exact counts the row itself carries."""
    import math

    (r,) = _q("agg_proportions_ztest", spark, sf_dir).collect()
    nx, ny, sx, sy = r["n_x"], r["n_y"], r["s_x"], r["s_y"]
    px, py = sx / nx, sy / ny
    pp = (sx + sy) / (nx + ny)
    z = (px - py) / math.sqrt(pp * (1 - pp) * (1 / nx + 1 / ny))
    se = math.sqrt(px * (1 - px) / nx + py * (1 - py) / ny)
    assert abs(r["z_stat"] - z) < 1e-12
    assert abs(r["ci_lo"] - ((px - py) - 1.959963984540054 * se)) < 1e-12
    assert abs(r["ci_hi"] - ((px - py) + 1.959963984540054 * se)) < 1e-12
    assert r["ci_lo"] <= r["p_x"] - r["p_y"] <= r["ci_hi"]


def test_multichar_delim_roundtrip_and_embedded_commas(spark, sf_dir):
    """The '::'-separated round trip must reproduce the source exactly,
    and a value CONTAINING commas must survive without quoting (the
    reason the legacy separator exists)."""
    from etl_ch_destination_spark.catalog import load_table

    back = _q("scan_csv_multichar_delim", spark, sf_dir)
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("price_cents"),
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    # embedded commas survive a :: round trip unquoted
    import os
    import tempfile

    path = os.path.join(tempfile.mkdtemp(), "mc")
    df = spark.createDataFrame([(1, "a,b,c"), (2, "x,,y")], "k long, v string")
    df.write.option("sep", "::").option("header", True).csv(path)
    got = (
        spark.read.option("sep", "::").option("header", True)
        .schema("k long, v string").csv(path).collect()
    )
    assert sorted(map(tuple, got)) == [(1, "a,b,c"), (2, "x,,y")]


def test_vad_segments_are_maximal_contiguous_active_runs(spark, sf_dir):
    """Segments must exactly tile the active windows: within a segment
    every window is active and contiguous; the windows just outside
    each segment are inactive or absent (maximality); per-doc seg_idx
    is dense from 1."""
    from collections import defaultdict

    from etl_ch_destination_spark.queries.llm_vectors import VAD_THRESH

    energies = defaultdict(dict)
    for r in _q("llm_multimodal_audio", spark, sf_dir).collect():
        energies[r["doc_id"]][r["window_idx"]] = (r["energy"], r["n_samples"])
    segs = defaultdict(list)
    for r in _q("llm_audio_vad_segments", spark, sf_dir).collect():
        segs[r["doc_id"]].append(r)
    assert segs

    def active(doc, w):
        if w not in energies[doc]:
            return False
        e, n = energies[doc][w]
        return e >= VAD_THRESH * n

    for doc, rows in segs.items():
        rows.sort(key=lambda r: r["win_start"])
        assert [r["seg_idx"] for r in rows] == list(range(1, len(rows) + 1))
        for r in rows:
            for w in range(r["win_start"], r["win_end"] + 1):
                assert active(doc, w), (doc, w)
            assert not active(doc, r["win_start"] - 1)
            assert not active(doc, r["win_end"] + 1)
            assert r["energy"] == sum(
                energies[doc][w][0] for w in range(r["win_start"], r["win_end"] + 1)
            )
    # every active window is covered by some segment
    for doc, ws in energies.items():
        covered = {
            w for r in segs.get(doc, []) for w in range(r["win_start"], r["win_end"] + 1)
        }
        assert {w for w in ws if active(doc, w)} == covered, doc


def test_variant_extraction_is_typed_and_total(spark, sf_dir):
    """VARIANT round trip: every extracted field matches the source
    column exactly (no nulls introduced — try_variant_get degrades to
    NULL on type mismatch, so totality proves the paths and types are
    right), and a wrong-typed probe DOES yield NULL."""
    from etl_ch_destination_spark.catalog import load_table

    got = {r["event_id"]: r for r in _q("json_variant_type", spark, sf_dir).collect()}
    src = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        (F.col("value").cast("decimal(12,2)") * 100).cast("bigint").alias("cents"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    for r in src.collect():
        g = got[r["event_id"]]
        assert (g["uid"], g["etype"], g["cents"], g["day"]) == (
            r["user_id"], r["event_type"], r["cents"], r["day"]
        )
    probe = spark.range(1).select(
        F.try_variant_get(
            F.parse_json(F.lit('{"a": "not-a-number"}')), "$.a", "bigint"
        ).alias("x")
    )
    assert probe.collect()[0]["x"] is None


def test_group_array_intersect_matches_set_replay(spark, sf_dir):
    """The relational decomposition must equal the literal python set
    intersection of per-day type sets for every user."""
    from collections import defaultdict

    from etl_ch_destination_spark.catalog import load_table

    per_user_day = defaultdict(lambda: defaultdict(set))
    for r in (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_format("ts", "yyyy-MM-dd").alias("day"),
                "event_type")
        .collect()
    ):
        per_user_day[r["user_id"]][r["day"]].add(r["event_type"])
    rows = {r["user_id"]: r for r in
            _q("agg_group_array_intersect", spark, sf_dir).collect()}
    assert set(rows) == set(per_user_day)
    for uid, days in per_user_day.items():
        common = set.intersection(*days.values())
        r = rows[uid]
        assert r["n_days"] == len(days)
        assert r["n_common"] == len(common)
        assert r["common_csv"] == ",".join(sorted(common))


def test_dict_get_composite_is_joinless_and_matches_join_replay(spark, sf_dir):
    """The composite-key dictGet must plan WITHOUT any join operator
    (literal-map codegen — the CH execution model) and equal the
    relational LEFT-JOIN replay; misses take the default."""
    import io
    from contextlib import redirect_stdout

    from etl_ch_destination_spark.catalog import load_table

    df = _q("dict_get_composite", spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("extended")
    phys = buf.getvalue().split("== Physical Plan ==")[-1]
    assert "Join" not in phys, phys
    nat = {
        (r["n_nationkey"], r["r_name"]): f'{r["n_name"]}/{r["r_name"]}'
        for r in load_table(spark, sf_dir, "nation")
        .join(
            load_table(spark, sf_dir, "region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "r_name", "n_name")
        .collect()
    }
    rows = df.collect()
    assert rows
    hits = 0
    for r in rows:
        region = "AMERICA" if r["seg"] in ("BUILDING", "MACHINERY") else "ASIA"
        want = nat.get((r["k_nation"], region))
        if want is None:
            assert (r["label"], r["dict_has"]) == ("UNKNOWN", False)
        else:
            assert (r["label"], r["dict_has"]) == (want, True)
            hits += 1
    assert 0 < hits < len(rows)  # both paths exercised


def test_arr_topk_partial_matches_heapq_replay(spark, sf_dir):
    """Per-order top-3 must equal heapq.nlargest over the raw line
    quantities, independent of collect order."""
    import heapq
    from collections import defaultdict

    from etl_ch_destination_spark.catalog import load_table

    per = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", F.col("l_quantity").cast("bigint").alias("q"))
        .collect()
    ):
        per[r["l_orderkey"]].append(r["q"])
    rows = {r["l_orderkey"]: r for r in
            _q("arr_topk_partial", spark, sf_dir).collect()}
    assert set(rows) == set(per)
    for k, qs in per.items():
        top = heapq.nlargest(3, qs)
        r = rows[k]
        assert r["n_items"] == len(qs)
        assert r["top3_csv"] == ",".join(map(str, top))
        assert r["top3_sum"] == sum(top)


def test_stopword_strip_matches_python_filter(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries.llm_text import STRIP_STOPWORDS

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text").collect()
    }
    for r in _q("llm_stopword_strip", spark, sf_dir).collect():
        words = docs[r["doc_id"]].split(" ")
        kept = [w for w in words if w not in STRIP_STOPWORDS]
        assert r["n_words"] == len(words)
        assert r["n_removed"] == len(words) - len(kept)
        assert r["stripped_text"] == " ".join(kept)


def test_linkpred_scores_match_networkless_replay(spark, sf_dir):
    """Jaccard link-prediction must equal a python replay of the exact
    documented semantics (capped-center common neighbors, full-degree
    denominator, non-edges only) on the fixture graph."""
    from collections import defaultdict

    from etl_ch_destination_spark.queries.graph import (
        LP_CENTER_CAP,
        LP_MIN_CN,
        _copurchase_edges,
        graph_jaccard_linkpred,
    )

    edges = {(r["u"], r["v"]) for r in
             _copurchase_edges(spark, sf_dir).collect()}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    cn = defaultdict(int)
    for center, leaves in adj.items():
        if len(leaves) > LP_CENTER_CAP:
            continue
        ls = sorted(leaves)
        for i, a in enumerate(ls):
            for b in ls[i + 1:]:
                cn[(a, b)] += 1
    expected = {}
    for (a, b), c in cn.items():
        if c >= LP_MIN_CN and (a, b) not in edges:
            expected[(a, b)] = (c, len(adj[a]), len(adj[b]))
    got = graph_jaccard_linkpred(spark, sf_dir).collect()
    assert got
    for r in got:
        c, da, db = expected[(r["a"], r["b"])]
        assert (r["common_n"], r["deg_a"], r["deg_b"]) == (c, da, db)
        assert abs(r["jaccard"] - c / (da + db - c)) < 1e-12
    # the report is the TOP of the expected set under the same order
    order = sorted(expected.items(), key=lambda kv: (-kv[1][0], kv[0]))
    want_top = [k for k, _ in order[: len(got)]]
    assert [(r["a"], r["b"]) for r in got] == sorted(
        want_top, key=lambda ab: (-expected[ab][0], ab)
    )


def test_order_cycle_time_matches_python_replay(spark, sf_dir):
    from collections import defaultdict

    from etl_ch_destination_spark.catalog import load_table

    ship = defaultdict(lambda: None)
    for r in (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey").agg(F.max("l_shipdate").alias("m")).collect()
    ):
        ship[r["l_orderkey"]] = r["m"]
    per_prio = defaultdict(list)
    for r in load_table(spark, sf_dir, "orders").collect():
        m = ship[r["o_orderkey"]]
        if m is not None:
            per_prio[r["o_orderpriority"]].append(
                (m.date() - r["o_orderdate"].date()).days
            )
    got = {r["o_orderpriority"]: r for r in
           _q("rpt_order_cycle_time", spark, sf_dir).collect()}
    assert set(got) == set(per_prio)
    for prio, days in per_prio.items():
        r = got[prio]
        assert r["n_orders"] == len(days)
        assert (r["min_days"], r["max_days"]) == (min(days), max(days))
        assert abs(r["avg_days"] - sum(days) / len(days)) < 1e-9


def test_fixed_width_roundtrip_trims_only_pad(spark, sf_dir):
    """Fixed-width round trip reproduces nation exactly; interior
    spaces in names survive (only TRAILING pad is trimmed)."""
    from etl_ch_destination_spark.catalog import load_table

    back = _q("scan_fixed_width", spark, sf_dir)
    src = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    # interior spaces survive the pad-trim (planted record, since the
    # fixture's synthetic nation names carry none)
    import os
    import tempfile

    p = os.path.join(tempfile.mkdtemp(), "fw")
    spark.createDataFrame(
        [("0007NEW ZEALAND AOTEAROA     0003",)], "value string"
    ).write.text(p)
    r = (
        spark.read.text(p)
        .select(
            F.substring("value", 1, 4).cast("int").alias("k"),
            F.rtrim(F.substring("value", 5, 25)).alias("name"),
            F.substring("value", 30, 4).cast("int").alias("rk"),
        )
        .collect()[0]
    )
    assert (r["k"], r["name"], r["rk"]) == (7, "NEW ZEALAND AOTEAROA", 3)


def test_clf_parse_quarantines_garbage_line(spark, sf_dir):
    """Exactly one is_bad row (the planted garbage line) with null
    fields; every good row's fields reassemble from source columns."""
    from etl_ch_destination_spark.catalog import load_table

    rows = _q("scan_clf_log_parse", spark, sf_dir).collect()
    bad = [r for r in rows if r["is_bad"]]
    assert len(bad) == 1
    assert bad[0]["host"] is None and bad[0]["status"] is None
    src = {
        r["event_id"]: r
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") >= 0).collect()
    }
    good = [r for r in rows if not r["is_bad"]]
    assert len(good) == len(src)
    for r in good[:200]:
        s = src[r["event_id"]]
        assert r["host"] == f"host-{s['user_id'] % 50}"
        assert r["method"] == s["event_type"][:4].upper()
        assert r["path"] == f"/p/{r['event_id'] % 1000}"
        assert r["status"] == 200 + (r["event_id"] % 3) * 100


def test_extract_all_groups_matches_re_replay(spark, sf_dir):
    import re

    from etl_ch_destination_spark.catalog import load_table

    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text").collect()
    }
    pat = re.compile(r"\b([a-z]{2,})(er|ing)\b")
    rows = _q("str_extract_all_groups", spark, sf_dir).collect()
    assert any(r["n_matches"] > 0 for r in rows)  # pattern bites
    for r in rows:
        ms = pat.findall(docs[r["doc_id"]])
        assert r["n_matches"] == len(ms)
        assert r["stems_csv"] == ",".join(m[0] for m in ms)
        assert r["suffixes_csv"] == ",".join(m[1] for m in ms)
