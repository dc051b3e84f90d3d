"""Property-based invariants (SURVEY §5.3 layer 4, hypothesis-driven):
the custom operators must agree with brute-force Python references on
RANDOM inputs — nulls, ties, empty groups, skew — not just on the
well-behaved fixture tables.

Example counts are small (each example runs Spark jobs) but every run
explores fresh shapes; failures shrink to minimal counterexamples.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.integers(min_value=0, max_value=3)
vers = st.integers(min_value=0, max_value=50)


@given(rows=st.lists(st.tuples(keys, vers), min_size=1, max_size=25))
@settings(**SETTINGS)
def test_latest_by_key_picks_true_maximum(spark, rows):
    from etl_ch_destination_spark.ops.dedup import latest_by_key

    data = [(k, v, i) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, v int, id int")
    got = {
        r["k"]: (r["v"], r["id"])
        for r in latest_by_key(df, ["k"], [F.desc("v"), F.desc("id")]).collect()
    }
    expected = {}
    for k, v, i in data:
        if k not in expected or (v, i) > expected[k]:
            expected[k] = (v, i)
    assert got == expected


@given(
    lefts=st.lists(st.tuples(keys, vers), min_size=1, max_size=20),
    rights=st.lists(st.tuples(keys, vers, st.integers(0, 99)), min_size=0, max_size=20),
)
@settings(**SETTINGS)
def test_asof_join_matches_python_reference(spark, lefts, rights):
    from etl_ch_destination_spark.ops.asof import asof_join

    ldata = [(k, t, i) for i, (k, t) in enumerate(lefts)]
    # right must be unique per (key, ts) — asof_join's documented contract
    rmap = {}
    for k, t, val in rights:
        rmap[(k, t)] = val
    rdata = [(k, t, v) for (k, t), v in rmap.items()]

    ldf = spark.createDataFrame(ldata, "k int, ts int, lid int")
    rdf = (
        spark.createDataFrame(rdata, "k int, ts int, val int")
        if rdata
        else spark.createDataFrame([], "k int, ts int, val int")
    )
    got = {
        r["lid"]: (r["asof_ts"], r["asof_val"])
        for r in asof_join(
            ldf, rdf, keys=["k"], ts="ts", right_cols=["val"], prefix="asof_", how="left"
        ).collect()
    }
    for k, t, lid in ldata:
        cand = [(rt, v) for (rk, rt), v in rmap.items() if rk == k and rt <= t]
        want = max(cand) if cand else (None, None)
        assert got[lid] == want, (lid, got[lid], want)


@given(
    rows=st.lists(
        st.tuples(st.one_of(st.none(), st.integers(-5, 5))), min_size=1, max_size=30
    )
)
@settings(**SETTINGS)
def test_global_rank_handles_nulls_and_ties(spark, rows):
    from etl_ch_destination_spark.ops.rank import with_global_rank

    data = [(float(v[0]) if v[0] is not None else None, i) for i, v in enumerate(rows)]
    df = spark.createDataFrame(data, "lead double, id int")
    order = [F.desc_nulls_last("lead"), F.asc("id")]
    got = {
        r["id"]: r["pos"]
        for r in with_global_rank(df, order, lead="lead", descending=True, buckets=4).collect()
    }
    ordered = sorted(
        data, key=lambda t: ((0, -t[0]) if t[0] is not None else (1, 0), t[1])
    )
    for pos, (_, i) in enumerate(ordered, start=1):
        assert got[i] == pos, (i, got[i], pos, ordered)


@given(
    facts=st.lists(st.tuples(keys, st.integers(0, 999)), min_size=0, max_size=30),
    dims=st.lists(keys, min_size=0, max_size=4, unique=True),
)
@settings(**SETTINGS)
def test_salted_join_equals_plain_join_on_random_skew(spark, facts, dims):
    from etl_ch_destination_spark.ops.salting import salted_join

    fdata = [(k, p) for k, p in facts]
    ddata = [(k, f"dim{k}") for k in dims]
    fdf = (
        spark.createDataFrame(fdata, "fk int, payload int")
        if fdata
        else spark.createDataFrame([], "fk int, payload int")
    )
    ddf = (
        spark.createDataFrame(ddata, "dk int, name string")
        if ddata
        else spark.createDataFrame([], "dk int, name string")
    )
    salted = salted_join(fdf, ddf, "fk", "dk", salt_cols=["payload"], n_salts=3)
    plain = fdf.join(ddf, fdf.fk == ddf.dk)
    cols = ["fk", "payload", "name"]
    gs = sorted(tuple(str(v) for v in r) for r in salted.select(*cols).collect())
    gp = sorted(tuple(str(v) for v in r) for r in plain.select(*cols).collect())
    assert gs == gp


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), min_size=0, max_size=30
    )
)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """The iterative large-star/small-star CC must label every node
    with its component MINIMUM — exactly what a sequential union-find
    computes — on random multigraphs: self-loops, parallel edges,
    both orientations, chains, isolated cliques."""
    from etl_ch_destination_spark.ops.components import connected_components

    df = (
        spark.createDataFrame(edges, "src int, dst int")
        if edges
        else spark.createDataFrame([], "src int, dst int")
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, exact_convergence=True).collect()
    }

    # brute-force union-find over the non-self-loop edge set
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = {n for a, b in edges if a != b for n in (a, b)}
    for n in nodes:
        parent[n] = n
    for a, b in edges:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
    expected = {}
    comp_min: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    for n in nodes:
        expected[n] = comp_min[find(n)]

    assert got == expected, (sorted(got.items()), sorted(expected.items()))


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 1),                       # user
            st.integers(0, 60),                      # minutes offset
            st.sampled_from(["view", "click", "purchase", "other"]),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_funnel_levels_match_brute_force_on_random_sequences(spark, events):
    """windowFunnel on adversarial random sequences: duplicate
    timestamps (strict-progress rule), deadline-exact events
    (inclusive window edge), interleaved users, steps out of order.
    Must equal the greedy per-anchor reference used on the fixture."""
    from datetime import datetime, timedelta

    from etl_ch_destination_spark.ops.funnel import funnel_levels
    from tests.test_behavior import STEPS, _brute_funnel_level

    base = datetime(2024, 1, 1)
    data = [(u, base + timedelta(minutes=m), ty) for u, m, ty in events]
    df = spark.createDataFrame(data, "user_id int, ts timestamp, event_type string")
    lv = funnel_levels(
        df,
        steps=[F.col("event_type") == s for s in STEPS],
        window_expr="INTERVAL 30 MINUTES",
    )
    got = {r["user_id"]: r["funnel_level"] for r in lv.collect()}
    per_user: dict[int, list] = {}
    for u, t, ty in data:
        per_user.setdefault(u, []).append((t, ty))
    expected = {
        u: _brute_funnel_level(rows, timedelta(minutes=30))
        for u, rows in per_user.items()
    }
    assert got == expected


words_alpha = st.lists(
    st.sampled_from(["a", "b", "bb", "c", "longword", "x1"]),
    min_size=1,
    max_size=30,
)


@given(docs=st.lists(words_alpha, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_repetition_stats_match_counter_reference(spark, docs):
    """The zero-shuffle sorted-run fold (top-word count) and the
    array-side distinct/bigram stats must agree with collections.Counter
    brute force on random word soups — heavy repeats, ties, singleton
    docs."""
    from collections import Counter

    from etl_ch_destination_spark.queries.llm_text import llm_repetition_filter

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        sf = os.path.join(tmp, "sf")
        os.makedirs(sf)
        rows = [
            (i, " ".join(ws), len(" ".join(ws)), "en", "src")
            for i, ws in enumerate(docs)
        ]
        spark.createDataFrame(
            rows, "doc_id long, text string, n_chars int, lang string, source string"
        ).write.parquet(f"{sf}/documents.parquet")
        got = {r.doc_id: r for r in llm_repetition_filter(spark, sf).collect()}

    for i, ws in enumerate(docs):
        c = Counter(ws)
        n, distinct, top = len(ws), len(c), max(c.values())
        bigs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        r = got[i]
        assert r.n_words == n
        assert abs(r.dup_word_frac - (1 - distinct / n)) < 1e-12
        assert abs(r.top_word_frac - top / n) < 1e-12
        if bigs:
            want_bg = 1 - len(set(bigs)) / len(bigs)
        else:
            want_bg = 0.0
        assert abs(r.dup_bigram_frac - want_bg) < 1e-12


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=0,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_triangle_counts_match_python_reference(spark, edges):
    """Degree-ordered triangle enumeration equals brute-force triple
    iteration on random small graphs (self-loops dropped, duplicate
    edges collapsed — the canonicalization the operator defines)."""
    from itertools import combinations

    from etl_ch_destination_spark.queries.graph import triangle_counts

    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for u, v in canon:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expected: dict[int, int] = {}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1

    if not canon:
        return  # empty edge frame: nothing to build a DataFrame from
    df = spark.createDataFrame(sorted(canon), "u long, v long")
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }
    assert got == expected


@given(
    ivals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 60), st.integers(1, 15)),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_merge_intervals_sweep_matches_python(spark, ivals):
    """The running-max-end island sweep (win_merge_intervals' core)
    produces exactly the union spans a sequential Python merge does,
    on random per-key interval sets with duplicates and containment."""
    from pyspark.sql.window import Window as W

    data = [
        (k, s, s + ln, i) for i, (k, s, ln) in enumerate(ivals)
    ]  # [start, end), unique id as tiebreak
    df = spark.createDataFrame(data, "k int, s int, e int, id int")
    w_prev = (
        W.partitionBy("k").orderBy("s", "id").rowsBetween(W.unboundedPreceding, -1)
    )
    run_max = F.max("e").over(w_prev)
    marked = df.select(
        "k",
        "s",
        "e",
        "id",
        F.when(run_max.isNull() | (F.col("s") > run_max), 1).otherwise(0).alias(
            "nw"
        ),
    )
    w_run = (
        W.partitionBy("k").orderBy("s", "id").rowsBetween(W.unboundedPreceding, 0)
    )
    got = {
        (r["k"], r["ss"], r["ee"])
        for r in marked.select(
            "k", "s", "e", F.sum("nw").over(w_run).alias("island")
        )
        .groupBy("k", "island")
        .agg(F.min("s").alias("ss"), F.max("e").alias("ee"))
        .collect()
    }

    expected = set()
    by_k: dict[int, list] = {}
    for k, s, e, _ in data:
        by_k.setdefault(k, []).append((s, e))
    for k, spans in by_k.items():
        spans.sort()
        cs, ce = spans[0]
        for s, e in spans[1:]:
            if s > ce:
                expected.add((k, cs, ce))
                cs, ce = s, e
            else:
                ce = max(ce, e)
        expected.add((k, cs, ce))
    assert got == expected


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_skyline_sweep_matches_brute_force(spark, pts):
    """The one-window skyline sweep equals brute-force dominance
    filtering on random 2-D points (minimize x, maximize y; duplicate
    points collapse to the lowest id)."""
    from pyspark.sql.window import Window as W

    data = [(x, y, i) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(data, "x int, y int, id int")
    w = W.orderBy("x", F.desc("y"), "id").rowsBetween(W.unboundedPreceding, -1)
    swept = df.select("x", "y", "id", F.max("y").over(w).alias("best"))
    got = {
        r["id"]
        for r in swept.filter(
            F.col("best").isNull() | (F.col("y") > F.col("best"))
        ).collect()
    }

    def dominated(x, y, i):
        for xb, yb, ib in data:
            if (xb, yb) == (x, y):
                if ib < i:
                    return True
                continue
            if xb <= x and yb >= y:
                return True
        return False

    expected = {i for x, y, i in data if not dominated(x, y, i)}
    assert got == expected


@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_pagerank_integer_recurrence_matches_reference(spark, edges):
    """On random small graphs the distributed fixed-point PageRank must
    equal a sequential python implementation of the SAME integer
    recurrence — any order-dependence in the distributed form would
    diverge under hypothesis's shapes (stars, paths, multi-component
    graphs, near-cliques)."""
    from etl_ch_destination_spark.queries.graph import (
        PR_ITERS,
        PR_SCALE,
        pagerank_ranks,
    )

    canon = sorted({(min(u, v), max(u, v)) for u, v in edges})
    adj: dict[int, list[int]] = {}
    for u, v in canon:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    deg = {k: len(vs) for k, vs in adj.items()}
    rank = {k: PR_SCALE for k in adj}
    for _ in range(PR_ITERS):
        rank = {
            k: 150000 + 85 * sum(rank[j] // deg[j] for j in adj[k]) // 100
            for k in adj
        }
    e = spark.createDataFrame(canon, "u long, v long")
    got = {r["node"]: r["rank_ppm"] for r in pagerank_ranks(e).collect()}
    assert got == rank


@given(
    xs=st.lists(st.integers(min_value=0, max_value=10_000),
                min_size=1, max_size=40)
)
@settings(**SETTINGS)
def test_wma_two_cumsum_identity_on_random_series(spark, xs):
    """win_weighted_moving_avg's ACTUAL window expressions (via the
    factored wma_over core) must equal the naive per-row weighted scan
    on arbitrary integer series (ramp-in prefixes, ties, zeros,
    constant runs) — the hypothesis series flows through a real
    DataFrame so a regression in the Spark plan fails here, not only
    at fixture scale (ADVICE r9)."""
    from etl_ch_destination_spark.queries.windows_extra import (
        WMA_K,
        wma_over,
    )

    rows = [(1, i, x, i) for i, x in enumerate(xs, start=1)]
    v = spark.createDataFrame(
        rows, "user_id long, event_id long, cents long, rn long"
    )
    got = {
        r["event_id"]: (r["m"], r["wma_num"])
        for r in wma_over(v).collect()
    }
    for t in range(1, len(xs) + 1):
        m = min(t, WMA_K)
        naive = sum((j + 1) * x for j, x in enumerate(xs[t - m : t]))
        assert got[t] == (m, naive)


@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_bfs_matches_sequential_reference_on_random_graphs(spark, edges):
    """On random small graphs the convergence-terminated relational BFS
    must reach the FULL fixpoint of a sequential python BFS from the
    same seed rule (node % 97 == 0 → seed 0 here) — no truncation:
    node ids ≤ 12 bound the diameter well under BFS_MAX_ROUNDS, so the
    loop must stop at convergence, before the cap (VERDICT r10 #6).
    Hypothesis shapes cover disconnected components, cycles, and hub
    fans. Graphs without node 0 have no seed and must return an EMPTY
    frame (never an invented distance)."""
    from collections import deque

    from etl_ch_destination_spark.queries.graph import (
        BFS_MAX_ROUNDS,
        bfs_distances_with_rounds,
    )

    canon = sorted({(min(u, v), max(u, v)) for u, v in edges})
    adj: dict[int, list[int]] = {}
    for u, v in canon:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    expected: dict[int, int] = {}
    if 0 in adj:
        expected[0] = 0
        q = deque([0])
        while q:
            n = q.popleft()
            for m in adj[n]:
                if m not in expected:
                    expected[m] = expected[n] + 1
                    q.append(m)
    e = spark.createDataFrame(canon, "u long, v long")
    # generous cap: node ids ≤ 12 bound eccentricity at 12, so the loop
    # must STOP ITSELF (converged) well before 64 — budget exhaustion
    # would be a convergence-detection bug, not a deep graph
    dist, rounds = bfs_distances_with_rounds(e, max_rounds=64)
    got = {r["node"]: r["dist"] for r in dist.collect()}
    assert got == expected
    assert rounds < 64  # converged, not budget-exhausted
    assert rounds <= BFS_MAX_ROUNDS + 2  # and promptly: ecc+1 ≤ 14


# --- Avro container fuzz (round 13): the hand-rolled byte format must
# round-trip ARBITRARY values — unicode, emoji, huge
# longs, negative decimals, microsecond-edge timestamps, None in every
# nullable slot — under both codecs. Pure python (no Spark job per
# example), so examples are cheap and the count can be high.

import datetime as _dt
import decimal as _decimal

_avro_longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_avro_strings = st.text(max_size=40)
_avro_decimals = st.decimals(
    min_value=-(10**10), max_value=10**10, places=2, allow_nan=False,
    allow_infinity=False,
)
_avro_ts = st.datetimes(
    min_value=_dt.datetime(1, 1, 1),
    max_value=_dt.datetime(9999, 12, 31, 23, 59, 59),
).map(lambda d: d.replace(microsecond=(d.second * 7919) % 1000000))


@given(
    rows=st.lists(
        st.tuples(
            _avro_longs,
            st.one_of(st.none(), _avro_strings),
            _avro_decimals,
            _avro_ts,
        ),
        min_size=0,
        max_size=30,
    ),
    codec=st.sampled_from(["null", "deflate"]),
    per_block=st.integers(min_value=1, max_value=7),
)
@settings(max_examples=150, deadline=None)
def test_avro_container_roundtrip_fuzz(rows, codec, per_block):
    from pyspark.sql.types import (
        DecimalType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from etl_ch_destination_spark.sink.avro import (
        avro_schema,
        decode_container,
        encode_container,
    )

    schema = avro_schema(
        StructType(
            [
                StructField("k", LongType(), False),
                StructField("s", StringType(), True),
                StructField("d", DecimalType(14, 2), False),
                StructField("t", TimestampType(), False),
            ]
        )
    )
    payload = encode_container(
        schema, rows, codec=codec, objects_per_block=per_block
    )
    back = decode_container(payload, schema)
    assert back == [tuple(r) for r in rows]


@given(
    vals=st.lists(st.tuples(_avro_longs, st.one_of(st.none(), _avro_strings)),
                  min_size=0, max_size=20),
)
@settings(max_examples=80, deadline=None)
def test_avro_resolution_fuzz_promotion_and_default(vals):
    """Resolution fuzz: writer (int-ish long, nullable string) read
    under a reader that promotes, drops, reorders, and defaults."""
    from etl_ch_destination_spark.sink.avro import (
        decode_container,
        decode_container_resolved,
        encode_container,
    )

    writer = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
        ],
    }
    reader = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "s", "type": ["null", "string"]},  # reordered
            {"name": "a", "type": "double"},            # promoted
            {"name": "extra", "type": "long", "default": -1},
        ],
    }
    payload = encode_container(writer, vals, codec="deflate",
                               objects_per_block=3)
    # unresolved decode is the identity…
    assert decode_container(payload, writer) == [tuple(v) for v in vals]
    # …and the resolved decode applies the rules row-for-row
    got = decode_container_resolved(payload, reader, writer)
    assert got == [(s, float(a), -1) for a, s in vals]
