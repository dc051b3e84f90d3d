"""Round-12 key gates: running-peak drawdown."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_win_drawdown_invariants_and_replay(spark, sf_dir):
    """drawdown_bp ∈ [0, 10000), 0 exactly on peak days, peak is the
    running max of the nation's daily series (replayed sequentially on
    the collected frame), and the grain is nation × order-date."""
    from etl_ch_destination_spark.queries.windows_extra import win_drawdown

    rows = win_drawdown(spark, sf_dir).collect()
    assert rows
    by_nation: dict[str, list] = {}
    for r in rows:
        assert 0 <= r["drawdown_bp"] < 10_000
        assert r["peak_cents"] >= r["rev_cents"] > 0
        if r["rev_cents"] == r["peak_cents"]:
            assert r["drawdown_bp"] == 0
        by_nation.setdefault(r["nation"], []).append(r)
    # sequential replay per nation
    for series in by_nation.values():
        series.sort(key=lambda r: r["day"])
        peak = 0
        for r in series:
            peak = max(peak, r["rev_cents"])
            assert r["peak_cents"] == peak
            assert r["drawdown_bp"] == (peak - r["rev_cents"]) * 10_000 // peak
    # grain: one row per (nation, day)
    keys = [(r["nation"], r["day"]) for r in rows]
    assert len(keys) == len(set(keys))


def test_ts_sma_crossover_sign_replay(spark, sf_dir):
    """Replay the crossover definition sequentially per nation on the
    collected daily series: only sign CHANGES between consecutive
    full-window rows emit, labeled by direction, and the emitted
    rolling sums equal the replayed ones."""
    from etl_ch_destination_spark.queries.timeseries_extra import (
        SMA_LONG,
        SMA_SHORT,
        ts_sma_crossover,
    )

    got = {
        (r["nation"], r["day"]): (
            r["s_short_cents"], r["s_long_cents"], r["signal"]
        )
        for r in ts_sma_crossover(spark, sf_dir).collect()
    }
    o = load_table_daily(spark, sf_dir)
    expect = {}
    for nation, series in o.items():
        series.sort(key=lambda t: t[0])
        revs = [v for _, v in series]
        prev_sgn = None
        for i in range(len(revs)):
            if i + 1 < SMA_LONG:
                continue
            s_s = sum(revs[max(0, i - SMA_SHORT + 1): i + 1])
            s_l = sum(revs[i - SMA_LONG + 1: i + 1])
            diff = s_s * SMA_LONG - s_l * SMA_SHORT
            sgn = 1 if diff > 0 else (-1 if diff < 0 else 0)
            if prev_sgn is not None and sgn != prev_sgn:
                expect[(nation, series[i][0])] = (
                    s_s, s_l, "golden" if sgn > prev_sgn else "death"
                )
            prev_sgn = sgn
    assert got == expect
    assert got  # the fixture produces real crossovers


def load_table_daily(spark, sf_dir):
    """nation -> [(day, rev_cents)] — the shared daily aggregate both
    round-12 keys window over, re-derived independently for replay."""
    from etl_ch_destination_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rows = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.col("o_orderdate").alias("day"))
        .agg(F.sum("cents").cast("bigint").alias("rev"))
        .collect()
    )
    out: dict[str, list] = {}
    for r in rows:
        out.setdefault(r["nation"], []).append((r["day"], r["rev"]))
    return out


def test_bloom_prefilter_exact_and_in_plan(spark, sf_dir):
    """The bloom pre-filter must be pure optimization: output equals
    the exact set replay (normalized-text-hash matches of odd doc_ids
    against even doc_ids), AND the k-position membership machinery
    must actually be in the plan (xxhash64 positions + a broadcast of
    the set-bit table) — otherwise the key silently degraded to a
    plain join."""
    from etl_ch_destination_spark.queries.llm_dedup_extra import (
        llm_dedup_bloom_prefilter,
    )

    df = llm_dedup_bloom_prefilter(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    got = {(r["doc_id"], r["text_hash"]) for r in df.collect()}
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    " ", F.slice(F.split(F.lower(F.trim("text")), " "), 1, 8)
                )
            ).alias("th"),
        )
        .collect()
    )
    idx = {r["th"] for r in docs if r["doc_id"] % 2 == 0}
    expect = {(r["doc_id"], r["th"]) for r in docs
              if r["doc_id"] % 2 == 1 and r["th"] in idx}
    assert got == expect
    assert got  # the fixture has real cross-half duplicates


def test_scan_virtual_columns_provenance(spark, sf_dir):
    """_metadata-derived provenance: one row for the fixture's single
    file, row_index distinct-count equals the row count (no
    double-read split), and the doc_id range matches a direct scan."""
    from etl_ch_destination_spark.queries.sources_sinks import (
        scan_virtual_columns,
    )

    rows = scan_virtual_columns(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["file_name"] == "documents.parquet"
    assert r["n_rows"] == r["n_row_index_distinct"]
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
    ).collect()[0]
    assert (r["n_rows"], r["min_doc_id"], r["max_doc_id"]) == (
        d["n"], d["lo"], d["hi"]
    )


def test_lttb_oracle_all_ties_and_exact_boundary(spark):
    """Adversarial gate for the round-12 LTTB hash-oracle promotion:
    on an ALL-CONSTANT series every triangle area is 0, so the
    selection is decided purely by the earliest-index tie-break — the
    recursive-CTE oracle must reproduce the Python/Spark chain
    exactly. Also pins the n = LTTB_POINTS + 1 boundary (smallest
    series that triggers bucketing) and an n <= LTTB_POINTS series
    (pass-through branch). Spark rows == DuckDB oracle rows on the
    synthetic fixture, bit-for-bit."""
    import datetime as dt
    import os
    import tempfile

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_ch_destination_spark.queries.timeseries_extra import (
        LTTB_POINTS,
        ts_downsample_lttb,
    )
    from etl_ch_destination_spark.registry import all_oracles

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # series A: 4x LTTB_POINTS rows, ALL values identical (tie-break only)
    for i in range(4 * LTTB_POINTS):
        rows.append((eid, t0 + dt.timedelta(seconds=i), 1, "click", 5.0))
        eid += 1
    # series B: boundary n = LTTB_POINTS + 1, sawtooth values
    for i in range(LTTB_POINTS + 1):
        rows.append(
            (eid, t0 + dt.timedelta(seconds=i), 2, "view",
             float(1 + (i * 7) % 13))
        )
        eid += 1
    # series C: n <= LTTB_POINTS (pass-through)
    for i in range(7):
        rows.append((eid, t0 + dt.timedelta(seconds=i), 3, "error",
                     float(i)))
        eid += 1

    tmp = tempfile.mkdtemp(prefix="lttb_adversarial")
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp, "events.parquet"))

    got = sorted(
        tuple(r) for r in ts_downsample_lttb(spark, tmp).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{os.path.join(tmp, 'events.parquet')}')"
    )
    want = sorted(con.execute(all_oracles()["ts_downsample_lttb"]).fetchall())
    con.close()
    assert got == want
    by_type = {}
    for r in got:
        by_type.setdefault(r[0], []).append(r)
    assert len(by_type["click"]) == LTTB_POINTS   # downsampled
    assert len(by_type["view"]) == LTTB_POINTS    # boundary bucketing
    assert len(by_type["error"]) == 7             # pass-through
    # all-ties: endpoints kept, interior = each bucket's FIRST index
    click_pos = sorted(p for _, p, _, _ in by_type["click"])
    assert click_pos[0] == 0 and click_pos[-1] == 4 * LTTB_POINTS - 1


def test_bloom_prefilter_exact_under_forced_false_positives(spark, sf_dir, monkeypatch):
    """The key's central claim is that Bloom false positives NEVER
    reach the output (the exact semi-join removes them). Force a
    saturated filter — an 8-bit space makes nearly every probe a
    Bloom candidate — and assert the output is still exactly the true
    match set."""
    import etl_ch_destination_spark.queries.llm_dedup_extra as mod

    monkeypatch.setattr(mod, "BLOOM_M", 8)
    monkeypatch.setattr(mod, "BLOOM_K", 2)
    got = {(r["doc_id"], r["text_hash"])
           for r in mod.llm_dedup_bloom_prefilter(spark, sf_dir).collect()}
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    " ", F.slice(F.split(F.lower(F.trim("text")), " "), 1, 8)
                )
            ).alias("th"),
        )
        .collect()
    )
    idx = {r["th"] for r in docs if r["doc_id"] % 2 == 0}
    expect = {(r["doc_id"], r["th"]) for r in docs
              if r["doc_id"] % 2 == 1 and r["th"] in idx}
    assert got == expect


def test_ivfpq_works_under_durable_staging(spark, sf_dir):
    """The round-12 ivfpq staging claim, exercised in DURABLE mode:
    with spark.etl_ch.staging.dir set, the staged corpus projection
    (which carries an ml VectorUDT column) must round-trip through the
    parquet staging table and still hold the key's recall gate.
    NOTE the modes are not expected to produce identical top-k: the
    parquet round-trip changes partitioning, and Spark ML KMeans
    random init is partitioning-dependent, so the (valid) coarse
    lists differ — recall vs exact is the mode-independent contract,
    same floor as the fixture gate."""
    import os
    import tempfile

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.ops.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )
    from etl_ch_destination_spark.ops.staging import STAGING_DIR_CONF

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    q = emb.filter(F.col("vec_id") < 8)

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    exact = topk_sets(brute_force_topk(emb, q, 5))
    root = tempfile.mkdtemp(prefix="ivfpq_durable")
    spark.conf.set(STAGING_DIR_CONF, os.path.join(root, "staging"))
    try:
        durable = topk_sets(ivfpq_topk(emb, q, 5))
        # the staging table actually materialized (durable mode ran)
        staged = os.listdir(os.path.join(root, "staging"))
        assert any(p.startswith("ivfpq-corpus") for p in staged), staged
    finally:
        spark.conf.unset(STAGING_DIR_CONF)
    assert sum(len(v) for v in durable.values()) == 40
    recall = sum(
        len(exact[k] & durable.get(k, set())) / len(exact[k]) for k in exact
    ) / len(exact)
    assert recall >= 0.8, recall
