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
