"""Invariant gates for the round-7 key batch (SURVEY §2.10/§2.3/§2.8/
§2.12 additions). Cross-engine value equality is the parity gate's job
(every key here carries a full DuckDB oracle); these tests pin the
SEMANTIC invariants the oracle can't express — monotonicity, caps,
probability ranges, tolerance bounds, mass conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_ch_destination_spark.registry import all_queries


def _q(key, spark, sf_dir):
    return all_queries()[key](spark, sf_dir)


def test_context_window_stats_monotone(spark, sf_dir):
    rows = {r["window_tokens"]: r for r in _q(
        "llm_context_window_stats", spark, sf_dir).collect()}
    assert sorted(rows) == [128, 512, 2048, 8192]
    totals = {r["tokens_total"] for r in rows.values()}
    assert len(totals) == 1  # same corpus under every window
    prev_fit, prev_kept = -1, -1
    for w in sorted(rows):
        r = rows[w]
        assert r["n_docs_fit"] >= prev_fit
        assert r["tokens_kept"] >= prev_kept
        assert r["tokens_kept"] <= r["tokens_total"]
        assert 0.0 < r["frac_kept"] <= 1.0
        prev_fit, prev_kept = r["n_docs_fit"], r["tokens_kept"]
    assert rows[8192]["n_docs_fit"] <= rows[8192]["n_docs"]


def test_source_cap_bounds_and_determinism(spark, sf_dir):
    from etl_ch_destination_spark.queries.llm_training import SOURCE_CAP

    df = _q("llm_source_cap", spark, sf_dir)
    per = df.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.max("cap_rank").alias("mx")
    )
    bad = per.filter(
        (F.col("n") > SOURCE_CAP) | (F.col("mx") > SOURCE_CAP)
    ).count()
    assert bad == 0
    # deterministic: two runs agree row-for-row
    a = {(r["source"], r["doc_id"], r["cap_rank"]) for r in df.collect()}
    b = {
        (r["source"], r["doc_id"], r["cap_rank"])
        for r in _q("llm_source_cap", spark, sf_dir).collect()
    }
    assert a == b


def test_tokenizer_fertility_at_least_one(spark, sf_dir):
    rows = _q("llm_tokenizer_fertility", spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every nonempty whitespace word emits >= 1 BPE-ish token
        assert r["n_bpe_ish"] >= r["n_words"] > 0
        assert r["fertility"] >= 1.0


def test_kneser_ney_probabilities_valid(spark, sf_dir):
    from etl_ch_destination_spark.queries.llm_training import KN_TOP

    rows = _q("llm_bigram_kneser_ney", spark, sf_dir).collect()
    assert 0 < len(rows) <= KN_TOP
    counts = [r["c"] for r in rows]
    assert counts == sorted(counts, reverse=True)  # total order kept
    for r in rows:
        assert 0.0 < r["p_kn"] <= 1.0, r


def test_char_ngram_entropy_bounds(spark, sf_dir):
    df = _q("llm_char_ngram_entropy", spark, sf_dir)
    bad = df.filter(
        (F.col("entropy_bits") < 0)
        | (F.col("n_distinct") > F.col("n_grams"))
        | ((F.col("n_distinct") == 1) & (F.col("entropy_bits") != 0.0))
    ).count()
    assert bad == 0
    # dyadic entropy is bounded by log2(n_grams) + 1 bits
    over = df.filter(
        F.col("entropy_bits")
        > (F.log2(F.col("n_grams").cast("double")) + F.lit(1.0))
    ).count()
    assert over == 0


def test_span_corruption_plan_consistent(spark, sf_dir):
    from etl_ch_destination_spark.queries.llm_training import (
        MASK_PCT,
        SPAN_LEN,
    )

    df = _q("llm_span_corruption_mask", spark, sf_dir)
    bad = df.filter(
        (F.col("masked_tokens") > F.col("n_tok"))
        | (F.col("n_spans") < 1)
        | (
            F.col("masked_tokens")
            != F.col("n_spans")
            * F.least(F.lit(SPAN_LEN).cast("bigint"), F.col("block_len"))
        )
        | (F.col("mask_ratio") > MASK_PCT / 100.0 + 1e-9)
    ).count()
    assert bad == 0


def test_asof_tolerance_nulls_stale_matches(spark, sf_dir):
    from etl_ch_destination_spark.queries.joins_extra import ASOF_TOLERANCE_S

    tol = _q("join_asof_tolerance", spark, sf_dir)
    # every surviving match is within tolerance
    viol = tol.filter(
        F.col("asof_ts").isNotNull()
        & (
            F.unix_timestamp("ts") - F.unix_timestamp("asof_ts")
            > ASOF_TOLERANCE_S
        )
    ).count()
    assert viol == 0
    # exactly the within-tolerance subset of the untolerated ASOF key
    base = _q("join_asof", spark, sf_dir)
    base_within = base.filter(
        F.col("asof_ts").isNotNull()
        & (
            F.unix_timestamp("ts") - F.unix_timestamp("asof_ts")
            <= ASOF_TOLERANCE_S
        )
    ).count()
    assert tol.filter(F.col("asof_ts").isNotNull()).count() == base_within
    assert tol.count() == base.count()  # left join keeps every view


def test_rolling_corr_range_and_window(spark, sf_dir):
    from etl_ch_destination_spark.queries.timeseries_extra import (
        ROLL_CORR_ROWS,
    )

    df = _q("ts_rolling_corr", spark, sf_dir)
    bad = df.filter(
        (F.col("n_window") > ROLL_CORR_ROWS)
        | (F.col("n_window") < 1)
        | (F.abs(F.col("corr_qty_price")) > 1.0 + 1e-12)
    ).count()
    assert bad == 0


def test_dedup_cluster_sizes_mass_conserved(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table

    df = _q("rpt_dedup_cluster_sizes", spark, sf_dir)
    agg = df.agg(
        F.sum("n_docs").alias("docs"), F.sum("frac_docs").alias("frac")
    ).collect()[0]
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert agg["docs"] == n_docs
    assert abs(agg["frac"] - 1.0) < 1e-9
