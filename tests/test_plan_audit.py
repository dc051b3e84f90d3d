"""Fleet-wide plan audit: no registered query may plan a cartesian or
nested-loop join over unbounded inputs, and shuffle counts stay
bounded. This is the 100 TB regression guard — a key that starts
planning an accidental cross join fails here before it fails a
cluster."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

# Callables with side effects or driver-side jobs during construction
# (sinks write, streaming runs, rank collects bucket bounds, LSH fits)
# — audited by their own dedicated tests instead. VERDICT r9 #6: the
# mapping key → covering test is EXPLICIT (file, test-function name)
# and mechanically enforced by test_effectful_exemptions_have_dedicated
# _coverage below, so this list cannot silently grow an unaudited key.
EFFECTFUL = {
    "scan_csv_typed": (
        "test_sources_scan.py", "test_csv_typed_roundtrip_matches_source"),
    "scan_csv_badrows": (
        "test_sources_scan.py", "test_csv_badrows_quarantines_malformed_rows"),
    "scan_jsonl": (
        "test_sources_scan.py", "test_jsonl_roundtrip_preserves_microseconds"),
    "sink_parquet_partitioned": (
        "test_sinks.py", "test_partitioned_sink_reread_prunes_partitions"),
    "sink_sorted_by_key": (
        "test_sinks.py", "test_sorted_sink_files_are_sorted_within"),
    "sink_idempotent_batch": (
        "test_sinks.py", "test_idempotent_batch_replay_collapses"),
    "sink_clickhouse_jdbc": (
        "test_sinks.py", "test_jdbc_writer_is_configured"),
    "sink_bucketed_join": (
        "test_sinks.py", "test_bucketed_join_eliminates_shuffles"),
    "stream_foreachbatch_sink": (
        "test_streaming.py", "test_foreachbatch_sink_idempotent_across_restart"),
    # delegates the global sort to ops/rank.with_global_rank (bucketed,
    # never a single-task window) — covered at the op level
    "sort_multikey": (
        "test_ops.py", "test_global_rank_matches_naive_enumeration"),
    "llm_sim_topk_ann": ("test_llm.py", "test_ann_recall_vs_exact"),
    "llm_sim_topk_ivf": ("test_llm.py", "test_ivf_full_probe_equals_brute_force"),
    "llm_dedup_near": (
        "test_llm.py", "test_near_dedup_finds_planted_near_duplicates"),
    # iterative CC: jobs run during construction
    "llm_dedup_clusters": (
        "test_ops.py", "test_connected_components_vs_union_find"),
    # iterative PageRank: jobs run during construction
    "llm_textrank_words": (
        "test_round7_keys.py", "test_textrank_mass_and_order"),
    # end-to-end ETL: writes staged JSONL + sink
    "job_batch_etl": ("test_sinks.py", "test_batch_etl_job_rerun_is_idempotent"),
    # end-to-end curation: writes the split corpus
    "job_corpus_curate": (
        "test_llm_corpus.py", "test_corpus_curate_job_roundtrip"),
    # writes v1/v2 batches to scratch
    "scan_schema_evolution": (
        "test_sinks.py", "test_schema_evolution_merges_additive_column"),
    # writes the partitioned layout to scratch
    "scan_partition_pruned": (
        "test_relational_round4.py", "test_partition_pruning_reaches_the_scan"),
    # writes base + merged state to scratch
    "sink_merge_upsert": (
        "test_relational_round4.py", "test_merge_upsert_state_algebra"),
    # writes wire blocks to scratch
    "scan_rowbinary_import": (
        "test_rowbinary.py", "test_rowbinary_export_blocks_match_local_encoder"),
    # writes columnar wire blocks to scratch
    "scan_native_import": (
        "test_relational_round4.py", "test_native_import_round_trips_embeddings"),
    # writes Avro container files to scratch
    "scan_avro_import": (
        "test_round13_keys.py", "test_scan_avro_import_roundtrip_vs_source"),
    # writes v1-writer-schema Avro files to scratch
    "scan_avro_evolution": (
        "test_round13_keys.py", "test_scan_avro_evolution_resolves_v1_to_v2"),
    # runs a REAL streaming query + state-table appends during construction
    "stream_tdigest_state": (
        "test_round13_keys.py", "test_stream_tdigest_state_vs_batch"),
    # same streaming replay + epoch-partitioned state writes, then the
    # two-level compaction merge
    "stream_tdigest_compact": (
        "test_round14_keys.py",
        "test_stream_tdigest_compact_accuracy_and_bounds"),
    # runs a REAL streaming query committing to the transaction log
    "stream_table_log_sink": (
        "test_round14b_keys.py",
        "test_stream_table_log_sink_commits_exactly_once"),
    # runs a REAL streaming query maintaining versioned SCD2 state
    "stream_scd2_apply": (
        "test_round14b_keys.py",
        "test_scd2_apply_history_chains_are_sound"),
    # writes view-state versions to scratch
    "job_matview_refresh": (
        "test_relational_round4.py",
        "test_matview_refresh_equals_full_recompute_and_tracks_delta"),
    # stages blob fixture files to scratch
    "scan_binary_files": (
        "test_round7_keys.py", "test_binary_files_scan_round_trips_bytes"),
    # stages wrapped .txt fixture files to scratch
    "scan_text_lines": (
        "test_round8_keys.py", "test_scan_text_lines_reassembles_documents"),
    # stages the RFC-4180 tricky-CSV fixture
    "scan_csv_quoted": (
        "test_round8_keys.py", "test_csv_quoted_fields_roundtrip_exactly"),
    # writes the bloom-indexed layout
    "sink_parquet_bloom": (
        "test_round8_keys.py",
        "test_parquet_bloom_filter_is_written_and_probe_matches"),
    # writes the z-clustered layout
    "sink_zorder_layout": (
        "test_round8_keys.py", "test_zorder_files_have_disjoint_z_ranges"),
    # writes the gzip JSONL export
    "sink_jsonl_gzip": (
        "test_round8_keys.py", "test_jsonl_gzip_actually_compresses"),
    # iterative peeling: jobs run during construction
    "graph_kcore": ("test_round9_keys.py", "test_kcore_known_graph_cascade"),
    # delegates positions to ops/rank.with_global_rank (percentile
    # probe runs a job during construction, like sort_multikey)
    "join_paste_positional": (
        "test_round10_keys.py", "test_paste_join_matches_python_zip"),
    # stages the JSON-array file (bounded 25-row dim collect)
    "scan_json_multiline": (
        "test_round10_keys.py", "test_json_multiline_roundtrip_matches_source"),
    # writes the XML document to scratch
    "scan_xml_roundtrip": (
        "test_round10_keys.py",
        "test_xml_roundtrip_matches_source_and_is_schema_first"),
    # writes the ::-separated export to scratch
    "scan_csv_multichar_delim": (
        "test_round10_keys.py",
        "test_multichar_delim_roundtrip_and_embedded_commas"),
    # writes the fixed-width text export to scratch
    "scan_fixed_width": (
        "test_round10_keys.py", "test_fixed_width_roundtrip_trims_only_pad"),
    # writes the CLF log lines (incl. the planted bad line) to scratch
    "scan_clf_log_parse": (
        "test_round10_keys.py", "test_clf_parse_quarantines_garbage_line"),
    # iterative CC: star rounds + fingerprint probes run during
    # construction (same loop llm_dedup_clusters exempts)
    "graph_connected_components": (
        "test_round11_keys.py", "test_cc_key_matches_union_find"),
    # convergence-terminated BFS: per-round 1-row probes run during
    # construction (the CC counter device) — same exemption rationale
    "graph_bfs_distance": (
        "test_round10_keys.py", "test_bfs_known_path_graph_distances"),
}

# Bounded-by-construction nested-loop joins, each documented in its
# module docstring:
#   join_cross          — 25 × 5 dimension product
#   llm_sim_topk_exact  — broadcast query side × streamed candidates
#                         (the intended few-queries scan pattern)
#   rpt_idle_customers, rpt_nation_inventory_value — scalar threshold
#                         joined as a 1-row broadcast (condition-free
#                         by design)
# (llm_dedup_embedding left this list in round 3: it now plans a
# blocked composite-key EQUI-join — the audit holds it to the fleet
# no-NLJ rule like everything else.)
ALLOWED_NLJ = {
    "join_cross",
    # 25-row fixed site dimension broadcast onto customer points — the
    # canonical bounded small-dim geo join (queries/scalars_math.py
    # geo_haversine_join); the 25× expansion collapses map-side in the
    # partial min(struct) aggregate
    "geo_haversine_join",
    "llm_sim_topk_exact",
    # broadcast query side × streamed candidates with the label-mismatch
    # predicate fused (non-equi by definition) — the llm_sim_topk_exact
    # scan pattern (queries/llm_vectors.py llm_hard_negatives)
    "llm_hard_negatives",
    "rpt_idle_customers",
    "rpt_nation_inventory_value",
    # corpus-total N (1 row) broadcast onto the per-doc frame,
    # condition-free by design (queries/llm_corpus.py)
    "llm_unigram_logprob",
    # 1-row × 1-row reshape of the two group summaries into the final
    # statistic row (queries/aggregations_ch.py agg_welch_ttest /
    # agg_student_ttest — same shape, same bound)
    "agg_welch_ttest",
    "agg_student_ttest",
    # bigram-type total (1 row) broadcast onto the type table
    # (queries/llm_training.py)
    "llm_bigram_kneser_ney",
    # histogram total (1 row) broadcast onto the |distinct sizes| frame
    # (queries/reports_behavior.py)
    "rpt_dedup_cluster_sizes",
    # 1-row corpus-total broadcast onto the |sources| frame
    # (queries/llm_training.py)
    "llm_mixture_rebalance",
    # 1-row × 1-row reshape of the two group summaries into the final
    # statistic row — the welch/student shape (aggregations_ch.py)
    "agg_meanztest",
    "agg_proportions_ztest",
    # |groups| × 3-row quantile-spec literal dim (aggregations_ch.py)
    "agg_quantile_interp_exact",
    # |segments| × 2-row quantile-spec literal dim — the same
    # interp-exact reshape over converted-user latencies
    # (reports_behavior.py rpt_time_to_convert)
    "rpt_time_to_convert",
    # 1-row (lo, hi) hourly-bounds broadcast onto the bucket aggregate
    # and the 5-row group frame — condition-free spine construction
    # (timeseries_extra.py ts_holt_winters)
    "ts_holt_winters",
    # 8-subset × ≤7-mask-count literal-algebra cross (condition-free
    # by design, both sides single-digit rows) + the 3-row channel
    # reshape (reports_behavior.py rpt_attribution_shapley)
    "rpt_attribution_shapley",
    # 1-row observation-end broadcast onto the episode frame,
    # condition-free by design (reports_behavior.py rpt_kaplan_meier)
    "rpt_kaplan_meier",
    # 1-row (max_avg, min_avg) bounds broadcast onto suppliers —
    # condition-free by design (joins_extra.py)
    "subq_any_all",
    # three 1-row x 1-row (orphans x total) reshapes unioned into the
    # long-form audit report (reports_behavior.py)
    "rpt_fk_integrity",
    # 1-row basket-count total broadcast onto the |brand-pair| frame,
    # condition-free by design (reports_behavior.py)
    "rpt_basket_pairs",
    # 1-row corpus (N, total_tokens) broadcast onto the scored
    # postings frame (llm_corpus.py)
    "llm_bm25_score",
    # 1-row (n_keys, n_rows, max) stats broadcast onto the top-N heavy
    # keys, condition-free by design (reports_behavior.py)
    "rpt_join_skew_profile",
    # 1-row bigram grand total broadcast onto the |pairs| frame
    # (llm_corpus.py)
    "llm_pmi_collocations",
    # 1-row sampled-edge count × 1-row sampled-triangle total reshape
    # into the single estimate row — the welch/meanztest shape
    # (queries/graph.py graph_triangle_approx)
    "graph_triangle_approx",
    # broadcast n_clusters-row centroid dim × query side (the coarse
    # ranking needs every (query, centroid) distance — bounded by the
    # cluster count, the llm_sim_topk_exact scan pattern), plus the
    # 1-sided broadcast probe join (ops/similarity.py ivfpq_topk)
    "llm_sim_topk_ivfpq",
    # 1-row group-moments row × 1-row tie-sum row reshaped into the
    # single statistic row — the welch/meanztest shape
    # (aggregations_ch.py agg_kruskal_wallis)
    "agg_kruskal_wallis",
}

MAX_HASH_SHUFFLES = 4

# Per-key allowances above the fleet cap, each with its structural
# reason (count is the static pre-AQE plan):
#   agg_window_funnel — a 3-step exists-chain funnel irreducibly
#     shuffles each step's filtered events plus the distinct-users
#     frame, and the per-anchor→per-user reductions can't reuse a
#     broadcast join's (non-)partitioning. 5 at fixture scale; 6 gives
#     headroom for the stats flip to sort-merge joins.
#   rpt_dedup_audit — composes the ENTIRE llm_dedup_near pipeline
#     (band self-equi-join candidate generation, itself several
#     exchanges) and then adds the audit's own distinct-endpoints,
#     doc join, and per-source aggregate; the cap is meant to catch
#     accidental shuffles in a single operator, not to penalize an
#     honest composition of two bounded ones.
#   rpt_active_users — rolling-distinct engagement needs the
#     (user, day) dedupe, the DAU aggregate, the single 30-day
#     coverage aggregate pair (user-covered min-offset, then per-day),
#     and the day-spine join: five genuinely distinct keys; the static
#     plan shows the spine join exchange AQE replaces with a broadcast
#     at runtime.
#   rpt_brand_affinity — the (order, brand) basket projection feeds
#     three branches (per-brand counts, both self-join sides); the
#     STATIC plan prints an exchange per branch — at execution
#     ReuseExchange/AQE collapse the identical subplans — plus the
#     self-join's two order-key exchanges and the two count
#     aggregates, all genuinely distinct keys.
#   llm_bigram_kneser_ney — the corpus collapses once into the
#     bigram-TYPE table, but KN then needs that table keyed three ways
#     (the (w1,w2) count agg, the w1 left-context agg + join-back, the
#     w2 continuation agg + join-back): the static plan prints an
#     exchange per keying of each side. All six carry |bigram types|
#     rows, never corpus rows — the honest cost of the smoothing
#     definition, not an accidental re-shuffle of the text.
#   graph_degree_stats / graph_triangle_count — the co-purchase edge
#     build alone is (order,part) distinct + self-join + edge distinct
#     (3-4 exchanges of fact-derived rows); degree needs the node agg,
#     orientation two deg join keyings, the wedge self-join, the
#     closing join and the corner agg — every exchange carries edge-
#     or wedge-sized rows on node keys, none is corpus-rescan or
#     cartesian (the o(m^1.5) wedge bound is the algorithm's point).
#     The triangle edge frame is staged (localCheckpoint), so the
#     static plan under audit is the pre-stage construction count.
SHUFFLE_ALLOWANCE = {
    "agg_window_funnel": 6,
    #   agg_window_funnel_dedup — the base exists-chain joins plus the
    #     two LEFT ANTI interrupt joins, all equi on user_id with the
    #     time range as the join residual; every exchange carries the
    #     per-user funnel-event slice or the anchor frame (bounded by
    #     |views|). Static count 5; 6 gives one headroom.
    "agg_window_funnel_dedup": 6,
    #   agg_window_funnel_increase — identical join shape to the base
    #     funnel on hour-truncated times: two step equi-joins + level
    #     rollup + distinct-users + final count. Static 5; 6 headroom.
    "agg_window_funnel_increase": 6,
    #   rpt_time_to_convert — two user-keyed event aggregates + the
    #     qualifying-purchase range-residual equi-join + per-segment
    #     sort window + count + the two sparse rank-probe joins: every
    #     exchange after the per-user collapse carries user-or-smaller
    #     cardinality; the probe joins each move |segments|×|qs| rows.
    #     Static count 12; 13 gives one headroom.
    "rpt_time_to_convert": 13,
    "rpt_dedup_audit": 6,
    "rpt_active_users": 5,
    "rpt_brand_affinity": 9,
    "llm_bigram_kneser_ney": 6,
    "graph_degree_stats": 8,
    "graph_triangle_count": 13,
    #   graph_jaccard_linkpred — same co-purchase edge-build cost as the
    #     other graph keys (3-4 exchanges) + degree agg, the capped
    #     center equi-join, the (a,b) candidate agg, the anti-join
    #     against existing edges, and two degree joins: every exchange
    #     carries edge- or candidate-bounded rows on node keys; fan-out
    #     is bounded by the center cap (the df-cap device), never a
    #     cartesian. Static count 10; 11 gives one headroom.
    "graph_jaccard_linkpred": 11,
    #   graph_adamic_adar — the linkpred shape minus the two degree
    #     joins (the score needs only center degrees, which ride the
    #     broadcast weight-dim join): staged edge read + degree agg +
    #     center join + (a,b) candidate agg + anti-join + top-k sort.
    #     Static count 6; 7 gives one headroom.
    "graph_adamic_adar": 7,
    #   rpt_attribution_shapley — the events scan feeds TWO lineages
    #     (the purchase-time aggregate and the mask join/agg) which
    #     reconverge through the mask-count frame's two consumers
    #     (v(S) and the touch counts); every exchange after the user
    #     aggregate carries ≤8-row literal-algebra frames. Static
    #     count 10 post the single-pass touch rewrite (the first
    #     draft's per-channel union re-planned the lineage three
    #     times → 16); 11 gives one headroom.
    "rpt_attribution_shapley": 11,
    #   graph_triangle_approx — the DOULION sampler is a zero-shuffle
    #     map-side filter fused into the (staged) edge build, so the
    #     static count is the edge build (3) + degree agg + corner agg
    #     + the final 1-row reshape: 6 measured; 7 gives one headroom.
    "graph_triangle_approx": 7,
    #   graph_clustering_coeff — degree agg + the triangle spine's
    #     orient/wedge/corner exchanges over the STAGED edge set + the
    #     final deg⋈tri node join: static count 7 post-staging (the
    #     edge build itself sits behind the stage seam); 8 headroom.
    "graph_clustering_coeff": 8,
    #   agg_kruskal_wallis — (x, group) count agg + value-spine agg +
    #     the bounded-spine cumulative window + the g⋈spine equi-join
    #     + the final moments agg: 5 structural exchanges, every one
    #     on the ≤49k-row cents spine or its per-group split; 6 gives
    #     one headroom.
    "agg_kruskal_wallis": 6,
    #   llm_dedup_bloom_prefilter — index-hash distinct + the set-bit
    #     distinct (bounded by the 2^20-bit space) + the k-hit
    #     group-by + the exact semi-join's two sides: 5 structural
    #     exchanges, and the whole point is that the two biggest ones
    #     carry the bounded bitmap / prefiltered survivors, never the
    #     corpus; 6 gives one headroom.
    "llm_dedup_bloom_prefilter": 6,
    # 3 unrolled power iterations × (edges⋈ranks join + dst agg) over
    # the staged degree-annotated edge list, plus the edge-derivation
    # exchanges — each structural (queries/graph.py)
    "graph_pagerank": 12,
    # staged (order, brand) dedup + self-join + pair agg + two brand
    # marginals + exact basket count — each exchange structural
    # (reports_behavior.py)
    "rpt_basket_pairs": 7,
}


def test_effectful_exemptions_have_dedicated_coverage():
    """Every plan-audit exemption must name a real test: the file
    exists under tests/ and defines the named test function. A key
    added to EFFECTFUL without writing its dedicated test fails here."""
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    for key, (fname, test_name) in sorted(EFFECTFUL.items()):
        path = os.path.join(here, fname)
        assert os.path.exists(path), f"{key}: {fname} does not exist"
        src = open(path, encoding="utf-8").read()
        assert re.search(rf"^def {re.escape(test_name)}\(", src, re.M), (
            f"{key}: {fname} has no test function {test_name}"
        )


def test_no_unplanned_cartesians_or_shuffle_explosions(spark, sf_dir):
    from etl_ch_destination_spark.registry import all_queries

    problems = []
    for key, fn in sorted(all_queries().items()):
        if key in EFFECTFUL:
            continue
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("extended")
        phys = buf.getvalue().split("== Physical Plan ==")[-1]
        if key not in ALLOWED_NLJ:
            if "CartesianProduct" in phys:
                problems.append(f"{key}: CartesianProduct")
            if "BroadcastNestedLoopJoin" in phys:
                problems.append(f"{key}: BroadcastNestedLoopJoin")
        n_shuffles = phys.count("Exchange hashpartitioning")
        if n_shuffles > SHUFFLE_ALLOWANCE.get(key, MAX_HASH_SHUFFLES):
            problems.append(f"{key}: {n_shuffles} hash shuffles")
    assert not problems, "\n".join(problems)
