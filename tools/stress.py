#!/usr/bin/env python
"""Scaling stress: replicate the sf0.1 fact table in-memory N× and
measure how the headline plans scale with input size on fixed cores.

This does NOT synthesize new fixture data for correctness gates — the
oracle gate always runs on the driver's parquet. It answers one
question the fixtures alone can't: *is wall-clock linear in rows for
the shapes we claim are scan/shuffle-bound?* A plan with an accidental
quadratic term (all-pairs join, unpartitioned sort) shows super-linear
growth here long before a cluster run would.

Replication: `explode(sequence(1, N))` per row with the copy index
mixed into the join/group keys where uniqueness matters — row count
scales exactly N×, key cardinality scales with it, value domains stay
fixture-realistic.

Usage: python tools/stress.py [--factors 1,10,30]
Prints one JSON line: {"factor": {"q1": sec, "join_agg": sec, ...}}
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Production-parity heap for the stress JVM (overridable via env): the
# bench/test default of 8g across local[32] is 0.25 GB/core — 16-30×
# below any real executor config (4-8 GB/core) — and at 30× replicated
# input the triangle spine's repeated runs exhaust the execution pool
# there (UNABLE_TO_ACQUIRE across back-to-back 1.2B-row wedge
# exchanges) even though every single run fits. 16g = 0.5 GB/core is
# still conservative vs production; timings are not memory-bound below
# that, so recorded medians stay comparable across rounds.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(df, n: int, key_cols: list[str]):
    from pyspark.sql import functions as F

    if n == 1:
        return df
    rep = df.withColumn("__copy", F.explode(F.sequence(F.lit(1), F.lit(n))))
    # shift integral keys by copy index so cardinality scales too
    out = rep
    for k in key_cols:
        out = out.withColumn(k, F.col(k) + F.col("__copy").cast("long") * F.lit(10_000_000))
    return out.drop("__copy")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,10,30")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--only",
        default="",
        help=(
            "comma list of spine names to run (default: all). Names: "
            "q1,join_agg,topk_global,neardup,vocab_score,ngram_novelty,"
            "line_dedup,bpe_vocab_rounds,cc,pagerank,triangles,bfs,linkpred,"
            "tri_approx,semdedup,sim,streaming,asof,tdigest — 'sim' covers "
            "the exact/LSH/IVF/IVF-PQ ladder + recall gates; 'streaming' "
            "the foreachBatch ingest + session-window state spine; "
            "'tdigest' the centroid-sketch build at fixed vs scaled shards; 'tlog' the commit-log replay vs checkpoint read; "
            "'avro'/'protobuf'/'warc' the wire-codec encode→store→decode"
            " paths"
        ),
    )
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]
    only = {s for s in args.only.split(",") if s}

    def want(name: str) -> bool:
        return not only or name in only

    from pyspark.sql import functions as F

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.queries._util import disc_price, dsum, money, one, rate
    from etl_ch_destination_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    from etl_ch_destination_spark.catalog import parallelize_scan

    # The fixture parquet is one row group = one scan split; a 100 TB
    # table arrives in thousands of splits. Spread the scan so the
    # measured slope reflects the multi-core plan, not the fixture's
    # single-task scan stage (the repartition cost is included in every
    # timing, so this is conservative).
    li0 = parallelize_scan(load_table(spark, SF_DIR, "lineitem"), spark)
    o0 = parallelize_scan(load_table(spark, SF_DIR, "orders"), spark)
    d0 = parallelize_scan(
        load_table(spark, SF_DIR, "documents").select("doc_id", "text"), spark
    )
    emb0 = parallelize_scan(
        load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding"), spark
    )

    def replicate_vecs(df, n: int):
        """N× corpus with a deterministic per-copy DIRECTION jitter.

        Plain replication duplicates every vector exactly (cosine ties
        across copies → degenerate neighbor sets) and pure scaling is
        cosine-invariant; adding sin(vec_id·13 + copy·7 + i)·0.05 per
        dimension perturbs directions reproducibly, so the replicated
        corpus has a realistic (non-tied) neighborhood structure while
        staying a pure function of (row, copy)."""
        if n == 1:
            return df
        rep = df.withColumn("__copy", F.explode(F.sequence(F.lit(1), F.lit(n))))
        jitter = F.transform(
            F.col("embedding"),
            lambda x, i: x.cast("double")
            + F.sin(
                F.col("vec_id").cast("double") * 13.0
                + F.col("__copy").cast("double") * 7.0
                + i.cast("double")
            )
            * F.lit(0.05),
        )
        return rep.select(
            (F.col("vec_id") + F.col("__copy").cast("long") * 10_000_000).alias(
                "vec_id"
            ),
            jitter.alias("embedding"),
        )

    def replicate_docs(df, n: int):
        """N× corpus with CONSTANT duplicate density: every copy gets a
        disjoint vocabulary (copy index suffixed onto every word), so
        cross-copy shingles never collide and the near-dup pair
        structure replicates instead of growing quadratically — the
        measured slope is the pipeline's, not the duplicate
        semantics'."""
        if n == 1:
            return df
        rep = df.withColumn("__copy", F.explode(F.sequence(F.lit(1), F.lit(n))))
        return rep.select(
            (F.col("doc_id") + F.col("__copy").cast("long") * 10_000_000).alias(
                "doc_id"
            ),
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(w, F.lit("_"), F.col("__copy").cast("string")),
                ),
                " ",
            ).alias("text"),
        )

    def replicate_events(ev0, n: int):
        """N× events with DISJOINT user/event id spaces per copy —
        sessions, asof-match groups, and state rows all scale exactly
        N× by construction (shared by the streaming and asof spines)."""
        if n == 1:
            return ev0
        return ev0.withColumn(
            "__copy", F.explode(F.sequence(F.lit(1), F.lit(n)))
        ).select(
            (F.col("event_id") + F.col("__copy").cast("long") * 100_000_000)
            .alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("__copy").cast("long") * 10_000_000)
            .alias("user_id"),
            "event_type",
            "value",
            "props",
        )

    def time_action(fn) -> float:
        fn()  # warm-up
        return round(statistics.median(_timed(fn) for _ in range(args.runs)), 3)

    def _timed(fn) -> float:
        t0 = time.monotonic()
        fn()
        return time.monotonic() - t0

    results: dict[str, dict[str, float]] = {}
    for n in factors:
        li = replicate(li0, n, ["l_orderkey"])
        o = replicate(o0, n, ["o_orderkey"])

        def q1():
            (
                li.filter(F.col("l_shipdate") <= "2001-09-02")
                .groupBy("l_returnflag", "l_linestatus")
                .agg(
                    dsum(money("l_quantity"), "sum_qty"),
                    dsum(disc_price(), "sum_disc_price"),
                    F.count(F.lit(1)).alias("n"),
                )
                .write.mode("overwrite").format("noop").save()
            )

        def join_agg():
            (
                li.join(o, li.l_orderkey == o.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(dsum(disc_price(), "revenue"), F.count(F.lit(1)).alias("n"))
                .write.mode("overwrite").format("noop").save()
            )

        def topk():
            (
                li.orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
                .limit(10)
                .write.mode("overwrite").format("noop").save()
            )

        d = replicate_docs(d0, n)

        def neardup():
            from etl_ch_destination_spark.ops.neardup import near_duplicate_pairs

            near_duplicate_pairs(d).write.mode("overwrite").format("noop").save()

        def line_dedup():
            # the llm_line_dedup spine: block explode → first-occurrence
            # window on the block hash → doc_id reassembly. The heaviest
            # corpus pass (both exchanges carry ~token volume); slope
            # here is the whole C4-cleaning cost model.
            from pyspark.sql.window import Window as W

            LINE_W = 10
            words = F.split("text", " ")
            nb = F.expr(f"(size(split(text, ' ')) + {LINE_W} - 1) div {LINE_W}")
            rows = d.select(
                "doc_id",
                words.alias("w"),
                F.size(words).alias("nw"),
                F.explode(F.sequence(F.lit(0), nb - 1)).alias("bi"),
            )
            start = F.col("bi") * LINE_W + 1
            end = F.least((F.col("bi") + 1) * LINE_W, F.col("nw"))
            btxt = F.array_join(F.slice(F.col("w"), start, end - start + 1), " ")
            blocks = rows.select("doc_id", "bi", btxt.alias("btxt"))
            win = W.partitionBy(F.md5("btxt")).orderBy("doc_id", "bi")
            r = blocks.withColumn("rn", F.row_number().over(win))
            (
                r.groupBy("doc_id")
                .agg(
                    F.count(F.lit(1)).alias("n_blocks"),
                    F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
                )
                .write.mode("overwrite")
                .format("noop")
                .save()
            )

        def vocab_score():
            # the llm_word_rarity / llm_unigram_logprob spine: explode →
            # vocabulary agg → join-back → per-doc agg. replicate_docs
            # gives each copy a disjoint vocabulary, so vocabulary
            # cardinality scales N× with the corpus — the worst case for
            # the join-back (no cross-copy key sharing to amortize).
            w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
            tok = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("m"))
            vocab = tok.groupBy("word").agg(F.sum("m").alias("n"))
            (
                tok.join(vocab, "word")
                .groupBy("doc_id")
                .agg(F.sum("m").alias("n_words"), F.min("n").alias("min_n"))
                .write.mode("overwrite")
                .format("noop")
                .save()
            )

        def ngram_novelty():
            # the llm_ngram_novelty spine: trigram explode → shingle
            # first-owner agg → TWO per-doc aggregates left-joined on
            # doc_id (never a join back on the shingle key — the round-4
            # rewrite). replicate_docs keeps per-copy vocabularies
            # disjoint, so the shingle index cardinality scales N×.
            dd = d.filter(F.size(F.split("text", " ")) >= 3)
            toks = F.split("text", " ")
            shingles = F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 2),
                    lambda i: F.array_join(F.slice(toks, i, 3), " "),
                )
            )
            sh = dd.select("doc_id", F.explode(shingles).alias("shingle"))
            per_doc = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ns"))
            owner = sh.groupBy("shingle").agg(F.min("doc_id").alias("fd"))
            novel = owner.groupBy(F.col("fd").alias("doc_id")).agg(
                F.count(F.lit(1)).alias("nn")
            )
            (
                per_doc.join(novel, "doc_id", "left")
                .write.mode("overwrite")
                .format("noop")
                .save()
            )

        def bpe_rounds():
            # the llm_bpe_learn spine: the corpus collapses ONCE into
            # the (word, freq) vocabulary and every BPE round iterates
            # on that reduction only. replicate_docs gives each copy a
            # disjoint vocabulary, so vocab cardinality scales N× —
            # the iteration's worst case. Fixed 4 rounds: the slope
            # measured is per-iteration cost vs vocab size.
            from etl_ch_destination_spark.queries.llm_corpus import (
                _bpe_apply_merge,
            )

            vocab = (
                d.select(F.explode(F.split("text", " ")).alias("w"))
                .filter(F.col("w") != "")
                .groupBy("w")
                .agg(F.count(F.lit(1)).cast("long").alias("freq"))
                .select("freq", F.split(F.col("w"), "").alias("syms"))
            )
            work = vocab.localCheckpoint(eager=True)
            for _ in range(4):
                best = (
                    work.filter(F.size("syms") >= 2)
                    .select(
                        "freq",
                        F.explode(
                            F.transform(
                                F.sequence(F.lit(1), F.size("syms") - 1),
                                lambda i: F.struct(
                                    F.element_at("syms", i).alias("l"),
                                    F.element_at("syms", i + F.lit(1)).alias("r"),
                                ),
                            )
                        ).alias("p"),
                    )
                    .groupBy("p.l", "p.r")
                    .agg(F.sum("freq").alias("cnt"))
                    .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
                    .limit(1)
                    .collect()
                )[0]
                work = work.select(
                    "freq",
                    _bpe_apply_merge(F.col("syms"), best.l, best.r).alias("syms"),
                ).localCheckpoint(eager=True)

        def cc_clusters():
            # the llm_dedup_clusters spine ALONE: alternating
            # large-star/small-star connected components over a
            # materialized near-dup edge set (edge generation is the
            # `neardup` spine; separating them isolates the iterative
            # graph cost AND its rounds-to-converge, the O(log n)
            # claim). replicate_docs keeps per-copy vocabularies
            # disjoint, so components replicate per copy — edge count
            # and component count both scale N×, component SHAPE stays
            # fixture-realistic.
            from etl_ch_destination_spark.ops.components import (
                connected_components,
            )

            stats: dict = {}
            connected_components(
                cc_edges, src="id_a", dst="id_b", stats=stats
            ).write.mode("overwrite").format("noop").save()
            cc_rounds_seen.append(stats["rounds"])

        def substr_dedup():
            # the llm_dedup_substring spine: strided char-shingle
            # hashing -> duplicate-hash aggregate -> hash-key join-back
            # (the round-8 char-level dedup axis). Both exchanges carry
            # ~len/stride rows; replicate_docs keeps per-copy texts
            # disjoint so shared-substring structure replicates and the
            # slope is the pipeline's.
            from etl_ch_destination_spark.queries.llm_filters import (
                SUBSTR_GRAM,
                SUBSTR_STEP,
            )

            dd = d.filter(F.length("text") >= SUBSTR_GRAM)
            starts = F.sequence(
                F.lit(1), F.length("text") - (SUBSTR_GRAM - 1),
                F.lit(SUBSTR_STEP),
            )
            sh = dd.select(
                "doc_id",
                F.explode(
                    F.array_distinct(
                        F.transform(
                            starts,
                            lambda i: F.md5(
                                F.col("text").substr(i, F.lit(SUBSTR_GRAM))
                            ),
                        )
                    )
                ).alias("h"),
            )
            dup = (
                sh.groupBy("h")
                .agg(F.countDistinct("doc_id").alias("nd"))
                .filter(F.col("nd") >= 2)
                .select("h")
            )
            (
                sh.join(dup, "h", "left_semi")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_shared"))
                .write.mode("overwrite")
                .format("noop")
                .save()
            )

        def pagerank_spine():
            # the graph_pagerank spine: disjoint graph copies (order
            # AND part keys offset per copy, so nodes and edges both
            # scale N x while degree structure stays fixture-real);
            # measures the 3-iteration staged message-passing rounds
            # end-to-end including edge derivation. The staging seam
            # runs in DURABLE mode here: the replicated edge list
            # outgrows executor storage at 30x (localCheckpoint OOMed —
            # this spine caught it), which is precisely the
            # spill-to-table path ops/staging.py prescribes for
            # cluster-scale inputs.
            from etl_ch_destination_spark.ops.staging import STAGING_DIR_CONF
            from etl_ch_destination_spark.queries.graph import pagerank_ranks

            spark.conf.set(
                STAGING_DIR_CONF,
                os.path.join(tempfile.gettempdir(), "stress_staging"),
            )

            try:
                pagerank_ranks(_copurchase_from(lig)).write.mode(
                    "overwrite"
                ).format("noop").save()
            finally:
                spark.conf.unset(STAGING_DIR_CONF)

        def triangles_spine():
            # the graph_triangle_count spine: disjoint co-purchase graph
            # copies (order AND part keys offset per copy — nodes and
            # edges both scale N× with fixture-real degree structure),
            # so the measured slope isolates the degree-ordered
            # enumeration's O(m^1.5) wedge bound (Suri & Vassilvitskii):
            # an unoriented sum(d²) wedge join would blow the linearity
            # gate well inside 10→30×. Durable staging for the edge +
            # oriented tables — the same spill seam the pagerank spine
            # proved necessary at 30× (localCheckpoint OOM).
            #
            # Partition sizing (this spine's own 30× catch): the wedge
            # exchange carries ~1.2B rows at 30×; at the session's toy
            # 32 shuffle partitions that is ~38M rows (~1 GB of sort
            # state) PER TASK × 32 concurrent tasks — OOM on the shared
            # 8g local heap, where the step-wise plan ran fine. The fix
            # is the production one (partitions ∝ data, SCALE.md):
            # raise AQE's initialPartitionNum so heavy exchanges split
            # into heap-sized sorts while AQE coalescing keeps the small
            # stages at few partitions.
            from etl_ch_destination_spark.ops.staging import STAGING_DIR_CONF
            from etl_ch_destination_spark.queries.graph import triangle_counts

            spark.conf.set(
                STAGING_DIR_CONF,
                os.path.join(tempfile.gettempdir(), "stress_staging"),
            )
            # partitions ∝ data (the production rule, SCALE.md): the
            # wedge exchange carries ~41M rows per 1× copy, so scale
            # the split count with the factor to keep per-task sort
            # state heap-sized; AQE coalesces the small stages back.
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                str(max(256, 32 * n)),
            )
            try:
                triangle_counts(_copurchase_from(lig)).write.mode(
                    "overwrite"
                ).format("noop").save()
            finally:
                spark.conf.unset(STAGING_DIR_CONF)
                spark.conf.unset(
                    "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
                )

        row: dict[str, float] = {"rows": li.count()}
        if want("q1"):
            row["q1"] = time_action(q1)
        if want("join_agg"):
            row["join_agg"] = time_action(join_agg)
        if want("topk_global"):
            row["topk_global"] = time_action(topk)
        if want("neardup"):
            row["neardup"] = time_action(neardup)
        if want("vocab_score"):
            row["vocab_score"] = time_action(vocab_score)
        if want("ngram_novelty"):
            row["ngram_novelty"] = time_action(ngram_novelty)
        if want("line_dedup"):
            row["line_dedup"] = time_action(line_dedup)
        if want("substr_dedup"):
            row["substr_dedup"] = time_action(substr_dedup)
        def semdedup_spine():
            # SemDeDup with K ∝ n (8 per 1× copy): per-cluster size
            # stays constant, so the intra-cluster pair stage is LINEAR
            # in rows; the Voronoi assignment is O(n·K) — the published
            # recipe's own assignment cost (flat KMeans/Voronoi) — and
            # crosses into the broadcast-join + max(struct) regime
            # above K=32, exercising the cluster-scale code path the
            # fixture key (K=8, HOF literals) never reaches.
            from etl_ch_destination_spark.ops.similarity import semdedup_flags

            semdedup_flags(corpus_sd, n_clusters=8 * n, tau=0.4).write.mode(
                "overwrite"
            ).format("noop").save()

        if want("semdedup"):
            corpus_sd = replicate_vecs(emb0, n).persist()
            corpus_sd.count()
            row["semdedup"] = time_action(semdedup_spine)
            corpus_sd.unpersist(blocking=False)

        def _copurchase_from(lig_df):
            lp = lig_df.select(
                F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
            ).distinct()
            a, b = lp.alias("a"), lp.alias("b")
            return (
                a.join(
                    b,
                    (F.col("a.o") == F.col("b.o"))
                    & (F.col("a.p") < F.col("b.p")),
                )
                .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
                .distinct()
            )

        bfs_rounds_seen: list[int] = []

        def bfs_spine():
            # graph_bfs_distance spine (VERDICT r10 #6): disjoint graph
            # copies — per-round work is |E|-bounded so wall must be
            # linear, and because every copy is the same fixture graph
            # the multi-source diameter is copy-invariant: the
            # convergence loop must pay the SAME round count at every
            # factor (gated below like cc_rounds). Durable staging for
            # the per-round frontier tables (the pagerank-spine seam).
            from etl_ch_destination_spark.ops.staging import STAGING_DIR_CONF
            from etl_ch_destination_spark.queries.graph import (
                bfs_distances_with_rounds,
            )

            spark.conf.set(
                STAGING_DIR_CONF,
                os.path.join(tempfile.gettempdir(), "stress_staging"),
            )
            try:
                dist, rounds = bfs_distances_with_rounds(_copurchase_from(lig))
                bfs_rounds_seen.append(rounds)
                dist.write.mode("overwrite").format("noop").save()
            finally:
                spark.conf.unset(STAGING_DIR_CONF)

        def tri_approx_spine():
            # graph_triangle_approx spine (VERDICT r10 #5): the DOULION
            # sampler is a zero-shuffle map-side filter; the exact
            # enumeration then runs on the p-sparsified graph, scaling
            # the wedge exchange by ~p^1.5 — this is the declared scale
            # path where the exact spine is disk-bound at 100×, so THIS
            # spine is the one that must fit in scratch there. Same
            # partitions-∝-data sizing as the exact triangle spine.
            from etl_ch_destination_spark.ops.staging import STAGING_DIR_CONF
            from etl_ch_destination_spark.queries.graph import (
                doulion_sampled_edges,
                triangle_counts,
            )

            spark.conf.set(
                STAGING_DIR_CONF,
                os.path.join(tempfile.gettempdir(), "stress_staging"),
            )
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                str(max(256, 32 * n)),
            )
            try:
                triangle_counts(
                    doulion_sampled_edges(_copurchase_from(lig))
                ).agg(
                    F.expr("coalesce(sum(n_triangles) div 3, 0)").alias("t")
                ).write.mode("overwrite").format("noop").save()
            finally:
                spark.conf.unset(STAGING_DIR_CONF)
                spark.conf.unset(
                    "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
                )

        def linkpred_spine():
            # graph_jaccard_linkpred spine: disjoint graph copies, so
            # the degree-capped center join's candidate count scales
            # linearly (per-copy candidates are copy-invariant); an
            # uncapped enumeration would blow the gate on the hub deg²
            # term well inside 10→30×. Durable staging for the edge
            # seam like the other graph spines.
            from etl_ch_destination_spark.ops.staging import STAGING_DIR_CONF
            from etl_ch_destination_spark.queries.graph import (
                jaccard_linkpred_scores,
            )

            spark.conf.set(
                STAGING_DIR_CONF,
                os.path.join(tempfile.gettempdir(), "stress_staging"),
            )
            try:
                jaccard_linkpred_scores(_copurchase_from(lig)).write.mode(
                    "overwrite"
                ).format("noop").save()
            finally:
                spark.conf.unset(STAGING_DIR_CONF)

        if (
            want("pagerank")
            or want("triangles")
            or want("bfs")
            or want("tri_approx")
            or want("linkpred")
        ):
            lig = replicate(li0, n, ["l_orderkey", "l_partkey"])
        if want("pagerank"):
            row["pagerank"] = time_action(pagerank_spine)
        if want("triangles"):
            row["triangles"] = time_action(triangles_spine)
        if want("bfs"):
            row["bfs"] = time_action(bfs_spine)
            row["bfs_rounds"] = max(bfs_rounds_seen)
        if want("tri_approx"):
            row["tri_approx"] = time_action(tri_approx_spine)
        if want("linkpred"):
            row["linkpred"] = time_action(linkpred_spine)
        if want("bpe_vocab_rounds"):
            row["bpe_vocab_rounds"] = time_action(bpe_rounds)
        if want("cc"):
            from etl_ch_destination_spark.ops.neardup import (
                near_duplicate_pairs,
            )

            cc_edges = near_duplicate_pairs(d).localCheckpoint(eager=True)
            cc_rounds_seen: list[int] = []
            row["cc"] = time_action(cc_clusters)
            row["cc_rounds"] = max(cc_rounds_seen)
            row["cc_edges"] = cc_edges.count()

        if want("sim"):
            # --- ANN vs exact: recall AND latency under row scaling ---
            # (VERDICT r3 next-round #5: prove the approximate paths
            # hold their recall floor as the corpus grows, not just
            # their slope.)
            from etl_ch_destination_spark.ops.similarity import (
                ann_topk,
                brute_force_topk,
                ivf_topk,
                ivfpq_topk,
            )

            K = 10
            corpus = replicate_vecs(emb0, n).persist()
            corpus.count()  # materialize once; all paths read the same frame
            queries = emb0.filter(F.col("vec_id") < 16)

            def collect_topk(fn):
                rows = fn(corpus, queries, K).collect()
                out: dict[int, set] = {}
                for r in rows:
                    out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
                return out

            exact = collect_topk(brute_force_topk)

            def recall_of(approx: dict[int, set]) -> float:
                per_q = [
                    len(exact[q] & approx.get(q, set())) / max(1, len(exact[q]))
                    for q in exact
                ]
                return round(sum(per_q) / len(per_q), 4)

            recall_ann = recall_of(collect_topk(ann_topk))
            # IVF probes 8-of-16 cells, the config of the pytest recall
            # floor: the fixture's isotropic unit vectors are IVF's worst
            # case (no cluster structure → recall ≈ probed-mass fraction),
            # so its floor is 0.5 where LSH holds 0.9; real embedding
            # corpora cluster and close the gap. Full-probe ≡ brute force
            # is the correctness gate (tests/test_llm.py).
            recall_ivf = recall_of(
                collect_topk(lambda c, q, k: ivf_topk(c, q, k, n_probe=8))
            )
            # IVF-PQ (VERDICT r10 #7): recall is bounded above by its
            # probed-mass fraction (n_probe=6 of 8 lists = 0.75 on this
            # worst-case isotropic fixture) times the ADC-shortlist hit
            # rate; the exact re-rank only fixes ordering, never the
            # candidate set — so the stress floor is the IVF one (0.5),
            # while the pytest gate holds the fixture-scale 0.8 floor.
            recall_ivfpq = recall_of(collect_topk(ivfpq_topk))

            def t_exact():
                brute_force_topk(corpus, queries, K).write.mode(
                    "overwrite"
                ).format("noop").save()

            def t_ann():
                ann_topk(corpus, queries, K).write.mode("overwrite").format(
                    "noop"
                ).save()

            def t_ivf():
                ivf_topk(corpus, queries, K).write.mode("overwrite").format(
                    "noop"
                ).save()

            def t_ivfpq():
                ivfpq_topk(corpus, queries, K).write.mode(
                    "overwrite"
                ).format("noop").save()

            row.update(
                {
                    "vec_rows": corpus.count(),
                    "ann_recall_lsh": recall_ann,
                    "ann_recall_ivf": recall_ivf,
                    "ann_recall_ivfpq": recall_ivfpq,
                    "sim_exact": time_action(t_exact),
                    "sim_lsh": time_action(t_ann),
                    "sim_ivf": time_action(t_ivf),
                    "sim_ivfpq": time_action(t_ivfpq),
                }
            )
            corpus.unpersist(blocking=False)

        if want("asof"):
            # --- ASOF-join spine: the union+window merge idiom
            # (ops/asof.py) end-to-end at 1×/10×/30× — the §2.3 custom
            # operator family's stress row. Disjoint user spaces make
            # the per-key sorted-window state copy-invariant: wall must
            # scale ~linearly in rows (one keyed exchange + one
            # per-user sorted pass; the merge-join cost model, never a
            # range-join blowup).
            from etl_ch_destination_spark.ops.asof import asof_join
            from etl_ch_destination_spark.ops.dedup import latest_by_key

            ev0a = parallelize_scan(load_table(spark, SF_DIR, "events"), spark)
            eva = replicate_events(ev0a, n)
            views = eva.filter(F.col("event_type") == "view").select(
                "event_id", "user_id", "ts", "value"
            )
            purch = latest_by_key(
                eva.filter(F.col("event_type") == "purchase").select(
                    "event_id", "user_id", "ts", "value"
                ),
                ["user_id", "ts"],
                [F.desc("event_id")],
            ).select("user_id", "ts", "value")

            def asof_run():
                asof_join(
                    views, purch, keys=["user_id"], ts="ts", how="left"
                ).write.mode("overwrite").format("noop").save()

            row["asof"] = time_action(asof_run)

        if want("streaming"):
            # --- streaming spine (VERDICT r11 #6): §2.9 was the one
            # family with no 1×/10×/30× row. Replay events replicated
            # with DISJOINT user/event spaces (sessions and state rows
            # scale exactly N× by construction) through the two
            # stateful shapes: the foreachBatch batched-insert ingest
            # (throughput) and the session_window aggregation (state
            # store). The staged replay keeps the FILE count constant
            # across factors, so every factor pays the same number of
            # micro-batches with N× bigger batches — state cadence
            # fixed, state size the scaled variable, exactly a Kafka
            # topic carrying N× the traffic into the same trigger
            # schedule.
            import shutil as _sh

            from etl_ch_destination_spark.catalog import scratch_dir
            from etl_ch_destination_spark.streaming import pipeline as spipe
            from etl_ch_destination_spark.streaming.replay import (
                read_staged_stream,
            )

            # Scale WITHIN-batch parallelism with batch size (the r10
            # triangle-spine "partitions ∝ data" rule, applied to the
            # replay read): maxFilesPerTrigger=1 makes each micro-batch
            # one staged file, and at 300× that file is ~51 MB — under
            # the default 128 MB maxPartitionBytes, so the WHOLE 5M-row
            # batch ran as ONE task end-to-end (scan→stamp→sink write
            # has no exchange) and fbatch collapsed super-linearly
            # (12.8 → 92 s for 3× rows, caught by the gate in the
            # first r13 run). 8 MB splits a factor-N batch into ~N×
            # size/8MB tasks: 30× stays 1 task (r12 rows unchanged),
            # 100× → ~3, 300× → ~7 — micro-batch COUNT still constant,
            # exactly a Kafka consumer whose partition count follows
            # topic volume.
            _prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024)
            )
            # restored in the finally below — an exception mid-spine
            # must not leak the 8 MB override into later spines/factors
            # (it would silently skew their timings)

            try:
                N_SLICES = 6
                ev0 = parallelize_scan(load_table(spark, SF_DIR, "events"), spark)
                evr = replicate_events(ev0, n)
                # time-RANGE slicing (parallel — no global window): slice
                # bounds come from the 1× table, identical for every copy.
                b = ev0.agg(
                    F.min(F.unix_micros("ts")).alias("lo"),
                    F.max(F.unix_micros("ts")).alias("hi"),
                ).collect()[0]
                span = max(b["hi"] - b["lo"] + 1, 1)
                slice_col = F.least(
                    F.floor(
                        (F.unix_micros("ts") - F.lit(b["lo"]))
                        * F.lit(N_SLICES) / F.lit(span)
                    ),
                    F.lit(N_SLICES - 1),
                ).cast("int")
                staged = scratch_dir(f"stress_stream/{n}x")
                _sh.rmtree(staged, ignore_errors=True)
                sliced = evr.withColumn("__slice", slice_col)
                for i in range(N_SLICES):
                    (
                        sliced.filter(F.col("__slice") == i)
                        .drop("__slice")
                        .coalesce(1)
                        .write.mode("append")
                        .parquet(staged)
                    )

                def run_fbatch():
                    out = scratch_dir(f"stress_stream/{n}x_sink")
                    ck = scratch_dir(f"stress_stream/{n}x_ckpt")
                    _sh.rmtree(out, ignore_errors=True)
                    _sh.rmtree(ck, ignore_errors=True)
                    q = spipe.foreach_batch_load(
                        read_staged_stream(spark, staged), out, ck
                    )
                    q.awaitTermination()

                def run_session():
                    ck = scratch_dir(f"stress_stream/{n}x_ckpt2")
                    _sh.rmtree(ck, ignore_errors=True)
                    q = (
                        spipe.session_gap(read_staged_stream(spark, staged))
                        .writeStream.format("noop")
                        .outputMode("complete")
                        .option("checkpointLocation", ck)
                        .trigger(availableNow=True)
                        .start()
                    )
                    q.awaitTermination()
                    return q

                n_events = evr.count()
                t_fb = time_action(run_fbatch)
                run_session()  # warm-up
                t_ss_runs, state_rows = [], 0
                for _ in range(args.runs):
                    t0 = time.monotonic()
                    q = run_session()
                    t_ss_runs.append(time.monotonic() - t0)
                    prog = q.lastProgress
                    if prog and prog.get("stateOperators"):
                        state_rows = max(
                            state_rows, prog["stateOperators"][0]["numRowsTotal"]
                        )
                row.update(
                    {
                        "stream_events": n_events,
                        "stream_fbatch": round(statistics.median([t_fb]), 3),
                        "stream_session": round(statistics.median(t_ss_runs), 3),
                        "stream_fbatch_evps": round(t_fb and n_events / t_fb),
                        # r15 (VERDICT r14 #10): per-epoch wall — the
                        # micro-batch count is CONSTANT across factors
                        # (N_SLICES staged files, maxFilesPerTrigger=1),
                        # so this row shows the ~fixed trigger/commit
                        # overhead amortizing as batches grow N×
                        "stream_sec_per_epoch": round(t_fb / N_SLICES, 3),
                        "stream_state_rows": state_rows,
                    }
                )
                _sh.rmtree(staged, ignore_errors=True)
                _sh.rmtree(scratch_dir(f"stress_stream/{n}x_sink"),
                           ignore_errors=True)
            finally:
                spark.conf.set(
                    "spark.sql.files.maxPartitionBytes", _prev_mpb
                )

        if want("tdigest"):
            # --- t-digest build spine (round 13): the
            # agg_quantile_tdigest per-shard digest build — the ONE
            # scale question the key leaves open is shard sizing. At
            # the fixture's FIXED 8 shards, per-(grp, shard) window
            # partitions grow ∝ rows (24 partitions total — the memory
            # wall the docstring warns about); with shards ∝ factor
            # (the production rule: shard count follows cluster/data),
            # partition size stays constant and the build should track
            # rows linearly. Both are measured; the scaled form is
            # linearity-GATED, and the centroid bound |grp|×|shards|×δ
            # is asserted exactly (a sketch whose state grows with ROWS
            # is not a sketch).
            from pyspark.sql.window import Window as W

            li_t = replicate(li0, n, ["l_orderkey"])
            TD_DELTA, TD_BASE_SHARDS = 128, 8

            def td_state(shards: int):
                src = li_t.select(
                    F.col("l_returnflag").alias("grp"),
                    (F.col("l_orderkey") % shards).alias("shard"),
                    (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
                    .cast("bigint")
                    .alias("cents"),
                )
                w_rank = W.partitionBy("grp", "shard").orderBy("cents")
                return (
                    src.select(
                        "grp",
                        "shard",
                        "cents",
                        F.row_number().over(w_rank).alias("rn"),
                        F.count(F.lit(1))
                        .over(W.partitionBy("grp", "shard"))
                        .alias("n"),
                    )
                    .withColumn(
                        "bucket",
                        F.expr(
                            f"CAST(({TD_DELTA} * "
                            f"(2 * CAST(rn AS BIGINT) - 1)) "
                            f"div (2 * n) AS BIGINT)"
                        ),
                    )
                    .groupBy("grp", "shard", "bucket")
                    .agg(
                        F.sum("cents").alias("s"),
                        F.count(F.lit(1)).alias("w"),
                    )
                )

            def td_run(shards: int):
                def run():
                    td_state(shards).write.mode("overwrite").format(
                        "noop"
                    ).save()

                return run

            scaled = TD_BASE_SHARDS * n
            row["tdigest_fixed8"] = time_action(td_run(TD_BASE_SHARDS))
            row["tdigest"] = time_action(td_run(scaled))
            row["tdigest_centroids"] = td_state(scaled).count()
            row["tdigest_centroid_bound"] = 3 * scaled * TD_DELTA

        if want("avro"):
            # --- Avro codec spine (round 14, VERDICT r13 #2): the
            # suite's slowest bench key (scan_avro_import, 8.86 s at
            # sf0.1) claims "embarrassingly parallel — scales with
            # file count"; this measures it instead of asserting it.
            # Distributed encode (one DEFLATE container file per
            # 8192-row slice via mapInPandas) → parquet store →
            # block-parallel VALIDATING decode (full value decode +
            # schema/sync/consumption checks). Both stages are pure
            # per-file Python with no exchange anywhere, so wall-clock
            # must track rows linearly on fixed cores; a super-linear
            # slope here would mean hidden driver-side or single-task
            # work in the codec path.
            from etl_ch_destination_spark.sink.avro import (
                avro_blocks,
                avro_schema,
                decode_container,
            )

            o_av = replicate(o0, n, ["o_orderkey"])
            src_av = o_av.select(
                F.col("o_orderkey").cast("long"),
                F.col("o_orderstatus"),
                F.col("o_totalprice").cast("decimal(12,2)"),
                F.col("o_orderdate").cast("timestamp"),
                F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
                .otherwise(F.substring("o_orderpriority", 1, 10))
                .alias("note"),
            )
            expected_av = avro_schema(src_av.schema)
            av_path = os.path.join(
                tempfile.gettempdir(), "stress_staging", f"avro_{n}x"
            )

            def avro_encode():
                avro_blocks(
                    src_av,
                    rows_per_file=8192,
                    objects_per_block=2048,
                    codec="deflate",
                ).write.mode("overwrite").parquet(av_path)

            row["avro_encode"] = time_action(avro_encode)
            files_av = spark.read.parquet(av_path)

            def _avro_dec(batches):
                import pandas as pd

                for pdf in batches:
                    counts = []
                    for payload, cnt in zip(
                        pdf["payload"], pdf["block_rows"]
                    ):
                        rows_ = decode_container(bytes(payload), expected_av)
                        if len(rows_) != int(cnt):
                            raise ValueError("container row-count drift")
                        counts.append(len(rows_))
                    yield pd.DataFrame({"n": counts})

            def avro_decode():
                files_av.mapInPandas(
                    _avro_dec, schema="n bigint"
                ).write.mode("overwrite").format("noop").save()

            row["avro_decode"] = time_action(avro_decode)

        if want("protobuf"):
            # --- Protobuf codec spine (round 14): same question as the
            # avro spine for the round-14 wire format — encode (one
            # length-delimited stream file per 8192-row slice via
            # mapInPandas) → parquet store → validating decode, both
            # pure per-file Python with no exchange; wall-clock must
            # track rows linearly on fixed cores.
            from etl_ch_destination_spark.sink.protobuf import (
                decode_stream,
                pb_schema,
                protobuf_blocks,
            )

            c0 = parallelize_scan(load_table(spark, SF_DIR, "customer"), spark)
            c_pb = replicate(c0, n, ["c_custkey"])
            src_pb = c_pb.select(
                F.col("c_custkey").cast("long"),
                F.col("c_name"),
                (F.col("c_acctbal").cast("decimal(12,2)") * 100)
                .cast("long")
                .alias("bal_cents"),
                F.col("c_nationkey").cast("long"),
                F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
                .otherwise(F.col("c_mktsegment"))
                .alias("segment"),
                (F.col("c_mktsegment") == "AUTOMOBILE").alias("is_auto"),
                F.col("c_acctbal").cast("double").alias("bal"),
            )
            pb_sch = pb_schema(
                [
                    (1, "c_custkey", "int64", False),
                    (2, "c_name", "string", False),
                    (3, "bal_cents", "sint64", False),
                    (4, "c_nationkey", "fixed32", False),
                    (5, "segment", "string", True),
                    (6, "is_auto", "bool", False),
                    (7, "bal", "double", False),
                ]
            )
            pb_path = os.path.join(
                tempfile.gettempdir(), "stress_staging", f"protobuf_{n}x"
            )

            def pb_encode():
                protobuf_blocks(
                    src_pb, pb_sch, rows_per_file=8192
                ).write.mode("overwrite").parquet(pb_path)

            row["protobuf_encode"] = time_action(pb_encode)
            files_pb = spark.read.parquet(pb_path)

            def _pb_dec(batches):
                import pandas as pd

                for pdf in batches:
                    counts = []
                    for payload, cnt in zip(
                        pdf["payload"], pdf["block_rows"]
                    ):
                        rows_ = decode_stream(
                            pb_sch, bytes(payload), expected_rows=int(cnt)
                        )
                        counts.append(len(rows_))
                    yield pd.DataFrame({"n": counts})

            def pb_decode():
                files_pb.mapInPandas(
                    _pb_dec, schema="n bigint"
                ).write.mode("overwrite").format("noop").save()

            row["protobuf_decode"] = time_action(pb_decode)

        if want("warc"):
            # --- WARC codec spine (round 14): the Common Crawl ingest
            # path of scan_warc_import — record-at-time gzip encode
            # (one member per record, warcinfo + request records
            # interleaved) → parquet store → inflate + strict-framing
            # parse + HTTP-envelope split. Both stages are pure
            # per-file Python over independent WARC files with no
            # exchange; wall-clock must track rows linearly on fixed
            # cores or the "one task per WARC file" claim is wrong.
            from etl_ch_destination_spark.sink.warc import (
                parse_http_response,
                parse_warc,
                split_gzip_members,
                warc_files,
            )

            dw0 = parallelize_scan(
                load_table(spark, SF_DIR, "documents").select(
                    "doc_id", "text", "lang", "source"
                ),
                spark,
            )
            if n == 1:
                dw = dw0
            else:
                dw = dw0.withColumn(
                    "__copy", F.explode(F.sequence(F.lit(1), F.lit(n)))
                ).select(
                    (
                        F.col("doc_id")
                        + F.col("__copy").cast("long") * 10_000_000
                    ).alias("doc_id"),
                    "text",
                    "lang",
                    "source",
                )
            warc_path = os.path.join(
                tempfile.gettempdir(), "stress_staging", f"warc_{n}x"
            )

            def warc_encode():
                warc_files(
                    dw, docs_per_file=256, request_every=5
                ).write.mode("overwrite").parquet(warc_path)

            row["warc_encode"] = time_action(warc_encode)
            files_warc = spark.read.parquet(warc_path)

            def _warc_dec(batches):
                import pandas as pd

                for pdf in batches:
                    counts = []
                    for payload, cnt in zip(
                        pdf["payload"], pdf["block_rows"]
                    ):
                        n_resp = 0
                        for member in split_gzip_members(bytes(payload)):
                            for hdrs, rec in parse_warc(member):
                                if hdrs["warc-type"] != "response":
                                    continue
                                status, _hh, body = parse_http_response(rec)
                                if status != 200 or not body:
                                    raise ValueError("bad response record")
                                n_resp += 1
                        if n_resp != int(cnt):
                            raise ValueError("response-count drift")
                        counts.append(n_resp)
                    yield pd.DataFrame({"n": counts})

            def warc_decode():
                files_warc.mapInPandas(
                    _warc_dec, schema="n bigint"
                ).write.mode("overwrite").format("noop").save()

            row["warc_decode"] = time_action(warc_decode)

        if want("kafka"):
            # --- Kafka RecordBatch v2 spine (round 14): segment
            # encode (batch headers + CRC32C + zigzag records) →
            # parquet store → strict decode incl. the per-batch CRC
            # pass. Pure per-segment Python, no exchange — linear on
            # fixed cores or the claim is wrong. CRC32C is the
            # interpreter-bound hot loop, exactly like a broker-less
            # tiered-storage consumer.
            from etl_ch_destination_spark.sink.kafka import (
                kafka_segments,
                parse_segment,
            )

            ev_k0 = parallelize_scan(load_table(spark, SF_DIR, "events"), spark)
            ev_k = replicate_events(ev_k0, n)
            src_k = ev_k.select(
                F.expr("unix_millis(ts)").alias("ts_ms"),
                F.col("user_id").cast("string").cast("binary").alias("key"),
                F.concat(
                    F.col("event_id").cast("string"), F.lit("|"),
                    (F.col("value").cast("decimal(12,2)") * 100)
                    .cast("long").cast("string"),
                ).cast("binary").alias("value"),
                F.col("event_type").alias("hdr_src"),
            )
            k_path = os.path.join(
                tempfile.gettempdir(), "stress_staging", f"kafka_{n}x"
            )

            def kafka_encode():
                kafka_segments(
                    src_k, records_per_batch=512, batches_per_segment=8
                ).write.mode("overwrite").parquet(k_path)

            row["kafka_encode"] = time_action(kafka_encode)
            files_k = spark.read.parquet(k_path)

            def _kafka_dec(batches):
                import pandas as pd

                for pdf in batches:
                    counts = []
                    for payload, cnt in zip(
                        pdf["payload"], pdf["block_rows"]
                    ):
                        records = parse_segment(bytes(payload))
                        if len(records) != int(cnt):
                            raise ValueError("segment record-count drift")
                        counts.append(len(records))
                    yield pd.DataFrame({"n": counts})

            def kafka_decode():
                files_k.mapInPandas(
                    _kafka_dec, schema="n bigint"
                ).write.mode("overwrite").format("noop").save()

            row["kafka_decode"] = time_action(kafka_decode)

        if want("tlog"):
            # --- transaction-log replay spine (round 14): the
            # table-log family's scale axis is COMMIT COUNT, not data
            # volume (replay touches only the manifest). Generate a
            # churn history of 200×n commits (each removes one file
            # and adds two — the compaction-debt pattern), measure
            # (a) the relational full replay (scan_table_log's
            # table_log_snapshot) and (b) the checkpoint read path
            # (parquet state + empty tail). Replay must stay ~linear
            # in commits; the checkpoint read must stay FLAT — the
            # reason the checkpoint path exists.
            import json as _json

            from etl_ch_destination_spark.queries.sources_sinks import (
                table_log_snapshot,
            )

            n_commits = 200 * n
            tlog_dir = os.path.join(
                tempfile.gettempdir(), "stress_staging", f"tlog_{n}x", "_log"
            )
            os.makedirs(tlog_dir, exist_ok=True)

            def _stats(lo, hi):
                return _json.dumps({
                    "numRecords": 1000,
                    "minValues": {"o_orderkey": lo},
                    "maxValues": {"o_orderkey": hi},
                })

            for v in range(n_commits):
                actions = []
                if v > 0:
                    # churn: retire one of the previous commit's files
                    actions.append(_json.dumps(
                        {"remove": {"path": f"f-{2 * (v - 1)}",
                                    "dataChange": True}}))
                actions.append(_json.dumps({"add": {
                    "path": f"f-{2 * v}", "dataChange": True,
                    "stats": _stats(v * 10, v * 10 + 9)}}))
                actions.append(_json.dumps({"add": {
                    "path": f"f-{2 * v + 1}", "dataChange": True,
                    "stats": _stats(v * 10, v * 10 + 9)}}))
                with open(os.path.join(tlog_dir, "%020d.json" % v), "w") as f:
                    f.write("\n".join(actions) + "\n")

            def tlog_replay():
                table_log_snapshot(
                    spark, tlog_dir, n_commits - 1
                ).write.mode("overwrite").format("noop").save()

            row["tlog_commits"] = n_commits
            row["tlog_replay"] = time_action(tlog_replay)
            # checkpoint path: collapse the live set once, then read it
            ckpt_path = os.path.join(
                tempfile.gettempdir(), "stress_staging", f"tlog_{n}x",
                "ckpt.parquet",
            )
            table_log_snapshot(spark, tlog_dir, n_commits - 1).write.mode(
                "overwrite"
            ).parquet(ckpt_path)

            def tlog_checkpoint_read():
                spark.read.parquet(ckpt_path).write.mode(
                    "overwrite"
                ).format("noop").save()

            row["tlog_ckpt_read"] = time_action(tlog_checkpoint_read)

        results[str(n)] = row
        spark.catalog.clearCache()
        # Reclaim the factor's durable staging tables: standalone
        # stage() calls (pagerank/triangle/BFS seams) write one parquet
        # table each under stress_staging and nothing deletes them —
        # a 1/10/30/100 sweep otherwise accumulates tens of GB and the
        # 100× factor's shuffle then hits ENOSPC (observed round 10).
        import shutil

        shutil.rmtree(
            os.path.join(tempfile.gettempdir(), "stress_staging"),
            ignore_errors=True,
        )

    print(json.dumps(results))
    rc = 0
    # recall gate at the LARGEST factor: the approximate paths must
    # hold ≥0.9 of exact top-k as the corpus scales, or the scale
    # story is only a latency story.
    top = str(max(factors))
    # LSH holds the 0.9 product floor; IVF's floor on THIS fixture is
    # 0.5 (isotropic vectors — see the recall comment above).
    if "ann_recall_lsh" in results[top]:
        for key, floor in (
            ("ann_recall_lsh", 0.9),
            ("ann_recall_ivf", 0.5),
            ("ann_recall_ivfpq", 0.5),
        ):
            if results[top][key] < floor:
                print(
                    f"FAIL {key}@{top}x = {results[top][key]} < {floor}",
                    file=sys.stderr,
                )
                rc = 1

    # LINEARITY gate (VERDICT r5 #5 / r6 #3): between the two largest
    # measured factors, wall-clock for every scan/shuffle-bound spine
    # must grow at most linearly in rows × a 2.0 noise/log-term slack
    # (log factors: sort depth, CC round count, AQE re-planning). A
    # quadratic term (all-pairs join, unpartitioned sort) shows up as
    # ratio >> factor-ratio long before the slack matters: e.g. 30→100×
    # all-pairs costs 11× rows-ratio. Keys faster than 2 s at the top
    # factor are scheduling-overhead-bound — slope is meaningless
    # there, so they are exempt (recorded, not gated).
    GATED = (
        "q1", "join_agg", "neardup", "vocab_score", "ngram_novelty",
        "line_dedup", "substr_dedup", "cc", "pagerank", "triangles",
        "semdedup", "sim_exact", "sim_lsh", "bfs", "tri_approx",
        "sim_ivfpq", "linkpred", "stream_fbatch", "stream_session",
        "asof", "tdigest", "avro_encode", "avro_decode",
        "protobuf_encode", "protobuf_decode", "warc_encode", "warc_decode",
        "kafka_encode", "kafka_decode", "tlog_replay",
    )
    if len(factors) >= 2:
        f1, f2 = sorted(factors)[-2:]
        rows_ratio = f2 / f1
        for key in GATED:
            a, b = results[str(f1)].get(key), results[str(f2)].get(key)
            if a is None or b is None or b < 2.0 or a <= 0:
                continue
            ratio = b / a
            if ratio > rows_ratio * 2.0:
                print(
                    f"FAIL super-linear {key}: {f1}x={a}s -> {f2}x={b}s "
                    f"(ratio {ratio:.1f} > {rows_ratio:.1f}x rows * 2.0 slack)",
                    file=sys.stderr,
                )
                rc = 1
    # CC round-count gate: rounds must grow LOGARITHMICALLLY — allow
    # +3 rounds over the smaller factor, never proportionally.
    if len(factors) >= 2 and "cc_rounds" in results[str(max(factors))]:
        f1, f2 = sorted(factors)[-2:]
        r1 = results[str(f1)].get("cc_rounds")
        r2 = results[str(f2)].get("cc_rounds")
        if r1 is not None and r2 is not None and r2 > r1 + 3:
            print(
                f"FAIL cc_rounds grew {r1} -> {r2} between {f1}x and {f2}x "
                "(log-round claim violated)",
                file=sys.stderr,
            )
            rc = 1
    # streaming state-store gate (VERDICT r11 #6): disjoint user spaces
    # scale session state EXACTLY N×; a deviation means the state store
    # is either leaking (never evicting merged sessions) or dropping
    # state. And ingest throughput must not collapse: events/s at the
    # top factor holds ≥1/3 of the smaller factor's (the linearity
    # gate's slack, expressed in the spine's native unit).
    if len(factors) >= 2 and "stream_state_rows" in results[str(max(factors))]:
        f1, f2 = sorted(factors)[-2:]
        rows_ratio = f2 / f1
        s1 = results[str(f1)].get("stream_state_rows")
        s2 = results[str(f2)].get("stream_state_rows")
        if s1 and s2 and not (
            0.8 * rows_ratio <= s2 / s1 <= 1.2 * rows_ratio
        ):
            print(
                f"FAIL stream state rows grew {s1} -> {s2} between {f1}x "
                f"and {f2}x (expected ~{rows_ratio:.0f}x: disjoint user "
                "spaces scale session state exactly with rows)",
                file=sys.stderr,
            )
            rc = 1
        e1 = results[str(f1)].get("stream_fbatch_evps")
        e2 = results[str(f2)].get("stream_fbatch_evps")
        if e1 and e2 and e2 < e1 / 3:
            print(
                f"FAIL stream ingest collapsed: {e1} ev/s at {f1}x -> "
                f"{e2} ev/s at {f2}x (floor: 1/3)",
                file=sys.stderr,
            )
            rc = 1
        # r15 per-epoch amortization gate (VERDICT r14 #10): the
        # micro-batch COUNT is constant across factors, so the ~0.4 s
        # trigger/commit fixed cost per epoch must AMORTIZE as batches
        # grow — throughput must RISE with batch size, not merely
        # avoid collapse. Measured this round: 43.9k -> 279k -> 663k
        # ev/s at 1x/10x/30x (epoch wall 0.38 -> 0.60 -> 0.75 s for
        # 30x the rows); the 1.5 floor sits 1.6-4x under the measured
        # consecutive-factor ratios.
        if e1 and e2 and f2 / f1 >= 3 and e2 < e1 * 1.5:
            print(
                f"FAIL per-epoch overhead not amortizing: {e1} ev/s at "
                f"{f1}x -> {e2} ev/s at {f2}x (constant epoch count "
                "should make throughput rise >=1.5x per >=3x rows)",
                file=sys.stderr,
            )
            rc = 1
    # t-digest state-bound gate (round 13): the sketch's state must
    # stay ≤ |groups| × |shards| × δ AT EVERY factor — state growing
    # with rows instead of shards would mean the bucket rule leaks.
    for f in factors:
        c = results[str(f)].get("tdigest_centroids")
        bound = results[str(f)].get("tdigest_centroid_bound")
        if c is not None and bound is not None and c > bound:
            print(
                f"FAIL tdigest centroids {c} > bound {bound} at {f}x "
                "(sketch state must scale with shards, never rows)",
                file=sys.stderr,
            )
            rc = 1
    # BFS round-count gate: disjoint copies of the same fixture graph
    # have a copy-invariant multi-source diameter, so the convergence
    # loop must pay the SAME round count at every factor (±1 for
    # source-set mod-shift variation across copies). Proportional
    # growth means the loop is re-reaching already-settled nodes.
    if len(factors) >= 2 and "bfs_rounds" in results[str(max(factors))]:
        f1, f2 = sorted(factors)[-2:]
        r1 = results[str(f1)].get("bfs_rounds")
        r2 = results[str(f2)].get("bfs_rounds")
        if r1 is not None and r2 is not None and r2 > r1 + 1:
            print(
                f"FAIL bfs_rounds grew {r1} -> {r2} between {f1}x and {f2}x "
                "(copy-invariant diameter claim violated)",
                file=sys.stderr,
            )
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
