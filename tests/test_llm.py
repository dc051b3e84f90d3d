"""LLM-pipeline gates (SURVEY §5.3): ANN recall vs exact ≥ 0.9,
planted-duplicate dedup (exact and near), multimodal feature
correctness, log-idf variant sanity."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _documents(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table

    return load_table(spark, sf_dir, "documents")


def test_ann_recall_vs_exact(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.ops.similarity import ann_topk, brute_force_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    k = 5
    exact = brute_force_topk(emb, queries, k=k)
    ann = ann_topk(emb, queries, k=k)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ann_pairs = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    recall = len(exact_pairs & ann_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"ANN recall {recall:.3f} < 0.9"


def test_exact_dedup_removes_planted_duplicates(spark, sf_dir):
    from etl_ch_destination_spark.ops.dedup import latest_by_key

    docs = _documents(spark, sf_dir)
    planted = docs.limit(10).withColumn("doc_id", F.col("doc_id") + 10_000_000)
    corpus = docs.unionByName(planted)
    hashed = corpus.withColumn(
        "content_hash", F.md5(F.lower(F.trim(F.col("text"))).cast("binary"))
    )
    deduped = latest_by_key(hashed, ["content_hash"], [F.asc("doc_id")])
    assert deduped.count() == docs.count()
    # the canonical (lowest-id) copy survives, never the planted one
    assert deduped.filter(F.col("doc_id") >= 10_000_000).count() == 0


def test_near_dedup_finds_planted_near_duplicates(spark, sf_dir):
    """Perturbed copies (one appended token) must collide in minhash
    bands with their originals at recall ≥ 0.9."""
    from etl_ch_destination_spark.ops.neardup import near_duplicate_pairs

    docs = _documents(spark, sf_dir)
    originals = docs.orderBy("doc_id").limit(10)
    perturbed = originals.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzyzx")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(perturbed)
    pairs = near_duplicate_pairs(corpus, max_jaccard_distance=0.5)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    planted = {(r["doc_id"], r["doc_id"] + 10_000_000) for r in originals.collect()}
    recall = len(planted & found) / len(planted)
    assert recall >= 0.9, f"near-dup recall {recall:.2f} < 0.9"


def test_multimodal_features_match_reference(spark, sf_dir):
    from etl_ch_destination_spark.ops.multimodal import (
        decode_image,
        extract_features,
        synthesize_binary,
    )

    docs = _documents(spark, sf_dir).limit(20)
    feats = {r["doc_id"]: r for r in extract_features(synthesize_binary(docs)).collect()}
    for r in docs.collect():
        raw = r["text"].encode("utf-8")
        f = feats[r["doc_id"]]
        assert f["n_bytes"] == len(raw)
        assert f["first_byte"] == raw[0]
        assert f["content_md5"] == hashlib.md5(raw).hexdigest()
    import pytest

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_text_stats_validate_fixture_n_chars(spark, sf_dir):
    from etl_ch_destination_spark.queries.llm_text import llm_text_stats

    bad = llm_text_stats(spark, sf_dir).filter(~F.col("n_chars_ok")).count()
    assert bad == 0


def test_log_idf_variant_is_finite_and_positive(spark, sf_dir):
    """The classic tf·ln(N/df) weighting (hashed query uses the
    rational surrogate — llm_text.py docstring)."""
    docs = _documents(spark, sf_dir)
    toks = docs.select("lang", "doc_id", F.explode(F.split("text", " ")).alias("term"))
    tstats = toks.groupBy("lang", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df")
    )
    nl = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tstats.join(F.broadcast(nl), "lang").withColumn(
        "tfidf_log", F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
    )
    assert scored.filter(F.col("tfidf_log") < 0).count() == 0
    assert scored.filter(F.isnan("tfidf_log") | F.col("tfidf_log").isNull()).count() == 0
