"""Round-14 continuation key gates: deterministic epoch shuffle,
WARC ingest, Delta CDF, destination-side log writer, Iceberg
positional deletes, and the rest of the late-round batch."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------------
# llm_dataset_shuffle
# ------------------------------------------------------------------


def _brute_shuffle(doc_ids, epochs, shards):
    """Pure-python replay of the hash-order epoch shuffle."""
    def shard_of(d):
        h = hashlib.md5(f"{d}:dshuf".encode()).hexdigest()
        return int(h[:7], 16) % shards

    out = {}
    for e in range(epochs):
        per_shard = {}
        for d in doc_ids:
            per_shard.setdefault(shard_of(d), []).append(d)
        for s, docs in per_shard.items():
            docs = sorted(
                docs, key=lambda d: hashlib.md5(f"{e}:{d}".encode()).hexdigest()
            )
            out[(e, s)] = docs
    return out


def test_dataset_shuffle_matches_brute_force(spark, sf_dir):
    from etl_ch_destination_spark.queries.llm_training import (
        DSHUF_EPOCHS,
        DSHUF_SHARDS,
        llm_dataset_shuffle,
    )

    doc_ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    brute = _brute_shuffle(doc_ids, DSHUF_EPOCHS, DSHUF_SHARDS)
    got = {
        (r["epoch"], r["shard"]): r
        for r in llm_dataset_shuffle(spark, sf_dir).collect()
    }
    assert set(got) == set(brute)
    for (e, s), docs in brute.items():
        row = got[(e, s)]
        assert row["n_docs"] == len(docs)
        assert row["first_doc"] == docs[0]
        assert row["order_checksum"] == sum(
            (i + 1) * d for i, d in enumerate(docs)
        )
        pos0 = {d: i for i, d in enumerate(brute[(0, s)])}
        disp = sum(abs(i - pos0[d]) for i, d in enumerate(docs)) / len(docs)
        assert row["mean_abs_disp"] == pytest.approx(disp, abs=1e-12)


def test_dataset_shuffle_epochs_actually_reshuffle(spark, sf_dir):
    """Epoch 0 displacement is exactly 0; later epochs genuinely move
    documents (mean displacement well above zero on every shard), and
    shard membership is epoch-invariant (n_docs constant per shard)."""
    from etl_ch_destination_spark.queries.llm_training import llm_dataset_shuffle

    rows = llm_dataset_shuffle(spark, sf_dir).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], {})[r["epoch"]] = r
    for shard, eps in by_shard.items():
        ns = {e: r["n_docs"] for e, r in eps.items()}
        assert len(set(ns.values())) == 1, f"shard {shard} membership drifted"
        assert eps[0]["mean_abs_disp"] == 0.0
        for e in (1, 2):
            # a uniform random permutation of n items displaces ~n/3
            assert eps[e]["mean_abs_disp"] > ns[e] / 10.0
            assert eps[e]["order_checksum"] != eps[0]["order_checksum"]
