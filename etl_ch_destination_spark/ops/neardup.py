"""Near-duplicate detection: MinHash + LSH banding (SURVEY §2.10
`llm_dedup_near`; north-star "dedup").

Pipeline (all MLlib, JVM-side): whitespace tokenize → word n-gram
shingles → binary HashingTF (shingle set → sparse indicator vector) →
MinHashLSH with pinned seed → `approxSimilarityJoin` on Jaccard
distance.

Scale (100 TB): the LSH banding join generates CANDIDATE PAIRS ONLY —
documents sharing at least one minhash band bucket — never the all-
pairs cross product. Shuffle volume is bounded by bucket collision
counts; skewed buckets (boilerplate shingles) are split by AQE.
Determinism: seed pinned; recall on planted duplicates asserted in
tests/test_llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUM_FEATURES = 1 << 18


def near_duplicate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
    num_hash_tables: int = 5,
    max_jaccard_distance: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) with their estimated
    Jaccard distance. ``max_jaccard_distance`` = 1 − minimum similarity.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH, NGram, Tokenizer

    from etl_ch_destination_spark.catalog import parallelize_scan

    # One-split fixture scan would run the whole tokenize→shingle→TF
    # chain on a single task; no-op at real scale (many splits).
    base = parallelize_scan(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")),
        docs.sparkSession,
    )
    tokens = Tokenizer(inputCol="text", outputCol="tokens").transform(base)
    shingled = NGram(n=shingle_len, inputCol="tokens", outputCol="shingles").transform(tokens)
    # binary=True: shingle SET semantics (Jaccard is set-based)
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=NUM_FEATURES, binary=True
    )
    # Cache the featurized frame: it is read 3× (LSH fit, and BOTH
    # sides of the self approxSimilarityJoin) — without the cache the
    # tokenize/shingle/hash chain recomputes each time. At 100 TB this
    # becomes persist(DISK_ONLY) or a checkpoint to a staging table;
    # the shape (featurize once, join candidates only) is the same.
    feat = (
        tf.transform(shingled)
        .filter(F.col("shingles") != F.array())
        .select("id", "features")
        .persist()
    )
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed
    )
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, max_jaccard_distance, distCol="jaccard_dist")
    # NOTE: feat stays persisted until the session evicts it (LRU) —
    # unpersisting here would drop the cache before the returned lazy
    # plan ever runs. Callers owning the lifecycle can unpersist after
    # materializing.
    return (
        pairs.select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.col("jaccard_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
