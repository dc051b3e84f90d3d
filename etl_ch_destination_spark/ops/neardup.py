"""Near-duplicate detection: MinHash + LSH banding (SURVEY §2.10
`llm_dedup_near`; north-star "dedup").

Pure-DataFrame pipeline (whole-stage codegen end to end — no MLlib,
no UDFs, no persisted intermediates):

  split → word n-gram shingles → md5-derived 28-bit shingle hashes
  (set semantics) → H universal-hash permutations, min per permutation
  (the MinHash signature) → posexplode the signature into (table,
  minhash) band keys → self equi-join on the band key → exact Jaccard
  on the hashed shingle sets → threshold filter.

Scale (100 TB): the band equi-join generates CANDIDATE PAIRS ONLY —
documents agreeing on at least one of the H minhash values — never the
all-pairs cross product; shuffle volume is bounded by band-bucket
collision counts and skewed buckets (boilerplate-heavy docs) are split
by AQE. The featurized shingle sets (`hs`) feed THREE consumers (band
signatures, and both sides of the verify join), so `feat` is
``localCheckpoint(eager=False)``-ed: the md5/HOF chain runs once and
the three branches read the stored blocks instead of re-deriving it —
measured r5 at sf0.1: median 3.13→2.74 s and p95 3.23→2.78 s idle,
and under 16-core contention the p95 spread collapses (3.64→3.29 s),
closing the r4 driver-host p95 variance flag. The materialization goes
through ``ops/staging.stage``: localCheckpoint by default (not
fault-tolerant across executor loss), and the durable parquet
staging-table variant — same plan shape, executor-loss-safe — whenever
``spark.etl_ch.staging.dir`` is set, the 100 TB configuration.

Determinism + oracle: every step is exact integer / IEEE-double math on
md5-derived hashes, so DuckDB reproduces the full pipeline bit for bit
(see queries/llm_vectors.py `llm_dedup_near` oracle SQL) — this op is
hash-checked against the oracle, not rows-only. Recall on planted
duplicates is additionally asserted in tests/test_llm.py: a pair with
true Jaccard similarity s survives banding with prob 1 − (1 − s)^H
(H=5 ⇒ 0.97 at s=0.5, ≈1 at s≥0.8).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_ch_destination_spark.ops.staging import stage

# Mersenne prime 2^31 − 1: permutation modulus. Shingle hashes are 28
# bits (7 hex chars of md5), coefficients < 2^31, so a*h + b < 2^59 —
# exact in int64 in both Spark and DuckDB (no overflow divergence).
MINHASH_PRIME = 2147483647
HASH_HEX_CHARS = 7  # 28-bit shingle hashes


def perm_params(num_hash_tables: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for the H minhash permutations
    h_j(x) = (a_j·x + b_j) mod P. Shared by the Spark pipeline and the
    DuckDB oracle SQL so both engines compute identical signatures."""
    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, MINHASH_PRIME), rnd.randrange(0, MINHASH_PRIME))
        for _ in range(num_hash_tables)
    ]


def shingle_hashes(text: Column, shingle_len: int) -> Column:
    """Distinct md5-derived 28-bit hashes of the word ``shingle_len``-
    grams of ``text`` (split on single spaces — the fixture tokenizer
    shared with the simhash/ngram keys). Set semantics: Jaccard is
    computed on these hash sets."""
    toks = F.split(text, " ")
    grams = F.when(
        F.size(toks) >= shingle_len,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (shingle_len - 1)),
            lambda i: F.array_join(F.slice(toks, i, shingle_len), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(
        F.transform(
            grams,
            lambda s: F.conv(F.substring(F.md5(s), 1, HASH_HEX_CHARS), 16, 10).cast(
                "long"
            ),
        )
    )


def near_duplicate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
    num_hash_tables: int = 5,
    max_jaccard_distance: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) with their exact
    Jaccard distance over hashed shingle sets.
    ``max_jaccard_distance`` = 1 − minimum similarity.
    """
    from etl_ch_destination_spark.catalog import parallelize_scan

    # One-split fixture scan would run the whole md5/HOF chain on a
    # single task; repartition the RAW text (before the hash chain is
    # projected) so the compute lands after the exchange, spread across
    # tasks. No-op at real scale (many splits), and the identical
    # exchange subtree is deduplicated by ReuseExchange across the four
    # branches below.
    base = parallelize_scan(
        docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")),
        docs.sparkSession,
    )
    feat = base.select(
        "id", shingle_hashes(F.col("text"), shingle_len).alias("hs")
    ).filter(F.size("hs") > 0)
    # three consumers below (bands + both verify-join sides): compute
    # the md5/HOF featurize chain ONCE and serve stored blocks — see
    # the module docstring for measurements and the 100 TB variant
    feat = stage(feat, eager=False, label="neardup-feat")

    sig = F.array(
        *[
            F.array_min(
                F.transform("hs", lambda h: F.pmod(a * h + b, F.lit(MINHASH_PRIME)))
            )
            for (a, b) in perm_params(num_hash_tables, seed)
        ]
    )
    bands = feat.select("id", F.posexplode(sig).alias("band", "mh"))

    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            [F.col("x.band") == F.col("y.band"), F.col("x.mh") == F.col("y.mh")],
        )
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()  # a pair may collide in several bands
    )

    # r15 (guide §2.3 "shuffle fewer bytes", VERDICT r14 #4): the exact
    # verify only consumes |A∩B| and the set SIZES, and the shingle
    # hashes are 28-bit by construction (HASH_HEX_CHARS = 7 hex chars),
    # so the arrays attached to the candidate pairs are carried as
    # array<int> — half the bytes of the original array<long> on every
    # exchange/broadcast that ships them (fa, fb, and hs_a riding the
    # id_b exchange at cluster scale). Values < 2^28 make the cast
    # exact; intersection size over equal values is unchanged, so
    # jaccard_dist divides the identical integers (pinned by
    # tests/test_r15_optimizations.py + the key's full hash parity).
    #
    # Measured and REJECTED (guide §1.1): a size-only candidate
    # prefilter (1 − min|sz|/max|sz| ≤ max_dist before attaching the
    # arrays — a provably lossless necessary condition under monotone
    # IEEE division). On this corpus it kills only 3.4% of candidate
    # pairs (documents are length-homogeneous) while costing two extra
    # joins: interleaved same-session A/B measured 3.01 → 3.39 s
    # median at sf0.1. Worth revisiting only for corpora with heavy
    # length skew, where the kill rate is what makes it pay.
    hs_int = F.col("hs").cast("array<int>")
    fa = feat.select(F.col("id").alias("id_a"), hs_int.alias("hs_a"))
    fb = feat.select(F.col("id").alias("id_b"), hs_int.alias("hs_b"))
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn(
            "jaccard_dist",
            F.lit(1.0) - inter.cast("double") / union.cast("double"),
        )
        .filter(F.col("jaccard_dist") <= max_jaccard_distance)
        .select("id_a", "id_b", "jaccard_dist")
    )
