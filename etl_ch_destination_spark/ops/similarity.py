"""Vector similarity search over embedding columns (SURVEY §2.10
`llm_sim_topk_exact` / `llm_sim_topk_ann`; north-star "similarity
search").

Two paths, mirroring how a 100 TB corpus is actually served:

- **Exact brute force** (`brute_force_topk`): the oracle-checkable
  baseline. The query set is broadcast (it is small by construction);
  candidates stream through a single narrow stage — no shuffle of the
  big side, no cartesian state. Cost is O(|queries| · |candidates|)
  FLOPs, which is the honest lower bound for exact search; use it for
  query sets, not all-pairs.
- **ANN via random-hyperplane LSH** (`ann_topk`): the scale path.
  BucketedRandomProjectionLSH hashes vectors into buckets; the join
  only scores collision candidates, pruning most of the corpus.
  Seeded → deterministic; recall vs the exact path is asserted ≥0.9
  in tests/test_llm.py.

All arithmetic is JVM-side codegen (`zip_with`/`aggregate` fold in
DOUBLE — float products are exact in double, and the sequential fold
order matches DuckDB's `list_sum(list_transform(...))`, keeping the
exact path hash-matchable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in DOUBLE (deterministic cross-engine)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = a·b / (|a|·|b|); IEEE-deterministic given equal folds."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k most similar
    candidate vectors (self-matches excluded).

    Returns (query_id, neighbor_id, cos_sim, rank). The query side is
    broadcast — candidates never shuffle, the scan stays one stage.
    Norms are hoisted to per-row columns (computed once per vector, not
    three dot products per pair) — the same `dot/(qn*cn)` float ops in
    the same order, so the result stays bit-identical to `cosine()`.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim",
            dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ann_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via BucketedRandomProjectionLSH on L2-normalized
    vectors (Euclidean distance on unit vectors is monotone in cosine:
    d² = 2 − 2·cos). Only bucket-collision pairs are scored — the
    pruning that makes 100 TB feasible. Deterministic under the pinned
    seed. Returns (query_id, neighbor_id, dist, rank).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    def normed(df: DataFrame, out_id: str) -> DataFrame:
        arr = F.col(vec_col)
        unit = F.transform(arr, lambda x: x.cast("double") / l2_norm(arr))
        return df.select(
            F.col(id_col).alias(out_id), array_to_vector(unit).alias("features")
        )

    qn = normed(queries, "query_id")
    cn = normed(candidates, "neighbor_id")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    )
    model = lsh.fit(cn)
    # threshold 2.0 covers the full unit sphere; pruning comes from
    # bucket collisions, not the radius.
    pairs = model.approxSimilarityJoin(cn, qn, 2.0, distCol="dist").select(
        F.col("datasetB.query_id").alias("query_id"),
        F.col("datasetA.neighbor_id").alias("neighbor_id"),
        F.col("dist"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
