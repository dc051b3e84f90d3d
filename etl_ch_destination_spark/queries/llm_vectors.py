"""SURVEY §2.10 — LLM-pipeline vector/binary operators
(llm_sim_topk_exact, llm_sim_topk_ann, llm_dedup_near,
llm_multimodal_ingest).

North-star coverage (BASELINE.json): similarity search (exact oracle
baseline + LSH scale path), near-duplicate detection (MinHash+LSH
banding), multimodal binary columns (Arrow-batched feature
extraction). Scale reasoning lives in the ops modules
(ops/similarity.py, ops/neardup.py, ops/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.ops.multimodal import (
    extract_features,
    resize_image,
    sample_frames,
    synthesize_binary,
)
from etl_ch_destination_spark.ops.neardup import (
    HASH_HEX_CHARS,
    MINHASH_PRIME,
    near_duplicate_pairs,
    perm_params,
)
from etl_ch_destination_spark.ops.similarity import ann_topk, brute_force_topk, ivf_topk
from etl_ch_destination_spark.registry import query

TOPK = 5


@query(
    "llm_sim_topk_exact",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id % 10 = 0),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, 65),
               i -> CAST(q.qv[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, 65),
                  i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(range(1, 65),
                  i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE))))
               ) AS cos_sim
      FROM q, embeddings c
      WHERE c.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {TOPK}
    """,
)
def llm_sim_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k (ops/similarity.brute_force_topk): every 10th
    vector queries the full corpus; broadcast query side, candidates
    never shuffle. Double-precision sequential folds match DuckDB's
    list_sum(list_transform(...)) bit for bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    return brute_force_topk(emb, queries, k=TOPK)


@query("llm_sim_topk_ann")  # approximate — rows-only; recall gate in tests/test_llm.py
def llm_sim_topk_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via BucketedRandomProjectionLSH bucket pruning
    (ops/similarity.ann_topk), seed pinned. Rows-only in the driver
    gate (LSH output is approximate by construction); recall ≥ 0.9 vs
    the exact path is the pytest gate."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    return ann_topk(emb, queries, k=TOPK)


@query("llm_sim_topk_ivf")  # approximate — rows-only; exactness/recall gates in tests/test_llm.py
def llm_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via IVF inverted lists (ops/similarity.ivf_topk):
    seeded KMeans build, n_probe=4-of-16 cluster pruning per query —
    the partition-pruning ANN layout complementing the LSH variant.
    Rows-only in the driver gate; tests assert n_probe=n_clusters ≡
    brute force plus a recall floor for the pruned form."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    return ivf_topk(emb, queries, k=TOPK)


_NEARDUP_PERMS = ", ".join(
    f"({j}, {a}, {b})" for j, (a, b) in enumerate(perm_params(5, 42))
)


@query(
    "llm_dedup_near",
    f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    f AS (
      SELECT doc_id,
             list_distinct(list_transform(
               list_transform(range(1, len(toks) - 1),
                 i -> array_to_string(list_slice(toks, i, i + 2), ' ')),
               s -> CAST(('0x' || substr(md5(s), 1, {HASH_HEX_CHARS})) AS BIGINT))) AS hs
      FROM w WHERE len(toks) >= 3
    ),
    b AS (
      SELECT doc_id, p.j,
             list_min(list_transform(hs, h -> (p.a * h + p.b) % {MINHASH_PRIME})) AS mh
      FROM f CROSS JOIN (VALUES {_NEARDUP_PERMS}) AS p(j, a, b)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM b x JOIN b y ON x.j = y.j AND x.mh = y.mh AND x.doc_id < y.doc_id
    )
    SELECT id_a, id_b, jaccard_dist FROM (
      SELECT id_a, id_b,
             1.0 - CAST(len(list_intersect(fa.hs, fb.hs)) AS DOUBLE)
                 / CAST(len(fa.hs) + len(fb.hs)
                        - len(list_intersect(fa.hs, fb.hs)) AS DOUBLE) AS jaccard_dist
      FROM cand JOIN f fa ON cand.id_a = fa.doc_id
                JOIN f fb ON cand.id_b = fb.doc_id
    ) WHERE jaccard_dist <= 0.8
    """,
)
def llm_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash+LSH banding
    (ops/neardup.near_duplicate_pairs): word-trigram shingles hashed to
    md5-derived 28-bit values, 5 universal-hash permutations, band
    equi-join, exact hashed-set Jaccard ≤ 0.8, pinned seed. The whole
    pipeline is exact integer/IEEE math, so the DuckDB oracle replays
    it bit for bit — full hash gate, no longer rows-only. Planted-
    duplicate recall additionally asserted in tests/test_llm.py."""
    d = load_table(spark, sf_dir, "documents")
    pairs = near_duplicate_pairs(d, max_jaccard_distance=0.8)
    return pairs.select("id_a", "id_b", "jaccard_dist")


@query(
    "llm_multimodal_ingest",
    """
    SELECT doc_id,
           length(text) AS n_bytes,
           ascii(substring(text, 1, 1)) AS first_byte,
           md5(text) AS content_md5,
           'text/synthetic' AS modality
    FROM documents
    """,
)
def llm_multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal ingest plumbing: synthesize binary payloads from
    documents.text (no binary fixture exists), run the Arrow-batched
    mapInPandas feature extractor (ops/multimodal.py), join back the
    metadata struct. The oracle mirrors the deterministic features
    (fixture text is ASCII, so char length == byte length and
    ascii(first char) == first byte)."""
    d = load_table(spark, sf_dir, "documents")
    binary = synthesize_binary(d)
    feats = extract_features(binary)
    meta = binary.select("doc_id", F.col("meta.modality").alias("modality"))
    return feats.join(meta, "doc_id").select(
        "doc_id", "n_bytes", "first_byte", "content_md5", "modality"
    )


RESIZE_W = RESIZE_H = 64  # target dims for the resize stage (4096-byte payload)


@query(
    "llm_multimodal_resize",
    f"""
    SELECT doc_id,
           {RESIZE_W} AS width, {RESIZE_H} AS height,
           length(text) AS orig_bytes,
           {RESIZE_W * RESIZE_H} AS n_bytes,
           md5(substr(repeat(text, CAST(ceil({RESIZE_W * RESIZE_H}.0 / length(text)) AS BIGINT)),
                      1, {RESIZE_W * RESIZE_H})) AS content_md5
    FROM documents
    """,
)
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize stage plumbing (ops/multimodal.resize_image):
    Arrow-batched mapInPandas, decode/resample stubbed as a
    deterministic byte-cycle to the exact target payload size. The
    hashed query projects scalar digests of the resized payload; the
    oracle reproduces the cycle with repeat()+substr() (fixture text is
    ASCII, so char ops == byte ops)."""
    d = load_table(spark, sf_dir, "documents")
    resized = resize_image(synthesize_binary(d), RESIZE_W, RESIZE_H)
    return resized.select(
        "doc_id",
        "width",
        "height",
        "orig_bytes",
        F.octet_length("content").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


FRAME_BYTES = 64
FRAME_EVERY = 10


@query(
    "llm_multimodal_frames",
    f"""
    SELECT doc_id,
           CAST(unnest(range(0, length(text) // {FRAME_BYTES}, {FRAME_EVERY})) AS INT)
             AS frame_idx,
           {FRAME_BYTES} AS frame_bytes
    FROM documents
    """,
)
def llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing (ops/multimodal.sample_frames):
    payload treated as fixed-size frames, every-Nth kept, exploded
    1:N through mapInPandas — the demux/decode step is the stub, the
    row-explosion shape is real. Hashed form keeps (doc_id, frame_idx,
    frame_bytes); frame payload digests are covered by the pytest
    round-trip instead (binary column stays out of the driver hash)."""
    d = load_table(spark, sf_dir, "documents")
    frames = sample_frames(synthesize_binary(d), FRAME_BYTES, FRAME_EVERY)
    return frames.select(
        "doc_id", "frame_idx", F.octet_length("frame").alias("frame_bytes")
    )
