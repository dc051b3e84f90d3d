"""SURVEY §2.10b extension — corpus-statistics operators for the
training-data pipeline (round 4 additions beyond the 166-key contract).

North-star coverage (BASELINE.json): unigram-frequency quality
signals, cross-source priority dedup, embedding quantization for
storage/serving egress, and sequence-length bucketing for batch-shape
planning. Every key here carries a full DuckDB hash oracle.

Scale notes (100 TB): `llm_word_rarity` is the only multi-shuffle op
(corpus vocabulary build + join back); the rest are map-side or a
single hash aggregate. See each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.ops.staging import StagingPipeline
from etl_ch_destination_spark.registry import query

# llm_length_buckets: fixed-width word-count buckets (whitespace tokens)
BUCKET_WIDTH = 16

# llm_embedding_quantize: symmetric int8 range
Q_LEVELS = 127


@query(
    "llm_word_rarity",
    """
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents WHERE length(text) > 0
    ),
    vocab AS (
      SELECT word, COUNT(*) AS n FROM w GROUP BY word
    )
    SELECT w.doc_id,
           COUNT(*) AS n_words,
           MIN(v.n) AS min_count,
           CAST(SUM(v.n) AS BIGINT) AS sum_count,
           CAST(SUM(v.n) AS DOUBLE) / COUNT(*) AS avg_count
    FROM w JOIN vocab v USING (word)
    GROUP BY w.doc_id
    """,
)
def llm_word_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency rarity profile per document — the integer-exact
    core of a CCNet-style unigram-LM quality filter: build the corpus
    vocabulary (word -> count), join it back onto each document's
    words, and report the rarest word's corpus count plus the mean
    corpus count of the document's words. Documents full of hapax
    tokens (min_count = 1, low avg_count) are OCR noise / mojibake
    candidates; documents of only ultra-common words are boilerplate.
    All statistics are integer aggregates with one final IEEE double
    division, so the oracle hash-matches exactly (no logs — the
    log-prob variant trades bit-stability across engines for no extra
    signal on a rank filter).

    Plan shape: explode words (the one fan-out, same budget as
    llm_tfidf_terms) → hash-aggregate vocabulary (1 shuffle, partial
    map-side) → shuffle equi-join exploded words to vocabulary on
    `word` → hash-aggregate per doc_id (1 shuffle). Zipf helps twice
    at 100 TB: the vocabulary is tiny relative to the corpus (tens of
    millions of rows at web scale — broadcastable after a
    document-frequency floor), and AQE's skew split handles the
    ultra-hot stopword keys in the join.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    vocab = w.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    return (
        w.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.min("n").alias("min_count"),
            F.sum("n").alias("sum_count"),
            (F.sum("n").cast("double") / F.count(F.lit(1))).alias("avg_count"),
        )
    )


@query(
    "llm_unigram_logprob",
    """
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents WHERE length(text) > 0
    ),
    tok AS (
      SELECT doc_id, word, COUNT(*) AS m FROM w GROUP BY doc_id, word
    ),
    vocab AS (
      SELECT word, CAST(SUM(m) AS BIGINT) AS n FROM tok GROUP BY word
    ),
    total AS (
      SELECT CAST(SUM(n) AS BIGINT) AS corpus_n FROM vocab
    ),
    scored AS (
      SELECT word, n,
             CAST(length(format('{:b}', total.corpus_n // n)) - 1 AS BIGINT)
               AS bits
      FROM vocab, total
    )
    SELECT t.doc_id,
           CAST(SUM(t.m) AS BIGINT) AS n_words,
           CAST(SUM(t.m * s.bits) AS BIGINT) AS sum_bits,
           CAST(SUM(t.m * s.bits) AS DOUBLE) / SUM(t.m) AS bits_per_word
    FROM tok t JOIN scored s USING (word)
    GROUP BY t.doc_id
    """,
)
def llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal per document — the CCNet/KenLM-style
    perplexity-proxy quality filter: train the maximum-likelihood
    unigram model on the corpus itself (p(w) = n_w / N), then score
    each document's mean per-word code length. Boilerplate of
    ultra-common words scores low, mojibake/hapax soup scores high;
    natural text sits in the middle band a filter keeps.

    Determinism policy: surprisal is quantized to WHOLE BITS —
    bits_w = floor(log2(N / n_w)) — computed entirely in integers as
    bitlen(N div n_w) - 1 (binary-string length; the identity
    floor(log2(N/n)) = floor(log2(floor(N/n))) holds for every
    q = N div n >= 1 since q <= N/n < q+1 <= 2^(bitlen(q))). A probe
    showed Spark's JVM `ln` drifts 1 ulp from DuckDB/glibc on some
    inputs, so the float form of this score cannot hash-match across
    engines; the whole-bit form preserves the filter's ordering at
    ~0.5-bit quantization while keeping the oracle exact (integer
    sums + one final IEEE double division). llm_word_rarity carries
    the complementary sub-bit-resolution signal (raw corpus counts).

    Plan shape: 4 hash shuffles at the fleet cap — (doc,word)
    multiplicity agg, vocabulary agg, join-back on word, per-doc agg.
    The corpus total N is a separate map-side count over the documents
    scan (partial agg + single-partition exchange, no hash shuffle)
    broadcast condition-free onto the tiny VOCABULARY — 1 row × vocab,
    the rpt_idle_customers scalar pattern, allow-listed in the plan
    audit; never a data×data NLJ. At 100 TB the scored vocabulary
    after a document-frequency floor is ~10^7 rows — broadcastable,
    which deletes the join-back shuffle; AQE splits the stopword skew
    either way."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tok = w.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("m"))
    vocab = tok.groupBy("word").agg(F.sum("m").alias("n"))
    total = d.agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("corpus_n")
    )
    scored = vocab.crossJoin(F.broadcast(total)).select(
        "word",
        (F.length(F.conv(F.expr("corpus_n div n"), 10, 2)) - 1)
        .cast("bigint")
        .alias("bits"),
    )
    return (
        tok.join(scored, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_words"),
            F.sum(F.col("m") * F.col("bits")).alias("sum_bits"),
            (
                F.sum(F.col("m") * F.col("bits")).cast("double") / F.sum("m")
            ).alias("bits_per_word"),
        )
    )


@query(
    "llm_cross_dedup",
    """
    WITH h AS (
      SELECT doc_id, source, md5(lower(trim(text))) AS content_hash
      FROM documents
    ),
    g AS (
      SELECT content_hash, COUNT(*) AS n_copies,
             COUNT(DISTINCT source) AS n_sources
      FROM h GROUP BY content_hash
    ),
    r AS (
      SELECT doc_id, source, content_hash,
             ROW_NUMBER() OVER (PARTITION BY content_hash
                                ORDER BY source, doc_id) AS rn
      FROM h
    )
    SELECT r.doc_id, r.source, r.content_hash, g.n_copies, g.n_sources
    FROM r JOIN g USING (content_hash)
    WHERE r.rn = 1
    """,
)
def llm_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source priority dedup — when the same text arrives from
    several sources (curated dump vs web crawl), keep exactly one copy
    from the *preferred* source rather than an arbitrary one, and
    report how many copies/sources it shadowed. Here priority is the
    lexicographic source rank (deterministic stand-in; a production
    pipeline broadcast-joins a tiny (source, priority) table — the
    plan shape is identical), tie-broken by doc_id so survivorship is
    a total order (SURVEY §4.2 determinism policy).

    Plan shape: one shuffle on the 128-bit content hash (uniform, no
    skew) feeding BOTH the row_number window and the per-hash copy
    counts — Spark computes the counts as window aggregates over the
    same partitioning, so the exchange is reused and no second
    shuffle or self-join materializes (the oracle uses the
    groupBy+join form; same values). Survivor selection is
    window-rank, never bare dropDuplicates."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select(
        "doc_id", "source", F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash")
    )
    wp = Window.partitionBy("content_hash")
    w = wp.orderBy("source", "doc_id")
    ranked = h.select(
        "doc_id",
        "source",
        "content_hash",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n_copies"),
        F.size(F.collect_set("source").over(wp)).alias("n_sources"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "doc_id",
        "source",
        "content_hash",
        F.col("n_copies").cast("bigint").alias("n_copies"),
        F.col("n_sources").cast("bigint").alias("n_sources"),
    )


@query(
    "llm_embedding_quantize",
    f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    m AS (
      SELECT vec_id, e,
             list_reduce(list_transform(e, x -> abs(x)),
                         (a, b) -> greatest(a, b)) AS absmax
      FROM v
    ),
    q AS (
      SELECT vec_id, e, absmax,
             absmax / {Q_LEVELS} AS scale,
             list_transform(e, x -> greatest(-{Q_LEVELS}, least({Q_LEVELS},
               CAST(floor(x / (absmax / {Q_LEVELS}) + 0.5) AS BIGINT)))) AS qv
      FROM m WHERE absmax > 0
    )
    SELECT vec_id, absmax, scale,
           CAST(list_sum(qv) AS BIGINT) AS q_sum,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
           list_reduce(
             list_transform(range(1, len(e) + 1),
               i -> (e[i] - qv[i] * scale) * (e[i] - qv[i] * scale)),
             (a, b) -> a + b) AS sq_err
    FROM q
    """,
)
def llm_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column — the
    storage/serving egress step of an embedding pipeline (4× smaller
    than float32, what a vector store actually ingests). Per vector:
    absmax scale = max|v|/127, quantized q_i = clamp(floor(v_i/scale
    + 0.5), ±127) (explicit floor(x+0.5) so both engines round
    identically — no engine-native round() half-even drift), plus the
    reconstruction squared error as the quality audit.

    All arithmetic is per-row left-to-right array folds in double
    precision — deterministic on both engines, so the oracle
    hash-matches bit for bit (same precedent as llm_sim_topk_exact's
    dot products). Zero vectors (absmax = 0) are excluded on both
    sides rather than special-cased to a 0/0 NaN.

    Plan shape: ZERO-shuffle map-side codegen over the embeddings
    scan; at 100 TB this fuses with the parquet scan and writes
    straight to the sink. The int8 payload itself would be
    `transform(...) cast array<tinyint>` into the Native/RowBinary
    encoder (sink/native.py handles Array(Int8) via the same offsets
    layout)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    absmax = F.aggregate(
        F.transform(e, lambda x: F.abs(x)), F.lit(0.0), lambda a, b: F.greatest(a, b)
    )
    base = emb.select("vec_id", e.alias("e"), absmax.alias("absmax")).filter(
        F.col("absmax") > 0
    )
    scale = F.col("absmax") / Q_LEVELS
    qv = F.transform(
        F.col("e"),
        lambda x: F.greatest(
            F.lit(-Q_LEVELS),
            F.least(F.lit(Q_LEVELS), F.floor(x / scale + 0.5).cast("bigint")),
        ),
    )
    q = base.select("vec_id", "e", "absmax", scale.alias("scale"), qv.alias("qv"))
    sq_err = F.aggregate(
        F.zip_with(
            F.col("e"),
            F.col("qv"),
            lambda x, qi: (x - qi * F.col("scale")) * (x - qi * F.col("scale")),
        ),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    return q.select(
        "vec_id",
        "absmax",
        "scale",
        F.aggregate(F.col("qv"), F.lit(0).cast("bigint"), lambda a, b: a + b).alias(
            "q_sum"
        ),
        F.aggregate(
            F.transform(F.col("qv"), lambda x: F.abs(x)),
            F.lit(0).cast("bigint"),
            lambda a, b: a + b,
        ).alias("q_l1"),
        sq_err.alias("sq_err"),
    )


@query(
    "llm_length_buckets",
    f"""
    WITH t AS (
      SELECT lang,
             len(string_split(text, ' ')) AS nw
      FROM documents WHERE length(text) > 0
    )
    SELECT lang,
           CAST(nw // {BUCKET_WIDTH} AS BIGINT) AS bucket,
           CAST(nw // {BUCKET_WIDTH} AS BIGINT) * {BUCKET_WIDTH} AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(SUM(nw) AS BIGINT) AS total_words,
           MIN(nw) AS min_words,
           MAX(nw) AS max_words
    FROM t
    GROUP BY lang, bucket
    """,
)
def llm_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length histogram per language, fixed {BUCKET_WIDTH}-word
    buckets — the batch-shape / curriculum planning input: how much
    padding a naive batcher wastes per bucket, where to cut
    length-grouped batches, and what llm_sequence_pack's budget should
    be. Integer-only arithmetic → exact oracle.

    Plan shape: map-side bucket id fused into the scan, then ONE
    partial+final hash aggregate on (lang, bucket) — cardinality is
    tiny (langs × max_len/{BUCKET_WIDTH}) so the reduce side is
    negligible at any scale."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    nw = F.size(F.split("text", " "))
    t = d.select("lang", nw.alias("nw"))
    return (
        t.withColumn("bucket", F.floor(F.col("nw") / BUCKET_WIDTH).cast("bigint"))
        .groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nw").alias("total_words"),
            F.min("nw").alias("min_words"),
            F.max("nw").alias("max_words"),
        )
        .select(
            "lang",
            "bucket",
            (F.col("bucket") * BUCKET_WIDTH).alias("bucket_lo"),
            "n_docs",
            "total_words",
            "min_words",
            "max_words",
        )
    )


# llm_eval_split: hash-threshold boundaries (fractions of the 28-bit
# md5 uniform) — train/valid/test = 80/10/10
SPLIT_DENOM = 268435456.0  # 16^7: exact power of two under the 28-bit hash
SPLIT_TRAIN = 0.8
SPLIT_VALID = 0.9


@query(
    "llm_eval_split",
    f"""
    WITH assigned AS (
      SELECT source,
             CASE
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split1'), 1, 7))
                    AS BIGINT) / {SPLIT_DENOM!r} < {SPLIT_TRAIN!r} THEN 'train'
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split1'), 1, 7))
                    AS BIGINT) / {SPLIT_DENOM!r} < {SPLIT_VALID!r} THEN 'valid'
               ELSE 'test'
             END AS split
      FROM documents
    ),
    g AS (
      SELECT source, split, COUNT(*) AS n_docs
      FROM assigned GROUP BY source, split
    )
    SELECT source, split, n_docs,
           CAST(n_docs AS DOUBLE)
             / SUM(n_docs) OVER (PARTITION BY source) AS frac
    FROM g
    """,
)
def llm_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment (80/10/10) by hash
    thresholding, reported as the per-source stratification audit a
    pipeline runs before training: doc counts and realized fractions
    per (source, split). The draw is a pure function of doc_id (same
    28-bit md5-uniform construction as llm_mixture_sample, different
    salt): reproducible across reruns, cluster sizes, partitionings,
    and engines — no RNG, so the oracle replays it bit for bit — and
    adding documents never reassigns existing ones (the property that
    keeps eval sets stable across corpus refreshes).

    Plan shape: map-side assignment fused into the scan, ONE hash
    shuffle on (source, split) (cardinality = sources x 3), and the
    per-source share as a window sum over the same tiny frame. At
    100 TB the assignment column composes with the other map-side
    filters; only the count frame ever shuffles."""
    d = load_table(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split1"))), 1, 7),
        16,
        10,
    ).cast("bigint") / F.lit(SPLIT_DENOM)
    split = (
        F.when(u < SPLIT_TRAIN, "train")
        .when(u < SPLIT_VALID, "valid")
        .otherwise("test")
    )
    g = (
        d.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("source")
    return g.select(
        "source",
        "split",
        "n_docs",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w)).alias("frac"),
    )


# rpt_training_mixture quality thresholds — same rules as
# llm_quality_score (min length, stopword cap, diversity floor)
TM_MIN_WORDS = 50
TM_MAX_STOP = 0.3
TM_MIN_LEX = 0.1


@query(
    "rpt_training_mixture",
    f"""
    WITH base AS (
      SELECT doc_id, source,
             md5(lower(trim(text))) AS content_hash,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             len(list_filter(string_split(text, ' '),
                             x -> x IN ('the', 'a', 'of', 'and', 'to')))
               AS n_stop,
             CASE
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split1'), 1, 7))
                    AS BIGINT) / {SPLIT_DENOM!r} < {SPLIT_TRAIN!r} THEN 'train'
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split1'), 1, 7))
                    AS BIGINT) / {SPLIT_DENOM!r} < {SPLIT_VALID!r} THEN 'valid'
               ELSE 'test'
             END AS split
      FROM documents
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
      FROM base
    ),
    survivors AS (
      SELECT *,
             CASE WHEN n_words >= {TM_MIN_WORDS}
                   AND CAST(n_stop AS DOUBLE) / n_words <= {TM_MAX_STOP!r}
                   AND CAST(n_distinct AS DOUBLE) / n_words >= {TM_MIN_LEX!r}
                  THEN 1 ELSE 0 END AS q
      FROM ranked WHERE rn = 1
    ),
    raw AS (
      SELECT source, COUNT(*) AS n_raw FROM base GROUP BY source
    ),
    agg AS (
      SELECT source,
             COUNT(*) AS n_dedup,
             CAST(SUM(q) AS BIGINT) AS n_quality,
             CAST(SUM(CASE WHEN q = 1 AND split = 'train' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_train,
             CAST(SUM(CASE WHEN q = 1 AND split = 'valid' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_valid,
             CAST(SUM(CASE WHEN q = 1 AND split = 'test' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_test,
             CAST(SUM(CASE WHEN q = 1 AND split = 'train' THEN n_words ELSE 0 END)
                  AS BIGINT) AS train_words
      FROM survivors GROUP BY source
    )
    SELECT raw.source, raw.n_raw, agg.n_dedup, agg.n_quality,
           agg.n_train, agg.n_valid, agg.n_test, agg.train_words
    FROM raw JOIN agg USING (source)
    """,
)
def rpt_training_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-curation FUNNEL report — the capstone composition a
    pretraining data pipeline runs end-to-end, per source: raw doc
    count → exact-dedup survivors (min-doc_id per normalized content
    hash, counted under the surviving doc's source) → quality keepers
    (llm_quality_score's rules: >= {TM_MIN_WORDS} words, stopword
    ratio <= {TM_MAX_STOP}, lexical diversity >= {TM_MIN_LEX}) →
    train/valid/test membership under llm_eval_split's deterministic
    md5 assignment, plus the training-token budget (train_words).
    Every stage reuses the exact semantics of its standalone operator
    key, so this report is also an integration check across them.

    All outputs are integer counts/sums — exact oracle. Plan shape:
    one shuffle on the uniform content hash for the dedup window, one
    tiny (source) aggregate each for the raw and survivor branches,
    broadcast join of the two per-source frames. At 100 TB the funnel
    is dedup-shuffle-bound, exactly like production curation runs; the
    quality/split stages stay fused map-side."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    u = F.conv(
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split1"))), 1, 7),
        16,
        10,
    ).cast("bigint") / F.lit(SPLIT_DENOM)
    base = d.select(
        "doc_id",
        "source",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_hash"),
        n_words.alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.expr(
            "size(filter(split(text, ' '), x -> x IN ('the', 'a', 'of', 'and', 'to')))"
        ).alias("n_stop"),
        F.when(u < SPLIT_TRAIN, "train")
        .when(u < SPLIT_VALID, "valid")
        .otherwise("test")
        .alias("split"),
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    survivors = (
        base.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn(
            "q",
            F.when(
                (F.col("n_words") >= TM_MIN_WORDS)
                & (F.col("n_stop").cast("double") / F.col("n_words") <= TM_MAX_STOP)
                & (
                    F.col("n_distinct").cast("double") / F.col("n_words")
                    >= TM_MIN_LEX
                ),
                1,
            ).otherwise(0),
        )
    )
    raw = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_raw"))
    is_q = F.col("q") == 1
    agg = survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_dedup"),
        F.sum("q").alias("n_quality"),
        F.sum(F.when(is_q & (F.col("split") == "train"), 1).otherwise(0)).alias(
            "n_train"
        ),
        F.sum(F.when(is_q & (F.col("split") == "valid"), 1).otherwise(0)).alias(
            "n_valid"
        ),
        F.sum(F.when(is_q & (F.col("split") == "test"), 1).otherwise(0)).alias(
            "n_test"
        ),
        F.sum(
            F.when(is_q & (F.col("split") == "train"), F.col("n_words")).otherwise(0)
        )
        .cast("bigint")
        .alias("train_words"),
    )
    return raw.join(agg, "source").select(
        "source",
        "n_raw",
        "n_dedup",
        "n_quality",
        "n_train",
        "n_valid",
        "n_test",
        "train_words",
    )


# llm_line_dedup: fixed block width (whitespace tokens) standing in for
# "lines"/sentence spans — the fixture corpus has no newline or
# sentence punctuation, so spans are defined positionally.
LINE_W = 10


@query(
    "llm_line_dedup",
    f"""
    WITH s AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS nw
      FROM documents WHERE length(text) > 0
    ),
    blocks AS (
      SELECT doc_id, CAST(u AS INT) AS block_idx,
             array_to_string(
               w[u * {LINE_W} + 1 : least((u + 1) * {LINE_W}, nw)], ' ') AS btxt
      FROM s, unnest(range(0, (nw + {LINE_W} - 1) // {LINE_W})) AS t(u)
    ),
    r AS (
      SELECT doc_id, block_idx, btxt,
             ROW_NUMBER() OVER (PARTITION BY md5(btxt)
                                ORDER BY doc_id, block_idx) AS rn
      FROM blocks
    )
    SELECT doc_id,
           COUNT(*) AS n_blocks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(COALESCE(array_to_string(
             list(btxt ORDER BY block_idx) FILTER (WHERE rn = 1), ' '),
             '')) AS kept_md5
    FROM r GROUP BY doc_id
    """,
)
def llm_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style span-level dedup (Raffel et al. 2020 discarded repeated
    three-sentence spans corpus-wide; here the span is a positional
    {LINE_W}-word block since the fixture has no sentence marks): any
    block whose exact text occurs elsewhere in the corpus survives
    only at its FIRST occurrence (min (doc_id, block_idx) — a total
    order, so survivorship is deterministic), and each document is
    reassembled from its kept blocks in order. Emits per doc the
    block/keep counts and the md5 of the reassembled text — pinning
    exact CONTENT, not just counts, while keeping the oracle
    list-free (check_parity lint).

    This is the intra-document-granularity complement of
    llm_dedup_exact (whole doc) and llm_dedup_near (fuzzy doc):
    boilerplate headers/footers repeated across pages die here while
    the surrounding unique prose survives.

    Plan shape: map-side block explode (bounded fan-out nw/{LINE_W}),
    ONE shuffle on the uniform 128-bit block hash for the first-
    occurrence window, one shuffle back to doc_id for reassembly. At
    100 TB the block-hash exchange is the cost driver — identical to
    production line-dedup passes (the hash is uniform, so no skew),
    and the reassembly aggregate carries only kept blocks."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    words = F.split("text", " ")
    nw = F.size(words)
    n_blocks = F.expr(f"(size(split(text, ' ')) + {LINE_W} - 1) div {LINE_W}")
    rows = d.select(
        "doc_id",
        words.alias("w"),
        nw.alias("nw"),
        F.explode(F.sequence(F.lit(0), n_blocks - 1)).alias("block_idx"),
    )
    start = F.col("block_idx") * LINE_W + 1
    end = F.least((F.col("block_idx") + 1) * LINE_W, F.col("nw"))
    btxt = F.array_join(F.slice(F.col("w"), start, end - start + 1), " ")
    blocks = rows.select(
        "doc_id", F.col("block_idx").cast("int").alias("block_idx"), btxt.alias("btxt")
    )
    w = Window.partitionBy(F.md5("btxt")).orderBy("doc_id", "block_idx")
    r = blocks.withColumn("rn", F.row_number().over(w))
    kept_sorted = F.transform(
        F.filter(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("block_idx").alias("i"),
                        (F.col("rn") == 1).alias("keep"),
                        F.col("btxt").alias("t"),
                    )
                )
            ),
            lambda x: x["keep"],
        ),
        lambda x: x["t"],
    )
    return r.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.md5(F.array_join(kept_sorted, " ")).alias("kept_md5"),
    )


@query(
    "job_corpus_curate",
    f"""
    WITH base AS (
      SELECT doc_id, source,
             md5(lower(trim(text))) AS content_hash,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             len(list_filter(string_split(text, ' '),
                             x -> x IN ('the', 'a', 'of', 'and', 'to')))
               AS n_stop,
             CASE
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split1'), 1, 7))
                    AS BIGINT) / {SPLIT_DENOM!r} < {SPLIT_TRAIN!r} THEN 'train'
               WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split1'), 1, 7))
                    AS BIGINT) / {SPLIT_DENOM!r} < {SPLIT_VALID!r} THEN 'valid'
               ELSE 'test'
             END AS split
      FROM documents WHERE length(text) > 0
    ),
    survivors AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY content_hash
                                     ORDER BY doc_id) AS rn
        FROM base
      ) WHERE rn = 1
    ),
    kept AS (
      SELECT * FROM survivors
      WHERE n_words >= {TM_MIN_WORDS}
        AND CAST(n_stop AS DOUBLE) / n_words <= {TM_MAX_STOP!r}
        AND CAST(n_distinct AS DOUBLE) / n_words >= {TM_MIN_LEX!r}
    )
    SELECT split, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           1 AS n_batches
    FROM kept GROUP BY split, source
    """,
)
def job_corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-curation job (jobs/curate_corpus.py): dedup →
    quality filter → deterministic split → parquet load partitioned by
    split → RE-READ verification report. The oracle computes the same
    per-(split, source) report straight from the source table, so a
    hash match proves the written training corpus lost and duplicated
    NOTHING across the full curate→load→re-read path (n_batches pins
    exactly one stamp) — the LLM-pipeline twin of job_batch_etl."""
    import os

    from etl_ch_destination_spark.catalog import scratch_dir
    from etl_ch_destination_spark.jobs.curate_corpus import run_curate_corpus

    tag = os.path.basename(sf_dir.rstrip("/"))
    out = scratch_dir(f"job_corpus_curate/{tag}")
    return run_curate_corpus(spark, sf_dir, out)


BIGRAM_TOPK = 3  # successors kept per head word


@query(
    "llm_bigram_lm",
    f"""
    WITH docs AS (
      SELECT string_split(text, ' ') AS w FROM documents
      WHERE length(text) > 0 AND len(string_split(text, ' ')) >= 2
    ),
    bg AS (
      SELECT w[i] AS w1, w[i+1] AS w2
      FROM docs, unnest(range(1, len(w))) AS t(i)
    ),
    counts AS (
      SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY w1, w2
    ),
    heads AS (
      SELECT w1, CAST(SUM(n) AS BIGINT) AS head_n FROM counts GROUP BY w1
    ),
    ranked AS (
      SELECT c.w1, c.w2, c.n, h.head_n,
             CAST(ROW_NUMBER() OVER (PARTITION BY c.w1
                                     ORDER BY c.n DESC, c.w2) AS INT) AS rank
      FROM counts c JOIN heads h USING (w1)
    )
    SELECT w1, w2, n, head_n, rank,
           CAST(n AS DOUBLE) / head_n AS cond_prob
    FROM ranked WHERE rank <= {BIGRAM_TOPK}
    """,
)
def llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram-LM table — the Markov-chain artifact an n-gram
    language model / next-word heuristic trains from: for every head
    word, its top {BIGRAM_TOPK} successors with count and conditional
    probability p(w2|w1) = n(w1,w2) / n(w1,*). Counts are integers and
    the probability is one final double division of integer sums, so
    the oracle hash-matches; the per-head rank is totalized (count
    desc, successor asc).

    Plan shape: map-side bigram fan-out via zip_with of the word
    array with its own tail (no self-join, the llm_repetition_filter
    idiom) → (w1, w2) hash aggregate (1 shuffle) → per-head totals as
    a window SUM over the w1 partition → WindowGroupLimit rank over
    the same partitioning (ONE w1 exchange serves both windows — the
    oracle's join form is the same values). Zipf caps the reduce side:
    distinct bigrams grow sublinearly in corpus size, and AQE splits
    the stopword-head skew. At 100 TB this is the KenLM count-collect
    stage shape."""
    d = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0) & (F.size(F.split("text", " ")) >= 2)
    )
    words = F.split("text", " ")
    tail = F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0)))
    pairs = F.slice(
        F.zip_with(words, tail, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))),
        1,
        F.greatest(F.size(words) - 1, F.lit(0)),
    )
    bg = d.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    wp = Window.partitionBy("w1")
    ranked = counts.select(
        "w1",
        "w2",
        "n",
        F.sum("n").over(wp).alias("head_n"),
        F.row_number()
        .over(wp.orderBy(F.desc("n"), F.asc("w2")))
        .cast("int")
        .alias("rank"),
    )
    return ranked.filter(F.col("rank") <= BIGRAM_TOPK).select(
        "w1",
        "w2",
        "n",
        "head_n",
        "rank",
        (F.col("n").cast("double") / F.col("head_n")).alias("cond_prob"),
    )


@query(
    "llm_bigram_surprisal",
    """
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE length(text) > 0 AND len(string_split(text, ' ')) >= 2
    ),
    bg AS (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      FROM docs, unnest(range(1, len(w))) AS t(i)
    ),
    counts AS (
      SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY w1, w2
    ),
    model AS (
      SELECT w1, w2, n,
             CAST(SUM(n) OVER (PARTITION BY w1) AS BIGINT) AS head_n
      FROM counts
    ),
    scored AS (
      SELECT b.doc_id,
             length(format('{:b}', m.head_n // m.n)) - 1 AS bits
      FROM bg b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(bits) AS BIGINT) AS sum_bits,
           CAST(SUM(bits) AS DOUBLE) / COUNT(*) AS mean_bits
    FROM scored GROUP BY doc_id
    """,
)
def llm_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM surprisal — the perplexity-proxy quality
    signal one LM-order above llm_unigram_logprob: each bigram (w1,w2)
    costs floor(log2(n(w1,*) / n(w1,w2))) WHOLE BITS under the corpus'
    own bigram model (the bitlen(a div b) - 1 identity proven at
    llm_unigram_logprob — float log2 cannot hash-match across libms).
    Repetitive/templated docs score near 0 bits; unpredictable word
    salad scores high. sum/count are exact ints, the mean is one
    correctly-rounded division.

    Plan — the MODEL-APPLY SHAPE at scale: one map-side bigram
    fan-out feeds BOTH the count aggregate (train) and the per-doc
    score join (apply); Catalyst reuses the exchange. The join is
    bigram-keyed equi vs a Zipf-bounded model table — AQE splits
    stopword-bigram skew; at 100 TB the model side is orders of
    magnitude smaller than the corpus side (distinct bigrams grow
    sublinearly), exactly the KenLM score-pass layout."""
    d = load_table(spark, sf_dir, "documents").filter(
        (F.length("text") > 0) & (F.size(F.split("text", " ")) >= 2)
    )
    words = F.split("text", " ")
    tail = F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0)))
    pairs = F.slice(
        F.zip_with(words, tail, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))),
        1,
        F.greatest(F.size(words) - 1, F.lit(0)),
    )
    bg = d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    model = counts.select(
        "w1",
        "w2",
        "n",
        F.sum("n").over(Window.partitionBy("w1")).cast("bigint").alias("head_n"),
    )
    bits = (F.length(F.conv(F.expr("head_n div n"), 10, 2)) - 1).cast("bigint")
    scored = bg.join(model, ["w1", "w2"]).select("doc_id", bits.alias("bits"))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("bits").cast("bigint").alias("sum_bits"),
        (F.sum("bits").cast("double") / F.count(F.lit(1))).alias("mean_bits"),
    )


OUTLIER_TOPK = 3  # flagged rows per label
Q_SCALE = 1048576  # 2^20 fixed-point scale for embedding coordinates


@query(
    "llm_embedding_outliers",
    f"""
    WITH ex AS (
      SELECT vec_id, label, i AS pos,
             CAST(floor(embedding[i] * {Q_SCALE}) AS BIGINT) AS q
      FROM embeddings, unnest(range(1, len(embedding) + 1)) t(i)
    ),
    cen AS (
      SELECT label AS cl, pos AS cp, SUM(q) AS s, COUNT(*) AS n
      FROM ex GROUP BY label, pos
    ),
    terms AS (
      SELECT vec_id, label, n,
             CAST(q * n - s AS HUGEINT) * CAST(q * n - s AS HUGEINT) AS term
      FROM ex JOIN cen ON label = cl AND pos = cp
    ),
    d AS (
      SELECT vec_id, label, MAX(n) AS n, SUM(term) AS dist2
      FROM terms GROUP BY vec_id, label
    ),
    r AS (
      SELECT vec_id, label, n, dist2,
             CAST(ROW_NUMBER() OVER (PARTITION BY label
                                     ORDER BY dist2 DESC, vec_id) AS INT) AS rk
      FROM d
    )
    SELECT vec_id, label, rk,
           CAST(dist2 AS DOUBLE) AS dist2_scaled
    FROM r WHERE rk <= {OUTLIER_TOPK}
    """,
)
def llm_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier audit: the {OUTLIER_TOPK} vectors
    farthest from their label's centroid — the 'mislabeled / corrupted
    sample' sweep a training pipeline runs before contrastive
    fine-tuning. Hash-exact distance geometry: coordinates quantize to
    2^20 fixed point, the centroid comparison avoids division entirely
    (compare q*n - S, the distance to the centroid SCALED by the group
    size n), each squared term is int64, and the 64-dim sum rides a
    38-digit decimal. Ranking compares the EXACT integer distance (a
    double-rounded rank could disagree across engines); the double
    cast happens only on output.

    Plan: posexplode to (vec, dim) long form -> (label, dim) partial
    +final agg (640-row centroid table) -> broadcast back onto the
    exploded scan -> per-vec sum -> per-label WindowGroupLimit top-k.
    Two narrow shuffles + a broadcast; at 100 TB the centroid table
    stays dim*labels rows, the scan stays map-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        "label",
        "pos",
        F.floor(F.col("val").cast("double") * Q_SCALE).cast("bigint").alias("q"),
    )
    cen = ex.groupBy(F.col("label").alias("cl"), F.col("pos").alias("cp")).agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    joined = ex.join(
        F.broadcast(cen), (ex.label == F.col("cl")) & (ex.pos == F.col("cp"))
    )
    dcol = (F.col("q") * F.col("n") - F.col("s")).cast("decimal(19,0)")
    terms = joined.select("vec_id", "label", (dcol * dcol).alias("term"))
    dist = terms.groupBy("vec_id", "label").agg(F.sum("term").alias("dist2"))
    rk = (
        F.row_number()
        .over(Window.partitionBy("label").orderBy(F.desc("dist2"), F.asc("vec_id")))
        .cast("int")
    )
    return (
        dist.select("vec_id", "label", "dist2", rk.alias("rk"))
        .filter(F.col("rk") <= OUTLIER_TOPK)
        .select("vec_id", "label", "rk", F.col("dist2").cast("double").alias("dist2_scaled"))
    )


@query(
    "llm_ngram_novelty",
    """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(toks) - 1),
               i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS shingle
      FROM w
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id
    ),
    owner AS (
      SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
    ),
    novel AS (
      SELECT first_doc AS doc_id, COUNT(*) AS n_novel
      FROM owner GROUP BY first_doc
    )
    SELECT p.doc_id,
           p.n_shingles,
           CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
           CAST(COALESCE(n.n_novel, 0) AS DOUBLE) / p.n_shingles AS novelty
    FROM per_doc p LEFT JOIN novel n ON p.doc_id = n.doc_id
    """,
)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-novelty score — what fraction of a document's distinct
    word-trigrams it contributes FIRST to the corpus (first = lowest
    doc_id, the ingestion-order convention llm_dedup_incremental also
    uses). Exact duplicates score 0 unless they are the first copy;
    boilerplate-heavy docs score low; fresh prose scores near 1. The
    per-doc counts are exact ints; novelty is one final division.

    Plan: map-side shingle fan-out -> (shingle) min-aggregate (the
    inverted-index shape every dedup pass here uses, Zipf-bounded
    reduce side) -> owner counts re-aggregated by doc -> LEFT join of
    two PER-DOC frames. Deliberately NOT a join back on the shingle
    key: both novelty inputs collapse to |docs|-sized frames first, so
    the only join runs on doc_id (AQE broadcasts the novel side when
    small) and the exploded frame is never re-shuffled — measured ~2×
    faster than the shingle-join form at sf0.1 (3.2 s -> 1.6 s). At
    100 TB this is the n-gram first-occurrence index build, linear in
    corpus shingles, with reduce-side state bounded by |docs|."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= 3
    )
    toks = F.split("text", " ")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.array_join(F.slice(toks, i, 3), " "),
        )
    )
    sh = d.select("doc_id", F.explode(shingles).alias("shingle"))
    # r14 note: computing n_shingles map-side as F.size(shingles) was
    # tried and MEASURED SLOWER (2.8 → 3.3 s at sf0.1): it re-runs the
    # whole split/transform/array_distinct chain on a second scan,
    # which costs more than aggregating the already-exploded rows.
    per_doc = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    owner = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = owner.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_novel_raw")
    )
    n_novel = F.coalesce(F.col("n_novel_raw"), F.lit(0)).cast("bigint")
    return per_doc.join(novel, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        n_novel.alias("n_novel"),
        (n_novel.cast("double") / F.col("n_shingles")).alias("novelty"),
    )


TEMPLATE_PREFIX_WORDS = 8


@query(
    "llm_template_detect",
    f"""
    WITH p AS (
      SELECT doc_id, source,
             array_to_string(list_slice(string_split(text, ' '), 1,
                                        {TEMPLATE_PREFIX_WORDS}), ' ') AS prefix
      FROM documents
      WHERE len(string_split(text, ' ')) >= {TEMPLATE_PREFIX_WORDS}
    )
    SELECT md5(prefix) AS prefix_md5,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS first_doc,
           CAST(COUNT(DISTINCT source) AS INT) AS n_sources
    FROM p
    GROUP BY prefix
    HAVING COUNT(*) >= 2
    """,
)
def llm_template_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template/boilerplate detector: documents sharing their first
    {TEMPLATE_PREFIX_WORDS} words are near-certainly instances of one
    template (the C4/RefinedWeb prefix heuristic). Groups of >= 2 are
    emitted with size, first doc, and how many sources the template
    spans (cross-source templates = syndicated boilerplate). The
    prefix is reported as md5 to keep rows narrow.

    Plan: one hash aggregate on the prefix (map-side partials), the
    HAVING prunes singletons before any downstream work. Linear at
    any corpus size."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= TEMPLATE_PREFIX_WORDS
    )
    prefix = F.array_join(
        F.slice(F.split("text", " "), 1, TEMPLATE_PREFIX_WORDS), " "
    )
    return (
        d.select("doc_id", "source", prefix.alias("prefix"))
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.countDistinct("source").cast("int").alias("n_sources"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(F.md5("prefix").alias("prefix_md5"), "n_docs", "first_doc", "n_sources")
    )


CODE_PUNCT = r"[{}();=<>\[\]]"


@query(
    "llm_code_detect",
    f"""
    WITH s AS (
        SELECT doc_id, source,
               length(text) AS n_chars,
               len(regexp_extract_all(text, '{{|}}|\\(|\\)|;|=|<|>|\\[|\\]'))
                 AS n_code_punct,
               len(regexp_extract_all(text, '[0-9]')) AS n_digits,
               len(string_split(text, ' ')) AS n_words
        FROM documents WHERE length(text) > 0
    )
    SELECT doc_id, source, n_chars,
           CAST(n_code_punct AS BIGINT) AS n_code_punct,
           CAST(n_digits AS BIGINT) AS n_digits,
           CAST(n_code_punct AS DOUBLE) / n_chars AS code_punct_ratio,
           CAST(n_chars AS DOUBLE) / n_words AS avg_token_len,
           CAST(100 * n_code_punct > 2 * n_chars AS BOOLEAN) AS is_codey
    FROM s
    """,
)
def llm_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose heuristic (the StarCoder/pile-curation routing
    signal): density of code punctuation ({{ }} ( ) ; = < > [ ]),
    digit count, and mean token length; the `is_codey` flag fires when
    code punctuation exceeds 2% of characters, decided by EXACT
    integer cross-multiplication (100·punct > 2·chars) so no float
    threshold can disagree between engines. Ratios are single final
    IEEE divisions over integer counts.

    Pure map-side regexp_count codegen — zero shuffles. Both regexes
    are alternation-of-literals/char-class only, semantics identical
    in RE2-style (DuckDB) and Java (Spark) dialects."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_chars = F.length("text")
    n_punct = F.regexp_count("text", F.lit(CODE_PUNCT)).cast("bigint")
    n_digits = F.regexp_count("text", F.lit("[0-9]")).cast("bigint")
    n_words = F.size(F.split("text", " "))
    return d.select(
        "doc_id",
        "source",
        n_chars.alias("n_chars"),
        n_punct.alias("n_code_punct"),
        n_digits.alias("n_digits"),
        (n_punct.cast("double") / n_chars).alias("code_punct_ratio"),
        (n_chars.cast("double") / n_words).alias("avg_token_len"),
        (100 * n_punct > 2 * n_chars).alias("is_codey"),
    )


VOCAB_MIN_DF = 2      # drop hapax-document words
VOCAB_MAX_DF_PCT = 50  # drop words in more than half the docs


@query(
    "llm_vocab_prune",
    f"""
    WITH w AS (
        SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
        FROM documents WHERE length(text) > 0
    ),
    n_docs AS (SELECT COUNT(*) AS nd FROM documents WHERE length(text) > 0),
    vocab AS (
        SELECT word, COUNT(*) AS df FROM w GROUP BY word
    ),
    flags AS (
        SELECT word, df,
               df >= {VOCAB_MIN_DF}
                 AND df * 100 <= (SELECT nd FROM n_docs) * {VOCAB_MAX_DF_PCT}
                 AS kept
        FROM vocab
    )
    SELECT w.doc_id,
           COUNT(*) AS n_distinct_words,
           CAST(SUM(CASE WHEN f.kept THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept_words,
           CAST(SUM(CASE WHEN f.kept THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS kept_ratio
    FROM w JOIN flags f USING (word)
    GROUP BY w.doc_id
    """,
)
def llm_vocab_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency vocabulary pruning — the TF-IDF / topic-model
    preprocessing step: drop words appearing in fewer than VOCAB_MIN_DF (2)
    documents (noise/hapax) or more than VOCAB_MAX_DF_PCT (50%) of
    them (stopword-like), and report each document's retained-vocabulary
    profile. The max-df test is an integer cross-multiplication
    (df·100 <= n_docs·pct) — no float threshold. This is also the
    operational justification for the "vocabulary becomes
    broadcastable" claim the word_rarity/unigram keys make at 100 TB:
    after this df floor/ceiling the surviving vocabulary is orders of
    magnitude smaller than the corpus.

    Plan: distinct-word explode → df aggregate (Zipf-bounded reduce) →
    flag join back → per-doc aggregate; the 1-row corpus count
    broadcasts onto the tiny vocab frame."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    w = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("word"),
    )
    nd = d.count()
    vocab = w.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    flags = vocab.select(
        "word",
        "df",
        (
            (F.col("df") >= VOCAB_MIN_DF)
            & (F.col("df") * 100 <= F.lit(nd * VOCAB_MAX_DF_PCT))
        ).alias("kept"),
    )
    kept = F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("bigint")
    return (
        w.join(flags, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_words"),
            kept.alias("n_kept_words"),
            (kept.cast("double") / F.count(F.lit(1))).alias("kept_ratio"),
        )
    )


BPE_MERGES = 24  # learned merge rules; driver loop is bounded by this


def _bpe_apply_merge(sym_col, left: str, right: str):
    """One BPE merge pass over a symbol array: left-to-right,
    non-overlapping — a greedy fold where the just-merged token can
    never re-match `left` (merged = left||right is strictly longer),
    so plain last-element inspection implements the classic scan."""
    merged = left + right
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )



# The DuckDB oracle replays the ENTIRE trainer in one recursive CTE
# (VERDICT r12 #2 — the ts_downsample_lttb promotion pattern applied
# to the last deterministic rows-only keys): per round, adjacent-pair
# counts come from a lateral UNNEST over each word's symbol positions
# with SUM(freq) OVER (PARTITION BY l, r); the argmax pair under the
# SAME pinned total order (count DESC, lexicographic l, r) rides every
# row via FIRST_VALUE over the full frame; and the non-overlapping
# left-to-right merge is a list_reduce fold into a chr(31)-delimited
# string — `acc || x` when the accumulator's LAST token equals `l` and
# x = r (the separator prefix makes the suffix test token-exact, and a
# just-merged token can never re-match l because l||r is strictly
# longer — the same argument as _bpe_apply_merge). Single-symbol words
# ride along as (l, NULL) rows, pushed last in the argmax order.
# Corpus preconditions (pinned by tests/test_round13_keys.py::
# test_bpe_oracle_corpus_preconditions): no word contains U+001F (the
# fold separator) and no non-BMP characters (engine char-split
# semantics could diverge on surrogates).
_BPE_RECURSION_SQL = f"""
WITH RECURSIVE vocab0 AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, string_split(w, '') AS syms
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
  GROUP BY w
),
bpe AS (
  SELECT 0 AS round, w, freq, syms,
         CAST(NULL AS VARCHAR) AS best_l, CAST(NULL AS VARCHAR) AS best_r,
         CAST(NULL AS BIGINT) AS best_cnt
  FROM vocab0
  UNION ALL
  SELECT round + 1, w, freq,
         CASE WHEN best_r IS NULL THEN syms
              ELSE string_split(
                     list_reduce(syms, (acc, x) ->
                       CASE WHEN x = best_r
                                 AND (acc = best_l
                                      OR ends_with(acc, chr(31) || best_l))
                            THEN acc || x
                            ELSE acc || chr(31) || x END),
                     chr(31)) END,
         best_l, best_r, best_cnt
  FROM (
    SELECT DISTINCT round, w, freq, syms, best_l, best_r, best_cnt
    FROM (
      SELECT round, w, freq, syms,
             FIRST_VALUE(l) OVER w_best AS best_l,
             FIRST_VALUE(r) OVER w_best AS best_r,
             FIRST_VALUE(cnt) OVER w_best AS best_cnt
      FROM (
        SELECT round, w, freq, syms, l, r,
               SUM(freq) OVER (PARTITION BY l, r) AS cnt
        FROM (
          SELECT round, w, freq, syms, syms[i] AS l, syms[i + 1] AS r
          FROM bpe, UNNEST(range(1, greatest(len(syms), 2))) AS u(i)
          WHERE round < {BPE_MERGES}
        )
      )
      WINDOW w_best AS (ORDER BY (r IS NULL), cnt DESC, l, r
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING)
    )
  )
)
"""


@query(
    "llm_bpe_learn",
    _BPE_RECURSION_SQL
    + """
    SELECT DISTINCT CAST(round - 1 AS INT) AS rank, best_l AS left,
           best_r AS right, best_l || best_r AS merged,
           best_cnt AS pair_count
    FROM bpe WHERE round >= 1 AND best_r IS NOT NULL
    """,
)
def llm_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn a byte-pair-encoding merge table from the corpus — the
    tokenizer-training step of an LLM data pipeline (Sennrich et al.
    2016), distributed the way it scales: the corpus collapses ONCE
    into the (word, freq) vocabulary table (orders of magnitude
    smaller than the text, the `llm_vocab_prune` broadcastability
    argument), and every BPE iteration runs on that vocabulary only —
    adjacent-pair counts weighted by word freq, the argmax pair chosen
    with a total deterministic order (count DESC, then lexicographic
    pair), and the merge applied to the symbol arrays by a
    non-overlapping left-to-right HOF fold. The driver loop is bounded
    by BPE_MERGES (the `llm_dedup_clusters` bounded-iteration
    pattern: per-round `localCheckpoint` truncates lineage, 1-row
    argmax collects only).

    Returns the learned merge table (rank, left, right, merged,
    pair_count) — ~BPE_MERGES rows, fully deterministic — which is
    exactly why it carries a FULL HASH ORACLE (promoted in round 13,
    VERDICT r12 #2): the DuckDB side replays all BPE_MERGES rounds in
    one recursive CTE (see _BPE_RECURSION_SQL) under the identical
    pinned argmax order and merge fold, so counts, pairs, and ranks
    hash-match value-for-value. tests/test_llm_corpus.py additionally
    asserts EXACT equality of the whole merge table against an
    independent Python replay of the algorithm."""
    rows, _ = _bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_count bigint"
    )


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Shared trainer: returns (merge_rows, trained_vocab) where
    trained_vocab is the post-merge (w, freq, syms) frame — the word →
    token-sequence dictionary `llm_bpe_encode` broadcasts."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(
            "w",
            F.col("freq"),
            F.split(F.col("w"), "").alias("syms"),
        )
    )
    # each merge round supersedes the previous vocabulary table; the
    # pipeline reclaims round N-1's staging storage when N lands
    # (ADVICE r7 storage hygiene), keeping only the newest copy.
    pipe = StagingPipeline(keep=1)
    work = pipe.stage(vocab, label="bpe-vocab")

    rows = []
    for rank in range(BPE_MERGES):
        pairs = (
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
        )
        if not pairs:
            break
        best = pairs[0]
        rows.append((rank, best.l, best.r, best.l + best.r, int(best.cnt)))
        nxt = work.select(
            "w",
            "freq",
            _bpe_apply_merge(F.col("syms"), best.l, best.r).alias("syms"),
        )
        work = pipe.stage(nxt, label="bpe-round")

    return rows, work


@query(
    "llm_bpe_encode",
    _BPE_RECURSION_SQL
    + """
    , final AS (
      SELECT w, len(syms) AS n_tok FROM bpe
      WHERE round = (SELECT MAX(round) FROM bpe)
    ),
    words AS (
      SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
             unnest(string_split(text, ' ')) AS w
      FROM documents
    )
    SELECT doc_id, any_value(n_chars) AS n_chars,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_tok) AS BIGINT) AS n_bpe_tokens,
           CAST(any_value(n_chars) AS DOUBLE) / CAST(SUM(n_tok) AS BIGINT)
             AS chars_per_token
    FROM words JOIN final USING (w)
    WHERE w <> ''
    GROUP BY doc_id
    """,
)
def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize the corpus with the corpus-learned BPE merges — the
    train→encode composition of `llm_bpe_learn`: the trained word →
    token-sequence dictionary (one row per distinct word, tiny next to
    the text — the `llm_vocab_prune` broadcastability argument) is
    BROADCAST onto the exploded word stream, and each document reports
    its word/char/BPE-token counts plus the resulting chars-per-token
    compression — the batch-shape/token-budget numbers a
    sequence-packing stage (`llm_sequence_pack`) consumes.

    Plan/scale: one explode + one broadcast equi-join + one per-doc
    aggregate; the iterative part never touches the corpus (it runs on
    the vocabulary — `_bpe_train`). Full hash oracle since round 13:
    the DuckDB side runs the same recursive-CTE trainer
    (_BPE_RECURSION_SQL), takes the final round's per-word token
    counts, and reproduces the per-doc aggregate exactly; the pytest
    gate additionally replays train+encode in Python and matches
    per-doc token counts exactly."""
    _, trained = _bpe_train(spark, sf_dir)
    dict_df = trained.select("w", F.size("syms").alias("n_tok"))
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.explode(F.split("text", " ")).alias("w"),
    ).filter(F.col("w") != "")
    return (
        words.join(F.broadcast(dict_df), "w")
        .groupBy("doc_id")
        .agg(
            F.any_value("n_chars").alias("n_chars"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_tok").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_chars",
            "n_words",
            "n_bpe_tokens",
            (F.col("n_chars").cast("double") / F.col("n_bpe_tokens"))
            .alias("chars_per_token"),
        )
    )


BM25_TERMS = ["join", "scan", "window", "vector", "stream"]
BM25_TOPK = 10  # docs reported per query term


@query(
    "llm_bm25_score",
    f"""
    WITH dl AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    corpus AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_tokens
      FROM dl
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      WHERE term IN ({", ".join("'" + t + "'" for t in BM25_TERMS)})
      GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df, dl.dl,
             ((CAST(corpus.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5))
             * ((CAST(tf.tf AS DOUBLE) * 2.2)
                / (tf.tf + 1.2 * (0.25 + (0.75 * dl.dl)
                                  / (CAST(corpus.total_tokens AS DOUBLE)
                                     / corpus.n_docs))))
               AS bm25_r
      FROM tf
      JOIN dl ON dl.doc_id = tf.doc_id
      JOIN df ON df.term = tf.term
      CROSS JOIN corpus
    )
    SELECT term, doc_id, tf, df, dl, bm25_r, rk FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (
               PARTITION BY term ORDER BY bm25_r DESC, doc_id) AS BIGINT) AS rk
      FROM scored
    ) WHERE rk <= {BM25_TOPK}
    """,
)
def llm_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring (Robertson & Walker SIGIR 1994 — public
    literature) for a fixed query-term set, top-{BM25_TOPK} documents
    per term: the ranking function behind every lexical retrieval /
    RAG-corpus indexing pipeline. k1 = 1.2, b = 0.75 (the canonical
    defaults); the idf factor uses the RATIONAL surrogate
    (N − df + 0.5)/(df + 0.5) — the argument of BM25's log, monotone in
    it, so rankings are identical while staying hash-exact (ln drifts
    ulps cross-engine; the agg_entropy_gini finding). Every float is
    one fixed-shape expression over exact integer counts with pinned
    parenthesization on both engines.

    Plan: map-side term filter DURING the explode (only query terms
    survive — the scan never materializes the full posting list), one
    (doc, term) hash agg, a broadcast of the tiny df/corpus frames,
    and a per-term top-k window over ≤ |terms|·|docs-with-term| rows.
    At 100 TB this is the classic one-pass scatter-gather scorer —
    no index build, no all-pairs."""
    d = load_table(spark, sf_dir, "documents")
    dl = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl")
    )
    corpus = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_tokens"),
    )
    from etl_ch_destination_spark.ops.staging import stage

    tf = stage(
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term").isin(BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf")),
        label="bm25_tf",
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs")
    idf_r = (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    sat = (F.col("tf").cast("double") * F.lit(2.2)) / (
        F.col("tf")
        + F.lit(1.2) * (F.lit(0.25) + (F.lit(0.75) * F.col("dl")) / avgdl)
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id", "term", "tf", "df", "dl", (idf_r * sat).alias("bm25_r")
        )
    )
    w = Window.partitionBy("term").orderBy(F.desc("bm25_r"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= BM25_TOPK)
        .select("term", "doc_id", "tf", "df", "dl", "bm25_r", "rk")
    )


PMI_MIN_COUNT = 5  # bigram support floor
PMI_TOPK = 50      # collocations reported


@query(
    "llm_pmi_collocations",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(
               range(1, CAST(len(ws) AS INT)),
               i -> struct_pack(x := ws[CAST(i AS INT)],
                                y := ws[CAST(i AS INT) + 1]))) AS b
      FROM toks WHERE len(ws) >= 2
    ),
    pair AS (
      SELECT b.x AS x, b.y AS y, CAST(COUNT(*) AS BIGINT) AS c_xy
      FROM bg GROUP BY b.x, b.y
    ),
    tot AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n FROM pair),
    ux AS (SELECT x, CAST(SUM(c_xy) AS BIGINT) AS c_x FROM pair GROUP BY x),
    uy AS (SELECT y, CAST(SUM(c_xy) AS BIGINT) AS c_y FROM pair GROUP BY y)
    SELECT x, y, c_xy, c_x, c_y, lift, rk FROM (
      SELECT pair.x, pair.y, pair.c_xy, ux.c_x, uy.c_y,
             (CAST(pair.c_xy AS DOUBLE) * tot.n)
               / (CAST(ux.c_x AS DOUBLE) * uy.c_y) AS lift,
             CAST(ROW_NUMBER() OVER (
               ORDER BY (CAST(pair.c_xy AS DOUBLE) * tot.n)
                          / (CAST(ux.c_x AS DOUBLE) * uy.c_y) DESC,
                        pair.x, pair.y) AS BIGINT) AS rk
      FROM pair
      JOIN ux ON ux.x = pair.x
      JOIN uy ON uy.y = pair.y
      CROSS JOIN tot
      WHERE pair.c_xy >= {PMI_MIN_COUNT}
    ) WHERE rk <= {PMI_TOPK}
    """,
)
def llm_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining (Church & Hanks, CL 1990 — public
    literature): adjacent-token bigrams scored by pointwise mutual
    information against the independence baseline — reported as the
    exact LIFT ratio N·c(x,y) / (c(x)·c(y)), the argument of PMI's
    log (monotone, hash-exact; ln itself drifts ulps cross-engine).
    Bigrams below support {PMI_MIN_COUNT} are pruned (PMI's
    low-frequency pathology), top {PMI_TOPK} reported. The marginals
    are positional (first/second slot of the bigram), the convention
    that makes the contingency table sum consistently.

    Plan: map-side bigram explode (index-zip over the token array, no
    self-join), one (x, y) hash agg — the Zipf-small bigram vocab —
    then marginal aggs OVER THE PAIR TABLE (not the corpus: c(x) =
    Σ_y c(x,y), so the heavy explode is consumed exactly once), two
    broadcast marginal joins and a constant-size top-k sort. One big
    exchange total at any corpus scale."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("ws")).filter(
        F.size("ws") >= 2
    )
    bg = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("ws"), i).alias("x"),
                    F.element_at(F.col("ws"), i + 1).alias("y"),
                ),
            )
        ).alias("b")
    )
    from etl_ch_destination_spark.ops.staging import stage

    pair = stage(
        bg.groupBy(F.col("b.x").alias("x"), F.col("b.y").alias("y")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c_xy")
        ),
        label="pmi_pairs",
    )
    tot = pair.agg(F.sum("c_xy").cast("bigint").alias("n"))
    ux = pair.groupBy("x").agg(F.sum("c_xy").cast("bigint").alias("c_x"))
    uy = pair.groupBy("y").agg(F.sum("c_xy").cast("bigint").alias("c_y"))
    lift = (F.col("c_xy").cast("double") * F.col("n")) / (
        F.col("c_x").cast("double") * F.col("c_y")
    )
    scored = (
        pair.filter(F.col("c_xy") >= PMI_MIN_COUNT)
        .join(F.broadcast(ux), "x")
        .join(F.broadcast(uy), "y")
        .crossJoin(F.broadcast(tot))
        .select("x", "y", "c_xy", "c_x", "c_y", lift.alias("lift"))
    )
    w = Window.orderBy(F.desc("lift"), F.asc("x"), F.asc("y"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= PMI_TOPK)
        .select("x", "y", "c_xy", "c_x", "c_y", "lift", "rk")
    )


@query(
    "llm_dedup_url",
    """
    WITH raw AS (
      SELECT doc_id, source,
             CASE doc_id % 4
               WHEN 0 THEN 'https://www.example.com/docs/'
                 || CAST(doc_id // 4 AS VARCHAR)
                 || '?utm_source=feed&utm_campaign=x'
               WHEN 1 THEN 'HTTPS://EXAMPLE.COM/docs/'
                 || CAST(doc_id // 4 AS VARCHAR) || '/'
               WHEN 2 THEN 'http://example.com/docs/'
                 || CAST(doc_id // 4 AS VARCHAR) || '#section-2'
               ELSE 'https://example.com/docs/'
                 || CAST(doc_id // 4 AS VARCHAR)
                 || '?ref=tw&utm_medium=social'
             END AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id, source, url,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(lower(url), '^https?://', ''),
                     '^www\\.', ''),
                   '#.*$', ''),
                 '([?&])(utm_[a-z]+|ref)=[^&]*', '\\1', 'g'),
               '[?&]+$|/$', '') AS cu
      FROM raw
    )
    SELECT doc_id, source, url, cu AS canonical_url,
           CAST(COUNT(*) OVER (PARTITION BY cu) AS BIGINT) AS group_size,
           (ROW_NUMBER() OVER (PARTITION BY cu ORDER BY doc_id) = 1)
             AS is_kept
    FROM canon
    """,
)
def llm_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the CCNet/RefinedWeb first pass:
    web-crawl URLs that differ only in scheme, case, ``www.``,
    trailing slash, fragment, or tracking parameters
    (utm_*/ref) are the SAME page and must collapse before any
    content-level dedup runs. The fixture synthesizes four
    deterministic messy variants per canonical page (doc_id mod 4
    picks the corruption), the canonicalizer is a fixed
    regexp_replace chain IDENTICAL on both engines (lowercase → strip
    scheme → strip www → strip fragment → strip tracking params →
    strip dangling ?/&/slash), and the dedup is the standard
    group-size + keeper-rank window pair on the canonical key.

    Plan: map-side regex codegen, ONE exchange on the canonical hash
    serving both windows — the llm_dedup_normalized shape applied to
    the URL axis. At 100 TB this runs before featurization and cuts
    the crawl by the duplicate factor for free."""
    d = load_table(spark, sf_dir, "documents")
    page = F.expr("doc_id div 4").cast("string")
    variants = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("https://www.example.com/docs/"), page,
                F.lit("?utm_source=feed&utm_campaign=x"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("HTTPS://EXAMPLE.COM/docs/"), page, F.lit("/")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit("http://example.com/docs/"), page, F.lit("#section-2")
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://example.com/docs/"), page,
                F.lit("?ref=tw&utm_medium=social"),
            )
        )
    )
    raw = d.select("doc_id", "source", variants.alias("url"))
    cu = F.lower(F.col("url"))
    for pat, rep in (
        ("^https?://", ""),
        ("^www\\.", ""),
        ("#.*$", ""),
        ("([?&])(utm_[a-z]+|ref)=[^&]*", "$1"),
        ("[?&]+$|/$", ""),
    ):
        cu = F.regexp_replace(cu, pat, rep)
    canon = raw.select("doc_id", "source", "url", cu.alias("canonical_url"))
    w_g = Window.partitionBy("canonical_url")
    w_r = Window.partitionBy("canonical_url").orderBy("doc_id")
    return canon.select(
        "doc_id",
        "source",
        "url",
        "canonical_url",
        F.count(F.lit(1)).over(w_g).cast("bigint").alias("group_size"),
        (F.row_number().over(w_r) == 1).alias("is_kept"),
    )


EVAL_TOPK = 10   # ranking depth
EVAL_REL_TF = 3  # relevance label: term frequency >= this


@query(
    "llm_ranking_eval",
    f"""
    WITH tf AS (
      SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents)
      WHERE term IN ({", ".join("'" + t + "'" for t in BM25_TERMS)})
      GROUP BY term, doc_id
    ),
    ranked AS (
      SELECT term, doc_id, tf,
             CAST(ROW_NUMBER() OVER (PARTITION BY term
                                     ORDER BY tf DESC, doc_id) AS BIGINT)
               AS rk,
             (tf >= {EVAL_REL_TF}) AS rel
      FROM tf
    ),
    top AS (SELECT * FROM ranked WHERE rk <= {EVAL_TOPK})
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS n_topk,
           CAST(SUM(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rel_topk,
           CAST(MIN(CASE WHEN rel THEN rk END) AS BIGINT)
             AS first_rel_rank,
           CAST(1 AS DOUBLE) / MIN(CASE WHEN rel THEN rk END)
             AS reciprocal_rank,
           CAST(SUM(CASE WHEN rel THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS precision_at_k
    FROM top GROUP BY term
    """,
)
def llm_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-ranking evaluation — the MRR / precision@k harness a
    RAG or search pipeline runs against its index: per query term, the
    top-{EVAL_TOPK} documents by term frequency are scored against a
    deterministic relevance label (tf ≥ {EVAL_REL_TF}), yielding
    first-relevant rank, reciprocal rank, and precision@k. Metrics are
    emitted PER QUERY (one row each) rather than macro-averaged —
    cross-query float averaging is order-sensitive, per-query
    reciprocals are single exact divisions; the reader averages
    downstream at whatever grouping it wants (NDCG's log2 discounts
    are the same one-division-per-rank shape if needed).

    Plan: term-filtered explode (map-side), one (term, doc) agg, a
    per-term top-k window over posting-sized partitions, and a
    |terms|-row final agg."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term").isin(BM25_TERMS))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    top = (
        tf.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .withColumn("rel", F.col("tf") >= EVAL_REL_TF)
        .filter(F.col("rk") <= EVAL_TOPK)
    )
    first_rel = F.min(F.when(F.col("rel"), F.col("rk")))
    return top.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_topk"),
        F.sum(F.when(F.col("rel"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_rel_topk"),
        first_rel.cast("bigint").alias("first_rel_rank"),
        (F.lit(1.0) / first_rel).alias("reciprocal_rank"),
        (
            F.sum(F.when(F.col("rel"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("precision_at_k"),
    )


# llm_vocab_growth: corpus-prefix granularity (docs per bucket)
VG_BUCKET_DOCS = 50
# llm_zipf_slope: fit over the top-R vocabulary ranks
ZIPF_TOP_R = 256


@query(
    "llm_vocab_growth",
    f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents WHERE length(text) > 0
    ),
    tok AS (
      SELECT CAST(doc_id // {VG_BUCKET_DOCS} AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM w GROUP BY 1
    ),
    fd AS (SELECT word, MIN(doc_id) AS first_doc FROM w GROUP BY word),
    nv AS (
      SELECT CAST(first_doc // {VG_BUCKET_DOCS} AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM fd GROUP BY 1
    )
    SELECT t.bucket,
           CAST((t.bucket + 1) * {VG_BUCKET_DOCS} AS BIGINT) AS prefix_docs,
           CAST(SUM(t.n) OVER (ORDER BY t.bucket) AS BIGINT) AS cum_tokens,
           CAST(SUM(COALESCE(v.n, 0)) OVER (ORDER BY t.bucket) AS BIGINT)
             AS cum_vocab
    FROM tok t LEFT JOIN nv v ON v.bucket = t.bucket
    """,
)
def llm_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law, public literature) curve of the
    corpus: cumulative distinct-word count and cumulative token count
    at every {VG_BUCKET_DOCS}-document prefix — the standard corpus
    diagnostic for "is new data still adding new vocabulary" (dataset
    saturation / dedup-effectiveness signal in training-data
    curation).

    All-integer (token counts, first-occurrence doc ids, cumulative
    sums), so the key carries a full hash oracle. A word's
    contribution to the curve is its FIRST document (min doc_id) —
    order-independent and exact.

    Plan: one explode + two hash aggregates (tokens per bucket, first
    doc per word → new-vocab per bucket), a small left join on the
    bucket key, and a cumulative window over the bucket spine. The
    window is a single partition BY CONSTRUCTION bounded at
    n_docs/{VG_BUCKET_DOCS} rows (the bucket granularity is the knob:
    at 100 TB raise it so the spine stays thousands of rows — the
    heavy lifting is in the two aggregates, which shuffle on
    word/bucket keys and combine map-side)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    w = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    tok = (
        w.groupBy(
            F.expr(f"doc_id div {VG_BUCKET_DOCS}")
            .cast("bigint")
            .alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    nv = (
        w.groupBy("word")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(
            F.expr(f"first_doc div {VG_BUCKET_DOCS}")
            .cast("bigint")
            .alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumnRenamed("n", "n_new")
    )
    spine = tok.join(nv, "bucket", "left")
    cum = Window.orderBy("bucket").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return spine.select(
        "bucket",
        ((F.col("bucket") + 1) * VG_BUCKET_DOCS)
        .cast("bigint")
        .alias("prefix_docs"),
        F.sum("n").over(cum).cast("bigint").alias("cum_tokens"),
        F.sum(F.coalesce(F.col("n_new"), F.lit(0)))
        .over(cum)
        .cast("bigint")
        .alias("cum_vocab"),
    )


@query(
    "llm_zipf_slope",
    f"""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word
      FROM documents WHERE length(text) > 0
    ),
    vocab AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS f FROM w GROUP BY word
    ),
    top AS (SELECT word, f FROM vocab ORDER BY f DESC, word
            LIMIT {ZIPF_TOP_R}),
    rk AS (
      SELECT f,
             CAST(ROW_NUMBER() OVER (ORDER BY f DESC, word) AS BIGINT) AS r
      FROM top
    ),
    pts AS (
      SELECT CAST(length(bin(r)) - 1 AS BIGINT) AS x,
             CAST(length(bin(f)) - 1 AS BIGINT) AS y
      FROM rk
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts
    )
    SELECT n AS n_terms, sx, sy, sxy, sxx,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (n * sxx - sx * sx) AS zipf_slope
    FROM s
    """,
)
def llm_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law slope of the corpus word-frequency distribution
    (Zipf 1949, public literature): least-squares slope of
    floor(log2 freq) against floor(log2 rank) over the top
    {ZIPF_TOP_R} vocabulary terms — the classic "is this corpus
    natural-language-shaped" diagnostic (a healthy corpus fits slope
    ≈ −1; boilerplate-heavy or template-generated corpora flatten it).

    Determinism: ranks are total-ordered by (freq DESC, word), both
    log2s are the repo-wide whole-bit identity (binary-string length −
    1 — exact integer, never float log), and the regression reduces to
    five int64 sums with ONE closed-form IEEE division at the end —
    full hash oracle.

    Plan: one explode + vocabulary hash aggregate (map-side combined),
    a global top-{ZIPF_TOP_R} (TakeOrdered — never a full sort), and a
    {ZIPF_TOP_R}-row bounded window + 1-row reduction. At 100 TB the
    only heavy stage is the vocabulary aggregate, which shuffles on
    the word key."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    top = vocab.orderBy(F.desc("f"), "word").limit(ZIPF_TOP_R)
    rk = top.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.desc("f"), "word"))
        .cast("bigint")
        .alias("r"),
    )
    pts = rk.select(
        (F.length(F.conv(F.col("r"), 10, 2)) - 1).cast("bigint").alias("x"),
        (F.length(F.conv(F.col("f"), 10, 2)) - 1).cast("bigint").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    return s.select(
        F.col("n").alias("n_terms"),
        "sx",
        "sy",
        "sxy",
        "sxx",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("zipf_slope"),
    )
