"""SURVEY §2.10 — LLM-pipeline text operators (llm_text_stats,
llm_lang_filter_quality, llm_dedup_exact, llm_tfidf_terms).

North-star coverage (BASELINE.json): text analysis, corpus quality
filtering, exact dedup, term importance — the batch hygiene passes a
training-data pipeline runs over a crawled corpus before tokenizing.

Scale notes (100 TB): every operator here is a scan + hash-aggregate
shape — one shuffle on the group key, partial aggregation map-side.
`llm_dedup_exact` shuffles on the 128-bit content hash (uniform by
construction, no skew); `llm_tfidf_terms` shuffles exploded tokens —
the one fan-out to budget — then reduces to (lang, term) cardinality
immediately via partial aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.catalog import load_table, parallelize_scan
from etl_ch_destination_spark.ops.dedup import latest_by_key
from etl_ch_destination_spark.registry import query

DECON_GRAM = 5       # benchmark-overlap n-gram length (GPT-3 used 13;
BENCH_MOD = 97       # 5 fits the ~54-word fixture docs); eval set =
#                      every 97th doc — a stand-in benchmark suite


@query(
    "llm_text_stats",
    """
    SELECT doc_id,
           length(text) AS n_chars_calc,
           length(text) = n_chars AS n_chars_ok,
           len(string_split(text, ' ')) AS n_words,
           CAST(list_reduce(list_transform(string_split(text, ' '), x -> length(x)),
                            (acc, x) -> acc + x) AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_word_len
    FROM documents
    """,
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text statistics (char/word counts, average word
    length) — validates the fixture's own n_chars column. Integer
    folds + one IEEE double division keep it hash-exact."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    total_wchars = F.aggregate(
        F.transform(words, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    )
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        (F.length("text") == F.col("n_chars")).alias("n_chars_ok"),
        F.size(words).alias("n_words"),
        (total_wchars.cast("double") / F.size(words)).alias("avg_word_len"),
    )


@query(
    "llm_lang_filter_quality",
    """
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    WHERE lang IN ('en', 'de', 'fr') AND n_chars BETWEEN 100 AND 10000
    GROUP BY source
    """,
)
def llm_lang_filter_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality report: language whitelist + length bounds, then
    per-source stats — the keep/drop accounting a crawl-cleaning pass
    emits. Filters push down to the parquet scan."""
    d = load_table(spark, sf_dir, "documents")
    kept = d.filter(
        F.col("lang").isin("en", "de", "fr") & F.col("n_chars").between(100, 10000)
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "llm_dedup_exact",
    """
    SELECT doc_id, content_hash FROM (
      SELECT doc_id,
             md5(lower(trim(text))) AS content_hash,
             ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                                ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-content hash: one canonical doc (lowest
    doc_id) survives per distinct normalized text. The md5 form is the
    oracle-checked variant; internal pipelines use xxhash64 over the
    same normalization (cheaper, but seed conventions differ across
    engines). Fixture corpus has no dupes — planted-duplicate behavior
    is asserted in tests/test_llm.py."""
    d = load_table(spark, sf_dir, "documents")
    hashed = d.withColumn(
        "content_hash", F.md5(F.lower(F.trim(F.col("text"))).cast("binary"))
    )
    return latest_by_key(hashed, ["content_hash"], [F.asc("doc_id")]).select(
        "doc_id", "content_hash"
    )


@query(
    "llm_tfidf_terms",
    """
    WITH toks AS (
      SELECT lang, doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tstats AS (
      SELECT lang, term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
      FROM toks GROUP BY lang, term
    ),
    nl AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang)
    SELECT lang, term, tf, df, score, rk FROM (
      SELECT t.lang AS lang, term, tf, df,
             tf * (CAST(n_docs AS DOUBLE) / df) AS score,
             ROW_NUMBER() OVER (PARTITION BY t.lang
                                ORDER BY tf * (CAST(n_docs AS DOUBLE) / df) DESC,
                                         term) AS rk
      FROM tstats t JOIN nl ON t.lang = nl.lang
    ) WHERE rk <= 5
    """,
)
def llm_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term importance per language: tf × (N/df), top 5 terms per lang
    (`limit_by` pattern). The rational tf·N/df surrogate replaces
    log-idf in the hashed query to avoid cross-engine libm drift (the
    two weightings can rank differently — the classic tf·ln(N/df) form
    is exercised in tests/test_llm.py). Shuffle shape: explode →
    immediate partial agg to (lang, term); the per-lang doc counts join
    is broadcast-size."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("lang", "doc_id", F.explode(F.split("text", " ")).alias("term"))
    tstats = toks.groupBy("lang", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.countDistinct("doc_id").alias("df")
    )
    nl = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    scored = tstats.join(F.broadcast(nl), "lang").withColumn(
        "score", F.col("tf") * (F.col("n_docs").cast("double") / F.col("df"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "term", "tf", "df", "score", "rk")
    )


@query(
    "llm_quality_score",
    """
    WITH w AS (
      SELECT doc_id,
             string_split(text, ' ') AS words,
             length(text) AS n_chars,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct
      FROM documents
    ),
    m AS (
      SELECT doc_id, n_chars,
             len(words) AS n_words,
             len(list_distinct(words)) AS n_distinct_words,
             len(list_filter(words, x -> x IN ('the', 'a', 'of', 'and', 'to')))
               AS n_stopwords,
             n_punct
      FROM w
    )
    SELECT doc_id, n_chars, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_distinct_words AS DOUBLE) / n_words AS lexical_diversity,
           CAST(n_stopwords AS DOUBLE) / n_words AS stopword_ratio,
           CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
           CAST(n_chars - n_words + 1 AS DOUBLE) / n_words AS mean_word_len,
           CASE WHEN n_words >= 50
                 AND CAST(n_stopwords AS DOUBLE) / n_words <= 0.3
                 AND CAST(n_distinct_words AS DOUBLE) / n_words >= 0.1
                THEN 1 ELSE 0 END AS keep
    FROM m
    """,
)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality scoring — the classic pre-training filter
    heuristics (north-star "quality scoring: length/punct/stopword
    ratios"): per document, word/char counts, lexical diversity
    (distinct/total words), stopword ratio, punctuation density (the
    synthetic fixture has none — the column exercises the machinery and
    hashes as exact zeros), mean word length, and a composite `keep`
    flag with the usual thresholds.

    All whole-stage-codegen string/array built-ins over one narrow
    projection — no shuffle at all; ratios are single double divisions
    of integer counts, bit-identical across engines."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    n_stop = F.expr(
        "size(filter(split(text, ' '), x -> x IN ('the', 'a', 'of', 'and', 'to')))"
    )
    n_chars = F.length("text")
    n_punct = F.length(F.regexp_replace("text", r"[^.,;:!?]", ""))
    lex = n_distinct.cast("double") / n_words
    stop_ratio = n_stop.cast("double") / n_words
    return d.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars"),
        n_words.cast("bigint").alias("n_words"),
        lex.alias("lexical_diversity"),
        stop_ratio.alias("stopword_ratio"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        ((n_chars - n_words + 1).cast("double") / n_words).alias("mean_word_len"),
        F.when((n_words >= 50) & (stop_ratio <= 0.3) & (lex >= 0.1), 1)
        .otherwise(0)
        .alias("keep"),
    )


@query(
    "llm_pii_scrub",
    r"""
    WITH staged AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-01' || CAST(doc_id % 100 AS VARCHAR)
               AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                            '<EMAIL>', 'g'),
             '\+?[0-9][0-9()\-. ]{6,}[0-9]', '<PHONE>', 'g') AS scrubbed,
           len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             AS n_emails,
           CAST(length(raw) AS BIGINT) AS n_chars_raw
    FROM staged
    """,
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass of a training-data pipeline:
    emails and phone-shaped spans replaced with typed placeholder
    tokens, plus per-doc redaction counts for curation stats. The
    synthetic corpus carries no PII, so the op first STAGES
    deterministic PII (derived from doc_id) into each document and the
    oracle stages the identical text — the gate then proves both
    engines scrub the same spans. Patterns are dialect-portable
    (character classes + bounded quantifiers, no lookaround: Java
    regex on the Spark side, RE2-ish on DuckDB's).

    Scale: pure per-row regexp_replace inside whole-stage codegen — no
    shuffle, no Python."""
    d = load_table(spark, sf_dir, "documents")
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-01"),
        (F.col("doc_id") % 100).cast("string"),
    )
    staged = d.select("doc_id", raw.alias("raw"))
    return staged.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("raw", email_re, "<EMAIL>"), phone_re, "<PHONE>"
        ).alias("scrubbed"),
        F.size(F.regexp_extract_all("raw", F.lit(email_re), F.lit(0))).cast("bigint").alias("n_emails"),
        F.length("raw").cast("bigint").alias("n_chars_raw"),
    )


@query(
    "llm_dedup_incremental",
    """
    WITH seen AS (
      SELECT DISTINCT md5(lower(trim(text))) AS h
      FROM documents WHERE doc_id < 250
    ),
    batch AS (
      SELECT doc_id, md5(lower(trim(text))) AS content_hash
      FROM documents WHERE doc_id >= 250
    ),
    novel AS (
      SELECT doc_id, content_hash FROM batch
      WHERE content_hash NOT IN (SELECT h FROM seen)
    )
    SELECT doc_id, content_hash FROM (
      SELECT doc_id, content_hash,
             ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
      FROM novel
    ) WHERE rn = 1
    """,
)
def llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the CONTINUOUS-ingest form of llm_dedup_exact:
    a new batch (doc_id ≥ 250 stands in for today's crawl) dedups
    against the persisted hash index of everything already ingested
    (doc_id < 250) WITHOUT rescanning old text — the index is
    hash-only, orders of magnitude smaller than the corpus. Two
    stages: anti join against the index (hash-partitioned, uniform
    128-bit key), then first-wins within the batch. At 100 TB the
    index lives as a bucketed table on the hash so the anti join is
    shuffle-free against it, and each day appends its novel hashes."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.trim(F.col("text"))).cast("binary"))
    seen = d.filter(F.col("doc_id") < 250).select(h.alias("h")).distinct()
    batch = d.filter(F.col("doc_id") >= 250).select("doc_id", h.alias("content_hash"))
    novel = batch.join(seen, batch.content_hash == seen.h, "left_anti")
    return latest_by_key(novel, ["content_hash"], [F.asc("doc_id")]).select(
        "doc_id", "content_hash"
    )


@query(
    "llm_decontaminate",
    f"""
    WITH g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               list_transform(range(1, len(toks) - {DECON_GRAM - 2}),
                 i -> array_to_string(list_slice(toks, i, i + {DECON_GRAM - 1}), ' ')),
               s -> CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT)))) AS gh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      WHERE len(toks) >= {DECON_GRAM}
    ),
    bench AS (SELECT DISTINCT gh FROM g WHERE doc_id % {BENCH_MOD} = 0),
    train AS (SELECT doc_id, gh FROM g WHERE doc_id % {BENCH_MOD} != 0)
    SELECT doc_id, COUNT(*) AS n_contaminated_grams
    FROM train JOIN bench USING (gh)
    GROUP BY doc_id
    """,
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the eval-set n-gram overlap check
    every serious pretraining pipeline runs (the GPT-3 paper's 13-gram
    procedure, public knowledge; 5-grams here to fit ~54-word fixture
    docs): flag every training document sharing at least one distinct
    word n-gram with the benchmark suite, with the count of distinct
    overlapping grams as the contamination score.

    Shape: benchmark suites are tiny (thousands of prompts) next to a
    100 TB corpus, so the distinct benchmark gram-hash set BROADCASTS
    and the check is a broadcast semi-join on the exploded training
    grams — a narrow map-side stage over the corpus scan, no shuffle
    of corpus data; only the per-doc hit counts aggregate. Gram hashes
    are the same md5-derived 28-bit values as the MinHash pipeline
    (ops/neardup.shingle_hashes), so the oracle replays everything
    exactly — full hash gate."""
    from etl_ch_destination_spark.ops.neardup import shingle_hashes

    d = parallelize_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), spark
    )
    g = d.select(
        "doc_id", F.explode(shingle_hashes(F.col("text"), DECON_GRAM)).alias("gh")
    )
    bench = (
        g.filter(F.col("doc_id") % BENCH_MOD == 0).select("gh").distinct()
    )
    train = g.filter(F.col("doc_id") % BENCH_MOD != 0)
    return (
        train.join(F.broadcast(bench), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )


@query(
    "llm_sequence_pack",
    """
    WITH toks AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM toks
    )
    SELECT source, doc_id, n_tokens,
           CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id
    FROM c
    """,
)
def llm_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the batch-construction step of a pretraining
    pipeline: documents are assigned to fixed-token-budget packs (2048
    tokens) by cumulative token count within their source shard, each
    doc joining the pack where it STARTS (the trainer then splits
    stragglers; assignment is the distributed part).

    Plan: the running sum partitions by ``source`` — the per-shard
    cumsum a real corpus uses — so the window is partitioned, never a
    global single-task scan; one shuffle total. (The global-order
    form — one stream across the whole corpus, offsets via a
    two-phase distributed prefix sum — is llm_pack_sequences in
    llm_training.py.)"""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", "doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return toks.select(
        "source",
        "doc_id",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / 2048.0).cast("bigint").alias("pack_id"),
    )


# Deterministic-mixture constants: 2^28 (7 md5 hex chars) — divisions
# by a power of two are exact in IEEE double on both engines.
MIX_DENOM = 268435456.0
MIX_FLOOR = 0.2  # every source keeps at least 20%


@query(
    "llm_mixture_sample",
    f"""
    WITH rated AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix1'), 1, 7))
                  AS BIGINT) / {MIX_DENOM!r} AS sample_u,
             {MIX_FLOOR!r} + {1.0 - MIX_FLOOR!r} *
               (CAST(('0x' || substr(md5(source), 1, 7)) AS BIGINT) / {MIX_DENOM!r})
               AS rate
      FROM documents
    )
    SELECT doc_id, source, sample_u, rate
    FROM rated WHERE sample_u < rate
    """,
)
def llm_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus-mixture sampling — the data-mixing step of
    a pretraining pipeline: each source keeps a per-source fraction of
    its documents, decided by HASH THRESHOLDING (keep iff
    u(doc) < rate(source)), not by `sample()`. That makes the draw a
    pure function of the data: reproducible across reruns, cluster
    sizes, and partitionings; changing one source's rate re-decides
    only that source's docs; and the oracle replays it bit for bit
    (md5-derived 28-bit uniforms over an exact power-of-two
    denominator — no engine RNG anywhere).

    The demo rates derive from md5(source) (floor {MIX_FLOOR}) so the
    key works at any SF without fixture-specific names; a production
    mixture would broadcast-join a (source, rate) weights table —
    identical plan shape.

    Scale: a zero-shuffle map-side filter over the corpus scan; at
    100 TB it composes with the quality/lang filters in the same
    codegen stage."""
    d = load_table(spark, sf_dir, "documents")
    h7 = lambda c: F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("bigint")  # noqa: E731
    u = h7(F.concat(F.col("doc_id").cast("string"), F.lit(":mix1"))) / F.lit(MIX_DENOM)
    rate = F.lit(MIX_FLOOR) + F.lit(1.0 - MIX_FLOOR) * (
        h7(F.col("source")) / F.lit(MIX_DENOM)
    )
    return (
        d.select(
            "doc_id",
            "source",
            u.alias("sample_u"),
            rate.alias("rate"),
        )
        .filter(F.col("sample_u") < F.col("rate"))
    )


# Gopher-style repetition thresholds (Rae et al. 2021, table A1 shape):
# docs above any of these are dropped by the keep flag.
REP_MAX_DUP_WORD = 0.30     # fraction of words that are repeats
REP_MAX_TOP_WORD = 0.20     # most-frequent word's share of all words
REP_MAX_DUP_BIGRAM = 0.18   # fraction of bigrams that are repeats


@query(
    "llm_repetition_filter",
    f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    c AS (
      SELECT doc_id, word, COUNT(*) AS n FROM w GROUP BY doc_id, word
    ),
    wordstats AS (
      SELECT doc_id, SUM(n) AS n_words, COUNT(*) AS n_distinct, MAX(n) AS top_n
      FROM c GROUP BY doc_id
    ),
    bigrams AS (
      SELECT doc_id,
             len(string_split(text, ' ')) - 1 AS n_bigrams,
             len(list_distinct(list_transform(
                 range(1, len(string_split(text, ' '))),
                 i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
             ))) AS n_distinct_bigrams
      FROM documents
      WHERE len(string_split(text, ' ')) > 0
    )
    SELECT ws.doc_id,
           CAST(ws.n_words AS BIGINT) AS n_words,
           1.0 - CAST(ws.n_distinct AS DOUBLE) / ws.n_words AS dup_word_frac,
           CAST(ws.top_n AS DOUBLE) / ws.n_words AS top_word_frac,
           CASE WHEN bg.n_bigrams > 0
                THEN 1.0 - CAST(bg.n_distinct_bigrams AS DOUBLE) / bg.n_bigrams
                ELSE 0.0 END AS dup_bigram_frac,
           (1.0 - CAST(ws.n_distinct AS DOUBLE) / ws.n_words) <= {REP_MAX_DUP_WORD!r}
             AND CAST(ws.top_n AS DOUBLE) / ws.n_words <= {REP_MAX_TOP_WORD!r}
             AND (CASE WHEN bg.n_bigrams > 0
                       THEN 1.0 - CAST(bg.n_distinct_bigrams AS DOUBLE) / bg.n_bigrams
                       ELSE 0.0 END) <= {REP_MAX_DUP_BIGRAM!r} AS keep
    FROM wordstats ws JOIN bigrams bg USING (doc_id)
    """,
)
def llm_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filtering (the Gopher/MassiveText rules
    in whitespace-token form): per document, the duplicate-word
    fraction, the most-frequent word's share, and the duplicate-bigram
    fraction, plus a keep flag over the pinned thresholds. Repetition
    is the strongest cheap signal for boilerplate/spam/low-quality
    generations, and it's orthogonal to the length/stopword scoring in
    llm_quality_score.

    Plan shape: ZERO-SHUFFLE map-side — every statistic is computed
    inside the word ARRAY of its own row. The subtle one is the
    most-frequent word's count: instead of explode → groupBy(doc, word)
    → max (two shuffles + a join back, the first-draft plan), it is the
    longest equal-run in array_sort(words), found by a single linear
    HOF fold over the sorted array. Bigram stats are zip_with of the
    word array with its own tail + array_distinct. All fractions are
    integer ratios in one IEEE double division each, so the oracle
    (which DOES use the grouped form — DuckDB has no run-length fold;
    same values, different plan) hash-matches exactly.

    Scale (100 TB): the whole operator fuses into the corpus scan's
    codegen stage — per-row O(n log n) sort beats shuffling an exploded
    word table by orders of magnitude at corpus scale. The keep flag
    composes with the lang/quality/mixture filters in the same stage."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    words = F.split("text", " ")

    # longest equal-run in the sorted word array == max per-word count
    top_n = F.expr(
        """
        aggregate(
          array_sort(split(text, ' ')),
          named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),
          (acc, x) -> named_struct(
            'prev', x,
            'run',  IF(x <=> acc.prev, acc.run + 1, 1L),
            'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1, 1L))),
          acc -> acc.best)
        """
    )

    tail = F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0)))
    bigrams = F.zip_with(words, tail, lambda a, b: F.concat_ws(" ", a, b))
    # zip_with pads the shorter side with NULL → drop the trailing
    # (last_word, NULL) entry by slicing to n-1 first
    bigrams = F.slice(bigrams, 1, F.greatest(F.size(words) - 1, F.lit(0)))

    stats = d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_distinct"),
        top_n.alias("top_n"),
        (F.size(words) - 1).alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).alias("n_distinct_bigrams"),
    )

    dup_word = 1.0 - F.col("n_distinct").cast("double") / F.col("n_words")
    top_word = F.col("top_n").cast("double") / F.col("n_words")
    dup_bigram = F.when(
        F.col("n_bigrams") > 0,
        1.0 - F.col("n_distinct_bigrams").cast("double") / F.col("n_bigrams"),
    ).otherwise(F.lit(0.0))
    return stats.select(
        "doc_id",
        "n_words",
        dup_word.alias("dup_word_frac"),
        top_word.alias("top_word_frac"),
        dup_bigram.alias("dup_bigram_frac"),
        (
            (dup_word <= REP_MAX_DUP_WORD)
            & (top_word <= REP_MAX_TOP_WORD)
            & (dup_bigram <= REP_MAX_DUP_BIGRAM)
        ).alias("keep"),
    )


CHUNK_WORDS = 40   # window size (whitespace tokens)
CHUNK_STRIDE = 20  # stride → 20-word overlap between neighbors


@query(
    "llm_chunk_overlap",
    f"""
    WITH s AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS nw
      FROM documents
      WHERE length(text) > 0
    ),
    n AS (
      SELECT doc_id, w, nw,
             CASE WHEN nw > {CHUNK_WORDS}
                  THEN (nw - {CHUNK_WORDS} + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE} + 1
                  ELSE 1 END AS n_chunks
      FROM s
    )
    SELECT doc_id,
           CAST(u AS INT) AS chunk_idx,
           CAST(least(u * {CHUNK_STRIDE} + {CHUNK_WORDS}, nw)
                - u * {CHUNK_STRIDE} AS INT) AS chunk_words,
           md5(array_to_string(
               w[u * {CHUNK_STRIDE} + 1 : least(u * {CHUNK_STRIDE} + {CHUNK_WORDS}, nw)],
               ' ')) AS chunk_md5
    FROM n, unnest(range(0, n_chunks)) AS t(u)
    """,
)
def llm_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking — the doc→training-sample explode of a
    pretraining pipeline: fixed {CHUNK_WORDS}-word windows at stride
    {CHUNK_STRIDE} (50% overlap), last window truncated, short docs one
    chunk. Emits (doc_id, chunk_idx, chunk_words, chunk_md5) — the
    digest stands in for the chunk text so the oracle compare stays
    small while still pinning exact window CONTENT, not just counts.

    Plan shape: pure map-side — chunk count is computed per row in
    integer arithmetic, ``explode(sequence(...))`` fans out, ``slice``
    takes each window from the one split array. NO shuffle anywhere:
    at 100 TB this is the narrow stage that feeds the tokenizer, and
    fan-out is bounded by ~nw/stride chunks per doc.

    Sequence-packing (llm_sequence_pack) solves the dual problem —
    packing short docs UP to a budget; this op cuts long docs DOWN."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    words = F.split("text", " ")
    nw = F.size(words)
    n_chunks = F.when(
        nw > CHUNK_WORDS,
        F.expr(
            f"((size(split(text, ' ')) - {CHUNK_WORDS} + {CHUNK_STRIDE} - 1) "
            f"div {CHUNK_STRIDE}) + 1"
        ),
    ).otherwise(F.lit(1))
    rows = d.select(
        "doc_id",
        words.alias("w"),
        nw.alias("nw"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * CHUNK_STRIDE + 1
    end = F.least(F.col("chunk_idx") * CHUNK_STRIDE + CHUNK_WORDS, F.col("nw"))
    chunk = F.slice(F.col("w"), start, end - start + 1)
    return rows.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (end - start + 1).cast("int").alias("chunk_words"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )


ZLIB_LEVEL = 6  # the default deflate level; pinned for reproducibility


@query("llm_compression_ratio")  # deflate has no SQL form — rows-only;
# EXACT zlib replay gate in tests/test_llm.py
def llm_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal — the classic C4/Gopher-family
    repetitiveness filter a SQL engine cannot express: highly
    templated/repetitive documents deflate far below typical prose, so
    bytes/compressed-bytes flags them without any language model.
    Computed by an Arrow-batched pandas UDF over stdlib zlib (level
    {ZLIB_LEVEL} pinned; the closure references only the stdlib, so
    the worker-cwd import trap cannot bite).

    Rows-only in the driver gate (no deflate in DuckDB);
    tests/test_llm.py replays zlib.compress per document and asserts
    EXACT compressed-length equality plus the monotone sanity that a
    constant-character document compresses below the corpus median
    ratio... inverted: its ratio is ABOVE (compresses better).

    Plan/scale: one Arrow-batched projection (no shuffle), then
    whatever filter the pipeline composes on `compression_ratio` —
    embarrassingly parallel at any scale; zlib cost is linear in
    bytes, the same work a storage codec would do anyway."""
    @F.pandas_udf("long")
    def comp_len(texts):
        import zlib

        return texts.map(
            lambda t: len(zlib.compress((t or "").encode("utf-8"), ZLIB_LEVEL))
        )

    d = parallelize_scan(load_table(spark, sf_dir, "documents"), spark)
    out = d.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        comp_len("text").alias("comp_bytes"),
    )
    return out.select(
        "doc_id",
        "n_bytes",
        "comp_bytes",
        (F.col("n_bytes").cast("double") / F.col("comp_bytes"))
        .alias("compression_ratio"),
    )


@query(
    "str_html_strip",
    """
    WITH raw AS (
      SELECT doc_id,
             '<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR)
               || '</h1><p class="main">' || text
               || ' &amp; more &lt;stuff&gt; &quot;here&quot;&nbsp;'
               || '</p><script>var x = 1;</script></body></html>' AS html
      FROM documents
    ),
    stripped AS (
      SELECT doc_id, html,
             trim(regexp_replace(
               replace(replace(replace(replace(replace(
                 regexp_replace(
                   regexp_replace(html,
                     '<script[^>]*>.*?</script>|<style[^>]*>.*?</style>',
                     '', 'gs'),
                   '<[^>]+>', ' ', 'g'),
                 '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
                 '&quot;', '"'), '&nbsp;', ' '),
               ' +', ' ', 'g')) AS clean
      FROM raw
    )
    SELECT doc_id,
           CAST(length(html) AS BIGINT) AS len_html,
           CAST(length(clean) AS BIGINT) AS len_clean,
           md5(clean) AS clean_md5,
           starts_with(clean, 'Doc ' || CAST(doc_id AS VARCHAR)) AS has_title
    FROM stripped
    """,
)
def str_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate stripping — the first transform of every
    web-crawl text pipeline: drop <script>/<style> WITH their
    contents (dotall non-greedy, the classic trap — stripping only
    the tags leaks javascript into the corpus), flatten remaining
    tags to spaces, decode the five core entities, collapse
    whitespace. The fixture wraps each document in a deterministic
    HTML shell (title, attributed <p>, entities, a script) so the
    cleaner's every rule is exercised; the md5 digest hash-matches
    the oracle running the IDENTICAL regex chain, and `has_title`
    pins that element boundaries became word boundaries.

    Plan: pure map-side regex codegen, zero shuffles — the
    embarrassing-parallel shape; at 100 TB this fuses into the scan
    stage of the corpus read."""
    d = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><body><h1>Doc "), F.col("doc_id").cast("string"),
        F.lit("</h1><p class=\"main\">"), F.col("text"),
        F.lit(" &amp; more &lt;stuff&gt; &quot;here&quot;&nbsp;"),
        F.lit("</p><script>var x = 1;</script></body></html>"),
    )
    clean = F.regexp_replace(
        html,
        "(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>",
        "",
    )
    clean = F.regexp_replace(clean, "<[^>]+>", " ")
    for ent, ch in (
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&nbsp;", " "),
    ):
        clean = F.replace(clean, F.lit(ent), F.lit(ch))
    clean = F.trim(F.regexp_replace(clean, " +", " "))
    return d.select(
        "doc_id",
        F.length(html).cast("bigint").alias("len_html"),
        F.length(clean).cast("bigint").alias("len_clean"),
        F.md5(clean).alias("clean_md5"),
        clean.startswith(
            F.concat(F.lit("Doc "), F.col("doc_id").cast("string"))
        ).alias("has_title"),
    )


STRIP_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_STRIP_SQL_SET = ", ".join(f"'{w}'" for w in STRIP_STOPWORDS)


@query(
    "llm_stopword_strip",
    f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    )
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           CAST(len(words)
                - len(list_filter(words, x -> x NOT IN ({_STRIP_SQL_SET})))
                AS BIGINT) AS n_removed,
           array_to_string(
             list_filter(words, x -> x NOT IN ({_STRIP_SQL_SET})), ' ')
             AS stripped_text
    FROM w
    """,
)
def llm_stopword_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword removal — the normalization transform feeding keyword
    indexes, TF-IDF variants, and shingle-based dedup (llm_quality_score
    measures the ratio; this emits the CLEANED text): tokens in the
    pinned function-word set drop, order and spacing of the survivors
    preserved exactly (the stripped text is value-hashed, not just
    counted).

    Plan: pure HOF codegen (split → filter → join), zero shuffles —
    the embarrassingly-parallel map every corpus pass starts with."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    kept = F.filter(words, lambda x: ~x.isin(*STRIP_STOPWORDS))
    return d.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_words"),
        (F.size(words) - F.size(kept)).cast("bigint").alias("n_removed"),
        F.array_join(kept, " ").alias("stripped_text"),
    )
