"""LLM-training-pipeline operators, round-7 batch (SURVEY §2.10).

Six curation/budgeting signals a pretraining data pipeline computes at
corpus scale, each Spark-first (built-in functions end to end — no
Python workers) and hash-oracled against DuckDB:

- ``llm_context_window_stats`` — token-budget fit per context window
- ``llm_source_cap`` — per-source document cap (domain capping)
- ``llm_tokenizer_fertility`` — tokens-per-word fertility per language
- ``llm_bigram_kneser_ney`` — interpolated Kneser-Ney bigram LM
- ``llm_char_ngram_entropy`` — dyadic character-trigram entropy
  (gibberish / low-diversity detector)
- ``llm_span_corruption_mask`` — deterministic T5-style span-corruption
  plan (counts, not RNG — reproducible across retries)

Determinism policy: integer/exact arithmetic everywhere, divisions and
multiplications in identical parenthesized order on both engines, and
logarithms only in the WHOLE-BIT dyadic form (bitlength(n div c) − 1 —
the llm_unigram_logprob identity; raw ln cannot hash-match because the
JVM's ln drifts 1 ulp from glibc's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.registry import query

# whitespace tokens with empties dropped — the shared token definition
# (a function, not a module-level Column: Column construction needs an
# active SparkContext, and this module imports before any session)
def _ws_tokens():
    return F.filter(F.split("text", " "), lambda w: w != F.lit(""))


_SQL_WS_N = "len(list_filter(string_split(text, ' '), w -> w != ''))"


@query(
    "llm_context_window_stats",
    f"""
    WITH t AS (
      SELECT CAST({_SQL_WS_N} AS BIGINT) AS n_tok
      FROM documents WHERE length(text) > 0
    )
    SELECT w.window_tokens,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN t.n_tok <= w.window_tokens THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_fit,
           CAST(SUM(t.n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(LEAST(t.n_tok, w.window_tokens)) AS BIGINT) AS tokens_kept,
           CAST(SUM(LEAST(t.n_tok, w.window_tokens)) AS DOUBLE)
             / CAST(SUM(t.n_tok) AS DOUBLE) AS frac_kept
    FROM t CROSS JOIN (VALUES (128), (512), (2048), (8192))
      AS w(window_tokens)
    GROUP BY w.window_tokens
    """,
)
def llm_context_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window budget report: for each candidate training
    context length, how many documents fit whole and what fraction of
    corpus tokens survives truncate-at-window packing. The standard
    first question when choosing a context length for a pretraining
    mix. Plan: one map-side explode of a 4-element literal array (no
    join — the window list is a constant), one hash aggregate; integer
    sums, single final IEEE division."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    t = d.select(F.size(_ws_tokens()).cast("bigint").alias("n_tok"))
    rows = t.select(
        "n_tok",
        F.explode(F.array(*[F.lit(w) for w in (128, 512, 2048, 8192)])).alias(
            "window_tokens"
        ),
    )
    kept = F.sum(F.least(F.col("n_tok"), F.col("window_tokens"))).cast("bigint")
    return rows.groupBy("window_tokens").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("n_tok") <= F.col("window_tokens"), 1).otherwise(0)
        ).cast("bigint").alias("n_docs_fit"),
        F.sum("n_tok").cast("bigint").alias("tokens_total"),
        kept.alias("tokens_kept"),
        (kept.cast("double") / F.sum("n_tok").cast("double")).alias("frac_kept"),
    )


SOURCE_CAP = 5


@query(
    "llm_source_cap",
    f"""
    SELECT source, doc_id, cap_rank FROM (
      SELECT source, doc_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS BIGINT) AS cap_rank
      FROM documents
    ) WHERE cap_rank <= {SOURCE_CAP}
    """,
)
def llm_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (domain capping — the standard guard
    against one crawl domain dominating the mixture): keep at most
    SOURCE_CAP docs per source, selected by a deterministic md5 order
    (an unseeded uniform draw both engines reproduce bit-for-bit;
    doc_id tiebreak makes the order total). Plan: one hash exchange on
    source + per-partition sort — the same shape at any scale; a
    skewed giant source still caps to SOURCE_CAP rows out."""
    d = load_table(spark, sf_dir, "documents")
    win = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select(
            "source",
            "doc_id",
            F.row_number().over(win).cast("bigint").alias("cap_rank"),
        )
        .filter(F.col("cap_rank") <= SOURCE_CAP)
    )


@query(
    "llm_tokenizer_fertility",
    f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST({_SQL_WS_N} AS BIGINT)) AS BIGINT) AS n_words,
           CAST(SUM(CAST(len(regexp_extract_all(text,
                 '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)) AS BIGINT)
             AS n_bpe_ish,
           CAST(SUM(CAST(len(regexp_extract_all(text,
                 '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)) AS DOUBLE)
             / CAST(SUM(CAST({_SQL_WS_N} AS BIGINT)) AS DOUBLE) AS fertility
    FROM documents WHERE length(text) > 0
    GROUP BY lang
    """,
)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (tokens emitted per whitespace word) per
    language — the standard metric for how expensive a language is
    under a given segmentation; high fertility flags scripts the
    tokenizer fragments. Uses the llm_token_count BPE-ish segmentation
    (letter runs | digit runs | single punctuation). Integer sums, one
    final IEEE division — hash-exact."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    bpe = F.size(
        F.regexp_extract_all(
            F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0)
        )
    ).cast("bigint")
    t = d.select("lang", F.size(_ws_tokens()).cast("bigint").alias("nw"), bpe.alias("nb"))
    return t.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nw").cast("bigint").alias("n_words"),
        F.sum("nb").cast("bigint").alias("n_bpe_ish"),
        (F.sum("nb").cast("double") / F.sum("nw").cast("double")).alias(
            "fertility"
        ),
    )


KN_DISCOUNT = 0.75
KN_TOP = 200


@query(
    "llm_bigram_kneser_ney",
    f"""
    WITH words AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w != '') AS ws
      FROM documents WHERE {_SQL_WS_N} >= 2
    ),
    bg AS (
      SELECT unnest(list_transform(range(1, len(ws)),
               i -> {{'w1': ws[CAST(i AS INT)], 'w2': ws[CAST(i + 1 AS INT)]}}))
               AS p
      FROM words
    ),
    b AS (
      SELECT p.w1 AS w1, p.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM bg GROUP BY p.w1, p.w2
    ),
    lhs AS (
      SELECT w1, CAST(SUM(c) AS BIGINT) AS c_w1,
             CAST(COUNT(*) AS BIGINT) AS n1p_w1
      FROM b GROUP BY w1
    ),
    rhs AS (
      SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_w2 FROM b GROUP BY w2
    ),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM b)
    SELECT w1, w2, c,
           (GREATEST(CAST(c AS DOUBLE) - {KN_DISCOUNT}, 0.0)
              / CAST(l.c_w1 AS DOUBLE))
           + (({KN_DISCOUNT} * CAST(l.n1p_w1 AS DOUBLE))
              / CAST(l.c_w1 AS DOUBLE))
             * (CAST(r.n1p_w2 AS DOUBLE) / CAST(t.n_types AS DOUBLE))
             AS p_kn
    FROM b JOIN lhs l USING (w1) JOIN rhs r USING (w2) CROSS JOIN total t
    ORDER BY c DESC, w1, w2 LIMIT {KN_TOP}
    """,
)
def llm_bigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (the classic
    n-gram-LM smoothing: absolute discount d=0.75 + continuation-count
    backoff), top-{KN_TOP} bigrams by count under a total order. The
    LM that perplexity-filters corpora (CCNet-style) — here as an
    exactly-reproducible DataFrame pipeline: every count is an
    integer; P_KN is four IEEE ops in a fixed parenthesized order,
    identical on both engines.

    Plan: bigram explode → (w1,w2) hash agg; the w1 totals / w2
    continuation counts are aggregates OF the bigram-type table (tiny
    vs the corpus), joined back by key; the 1-row type-total
    broadcasts. Scale: everything downstream of the first agg is
    |bigram types|-sized, not corpus-sized."""
    d = load_table(spark, sf_dir, "documents")
    ws = d.select(_ws_tokens().alias("ws")).filter(F.size("ws") >= 2)
    pairs = ws.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 1),
                lambda i: F.struct(
                    F.element_at("ws", i).alias("w1"),
                    F.element_at("ws", i + F.lit(1)).alias("w2"),
                ),
            )
        ).alias("p")
    )
    b = pairs.groupBy(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    lhs = b.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("c_w1"),
        F.count(F.lit(1)).cast("bigint").alias("n1p_w1"),
    )
    rhs = b.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n1p_w2"))
    total = b.agg(F.count(F.lit(1)).cast("bigint").alias("n_types"))
    d75 = F.lit(KN_DISCOUNT)
    p_kn = (
        F.greatest(F.col("c").cast("double") - d75, F.lit(0.0))
        / F.col("c_w1").cast("double")
    ) + (
        (d75 * F.col("n1p_w1").cast("double")) / F.col("c_w1").cast("double")
    ) * (F.col("n1p_w2").cast("double") / F.col("n_types").cast("double"))
    return (
        b.join(lhs, "w1")
        .join(rhs, "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", "c", p_kn.alias("p_kn"))
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(KN_TOP)
    )


@query(
    "llm_char_ngram_entropy",
    """
    WITH g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, length(text) - 1),
               i -> substring(text, CAST(i AS INT), 3))) AS gram
      FROM documents WHERE length(text) >= 3
    ),
    gc AS (
      SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
      FROM g GROUP BY doc_id, gram
    ),
    per AS (
      SELECT doc_id, c,
             CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
      FROM gc
    )
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS n_grams,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(c * (length(format('{:b}', n // c)) - 1)) AS DOUBLE)
             / CAST(MAX(n) AS DOUBLE) AS entropy_bits
    FROM per GROUP BY doc_id
    """,
)
def llm_char_ngram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram diversity per document — low entropy flags
    gibberish, boilerplate, and keyboard-mash docs (a standard cheap
    quality signal next to llm_quality_score's word-level rules).
    Entropy in WHOLE-BIT dyadic form: mean over grams of
    bitlength(n div c) − 1 = floor(log2(n/c)) — exact integers until
    one final division, so it hash-matches cross-engine (raw ln would
    drift 1 ulp). Plan: trigram explode → (doc, gram) hash agg (the
    corpus-sized exchange) → doc_id exchange for the window total,
    whose partitioning the final per-doc agg then reuses. Heaviest key
    of the round-7 batch (every character shuffles once); linear in
    corpus bytes, no all-pairs term.

    Measured alternative, rejected: the statistic is per-document, so
    a ZERO-SHUFFLE form exists — array_sort the row's trigrams and
    walk the runs with one F.aggregate fold. Measured r7 at sf0.1 it
    is SLOWER (3.33/3.39 s vs 2.79/2.81 s for this form): the fold's
    per-element struct state allocates outside whole-stage codegen,
    costing more than both exchanges combined. Keep the relational
    form; revisit only if an exchange-starved cluster profile says
    otherwise."""
    # r14 optimization attempt, MEASURED AND REJECTED (guide §1.1 —
    # the "ideal" plan was slower): carrying n = length(text) − 2 as a
    # map-side column through the explode removes the doc-keyed window
    # (one exchange + sort fewer, verified in the plan), but widening
    # the first aggregate's grouping key to (doc_id, n, gram) measured
    # ~2× slower on the (doc_id, gram) hash aggregate itself
    # (isolated A/B at sf0.1: 3.1 s vs 6.0 s for the first aggregate
    # alone) — the extra key column costs more than the whole window
    # stage it saved. Keeping the relational window form... for the
    # FIRST aggregate. r15 (VERDICT r14 #7, guide §2.3/§2.4): the doc
    # window itself is gone anyway — the entropy term depends on the
    # (doc_id, gram) counts only through the COUNT VALUE c, so the
    # per-gram frame collapses to a per-document count HISTOGRAM
    # (doc_id, c, m = #grams with that count) first. The histogram is
    # tiny (count values are small integers), so the window that
    # attaches the per-doc total n — previously a full second exchange
    # + sort of the corpus-sized (doc_id, gram, c) frame — now sorts a
    # few rows per document, and the first aggregate's key is untouched
    # (the r14-rejected rewrite's mistake). n = Σ c·m, n_distinct =
    # Σ m, Σ_grams c·bits(n div c) = Σ_c m·c·bits(n div c): exact
    # int64 identities, so the final division sees the identical
    # integers and the hash oracle is unchanged.
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    grams = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("text") - 2),
                lambda i: F.col("text").substr(i, F.lit(3)),
            )
        ).alias("gram"),
    )
    gc = grams.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    hist = gc.groupBy("doc_id", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    w = Window.partitionBy("doc_id")
    per = hist.select(
        "doc_id",
        "c",
        "m",
        F.sum(F.col("c") * F.col("m")).over(w).cast("bigint").alias("n"),
    )
    bits = (
        F.length(F.conv(F.expr("n div c"), 10, 2)) - F.lit(1)
    ).cast("bigint")
    return per.groupBy("doc_id").agg(
        F.max("n").cast("bigint").alias("n_grams"),
        F.sum("m").cast("bigint").alias("n_distinct"),
        (
            F.sum(F.col("m") * F.col("c") * bits).cast("double")
            / F.max("n").cast("double")
        ).alias("entropy_bits"),
    )


MASK_PCT = 15   # target corruption percentage
SPAN_LEN = 3    # mean/fixed span length


@query(
    "llm_span_corruption_mask",
    f"""
    WITH t AS (
      SELECT doc_id, CAST({_SQL_WS_N} AS BIGINT) AS n_tok
      FROM documents WHERE length(text) > 0
    ),
    plan AS (
      SELECT doc_id, n_tok,
             (n_tok * {MASK_PCT} // 100) // {SPAN_LEN} AS n_spans
      FROM t
    )
    SELECT doc_id, n_tok, n_spans,
           n_tok // GREATEST(n_spans, 1) AS block_len,
           n_spans * LEAST({SPAN_LEN}, n_tok // GREATEST(n_spans, 1))
             AS masked_tokens,
           CAST(n_spans * LEAST({SPAN_LEN}, n_tok // GREATEST(n_spans, 1))
                AS DOUBLE)
             / CAST(n_tok AS DOUBLE) AS mask_ratio
    FROM plan WHERE n_spans >= 1
    """,
)
def llm_span_corruption_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic T5-style span-corruption PLAN per document: a
    ~{MASK_PCT}% token budget in spans of {SPAN_LEN}, laid out
    non-overlapping by partitioning the token sequence into
    equal blocks and masking the head of each — counts derived purely
    from integer arithmetic on the token count, so a retried task (or
    a second engine) reproduces the identical plan without RNG state.
    Map-only: no shuffle, no join; the mask layout a downstream
    denoising-objective writer consumes."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    t = d.select("doc_id", F.size(_ws_tokens()).cast("bigint").alias("n_tok"))
    n_spans = F.expr(f"(n_tok * {MASK_PCT}) div 100 div {SPAN_LEN}")
    plan = t.select("doc_id", "n_tok", n_spans.alias("n_spans")).filter(
        F.col("n_spans") >= 1
    )
    # greatest() guard: the n_spans >= 1 filter removes zero-span docs,
    # but Catalyst may reorder/inline this projection with downstream
    # predicates, evaluating the division on pre-filter rows — under
    # ANSI mode an integer div-by-zero then errors instead of nulling
    block = F.expr("n_tok div greatest(n_spans, 1)")
    masked = F.col("n_spans") * F.least(F.lit(SPAN_LEN).cast("bigint"), block)
    return plan.select(
        "doc_id",
        "n_tok",
        "n_spans",
        block.alias("block_len"),
        masked.alias("masked_tokens"),
        (masked.cast("double") / F.col("n_tok").cast("double")).alias(
            "mask_ratio"
        ),
    )


COV_DENOM = 268435456.0  # 16^7 — the llm_eval_split 28-bit md5 uniform
COV_TRAIN = 0.8


@query(
    "llm_ngram_coverage",
    f"""
    WITH tagged AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w != '') AS ws,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':cov1'),
                                  1, 7)) AS BIGINT) / {COV_DENOM!r}
               < {COV_TRAIN!r} AS is_train
      FROM documents WHERE {_SQL_WS_N} >= 3
    ),
    grams AS (
      SELECT doc_id, is_train,
             unnest(list_transform(range(1, len(ws) - 1),
               i -> array_to_string(ws[CAST(i AS INT):CAST(i + 2 AS INT)],
                                    ' '))) AS gram
      FROM tagged
    ),
    train_grams AS (
      SELECT DISTINCT gram FROM grams WHERE is_train
    ),
    eval_grams AS (
      SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS m
      FROM grams WHERE NOT is_train GROUP BY doc_id, gram
    )
    SELECT e.doc_id,
           CAST(SUM(e.m) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN t.gram IS NOT NULL THEN e.m ELSE 0 END)
                AS BIGINT) AS n_covered,
           CAST(SUM(CASE WHEN t.gram IS NOT NULL THEN e.m ELSE 0 END)
                AS DOUBLE) / CAST(SUM(e.m) AS DOUBLE) AS coverage
    FROM eval_grams e LEFT JOIN train_grams t USING (gram)
    GROUP BY e.doc_id
    """,
)
def llm_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval n-gram coverage: for every EVAL-split document, the
    fraction of its word trigrams that appear anywhere in the TRAIN
    split — the memorization/contamination-pressure profile computed
    before reporting eval numbers (`llm_decontaminate` flags overlap
    docs; this measures the overlap mass). The split is the
    llm_eval_split 28-bit md5 draw under a fresh salt, so both engines
    replay it bit for bit.

    Plan: one corpus trigram explode feeding both sides; the train
    side collapses to DISTINCT grams, the eval side to (doc, gram)
    multiplicities; one equi-join on the gram key (never a broadcast
    assumption — a web-scale train gram set shuffles) and a per-doc
    aggregate. Integer sums, one final division."""
    d = load_table(spark, sf_dir, "documents")
    ws = _ws_tokens()
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":cov1"))),
            1,
            7,
        ),
        16,
        10,
    ).cast("bigint") / F.lit(COV_DENOM)
    tagged = d.filter(F.size(ws) >= 3).select(
        "doc_id", ws.alias("ws"), (u < COV_TRAIN).alias("is_train")
    )
    grams = tagged.select(
        "doc_id",
        "is_train",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - 2),
                lambda i: F.array_join(F.slice("ws", i, F.lit(3)), " "),
            )
        ).alias("gram"),
    )
    train_grams = grams.filter("is_train").select("gram").distinct()
    eval_grams = (
        grams.filter(~F.col("is_train"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    t = train_grams.withColumn("hit", F.lit(1))
    covered = F.sum(
        F.when(F.col("hit").isNotNull(), F.col("m")).otherwise(F.lit(0))
    ).cast("bigint")
    return (
        eval_grams.join(t, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("bigint").alias("n_grams"),
            covered.alias("n_covered"),
            (covered.cast("double") / F.sum("m").cast("double")).alias(
                "coverage"
            ),
        )
    )


# TextRank fixed-point config: scale, damping 85/100, fixed rounds
TR_SCALE = 1_000_000_000_000  # 10^12 fixed-point units
TR_DAMP_NUM, TR_DAMP_DEN = 85, 100
TR_ROUNDS = 5
TR_TOP = 100


def _textrank_oracle() -> str:
    """Unrolled-CTE DuckDB replay of the integer fixed-point TextRank
    iteration — built programmatically so the oracle and the Spark
    loop share one definition of a round."""
    head = f"""
    WITH words AS (
      SELECT list_filter(string_split(text, ' '), w -> w != '') AS ws
      FROM documents WHERE {_SQL_WS_N} >= 2
    ),
    bg AS (
      SELECT unnest(list_transform(range(1, len(ws)),
               i -> {{'w1': ws[CAST(i AS INT)], 'w2': ws[CAST(i + 1 AS INT)]}}))
               AS p
      FROM words
    ),
    e AS (
      SELECT p.w1 AS w1, p.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM bg GROUP BY p.w1, p.w2
    ),
    ew AS (
      SELECT w1, w2, c,
             CAST(SUM(c) OVER (PARTITION BY w1) AS BIGINT) AS wsum
      FROM e
    ),
    nodes AS (
      SELECT w1 AS node FROM e UNION SELECT w2 FROM e
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    base AS (
      SELECT CAST(({TR_SCALE} * {TR_DAMP_DEN - TR_DAMP_NUM})
                  // {TR_DAMP_DEN} // nn.n AS BIGINT) AS b,
             CAST({TR_SCALE} // nn.n AS BIGINT) AS r0
      FROM nn
    ),
    r0 AS (SELECT node, (SELECT r0 FROM base) AS r FROM nodes)"""
    rounds = []
    for k in range(TR_ROUNDS):
        rounds.append(f"""
    r{k + 1} AS (
      SELECT n.node,
             (SELECT b FROM base)
             + ({TR_DAMP_NUM} * COALESCE(SUM(
                 (CAST(r.r AS HUGEINT) * ew.c) // ew.wsum), 0))
               // {TR_DAMP_DEN} AS r
      FROM nodes n
      LEFT JOIN ew ON ew.w2 = n.node
      LEFT JOIN r{k} r ON ew.w1 = r.node
      GROUP BY n.node
    )""")
    return (
        head
        + ","
        + ",".join(rounds)
        + f"""
    SELECT node AS word, CAST(r AS BIGINT) AS rank_fp,
           CAST(r AS DOUBLE) / {TR_SCALE}.0 AS rank
    FROM r{TR_ROUNDS}
    ORDER BY r DESC, node LIMIT {TR_TOP}
    """
    )


@query("llm_textrank_words", _textrank_oracle())
def llm_textrank_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword scores (Mihalcea & Tarau, EMNLP 2004 — public
    literature): PageRank over the word co-occurrence (bigram) graph,
    the classic unsupervised corpus-keyword signal. Deterministic and
    HASH-ORACLED despite being an iterative graph algorithm: ranks
    live in 10^12 fixed-point int64, damping is the rational 85/100
    applied as (x*85) div 100, and the round count is fixed at
    {TR_ROUNDS} — every engine replays the identical integer sequence
    (the DuckDB oracle is the same round definition unrolled as CTEs).
    Dangling-node mass leaks, as in the original formulation.

    Plan: the corpus collapses once into the weighted bigram-edge
    table; each round is ONE |edges|-sized equi-join of the rank
    vector plus a grouped sum — the same bounded-driver-loop shape as
    BPE and connected components, with per-round `stage()` lineage
    truncation. At web scale this is exactly distributed PageRank:
    linear per round, O(1) rounds."""
    from etl_ch_destination_spark.ops.staging import StagingPipeline, stage

    d = load_table(spark, sf_dir, "documents")
    ws = _ws_tokens()
    pairs = (
        d.select(ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.element_at("ws", i).alias("w1"),
                        F.element_at("ws", i + F.lit(1)).alias("w2"),
                    ),
                )
            ).alias("p")
        )
    )
    e = pairs.groupBy(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wsum_w = Window.partitionBy("w1")
    ew = stage(
        e.select(
            "w1", "w2", "c",
            F.sum("c").over(wsum_w).cast("bigint").alias("wsum"),
        ),
        label="textrank-edges",
    )
    nodes = stage(
        ew.select(F.col("w1").alias("node"))
        .union(ew.select(F.col("w2").alias("node")))
        .distinct(),
        label="textrank-nodes",
    )
    n = nodes.count()  # 1-scalar driver value, the bounded-loop pattern
    base = (TR_SCALE * (TR_DAMP_DEN - TR_DAMP_NUM)) // TR_DAMP_DEN // n
    ranks = nodes.select("node", F.lit(TR_SCALE // n).cast("bigint").alias("r"))
    # ew/nodes are loop-invariant (plain stage); only the rank vector
    # supersedes per round — the pipeline reclaims round N-1's staging
    # table when N lands (ADVICE r7 storage hygiene).
    pipe = StagingPipeline(keep=1)
    for k in range(TR_ROUNDS):
        contribs = (
            ew.join(ranks, ew.w1 == ranks.node)
            .select(
                F.col("w2").alias("node"),
                # the product r*c can exceed int64 at corpus scale (r is
                # ~10^12 fixed-point; c is a raw global bigram count, so
                # c > ~9.2M would wrap silently under non-ANSI Spark) —
                # widen the product to decimal(38,0); `div` still yields
                # an exact int64 quotient since contrib <= r.
                F.expr("(cast(r as decimal(38,0)) * c) div wsum").alias(
                    "contrib"
                ),
            )
            .groupBy("node")
            .agg(F.sum("contrib").cast("bigint").alias("s"))
        )
        ranks = pipe.stage(
            nodes.join(contribs, "node", "left").select(
                "node",
                (
                    F.lit(base).cast("bigint")
                    + F.expr(
                        f"({TR_DAMP_NUM} * coalesce(s, 0)) div {TR_DAMP_DEN}"
                    )
                ).alias("r"),
            ),
            label=f"textrank-r{k + 1}",
        )
    return (
        ranks.select(
            F.col("node").alias("word"),
            F.col("r").cast("bigint").alias("rank_fp"),
            (F.col("r").cast("double") / F.lit(float(TR_SCALE))).alias("rank"),
        )
        .orderBy(F.desc("rank_fp"), "word")
        .limit(TR_TOP)
    )


PREFIX_K = 12  # tokens compared for prefix-duplicate grouping


@query(
    "llm_dedup_prefix",
    f"""
    WITH t AS (
      SELECT doc_id, source,
             md5(array_to_string(
               (list_filter(string_split(text, ' '), w -> w != ''))
                 [1:{PREFIX_K}], ' ')) AS pfx_hash,
             CAST({_SQL_WS_N} AS BIGINT) AS n_tok
      FROM documents WHERE {_SQL_WS_N} >= 1
    )
    SELECT doc_id, source, pfx_hash, n_tok, group_size,
           keep_rank = 1 AS is_kept
    FROM (
      SELECT doc_id, source, pfx_hash, n_tok,
             CAST(COUNT(*) OVER (PARTITION BY pfx_hash) AS BIGINT)
               AS group_size,
             ROW_NUMBER() OVER (PARTITION BY pfx_hash
                                ORDER BY doc_id) AS keep_rank
      FROM t
    )
    """,
)
def llm_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-duplicate grouping — the boilerplate-header dedup pass
    (crawl snapshots share identical page headers/navigation before
    diverging, so exact-hash and shingle dedup both miss them): docs
    sharing their first {PREFIX_K} whitespace tokens group under one
    md5 prefix key; the earliest doc_id in each group is kept. A
    distinct axis from exact (whole-text), line-level (C4 spans), and
    MinHash (global similarity) dedup. Plan: one map-side prefix hash
    fused into the scan, ONE exchange on the prefix key serving both
    the group-size window and the keep-rank window (same partitioning,
    one sort) — a skewed boilerplate prefix is one partition-local
    group, never a join explosion."""
    d = load_table(spark, sf_dir, "documents")
    ws = _ws_tokens()
    t = d.filter(F.size(ws) >= 1).select(
        "doc_id",
        "source",
        F.md5(F.array_join(F.slice(ws, 1, PREFIX_K), " ")).alias("pfx_hash"),
        F.size(ws).cast("bigint").alias("n_tok"),
    )
    w = Window.partitionBy("pfx_hash")
    wr = w.orderBy("doc_id")
    return t.select(
        "doc_id",
        "source",
        "pfx_hash",
        "n_tok",
        F.count(F.lit(1)).over(w).cast("bigint").alias("group_size"),
        (F.row_number().over(wr) == 1).alias("is_kept"),
    )


@query(
    "llm_mixture_rebalance",
    f"""
    WITH per_src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST({_SQL_WS_N} AS BIGINT)) AS BIGINT) AS tokens
      FROM documents WHERE length(text) > 0 GROUP BY source
    ),
    tot AS (
      SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_sources
      FROM per_src
    )
    SELECT s.source, s.n_docs, s.tokens,
           t.total_tokens // t.n_sources AS target_tokens,
           LEAST(1.0, CAST(t.total_tokens // t.n_sources AS DOUBLE)
                        / CAST(s.tokens AS DOUBLE)) AS sample_rate,
           CAST(LEAST(CAST(s.tokens AS DOUBLE),
                      CAST(t.total_tokens // t.n_sources AS DOUBLE))
                AS DOUBLE) AS expected_tokens
    FROM per_src s CROSS JOIN tot t
    """,
)
def llm_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-rebalancing rates toward a uniform per-source token
    budget: each source's downsampling rate min(1, target/tokens) and
    the expected post-sampling token mass — the arithmetic a mixture
    designer runs BEFORE llm_mixture_sample draws documents (that key
    consumes rates; this one derives them from the corpus). Integer
    token sums, an integer target (total div n_sources), and two
    fixed-order IEEE ops per row — hash-exact. Plan: one per-source
    hash agg (|sources| rows) and a 1-row broadcast total."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(_ws_tokens())).cast("bigint").alias("tokens"),
    )
    tot = per_src.agg(
        F.sum("tokens").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
    )
    target = F.expr("total_tokens div n_sources")
    rate = F.least(
        F.lit(1.0), target.cast("double") / F.col("tokens").cast("double")
    )
    expected = F.least(
        F.col("tokens").cast("double"), target.cast("double")
    )
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens",
        target.alias("target_tokens"),
        rate.alias("sample_rate"),
        expected.cast("double").alias("expected_tokens"),
    )


PCS_MIN_TOKENS = 12  # shortest doc that still yields a usable pair
PCS_NUM, PCS_DEN = 3, 4  # prompt takes floor(3/4) of the tokens


@query(
    "llm_prompt_completion_split",
    f"""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws
      FROM documents
    ),
    s AS (
      SELECT doc_id, source,
             CAST(len(ws) AS BIGINT) AS n_tokens,
             CAST((len(ws) * {PCS_NUM}) // {PCS_DEN} AS BIGINT) AS cut,
             ws
      FROM t WHERE len(ws) >= {PCS_MIN_TOKENS}
    )
    SELECT doc_id, source, n_tokens, cut AS prompt_tokens,
           CAST(n_tokens - cut AS BIGINT) AS completion_tokens,
           array_to_string(ws[1:CAST(cut AS INT)], ' ') AS prompt,
           array_to_string(ws[CAST(cut + 1 AS INT):CAST(n_tokens AS INT)], ' ')
             AS completion
    FROM s
    """,
)
def llm_prompt_completion_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prompt/completion pair synthesis — the continuation-objective
    fine-tuning prep: each document splits at a DETERMINISTIC token
    boundary (prompt = first ⌊3/4·n⌋ tokens, completion = the rest;
    docs under {PCS_MIN_TOKENS} tokens are dropped as unusable), the
    byte-exact inverse of sequence packing: prompt + ' ' + completion
    reconstructs the original text, which the pytest gate asserts.
    Integer-ratio cut — no float position can straddle a token
    differently across engines.

    Plan: pure map-side split/slice/join (higher-order array ops in
    whole-stage codegen), zero shuffles — the embarrassing-parallel
    shape a corpus transform must have at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "source", F.split("text", " ").alias("ws"))
    s = t.filter(F.size("ws") >= PCS_MIN_TOKENS).select(
        "doc_id",
        "source",
        F.size("ws").cast("bigint").alias("n_tokens"),
        F.expr(f"CAST(size(ws) * {PCS_NUM} div {PCS_DEN} AS BIGINT)").alias(
            "cut"
        ),
        "ws",
    )
    return s.select(
        "doc_id",
        "source",
        "n_tokens",
        F.col("cut").alias("prompt_tokens"),
        (F.col("n_tokens") - F.col("cut")).cast("bigint").alias(
            "completion_tokens"
        ),
        F.array_join(F.slice("ws", 1, F.col("cut").cast("int")), " ").alias(
            "prompt"
        ),
        F.array_join(
            F.expr("slice(ws, CAST(cut + 1 AS INT), "
                   "CAST(n_tokens - cut AS INT))"),
            " ",
        ).alias("completion"),
    )


SHARD_N = 16  # training shards


@query(
    "llm_shard_assign",
    f"""
    WITH a AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard1'),
                                  1, 7)) AS BIGINT) % {SHARD_N} AS shard
      FROM documents
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(n_tokens) AS DOUBLE)
             / (SELECT SUM(n_tokens) FROM a) AS token_share
    FROM a GROUP BY shard
    """,
)
def llm_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment — every distributed
    data-loader's first requirement: doc → shard via an md5 uniform
    hash (stable across reruns, partitionings and cluster sizes —
    ``pmod(hash(...))`` is NOT stable across Spark versions, the
    reason the md5 device is repo policy), plus the per-shard balance
    report (doc count, token count, token share) that tells you
    whether shard 7 will finish an epoch late. The pytest gate bounds
    the max/min token-share imbalance.

    Plan: map-side hash + one {SHARD_N}-row agg; the assignment column
    itself costs nothing at any scale — it IS the write partition key
    in a real export (sink_shard_balanced is the companion sink)."""
    d = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shard1"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("bigint")
        % SHARD_N
    )
    a = d.select(
        shard.alias("shard"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    g = a.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
    from pyspark.sql.window import Window as W

    return g.select(
        "shard",
        "n_docs",
        "n_tokens",
        (
            F.col("n_tokens").cast("double")
            / F.sum("n_tokens").over(W.partitionBy())
        ).alias("token_share"),
    )


@query(
    "llm_interleave_sources",
    """
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1
               AS rank_in_source
      FROM documents
    )
    SELECT doc_id, source,
           CAST(rank_in_source AS BIGINT) AS rank_in_source,
           CAST(ROW_NUMBER() OVER (ORDER BY rank_in_source, source, doc_id) - 1
                AS BIGINT) AS interleave_pos
    FROM r
    """,
)
def llm_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-robin source interleaving — the curriculum/mixing order a
    multi-source training run feeds its loader: documents take a rank
    WITHIN their source, then the global order cycles across sources
    rank-by-rank (rank 0 of every source, then rank 1, ...), so no
    source ever streaks — the deterministic alternative to shuffling
    when the mixture ratio must hold over every prefix of the epoch.
    Order is a pure function of (rank_in_source, source, doc_id) —
    replayable bit-for-bit.

    Plan: one per-source window (hash exchange on source) then one
    global sort for the epoch order — the same range exchange any
    global ORDER BY pays; at 100 TB emit interleave_pos and let the
    writer sort within partitions instead (sortWithinPartitions over
    range-partitioned pos), same layout without the single-sink
    sort."""
    d = load_table(spark, sf_dir, "documents")
    w_src = Window.partitionBy("source").orderBy("doc_id")
    r = d.select(
        "doc_id",
        "source",
        (F.row_number().over(w_src) - 1).cast("bigint").alias(
            "rank_in_source"
        ),
    )
    w_all = Window.orderBy("rank_in_source", "source", "doc_id")
    return r.select(
        "doc_id",
        "source",
        "rank_in_source",
        (F.row_number().over(w_all) - 1).cast("bigint").alias(
            "interleave_pos"
        ),
    )


@query(
    "llm_rouge_overlap",
    """
    WITH pairs AS (
      SELECT c.doc_id AS pair_id, c.text AS cand, r.text AS ref
      FROM documents c JOIN documents r ON r.doc_id = c.doc_id + 1
      WHERE c.doc_id % 2 = 0
    ),
    cu AS (
      SELECT pair_id, w, CAST(COUNT(*) AS BIGINT) AS cc
      FROM (SELECT pair_id, unnest(string_split(cand, ' ')) AS w FROM pairs)
      GROUP BY pair_id, w
    ),
    ru AS (
      SELECT pair_id, w, CAST(COUNT(*) AS BIGINT) AS rc
      FROM (SELECT pair_id, unnest(string_split(ref, ' ')) AS w FROM pairs)
      GROUP BY pair_id, w
    ),
    ov AS (
      SELECT ru.pair_id,
             CAST(SUM(LEAST(COALESCE(cu.cc, 0), ru.rc)) AS BIGINT) AS overlap1,
             CAST(SUM(ru.rc) AS BIGINT) AS ref_total1
      FROM ru LEFT JOIN cu ON cu.pair_id = ru.pair_id AND cu.w = ru.w
      GROUP BY ru.pair_id
    )
    SELECT pair_id, overlap1, ref_total1,
           CAST(overlap1 AS DOUBLE) / ref_total1 AS rouge1_recall
    FROM ov
    """,
)
def llm_rouge_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 recall — the n-gram-overlap eval metric every
    summarization / generation pipeline computes between a candidate
    and a reference text (Lin 2004, public): clipped unigram overlap
    Σ min(count_cand(w), count_ref(w)) over reference total. Pairs are
    deterministic (doc 2k candidate vs doc 2k+1 reference). Counts are
    exact int64; the only float is the final single division — so the
    metric hash-matches cross-engine (the per-query-row discipline of
    llm_ranking_eval: never a cross-pair float average).

    Plan: one explode → (pair, word) hash agg per side, one equi-join
    on (pair, word), one final agg — all linear in token count; at
    100 TB both sides shuffle on the same composite key."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cand = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("pair_id"), F.col("text").alias("cand")
    )
    ref = d.select((F.col("doc_id") - 1).alias("pair_id"),
                   F.col("text").alias("ref"))
    pairs = cand.join(ref, "pair_id")

    def counts(col: str, out: str) -> DataFrame:
        return (
            pairs.select("pair_id", F.explode(F.split(F.col(col), " ")).alias("w"))
            .groupBy("pair_id", "w")
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    cu, ru = counts("cand", "cc"), counts("ref", "rc")
    ov = (
        ru.join(cu, ["pair_id", "w"], "left")
        .groupBy("pair_id")
        .agg(
            F.sum(F.least(F.coalesce(F.col("cc"), F.lit(0)), F.col("rc")))
            .cast("bigint")
            .alias("overlap1"),
            F.sum("rc").cast("bigint").alias("ref_total1"),
        )
    )
    return ov.select(
        "pair_id",
        "overlap1",
        "ref_total1",
        (F.col("overlap1").cast("double") / F.col("ref_total1")).alias(
            "rouge1_recall"
        ),
    )


@query(
    "llm_dpo_pairs",
    """
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               * 1000000 + n_chars AS score
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, score,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY score DESC, doc_id) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
      FROM scored
    )
    SELECT a.lang, a.rk AS pair_rank,
           a.doc_id AS chosen_id, b.doc_id AS rejected_id,
           a.score - b.score AS margin
    FROM ranked a
    JOIN ranked b ON b.lang = a.lang AND b.rk = a.rk + a.n // 2
    WHERE a.rk <= a.n // 2
    """,
)
def llm_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for DPO/RLHF-style training data
    (Rafailov et al. 2023, public recipe): per language, documents rank
    by a deterministic integer quality score (distinct-word count, then
    length — both exact int64), and rank r pairs with rank r + n/2 —
    chosen vs rejected with a positive margin by construction. The
    halved pairing (top-half vs bottom-half) maximizes margin spread
    without any float scoring.

    Plan: one window rank per lang partition + a self-equi-join on
    (lang, rank) — two exchanges on the same key, margin arithmetic
    map-side."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        (
            F.size(F.array_distinct(F.split("text", " "))).cast("bigint")
            * 1_000_000
            + F.col("n_chars")
        ).alias("score"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
    wn = Window.partitionBy("lang")
    ranked = scored.select(
        "doc_id",
        "lang",
        "score",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    a = ranked.select(
        "lang",
        F.col("rk").alias("pair_rank"),
        F.col("doc_id").alias("chosen_id"),
        F.col("score").alias("score_a"),
        F.col("n").alias("n"),
    )
    b = ranked.select(
        F.col("lang").alias("lang_b"),
        F.col("rk").alias("rk_b"),
        F.col("doc_id").alias("rejected_id"),
        F.col("score").alias("score_b"),
    )
    half = F.floor(F.col("n") / 2)
    return (
        a.join(
            b,
            (F.col("lang_b") == F.col("lang"))
            & (F.col("rk_b") == F.col("pair_rank") + half),
        )
        .filter(F.col("pair_rank") <= half)
        .select(
            "lang",
            F.col("pair_rank").cast("long").alias("pair_rank"),
            "chosen_id",
            "rejected_id",
            (F.col("score_a") - F.col("score_b")).alias("margin"),
        )
    )


@query(
    "llm_curriculum_order",
    """
    WITH ranked AS (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
      FROM documents
    ),
    phased AS (
      SELECT doc_id, lang, n_chars, rk,
             CAST((CASE WHEN (rk - 1) * 4 >= n THEN 1 ELSE 0 END)
                + (CASE WHEN (rk - 1) * 4 >= 2 * n THEN 1 ELSE 0 END)
                + (CASE WHEN (rk - 1) * 4 >= 3 * n THEN 1 ELSE 0 END)
               AS BIGINT) AS phase
      FROM ranked
    )
    SELECT doc_id, lang, phase,
           CAST(ROW_NUMBER() OVER (PARTITION BY lang, phase
                                   ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                            doc_id)
                AS BIGINT) AS pos_in_phase
    FROM phased
    """,
)
def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule construction (Bengio et al. 2009, public
    recipe): per language, documents rank by an integer difficulty
    proxy (length — short first), split into 4 curriculum phases, and
    are SHUFFLED within each phase by a stable md5 order — ordered
    epochs across phases, decorrelated batches within one. The phase
    boundary is decided in cross-multiplied integers ((rk−1)·4 vs
    k·n — the rpt_abc_classification device), so quartile edges can
    never drift cross-engine.

    Plan: two window passes over one lang exchange (rank + count
    reuse the partition; the phase shuffle re-sorts within (lang,
    phase), a subpartition), all int/string codegen."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    wn = Window.partitionBy("lang")
    ranked = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    r4 = (F.col("rk") - 1) * 4
    phase = (
        F.when(r4 >= F.col("n"), 1).otherwise(0)
        + F.when(r4 >= 2 * F.col("n"), 1).otherwise(0)
        + F.when(r4 >= 3 * F.col("n"), 1).otherwise(0)
    ).cast("bigint")
    phased = ranked.select("doc_id", "lang", phase.alias("phase"))
    wp = Window.partitionBy("lang", "phase").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return phased.select(
        "doc_id",
        "lang",
        "phase",
        F.row_number().over(wp).cast("bigint").alias("pos_in_phase"),
    )


PACK_CAP = 2048  # context-window capacity (whitespace tokens)


@query(
    "llm_pack_sequences",
    f"""
    WITH d AS (
      SELECT doc_id, CAST({_SQL_WS_N} AS BIGINT) AS n_tokens FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS BIGINT) AS t0
      FROM d
    )
    SELECT doc_id, n_tokens,
           CAST(t0 // {PACK_CAP} AS BIGINT) AS chunk_id,
           CAST(t0 % {PACK_CAP} AS BIGINT) AS offset_in_chunk,
           CASE WHEN n_tokens > 0
                THEN (t0 + n_tokens - 1) // {PACK_CAP} > t0 // {PACK_CAP}
                ELSE FALSE END AS spans_chunks
    FROM c
    """,
)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE PACKING for LLM pretraining — the concat-then-chunk
    layout every production pipeline computes before writing training
    shards: documents concatenate in pinned doc_id order and the
    token stream is cut into {PACK_CAP}-token context windows; per
    document this yields the chunk it starts in, its offset inside
    that chunk, and whether it straddles a chunk boundary (the rows a
    loss-masking or best-fit repacking stage then acts on). This is
    the GLOBAL-ORDER complement of llm_sequence_pack (llm_text.py),
    which packs within source shards and so gets a partitioned window
    for free; when the training layout demands ONE stream across the
    whole corpus, the two-phase prefix sum below is how the global
    cumsum runs without a single-task window.

    The interesting part at 100 TB is the GLOBAL RUNNING OFFSET — a
    prefix sum over a total order, which naive formulations compute
    with an unpartitioned window (every row through ONE task). This
    key runs the scalable two-phase form instead: range-repartition
    by doc_id (range partition i holds smaller ids than i+1 by the
    RangePartitioner contract), per-partition cumulative sums via a
    partition-local window, then per-partition TOTALS (one row per
    partition — a bounded manifest) get their own tiny cumulative
    window and broadcast-join back as offsets. The exchange volume of
    the offset pass is |partitions| rows regardless of data size;
    the answer is partitioning-invariant (prefix sums are
    associative), which the DuckDB oracle — a plain single-window
    cumsum — re-proves value-for-value.

    Token definition is the shared whitespace-with-empties-dropped
    convention (_ws_tokens / _SQL_WS_N); all arithmetic is int64 with
    floor-division on non-negative operands (truncation ≡ floor on
    both engines)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(_ws_tokens()).cast("bigint").alias("n_tokens")
    )
    ranged = d.repartitionByRange(32, "doc_id").withColumn(
        "part", F.spark_partition_id()
    )
    w_in = Window.partitionBy("part").orderBy("doc_id")
    local = ranged.withColumn("local_cum", F.sum("n_tokens").over(w_in))
    totals = local.groupBy("part").agg(
        F.sum("n_tokens").alias("part_total")
    )
    # |partitions| rows — the bounded manifest; the global window here
    # costs nothing and never sees data rows
    w_parts = Window.orderBy("part").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "part",
        F.coalesce(F.sum("part_total").over(w_parts), F.lit(0)).alias(
            "part_offset"
        ),
    )
    packed = local.join(F.broadcast(offsets), "part").withColumn(
        "t0", F.col("part_offset") + F.col("local_cum") - F.col("n_tokens")
    )
    return packed.select(
        "doc_id",
        "n_tokens",
        F.expr(f"t0 div {PACK_CAP}").alias("chunk_id"),
        (F.col("t0") % PACK_CAP).alias("offset_in_chunk"),
        F.when(
            F.col("n_tokens") > 0,
            F.expr(f"(t0 + n_tokens - 1) div {PACK_CAP}")
            > F.expr(f"t0 div {PACK_CAP}"),
        )
        .otherwise(F.lit(False))
        .alias("spans_chunks"),
    )


DSHUF_EPOCHS = 3   # training epochs replayed
DSHUF_SHARDS = 8   # data-loader shards (fixed across epochs)


@query(
    "llm_dataset_shuffle",
    f"""
    WITH e AS (SELECT UNNEST(range(0, {DSHUF_EPOCHS})) AS epoch),
    a AS (
      SELECT CAST(e.epoch AS BIGINT) AS epoch, d.doc_id,
             CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':dshuf'),
                                  1, 7)) AS BIGINT) % {DSHUF_SHARDS} AS shard,
             md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR))
               AS okey
      FROM documents d CROSS JOIN e
    ),
    p AS (
      SELECT epoch, shard, doc_id,
             ROW_NUMBER() OVER (PARTITION BY epoch, shard ORDER BY okey) - 1
               AS pos
      FROM a
    ),
    q AS (
      SELECT epoch, shard, doc_id, pos,
             MIN(CASE WHEN epoch = 0 THEN pos END) OVER (PARTITION BY doc_id)
               AS pos0
      FROM p
    )
    SELECT epoch, CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(CASE WHEN pos = 0 THEN doc_id END) AS BIGINT) AS first_doc,
           CAST(SUM((pos + 1) * doc_id) AS BIGINT) AS order_checksum,
           CAST(SUM(ABS(pos - pos0)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mean_abs_disp
    FROM q GROUP BY epoch, shard
    """,
)
def llm_dataset_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EPOCH reshuffling — the training-dataloader order
    policy at 100 TB: shards are FIXED per document (md5 uniform hash,
    the repo's stable-across-cluster-shapes device — llm_shard_assign
    is the balance report for the same idea), and each epoch re-orders
    WITHIN every shard by a per-epoch salted hash, so no epoch ever
    replays another's order, yet any worker can reconstruct its
    shard's exact sequence from (epoch, shard) alone — no global
    shuffle service, no materialized permutation table. This is the
    hash-order trick real loaders (e.g. deterministic tf.data /
    Megatron-style samplers) use instead of a Fisher-Yates pass over
    the corpus.

    Output pins the permutation BY VALUE per (epoch, shard):
    ``order_checksum = Σ (pos+1)·doc_id`` (position-weighted — any
    transposition changes it), the doc at position 0, and
    ``mean_abs_disp`` — the mean |pos − pos@epoch0| displacement,
    which is 0 for epoch 0 and provably positive for later epochs
    (the reshuffle-actually-reshuffles gate; pytest bounds it from
    below).

    Plan: the 3-epoch fan-out is a literal-array explode (map-side,
    no join); position windows partition by (epoch, shard) — 24
    independent groups here, |shards|×|epochs| at any scale, each
    sorting only its shard slice; the epoch-0 reference rides a
    doc_id-partitioned window (one hash exchange), never a self-join.
    At 100 TB the same plan holds: every exchange keys on
    (epoch, shard) or doc_id — no global sort anywhere."""
    d = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"),
                               F.lit(":dshuf"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("bigint")
        % DSHUF_SHARDS
    )
    a = d.select(
        "doc_id",
        shard.alias("shard"),
        F.explode(
            F.array(*[F.lit(e) for e in range(DSHUF_EPOCHS)])
        ).alias("epoch"),
    ).select(
        F.col("epoch").cast("bigint").alias("epoch"),
        "shard",
        "doc_id",
        F.md5(
            F.concat(
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("okey"),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("okey")
    p = a.select(
        "epoch",
        "shard",
        "doc_id",
        (F.row_number().over(w) - 1).cast("bigint").alias("pos"),
    )
    w0 = Window.partitionBy("doc_id")
    q = p.withColumn(
        "pos0",
        F.min(F.when(F.col("epoch") == 0, F.col("pos"))).over(w0),
    )
    return q.groupBy("epoch", F.col("shard").cast("bigint").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min(F.when(F.col("pos") == 0, F.col("doc_id")))
        .cast("bigint")
        .alias("first_doc"),
        F.sum((F.col("pos") + 1) * F.col("doc_id"))
        .cast("bigint")
        .alias("order_checksum"),
        (
            F.sum(F.abs(F.col("pos") - F.col("pos0"))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_abs_disp"),
    )
