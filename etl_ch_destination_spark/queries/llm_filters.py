"""LLM pipeline — contamination reporting, tagging, label QA, and the
composed curation funnel (SURVEY §2.10, round-8 batch).

Four operators a pretraining-data team runs on top of the primitive
filters the earlier rounds registered:

- ``llm_contamination_pairs`` — per-benchmark-doc top overlapping
  train docs (the pair-level drill-down of ``llm_decontaminate``)
- ``llm_keyword_tag`` — token-dictionary tagging via the
  explode→broadcast-equi-join pattern (never array-contains NLJ)
- ``llm_lang_confusion`` — labeled-vs-predicted language confusion
  matrix (label-noise QA over ``llm_lang_id``'s heuristic)
- ``rpt_filter_funnel`` — the stage-by-stage survivor funnel of the
  full curation pipeline (raw → nonempty → length → quality →
  exact-dedup → decontaminated)

All four are built-in-function DataFrame plans (no Python workers)
with full DuckDB hash oracles; ratios are single IEEE divisions of
exact integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_ch_destination_spark.catalog import load_table, parallelize_scan
from etl_ch_destination_spark.queries.llm_dedup_extra import _MARKERS
from etl_ch_destination_spark.queries.llm_text import BENCH_MOD, DECON_GRAM
from etl_ch_destination_spark.registry import query

PAIR_TOP = 5  # overlapping train docs reported per benchmark doc

# the shared md5-derived 28-bit distinct gram hashes (ops/neardup.py)
# in DuckDB form — identical to llm_decontaminate's oracle
_SQL_GRAMS = f"""
    g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               list_transform(range(1, len(toks) - {DECON_GRAM - 2}),
                 i -> array_to_string(list_slice(toks, i, i + {DECON_GRAM - 1}), ' ')),
               s -> CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT)))) AS gh
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      WHERE len(toks) >= {DECON_GRAM}
    )
"""


@query(
    "llm_contamination_pairs",
    f"""
    WITH {_SQL_GRAMS},
    bench AS (SELECT doc_id, gh FROM g WHERE doc_id % {BENCH_MOD} = 0),
    train AS (SELECT doc_id, gh FROM g WHERE doc_id % {BENCH_MOD} != 0),
    bn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench_grams
           FROM bench GROUP BY doc_id),
    p AS (SELECT b.doc_id AS bench_id, t.doc_id AS train_id,
                 CAST(COUNT(*) AS BIGINT) AS n_overlap
          FROM bench b JOIN train t USING (gh)
          GROUP BY b.doc_id, t.doc_id)
    SELECT bench_id, train_id, n_overlap, n_bench_grams,
           CAST(n_overlap AS DOUBLE) / CAST(n_bench_grams AS DOUBLE)
             AS containment
    FROM (
      SELECT p.*, bn.n_bench_grams,
             ROW_NUMBER() OVER (PARTITION BY p.bench_id
                                ORDER BY p.n_overlap DESC, p.train_id) AS rk
      FROM p JOIN bn ON bn.doc_id = p.bench_id
    )
    WHERE rk <= {PAIR_TOP}
    """,
)
def llm_contamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-level contamination drill-down: for every benchmark
    document, the top {PAIR_TOP} training documents by distinct
    shared word-{DECON_GRAM}-grams, with the benchmark-side
    containment ratio (shared / benchmark grams — the direction that
    answers "how much of this eval item leaked"). The report a team
    actually reads after ``llm_decontaminate`` flags volume.

    Gram hashes are the shared md5-derived 28-bit values
    (ops/neardup.shingle_hashes), so the DuckDB oracle replays the
    pipeline exactly. Plan: the benchmark gram set is tiny next to a
    100 TB corpus, so the pair join BROADCASTS the bench side into the
    exploded train grams — a map-side stage over the corpus scan; only
    (bench, train) pair counts shuffle, and the per-bench top-k is a
    window over pair counts (bench-id partitions, thousands of rows
    each at most)."""
    from etl_ch_destination_spark.ops.neardup import shingle_hashes

    d = parallelize_scan(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), spark
    )
    g = d.select(
        "doc_id", F.explode(shingle_hashes(F.col("text"), DECON_GRAM)).alias("gh")
    )
    bench = g.filter(F.col("doc_id") % BENCH_MOD == 0).select(
        F.col("doc_id").alias("bench_id"), "gh"
    )
    train = g.filter(F.col("doc_id") % BENCH_MOD != 0).select(
        F.col("doc_id").alias("train_id"), "gh"
    )
    bn = bench.groupBy("bench_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bench_grams")
    )
    pairs = (
        F.broadcast(bench)
        .join(train, "gh")
        .groupBy("bench_id", "train_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    w = Window.partitionBy("bench_id").orderBy(F.desc("n_overlap"), "train_id")
    return (
        pairs.join(F.broadcast(bn), "bench_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= PAIR_TOP)
        .select(
            "bench_id",
            "train_id",
            "n_overlap",
            "n_bench_grams",
            (
                F.col("n_overlap").cast("double")
                / F.col("n_bench_grams").cast("double")
            ).alias("containment"),
        )
    )


# token → category dictionary for keyword tagging; terms chosen from the
# fixture vocabulary so every category actually matches (FIXTURES.md)
_KEYWORDS = {
    "operator": ["join", "filter", "sort", "scan", "merge", "agg"],
    "storage": ["column", "row", "table", "batch"],
    "perf": ["fast", "slow", "big", "small"],
}

_SQL_KEYWORD_DIM = " UNION ALL ".join(
    f"SELECT '{cat}' AS category, '{t}' AS term"
    for cat, terms in _KEYWORDS.items()
    for t in terms
)


@query(
    "llm_keyword_tag",
    f"""
    WITH kw AS ({_SQL_KEYWORD_DIM}),
    tok AS (
      SELECT doc_id, unnest(list_distinct(
               list_filter(string_split(text, ' '), w -> w != ''))) AS w
      FROM documents
    )
    SELECT tok.doc_id, kw.category,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_terms,
           array_to_string(list_sort(list(kw.term)), ',') AS terms_csv
    FROM tok JOIN kw ON kw.term = tok.w
    GROUP BY tok.doc_id, kw.category
    """,
)
def llm_keyword_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-based document tagging: per (doc, category), how many
    distinct dictionary terms appear, plus the sorted matched-term
    list — the topic/routing tagger every corpus pipeline runs before
    mixture construction.

    Shape lesson the key demonstrates: a term dictionary is a JOIN
    input, not an `array_contains` predicate — exploding the doc's
    distinct tokens and equi-joining the (tiny, broadcast) dictionary
    keeps the probe map-side and indexable, where a per-term
    contains() scan is O(terms × corpus) and defeats pushdown. The
    matched-term list is array_sort'ed before joining to a csv string,
    so the value is order-insensitive and hash-stable."""
    d = load_table(spark, sf_dir, "documents")
    kw_rows = [
        (cat, t) for cat, terms in _KEYWORDS.items() for t in terms
    ]
    kw = spark.createDataFrame(kw_rows, "category string, term string")
    tok = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.filter(F.split("text", " "), lambda w: w != ""))
        ).alias("w"),
    )
    return (
        tok.join(F.broadcast(kw), tok.w == kw.term)
        .groupBy("doc_id", "category")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_terms"),
            F.array_join(F.array_sort(F.collect_list("term")), ",").alias(
                "terms_csv"
            ),
        )
    )


# the llm_lang_id scoring core, shared verbatim with its oracle
_SQL_LANG_PRED = f"""
    pred AS (
      SELECT doc_id, lang,
             CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                  WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                  WHEN s_fr >= s_es THEN 'fr'
                  ELSE 'es' END AS pred_lang
      FROM (
        SELECT doc_id, lang,
               len(list_intersect(ws, {_MARKERS['en']!r})) AS s_en,
               len(list_intersect(ws, {_MARKERS['de']!r})) AS s_de,
               len(list_intersect(ws, {_MARKERS['fr']!r})) AS s_fr,
               len(list_intersect(ws, {_MARKERS['es']!r})) AS s_es
        FROM (SELECT doc_id, lang,
                     list_distinct(string_split(text, ' ')) AS ws
              FROM documents)
      )
    )
"""


@query(
    "llm_lang_confusion",
    f"""
    WITH {_SQL_LANG_PRED}
    SELECT lang, pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER (PARTITION BY lang) AS DOUBLE)
             AS frac_of_lang
    FROM pred
    GROUP BY lang, pred_lang
    """,
)
def llm_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-label QA: the confusion matrix between the corpus's
    labeled ``lang`` column and ``llm_lang_id``'s marker-word
    prediction, with each cell's share of its labeled language — the
    standard label-noise audit before trusting per-language mixture
    weights. (Fixture text is English word soup for every label, so
    the matrix collapses toward the 'en' column — the operator, not
    classifier accuracy, is under test; see llm_lang_id.)

    Plan: the scoring is per-row map-side set intersections against
    literal arrays; the only exchanges are the (lang, pred) aggregate
    and the tiny per-lang window over the ≤ |langs|² cell table."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.array_distinct(F.split("text", " "))
    scores = {
        lang: F.size(F.array_intersect(ws, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in _MARKERS.items()
    }
    pred = (
        F.when(
            (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["es"]),
            "en",
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] >= scores["es"]), "de")
        .when(scores["fr"] >= scores["es"], "fr")
        .otherwise("es")
    )
    cells = (
        d.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    w = Window.partitionBy("lang")
    return cells.select(
        "lang",
        "pred_lang",
        "n_docs",
        (
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double")
        ).alias("frac_of_lang"),
    )


# funnel thresholds — quality stage shares llm_quality_score's rules
FUNNEL_MIN_TOKENS = 10
FUNNEL_STAGES = [
    "raw",
    "nonempty",
    "length",
    "quality",
    "exact_dedup",
    "decontaminated",
]


@query(
    "rpt_filter_funnel",
    f"""
    WITH {_SQL_GRAMS},
    bench AS (SELECT DISTINCT gh FROM g WHERE doc_id % {BENCH_MOD} = 0),
    contaminated AS (
      SELECT DISTINCT g.doc_id FROM g JOIN bench USING (gh)
      WHERE g.doc_id % {BENCH_MOD} != 0
    ),
    flags AS (
      SELECT d.doc_id,
             CAST(len(list_filter(string_split(d.text, ' '), w -> w != ''))
                  AS BIGINT) AS n_tok,
             len(string_split(d.text, ' ')) AS n_words_raw,
             len(list_distinct(string_split(d.text, ' '))) AS n_distinct_raw,
             len(list_filter(string_split(d.text, ' '),
                 x -> list_contains(['the','a','of','and','to'], x))) AS n_stop,
             ROW_NUMBER() OVER (PARTITION BY md5(d.text)
                                ORDER BY d.doc_id) AS dup_rk,
             (c.doc_id IS NOT NULL) AS is_contam
      FROM documents d LEFT JOIN contaminated c ON c.doc_id = d.doc_id
    ),
    smax AS (
      SELECT doc_id, n_tok,
             CASE WHEN n_tok < 1 THEN 1
                  WHEN n_tok < {FUNNEL_MIN_TOKENS} THEN 2
                  WHEN NOT (n_words_raw >= 50
                            AND n_stop * 10 <= n_words_raw * 3
                            AND n_distinct_raw * 10 >= n_words_raw) THEN 3
                  WHEN dup_rk != 1 THEN 4
                  WHEN doc_id % {BENCH_MOD} = 0 OR is_contam THEN 5
                  ELSE 6 END AS survived_through
      FROM flags
    ),
    expanded AS (
      SELECT unnest(range(0, survived_through)) AS stage_idx, n_tok
      FROM smax
    )
    SELECT CAST(stage_idx AS BIGINT) AS stage_idx,
           ['raw','nonempty','length','quality','exact_dedup',
            'decontaminated'][CAST(stage_idx AS INT) + 1] AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM expanded
    GROUP BY stage_idx
    ORDER BY stage_idx
    """,
)
def rpt_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation-funnel report: documents (and their token mass)
    surviving each stage of the standard pretraining filter chain —
    raw → nonempty → minimum length → quality heuristics
    (llm_quality_score's thresholds, integer-cross-multiplied so no
    ratio is ever a float) → exact dedup (first doc per md5(text)) →
    decontamination (drop benchmark docs and any train doc sharing a
    {DECON_GRAM}-gram with them). The one-page answer to "where does
    our data go?".

    Each doc computes its deepest-surviving stage in one pass (the
    stages are nested by construction), then explodes into one row per
    survived stage — a ≤ 6× row expansion of doc-level rows, not
    corpus text. Exchanges: the md5 dedup window, the broadcast
    decontamination semi-join, and the final 6-group aggregate."""
    from etl_ch_destination_spark.ops.neardup import shingle_hashes

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    g = d.select(
        "doc_id", F.explode(shingle_hashes(F.col("text"), DECON_GRAM)).alias("gh")
    )
    bench_gh = g.filter(F.col("doc_id") % BENCH_MOD == 0).select("gh").distinct()
    contaminated = (
        g.filter(F.col("doc_id") % BENCH_MOD != 0)
        .join(F.broadcast(bench_gh), "gh", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_contam", F.lit(True))
    )
    raw_words = F.split("text", " ")
    n_words_raw = F.size(raw_words)
    n_distinct_raw = F.size(F.array_distinct(raw_words))
    n_stop = F.size(
        F.filter(
            raw_words,
            lambda x: x.isin("the", "a", "of", "and", "to"),
        )
    )
    # r14 (guide §2.3 "project before the exchange"): compute the
    # token stats and the md5 dedup key map-side FIRST, so the window
    # exchange shuffles (doc_id, 32-char hash, four ints) instead of
    # full document text. Same values — the window partitions on the
    # identical md5(text) — with corpus bytes never crossing the wire.
    dup_w = Window.partitionBy("__h").orderBy("doc_id")
    stats = d.select(
        "doc_id",
        F.md5("text").alias("__h"),
        F.size(F.filter(raw_words, lambda w: w != F.lit("")))
        .cast("bigint")
        .alias("n_tok"),
        n_words_raw.alias("n_words_raw"),
        n_distinct_raw.alias("n_distinct_raw"),
        n_stop.alias("n_stop"),
    )
    flags = (
        stats.join(F.broadcast(contaminated), "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            "n_words_raw",
            "n_distinct_raw",
            "n_stop",
            F.row_number().over(dup_w).alias("dup_rk"),
            F.coalesce("is_contam", F.lit(False)).alias("is_contam"),
        )
    )
    quality_ok = (
        (F.col("n_words_raw") >= 50)
        & (F.col("n_stop") * 10 <= F.col("n_words_raw") * 3)
        & (F.col("n_distinct_raw") * 10 >= F.col("n_words_raw"))
    )
    survived = (
        F.when(F.col("n_tok") < 1, 1)
        .when(F.col("n_tok") < FUNNEL_MIN_TOKENS, 2)
        .when(~quality_ok, 3)
        .when(F.col("dup_rk") != 1, 4)
        .when((F.col("doc_id") % BENCH_MOD == 0) | F.col("is_contam"), 5)
        .otherwise(6)
    )
    expanded = flags.select(
        "n_tok",
        F.explode(F.sequence(F.lit(0), survived - 1)).alias("stage_idx"),
    )
    stage_name = F.element_at(
        F.array(*[F.lit(s) for s in FUNNEL_STAGES]),
        F.col("stage_idx").cast("int") + 1,
    )
    return (
        expanded.groupBy(F.col("stage_idx").cast("bigint").alias("stage_idx"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .select("stage_idx", stage_name.alias("stage"), "n_docs", "n_tokens")
        .orderBy("stage_idx")
    )


MATTR_W = 20  # MATTR sliding-window width (Covington & McFall 2010)


@query(
    "llm_mattr_diversity",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w != '') AS toks
      FROM documents
      WHERE len(list_filter(string_split(text, ' '), w -> w != '')) >= 1
    ),
    m AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
             CASE WHEN len(toks) >= {MATTR_W}
                  THEN CAST(len(toks) - {MATTR_W} + 1 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) END AS n_windows,
             CASE WHEN len(toks) >= {MATTR_W}
                  THEN CAST(list_sum(list_transform(
                         range(1, len(toks) - {MATTR_W} + 2),
                         i -> len(list_distinct(list_slice(
                                toks, CAST(i AS INT),
                                CAST(i + {MATTR_W} - 1 AS INT))))))
                       AS BIGINT)
                  ELSE CAST(len(list_distinct(toks)) AS BIGINT) END
               AS sum_distinct
      FROM t
    )
    SELECT doc_id, n_tok, n_windows, sum_distinct,
           CAST(sum_distinct AS DOUBLE)
             / CAST(n_windows * LEAST(n_tok, {MATTR_W}) AS DOUBLE) AS mattr
    FROM m
    """,
)
def llm_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR — moving-average type-token ratio (Covington & McFall,
    JQL 2010; public literature): mean distinct-token ratio over every
    sliding {MATTR_W}-token window. The length-invariant lexical-
    diversity signal corpus QA uses where raw TTR (llm_quality_score's
    lexical_diversity) shrinks with document length; docs shorter than
    the window fall back to plain TTR. Emitted as exact integer
    numerator (sum of per-window distinct counts) and denominator
    parts with ONE final IEEE division, so it hash-matches.

    Plan: pure per-row higher-order-function fold (transform over
    window starts, array_distinct per slice) — zero shuffles, no
    Python workers; O(n_tok · {MATTR_W}) per document, linear in
    corpus bytes. The windows never materialize as rows — only the
    per-doc integer sum leaves the expression."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda w: w != F.lit(""))
    t = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 1)
    n = F.size("toks")
    long_sum = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), n - MATTR_W + 1),
            lambda i: F.size(F.array_distinct(F.slice("toks", i, MATTR_W))),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    m = t.select(
        "doc_id",
        n.cast("bigint").alias("n_tok"),
        F.when(n >= MATTR_W, (n - MATTR_W + 1).cast("bigint"))
        .otherwise(F.lit(1).cast("bigint"))
        .alias("n_windows"),
        F.when(n >= MATTR_W, long_sum)
        .otherwise(F.size(F.array_distinct("toks")).cast("bigint"))
        .alias("sum_distinct"),
    )
    return m.select(
        "doc_id",
        "n_tok",
        "n_windows",
        "sum_distinct",
        (
            F.col("sum_distinct").cast("double")
            / (F.col("n_windows") * F.least(F.col("n_tok"), F.lit(MATTR_W)))
            .cast("double")
        ).alias("mattr"),
    )


TEMP_ALPHA_SQRT = True  # alpha = 0.5 temperature (sqrt sampling)


@query(
    "llm_temperature_mixture",
    """
    WITH s AS (
      SELECT source,
             CAST(SUM(len(list_filter(string_split(text, ' '), w -> w != '')))
                  AS BIGINT) AS n_tok
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, n_tok,
             CAST(FLOOR(sqrt(CAST(n_tok AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS wt_micro
      FROM s
    )
    SELECT source, n_tok,
           CAST(wt_micro AS DOUBLE) / 1000000.0 AS weight,
           CAST(wt_micro AS DOUBLE)
             / CAST(SUM(wt_micro) OVER () AS DOUBLE) AS share,
           (CAST(wt_micro AS DOUBLE)
              / CAST(SUM(wt_micro) OVER () AS DOUBLE))
             / (CAST(n_tok AS DOUBLE)
                / CAST(SUM(n_tok) OVER () AS DOUBLE)) AS upsample_factor
    FROM w
    """,
)
def llm_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture reweighting — the alpha = 0.5
    exponentiated-smoothing rule multilingual pretraining uses (mBERT /
    XLM-R's p_i^alpha renormalization, public literature) to boost
    low-resource sources: weight_i = n_i^0.5, share_i = w_i / sum(w).
    sqrt is an IEEE correctly-rounded operation, so both engines get
    the identical double; the SUM of those irrational weights is the
    one order-sensitive step, so the weights are quantized FIRST to
    int64 micro-units via floor(sqrt·1e6) — floor of a double is exact
    and identical everywhere, where a double→DECIMAL cast is NOT
    (Spark rounds HALF_UP, DuckDB differs in the last place — measured
    at sf0.1) — and the micro-unit sum is exact integer arithmetic.
    upsample_factor = share / natural-share says how much each source
    over/under-samples.

    Plan: one per-source aggregate (map-side combinable), then windows
    over the |sources|-sized frame — post-agg, any scale."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", " "), lambda w: w != F.lit("")))
    s = d.groupBy("source").agg(F.sum(n_tok).cast("bigint").alias("n_tok"))
    wt_micro = F.floor(
        F.sqrt(F.col("n_tok").cast("double")) * F.lit(1000000.0)
    ).cast("bigint")
    w_all = Window.partitionBy()
    base = s.select("source", "n_tok", wt_micro.alias("wt_micro"))
    share = F.col("wt_micro").cast("double") / F.sum("wt_micro").over(
        w_all
    ).cast("double")
    nat = F.col("n_tok").cast("double") / F.sum("n_tok").over(w_all).cast(
        "double"
    )
    return base.select(
        "source",
        "n_tok",
        (F.col("wt_micro").cast("double") / F.lit(1000000.0)).alias("weight"),
        share.alias("share"),
        (share / nat).alias("upsample_factor"),
    )


@query(
    "llm_perplexity_buckets",
    """
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE length(text) > 0 AND len(string_split(text, ' ')) >= 2
    ),
    bg AS (
      SELECT doc_id, w[i] AS w1, w[i+1] AS w2
      FROM docs, unnest(range(1, len(w))) AS t(i)
    ),
    counts AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY w1, w2),
    model AS (
      SELECT w1, w2, n,
             CAST(SUM(n) OVER (PARTITION BY w1) AS BIGINT) AS head_n
      FROM counts
    ),
    per_doc AS (
      SELECT b.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(length(format('{:b}', m.head_n // m.n)) - 1)
                  AS BIGINT) AS sum_bits
      FROM bg b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
      GROUP BY b.doc_id
    )
    SELECT sum_bits // n_bigrams AS bits_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams_total,
           CAST(SUM(sum_bits) AS DOUBLE) / CAST(SUM(n_bigrams) AS DOUBLE)
             AS mean_bits_in_bucket
    FROM per_doc
    GROUP BY bits_bucket
    """,
)
def llm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus perplexity histogram — documents bucketed by their
    whole-bit mean bigram surprisal (floor of sum_bits/n_bigrams, an
    integer division, so bucket membership is exact): the corpus-level
    view a data team reads to pick the perplexity cutoffs that
    llm_bigram_surprisal scores per document (the CCNet-style
    perplexity-bucket triage, public literature). Same dyadic
    whole-bit surprisal as the per-doc key — exact integers until the
    final per-bucket mean.

    Plan: identical model-train + model-apply shape as
    llm_bigram_surprisal (one bigram fan-out feeding both the count
    aggregate and the score join), plus one extra 6-ish-row bucket
    aggregate on top."""
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
    per_doc = (
        bg.join(model, ["w1", "w2"])
        .select("doc_id", bits.alias("bits"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("bits").cast("bigint").alias("sum_bits"),
        )
    )
    return (
        per_doc.groupBy(
            F.expr("sum_bits div n_bigrams").alias("bits_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bigrams").cast("bigint").alias("n_bigrams_total"),
            (
                F.sum("sum_bits").cast("double")
                / F.sum("n_bigrams").cast("double")
            ).alias("mean_bits_in_bucket"),
        )
    )


@query(
    "llm_dedup_normalized",
    """
    WITH n AS (
      SELECT doc_id,
             md5(trim(regexp_replace(
               regexp_replace(lower(text), '[0-9]+', '0', 'g'),
               ' +', ' ', 'g'))) AS norm_hash,
             lower(text) != trim(regexp_replace(
               regexp_replace(lower(text), '[0-9]+', '0', 'g'),
               ' +', ' ', 'g')) AS changed
      FROM documents
    )
    SELECT doc_id, norm_hash, changed,
           CAST(COUNT(*) OVER (PARTITION BY norm_hash) AS BIGINT)
             AS group_size,
           ROW_NUMBER() OVER (PARTITION BY norm_hash ORDER BY doc_id) = 1
             AS is_kept
    FROM n
    """,
)
def llm_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-then-exact dedup — the cheap fuzzy-dedup layer
    between exact md5 dedup and MinHash: canonicalize (lowercase,
    collapse digit runs to 0, collapse space runs, trim) and group by
    the hash of the canonical form, so near-copies differing only in
    casing, ids, or whitespace collapse into one group. This is the
    C4-style preprocessing dedup; keeps the lowest doc_id per group
    (the repo's deterministic keep rule).

    Plan: the canonicalization is map-side regex codegen; one exchange
    on the 128-bit norm hash serves both the group-size window and the
    keeper rank (same partitioning, one Window operator)."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[0-9]+", "0"),
            " +",
            " ",
        )
    )
    w = Window.partitionBy("norm_hash")
    wr = Window.partitionBy("norm_hash").orderBy("doc_id")
    return (
        d.select(
            "doc_id",
            F.md5(norm).alias("norm_hash"),
            (F.lower(F.col("text")) != norm).alias("changed"),
        )
        .select(
            "doc_id",
            "norm_hash",
            "changed",
            F.count(F.lit(1)).over(w).cast("bigint").alias("group_size"),
            (F.row_number().over(wr) == 1).alias("is_kept"),
        )
    )


SUBSTR_GRAM = 40   # char-shingle length (BigCode used 50-token spans)
SUBSTR_STEP = 10   # shingle stride. NOTE both docs shingle on their own
                   # position grid (starts 1, 11, 21, ...), so a shared
                   # run yields a common shingle hash only when its
                   # start offsets in the two docs are congruent mod
                   # SUBSTR_STEP — phase-aligned copies (identical
                   # prefixes / whole-doc duplicates / block-aligned
                   # boilerplate). For a true length-based guarantee,
                   # stride one side only (index every position of the
                   # other) at ~STEP× the fan-out cost.


@query(
    "llm_dedup_substring",
    f"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, length(text) - {SUBSTR_GRAM - 2}, {SUBSTR_STEP}),
               i -> md5(substr(text, CAST(i AS INT), {SUBSTR_GRAM})))))
               AS h
      FROM documents WHERE length(text) >= {SUBSTR_GRAM}
    ),
    dup AS (
      SELECT h FROM sh GROUP BY h
      HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared,
           CAST(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS shared_frac
    FROM sh s LEFT JOIN dup d ON d.h = s.h
    GROUP BY s.doc_id
    """,
)
def llm_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-level shared-substring detection — the practical
    approximation of exact-substring dedup (the suffix-array
    deduplication of Lee et al. 2022, public literature): strided
    {SUBSTR_GRAM}-char shingles (stride {SUBSTR_STEP}; detection is
    guaranteed only for phase-aligned copies — runs whose start
    offsets in the two documents are congruent mod the stride, e.g.
    identical prefixes or whole-doc duplicates — since both sides
    shingle on their own position grid) hashed with md5; a shingle
    appearing in ≥2 documents marks boilerplate/quotation overlap, and
    each doc reports its shared-shingle fraction. Character-level
    catches what word-level n-gram Jaccard misses (whitespace/markup
    variants); the word-level axes live in llm_dedup_ngram_jaccard.

    Plan: map-side strided substring hashing (an O(len/stride)
    fan-out, ~1/10th of the char count), one (hash → distinct-doc
    count) aggregate whose output is Zipf-small, joined back by hash
    key — the same model-train/model-apply exchange-reuse shape as
    the bigram LM keys. No all-pairs term anywhere."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= SUBSTR_GRAM
    )
    starts = F.sequence(
        F.lit(1), F.length("text") - (SUBSTR_GRAM - 1), F.lit(SUBSTR_STEP)
    )
    sh = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    starts,
                    lambda i: F.md5(F.col("text").substr(i, F.lit(SUBSTR_GRAM))),
                )
            )
        ).alias("h"),
    )
    dup = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
        .withColumn("is_dup", F.lit(1))
    )
    shared = F.sum(F.when(F.col("is_dup").isNotNull(), 1).otherwise(0)).cast(
        "bigint"
    )
    return (
        sh.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            shared.alias("n_shared"),
            (shared.cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "shared_frac"
            ),
        )
    )


@query(
    "llm_dedup_substring_exact",
    f"""
    WITH idx AS (
      SELECT doc_id AS a,
             unnest(list_distinct(list_transform(
               range(1, CAST(length(text) - {SUBSTR_GRAM - 2} AS INT), 1),
               i -> md5(substr(text, CAST(i AS INT), {SUBSTR_GRAM})))))
               AS h
      FROM documents
      WHERE length(text) >= {SUBSTR_GRAM} AND doc_id % 2 = 0
    ),
    probe AS (
      SELECT doc_id AS b,
             unnest(list_distinct(list_transform(
               range(1, CAST(length(text) - {SUBSTR_GRAM - 2} AS INT),
                     {SUBSTR_STEP}),
               i -> md5(substr(text, CAST(i AS INT), {SUBSTR_GRAM})))))
               AS h
      FROM documents
      WHERE length(text) >= {SUBSTR_GRAM} AND doc_id % 2 = 1
    )
    SELECT idx.a, probe.b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
    FROM idx JOIN probe ON probe.h = idx.h
    GROUP BY idx.a, probe.b
    """,
)
def llm_dedup_substring_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-partition shared-substring detection with the TRUE length
    guarantee llm_dedup_substring's symmetric striding lacks (the
    ADVICE r8 finding): the INDEX side (even doc_ids — an old corpus)
    shingles EVERY position, the PROBE side (odd doc_ids — the new
    batch) strides by {SUBSTR_STEP}. Any shared run of
    ≥ {SUBSTR_GRAM + SUBSTR_STEP - 1} chars now necessarily contains
    some probe-grid shingle, and every {SUBSTR_GRAM}-char window of
    the index side exists in the index — so detection no longer
    depends on the two documents' phase alignment mod the stride.
    Cost: the index side fans out ~STEP× more than the strided form —
    the classic index-once/probe-cheap asymmetry (one-time cost
    amortized over every future probe batch; Lee et al. 2022's
    suffix-array dedup is the limit of the same idea).

    Plan: both sides are map-side explodes; one hash equi-join on the
    shingle digest + a (a, b) pair aggregate. Pair cardinality is
    bounded by真 shared content, not by corpus size — disjoint texts
    produce zero join rows. No all-pairs anywhere."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= SUBSTR_GRAM
    )

    def shingles(df, step: int, alias: str):
        starts = F.sequence(
            F.lit(1), F.length("text") - (SUBSTR_GRAM - 1), F.lit(step)
        )
        return df.select(
            F.col("doc_id").alias(alias),
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

    idx = shingles(d.filter(F.col("doc_id") % 2 == 0), 1, "a")
    probe = shingles(d.filter(F.col("doc_id") % 2 == 1), SUBSTR_STEP, "b")
    return (
        idx.join(probe, "h")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_shingles"))
    )
