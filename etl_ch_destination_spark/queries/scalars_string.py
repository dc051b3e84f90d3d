"""SURVEY §2.8 — string scalar families (str_basic, str_regex,
str_search, str_distance).

ClickHouse analog: the string function surface (`concat`, `upper`,
`replaceRegexpAll`, `extract`, `position`, `levenshtein`...).

Scale notes: pure narrow projections — no shuffle, whole-stage
codegen end to end, column-pruned parquet scans (only the referenced
part/nation columns are read). Dialect-pinned against DuckDB 1.0:
no `initcap` (absent there — pytest-only on the Spark side),
regexp_replace carries the 'g' flag in the oracle (DuckDB replaces
first match by default; Spark replaces all), extract-all arrays are
serialized with array_join (the driver's hasher takes scalars only).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.registry import query


@query(
    "str_basic",
    """
    SELECT p_partkey,
           concat_ws('|', p_brand, p_type) AS brand_type,
           upper(p_type) AS up,
           lower(p_name) AS lo,
           trim(concat(' ', p_name, ' ')) AS trimmed,
           length(p_name) AS name_len,
           substring(p_name, 1, 5) AS name5,
           replace(p_name, ' ', '_') AS snake,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
           split_part(p_name, ' ', 2) AS word2
    FROM part
    """,
)
def str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/upper/lower/trim/length/substring/replace/lpad/split_part
    (CH string basics). `initcap` is Spark-only (no DuckDB equivalent)
    and covered in tests/test_scalars.py."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.upper("p_type").alias("up"),
        F.lower("p_name").alias("lo"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("word2"),
    )


@query(
    "str_regex",
    """
    SELECT p_partkey,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
           array_to_string(regexp_extract_all(p_type, '[A-Z]+'), ',') AS type_tokens
    FROM part
    """,
)
def str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH `extract`/`replaceRegexpAll`/`extractAll`. POSIX-safe patterns
    only (SURVEY §2.8 dialect note); Spark regexp_replace is global by
    default — the oracle pins DuckDB's 'g' flag to match."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("no_vowels"),
        F.array_join(
            F.regexp_extract_all(F.col("p_type"), F.lit("[A-Z]+"), F.lit(0)), ","
        ).alias("type_tokens"),
    )


@query(
    "str_search",
    """
    SELECT p_partkey,
           strpos(p_type, 'BRASS') AS pos_brass,
           contains(p_type, 'PROMO') AS has_promo,
           starts_with(p_type, 'PROMO') AS is_promo,
           ends_with(p_type, 'STEEL') AS is_steel
    FROM part
    """,
)
def str_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """position/contains/startsWith/endsWith (CH `position`,
    `hasSubstr`, `startsWith`, `endsWith`)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.instr("p_type", "BRASS").alias("pos_brass"),
        F.contains(F.col("p_type"), F.lit("PROMO")).alias("has_promo"),
        F.startswith(F.col("p_type"), F.lit("PROMO")).alias("is_promo"),
        F.endswith(F.col("p_type"), F.lit("STEEL")).alias("is_steel"),
    )


@query(
    "str_distance",
    """
    SELECT n_name,
           levenshtein(n_name, 'UNITED STATES') AS lev_us,
           levenshtein(n_name, 'CHINA') AS lev_cn
    FROM nation
    """,
)
def str_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance for fuzzy dedup (BASELINE north-star `dedup`).
    `soundex` is Spark-only (absent in DuckDB) — tests/test_scalars.py."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.levenshtein(F.col("n_name"), F.lit("UNITED STATES")).alias("lev_us"),
        F.levenshtein(F.col("n_name"), F.lit("CHINA")).alias("lev_cn"),
    )


@query(
    "url_funcs",
    """
    SELECT doc_id,
           'https' AS proto,
           source || '.example.com' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           lang AS lang_param
    FROM documents
    """,
)
def url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition family (CH `protocol`/`domain`/`path`/
    `extractURLParameter`) via Spark's `parse_url` — exercised on a
    URL derived deterministically from fixture columns (the corpus has
    no URL column). The oracle reconstructs each component from the
    same base columns, so this gate proves parse_url implements the
    spec, not merely that both engines share a parser."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "str_readable_format",
    """
    WITH b AS (
        SELECT doc_id,
               CAST(n_chars * (doc_id % 1000 + 1) AS BIGINT) AS nbytes
        FROM documents
    ),
    u AS (
        SELECT doc_id, nbytes,
               CASE WHEN nbytes >= 1073741824 THEN 3
                    WHEN nbytes >= 1048576 THEN 2
                    WHEN nbytes >= 1024 THEN 1
                    ELSE 0 END AS unit
        FROM b
    ),
    h AS (
        SELECT doc_id, nbytes, unit,
               CASE unit WHEN 0 THEN nbytes * 100
                         WHEN 1 THEN nbytes * 100 // 1024
                         WHEN 2 THEN nbytes * 100 // 1048576
                         ELSE nbytes * 100 // 1073741824 END AS hundredths
        FROM u
    )
    SELECT doc_id, nbytes,
           CAST(hundredths // 100 AS VARCHAR) || '.' ||
             lpad(CAST(hundredths % 100 AS VARCHAR), 2, '0') || ' ' ||
             CASE unit WHEN 0 THEN 'B' WHEN 1 THEN 'KiB'
                       WHEN 2 THEN 'MiB' ELSE 'GiB' END AS readable
    FROM h
    """,
)
def str_readable_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH `formatReadableSize` — human-readable byte sizes ("1.38 MiB")
    built from PURE INTEGER arithmetic: hundredths = bytes·100 div
    1024^k, string = div 100 || '.' || lpad(mod 100). Deliberately NOT
    printf('%.2f'): Java's format rounds HALF_UP while C's printf
    rounds half-even, so float formatting cannot hash-match across
    engines — floor-to-2-decimals integer formatting can, and the
    floor semantics is documented here as the engine's contract.
    Synthetic byte counts (n_chars · (doc_id mod 1000 + 1)) span B
    through GiB so every unit branch is exercised.

    Map-side codegen string building — zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    nbytes = (F.col("n_chars") * (F.col("doc_id") % 1000 + 1)).cast("bigint")
    b = d.select("doc_id", nbytes.alias("nbytes"))
    unit = (
        F.when(F.col("nbytes") >= 1073741824, 3)
        .when(F.col("nbytes") >= 1048576, 2)
        .when(F.col("nbytes") >= 1024, 1)
        .otherwise(0)
    )
    u = b.select("doc_id", "nbytes", unit.alias("unit"))
    hundredths = (
        F.when(F.col("unit") == 0, F.col("nbytes") * 100)
        .when(F.col("unit") == 1, F.expr("nbytes * 100 div 1024"))
        .when(F.col("unit") == 2, F.expr("nbytes * 100 div 1048576"))
        .otherwise(F.expr("nbytes * 100 div 1073741824"))
    )
    h = u.select("doc_id", "nbytes", "unit", hundredths.alias("hundredths"))
    readable = F.concat(
        F.expr("CAST(hundredths div 100 AS STRING)"),
        F.lit("."),
        F.lpad((F.col("hundredths") % 100).cast("string"), 2, "0"),
        F.lit(" "),
        F.when(F.col("unit") == 0, "B")
        .when(F.col("unit") == 1, "KiB")
        .when(F.col("unit") == 2, "MiB")
        .otherwise("GiB"),
    )
    return h.select("doc_id", "nbytes", readable.alias("readable"))


MULTI_NEEDLES = ("data", "model", "test", "spark")


@query(
    "str_multi_search",
    f"""
    SELECT doc_id,
           (instr(text, 'data') > 0 OR instr(text, 'model') > 0
            OR instr(text, 'test') > 0 OR instr(text, 'spark') > 0)
             AS any_hit,
           CAST((CASE WHEN instr(text, 'data')  > 0 THEN 1 ELSE 0 END
               + CASE WHEN instr(text, 'model') > 0 THEN 1 ELSE 0 END
               + CASE WHEN instr(text, 'test')  > 0 THEN 1 ELSE 0 END
               + CASE WHEN instr(text, 'spark') > 0 THEN 1 ELSE 0 END)
             AS INT) AS n_hits,
           CAST(CASE
             WHEN instr(text, 'data')  > 0 THEN 1
             WHEN instr(text, 'model') > 0 THEN 2
             WHEN instr(text, 'test')  > 0 THEN 3
             WHEN instr(text, 'spark') > 0 THEN 4
             ELSE 0 END AS INT) AS first_needle,
           CAST(LEAST(
             CASE WHEN instr(text, 'data')  > 0 THEN instr(text, 'data')  ELSE 2147483647 END,
             CASE WHEN instr(text, 'model') > 0 THEN instr(text, 'model') ELSE 2147483647 END,
             CASE WHEN instr(text, 'test')  > 0 THEN instr(text, 'test')  ELSE 2147483647 END,
             CASE WHEN instr(text, 'spark') > 0 THEN instr(text, 'spark') ELSE 2147483647 END
           ) AS BIGINT) AS min_pos
    FROM documents
    """,
)
def str_multi_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH `multiSearchAny` / `multiSearchFirstIndex` /
    `multiSearchAllPositions`-style multi-needle search in one pass:
    any-hit flag, hit count, 1-based index of the first matching
    needle (needle-list order — the CH firstIndex convention), and the
    earliest match position across all needles (sentinel INT32_MAX
    when absent, matching the LEAST-fold both engines run). All
    needles are evaluated in a single codegen projection — the
    multi-needle point is one scan, not k scans.

    Scale: pure map-side projection, no shuffle; at 100 TB this is
    the predicate-bank shape (e.g. a blocklist screen) that runs at
    scan speed."""
    d = load_table(spark, sf_dir, "documents")
    hits = [F.instr("text", nd) for nd in MULTI_NEEDLES]
    any_hit = hits[0] > 0
    for h in hits[1:]:
        any_hit = any_hit | (h > 0)
    n_hits = sum((h > 0).cast("int") for h in hits)
    first_needle = F.lit(0)
    for idx in range(len(MULTI_NEEDLES) - 1, -1, -1):
        first_needle = F.when(hits[idx] > 0, idx + 1).otherwise(first_needle)
    sentinel = F.lit(2147483647)
    min_pos = F.least(
        *[F.when(h > 0, h).otherwise(sentinel) for h in hits]
    ).cast("bigint")
    return d.select(
        "doc_id",
        any_hit.alias("any_hit"),
        n_hits.cast("int").alias("n_hits"),
        first_needle.cast("int").alias("first_needle"),
        min_pos.alias("min_pos"),
    )


@query(
    "str_readable_timedelta",
    """
    WITH t AS (
      SELECT event_id, (event_id * 37) % 8000000 AS secs
      FROM events
    ),
    p AS (
      SELECT event_id, secs,
             secs // 86400 AS d, (secs % 86400) // 3600 AS h,
             (secs % 3600) // 60 AS m, secs % 60 AS s
      FROM t
    )
    SELECT event_id, CAST(secs AS BIGINT) AS secs,
           concat_ws(', ',
             CASE WHEN d > 0 THEN d || CASE WHEN d = 1 THEN ' day'
                                            ELSE ' days' END END,
             CASE WHEN h > 0 THEN h || CASE WHEN h = 1 THEN ' hour'
                                            ELSE ' hours' END END,
             CASE WHEN m > 0 THEN m || CASE WHEN m = 1 THEN ' minute'
                                            ELSE ' minutes' END END,
             CASE WHEN s > 0 OR secs = 0
                  THEN s || CASE WHEN s = 1 THEN ' second'
                                 ELSE ' seconds' END END
           ) AS readable
    FROM p
    """,
)
def str_readable_timedelta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``formatReadableTimeDelta`` — seconds rendered as
    "2 days, 3 hours, 5 seconds" with singular/plural forms and zero
    units elided (seconds kept when the whole delta is zero). Pure
    integer div/mod + string concatenation — the same
    no-float-formatting policy as str_readable_format (printf rounding
    differs between JVM and C, integer string building cannot).
    Synthetic deltas (event_id·37 mod 8e6) span seconds→months so
    every unit and plural branch is exercised. Map-side codegen
    projection, zero shuffles."""
    e = load_table(spark, sf_dir, "events")
    secs = (F.col("event_id") * 37) % 8000000
    d = F.expr("secs div 86400")
    h = F.expr("(secs % 86400) div 3600")
    m = F.expr("(secs % 3600) div 60")
    s = F.col("secs") % 60

    def unit(n, name):
        return F.concat(
            n.cast("string"),
            F.when(n == 1, F.lit(f" {name}")).otherwise(F.lit(f" {name}s")),
        )

    return (
        e.select("event_id", secs.alias("secs"))
        .select(
            "event_id",
            F.col("secs").cast("bigint").alias("secs"),
            F.concat_ws(
                ", ",
                F.when(d > 0, unit(d, "day")),
                F.when(h > 0, unit(h, "hour")),
                F.when(m > 0, unit(m, "minute")),
                F.when((s > 0) | (F.col("secs") == 0), unit(s, "second")),
            ).alias("readable"),
        )
    )


@query(
    "url_hierarchy",
    """
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com' AS origin,
             '/docs/' || CAST(doc_id AS VARCHAR) AS path
      FROM documents
    )
    SELECT doc_id, CAST(lvl AS BIGINT) AS level,
           CASE lvl WHEN 1 THEN origin || '/'
                    WHEN 2 THEN origin || '/docs/'
                    ELSE origin || path END AS url_prefix
    FROM u CROSS JOIN (VALUES (1), (2), (3)) AS l(lvl)
    """,
)
def url_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``URLPathHierarchy`` — the cumulative URL-prefix ladder
    ("https://h/", "https://h/docs/", "https://h/docs/42") used for
    drill-down path analytics; one row per (url, level) so downstream
    GROUP BY level aggregates roll pageviews up the path tree. Same
    synthetic URL derivation as url_funcs (the corpus has no URL
    column). A 3-element literal fan-out + string concat — pure
    map-side codegen, zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    origin = F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com"))
    full = F.concat(origin, F.lit("/docs/"), F.col("doc_id").cast("string"))
    lvl = F.explode(F.array(F.lit(1), F.lit(2), F.lit(3)))
    return (
        d.select("doc_id", origin.alias("origin"), full.alias("full"),
                 lvl.alias("level"))
        .select(
            "doc_id",
            F.col("level").cast("bigint").alias("level"),
            F.when(F.col("level") == 1, F.concat("origin", F.lit("/")))
            .when(F.col("level") == 2, F.concat("origin", F.lit("/docs/")))
            .otherwise(F.col("full"))
            .alias("url_prefix"),
        )
    )


CHAR_NGRAM_N = 3
CHAR_NGRAM_TOP = 50


@query(
    "str_char_ngrams",
    f"""
    WITH g AS (
      SELECT unnest(list_transform(
               range(1, length(p_name) - {CHAR_NGRAM_N - 2}),
               i -> substr(p_name, CAST(i AS INT), {CHAR_NGRAM_N}))) AS gram
      FROM part WHERE length(p_name) >= {CHAR_NGRAM_N}
    )
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
    FROM g
    GROUP BY gram
    ORDER BY n DESC, gram
    LIMIT {CHAR_NGRAM_TOP}
    """,
)
def str_char_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``ngrams(s, n)`` — character {CHAR_NGRAM_N}-gram extraction
    with a corpus-frequency rollup (top {CHAR_NGRAM_TOP} grams of the
    part names, total order by count then gram). The char-gram
    explode is the primitive under the simhash/ngram-distance keys,
    exposed here as its own surface. Map-side substring transform +
    one hash aggregate; the top-k is a WindowGroupLimit-style global
    sort of the |distinct grams| frame, not the corpus."""
    p = load_table(spark, sf_dir, "part").filter(
        F.length("p_name") >= CHAR_NGRAM_N
    )
    grams = p.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("p_name") - (CHAR_NGRAM_N - 1)),
                lambda i: F.col("p_name").substr(i, F.lit(CHAR_NGRAM_N)),
            )
        ).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "gram")
        .limit(CHAR_NGRAM_TOP)
    )


@query(
    "str_slugify",
    """
    SELECT p_partkey,
           trim(BOTH '-' FROM regexp_replace(lower(p_name),
                                             '[^a-z0-9]+', '-', 'g')) AS slug,
           CAST(length(trim(BOTH '-' FROM regexp_replace(lower(p_name),
                '[^a-z0-9]+', '-', 'g'))) AS BIGINT) AS slug_len
    FROM part
    """,
)
def str_slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-slug normalization — lowercase, collapse every non-
    alphanumeric run to a single '-', trim edge dashes: the id
    canonicalization used for URLs, file names, and join keys against
    scraped data. Pure regex codegen projection, zero shuffles; the
    regex dialect is pinned identical on both engines (character
    class + '+' quantifier only)."""
    p = load_table(spark, sf_dir, "part")
    slug = F.expr(
        "trim(BOTH '-' FROM regexp_replace(lower(p_name), '[^a-z0-9]+', '-'))"
    )
    return p.select(
        "p_partkey",
        slug.alias("slug"),
        F.length(slug).cast("bigint").alias("slug_len"),
    )


@query(
    "str_printf_int",
    """
    SELECT p_partkey,
           printf('%08d', p_partkey) AS key_padded,
           printf('SKU-%x-%s', p_partkey, p_brand) AS sku,
           printf('%d/%d', p_size, p_partkey % 10) AS ratio_repr
    FROM part
    """,
)
def str_printf_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """printf-style formatting over INTEGER/STRING arguments only —
    zero-padded ids, hex render, composite SKUs (Spark format_string /
    java.util.Formatter vs DuckDB's C printf agree exactly on %d, %s,
    %x, and zero-padding; FLOAT specifiers are deliberately excluded —
    %f rounds HALF_UP in Java and half-even in C, the same cliff
    str_readable_format documents). Map-side codegen projection."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.format_string("%08d", "p_partkey").alias("key_padded"),
        F.format_string("SKU-%x-%s", "p_partkey", "p_brand").alias("sku"),
        F.format_string(
            "%d/%d", "p_size", F.col("p_partkey") % 10
        ).alias("ratio_repr"),
    )


@query(
    "str_normalize_nfc",
    """
    WITH raw AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
                  THEN 'caf' || chr(101) || chr(769) || ' ' || text
                  ELSE 'caf' || chr(233) || ' ' || text END AS s
      FROM documents
    )
    SELECT doc_id,
           CAST(length(s) AS BIGINT) AS len_raw,
           CAST(length(nfc_normalize(s)) AS BIGINT) AS len_nfc,
           (s <> nfc_normalize(s)) AS changed,
           md5(nfc_normalize(s)) AS nfc_md5
    FROM raw
    """,
)
def str_normalize_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (ClickHouse ``normalizeUTF8NFC``) —
    the canonicalization every text dedup/search pipeline needs:
    'é' as one codepoint (U+00E9) and as 'e' + COMBINING ACUTE
    (U+0301) must hash identically. The fixture text is ASCII, so each
    doc is prefixed with a DETERMINISTIC decomposed/precomposed "café"
    (by doc_id parity); NFC collapses both spellings to the same
    bytes — the md5 column proves it (even and odd docs sharing a text
    get equal hashes), and `changed` marks exactly the decomposed
    half. Spark has no built-in normalizer, so this is a REAL
    Arrow-batched pandas UDF over stdlib ``unicodedata`` — the
    vectorized Python path at its legitimate use: semantics the JVM
    engine lacks.

    Plan: map-side UDF, zero shuffles; the Arrow batch transfer is the
    only cost — the acceptable shape for a per-row text transform at
    100 TB (never a row-at-a-time @udf)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda x: unicodedata.normalize("NFC", x))

    d = load_table(spark, sf_dir, "documents")
    decomposed = "caf" + "e\u0301" + " "   # e + COMBINING ACUTE (U+0301)
    precomposed = "caf" + "\u00e9" + " "   # single-codepoint e-acute
    raw = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.lit(decomposed), F.col("text"))
        )
        .otherwise(F.concat(F.lit(precomposed), F.col("text")))
        .alias("s"),
    )
    n = nfc(F.col("s"))
    return raw.select(
        "doc_id",
        F.length("s").cast("bigint").alias("len_raw"),
        F.length(n).cast("bigint").alias("len_nfc"),
        (F.col("s") != n).alias("changed"),
        F.md5(n).alias("nfc_md5"),
    )


@query(
    "str_extract_all_groups",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\b([a-z]{2,})(er|ing)\b', 0))
                AS BIGINT) AS n_matches,
           COALESCE(array_to_string(
             regexp_extract_all(text, '\b([a-z]{2,})(er|ing)\b', 1), ','), '')
             AS stems_csv,
           COALESCE(array_to_string(
             regexp_extract_all(text, '\b([a-z]{2,})(er|ing)\b', 2), ','), '')
             AS suffixes_csv
    FROM documents
    """,
)
def str_extract_all_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``extractAllGroups(Horizontal)`` — pull EVERY match
    of a capture-group regex out of free text (the
    entity-extraction primitive — here "<stem>er|ing" morphology),
    one column per group, order preserved. Spark's
    ``regexp_extract_all(col, pat, g)`` maps 1:1 to DuckDB's
    ``regexp_extract_all`` with the same RE2-class pattern, so the
    extracted sequences hash-match exactly (csv-joined; found along
    the way: DuckDB's array_to_string of an EMPTY list is NULL where
    Spark's array_join is '' — the oracle COALESCEs).

    Plan: pure map-side regex codegen, zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    pat = r"\b([a-z]{2,})(er|ing)\b"
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
        .cast("bigint")
        .alias("n_matches"),
        F.array_join(
            F.regexp_extract_all("text", F.lit(pat), F.lit(1)), ","
        ).alias("stems_csv"),
        F.array_join(
            F.regexp_extract_all("text", F.lit(pat), F.lit(2)), ","
        ).alias("suffixes_csv"),
    )


# str_soundex: American Soundex letter→digit code table
_SDX_FROM = "BFPVCGJKQSXZDTLMNRAEIOUY"
_SDX_TO = "111122222222334556000000"


@query(
    "str_soundex",
    f"""
    WITH w AS (
      SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
      FROM part
    ),
    s AS (
      SELECT p_partkey, word,
             upper(regexp_replace(word, '[^A-Za-z]', '', 'g')) AS su
      FROM w WHERE word <> ''
    ),
    c AS (
      SELECT p_partkey, word,
             substr(su, 1, 1) AS head,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           translate(regexp_replace(su, '[HW]', '', 'g'),
                                     '{_SDX_FROM}', '{_SDX_TO}'),
                           '0+', '0', 'g'),
                         '1+', '1', 'g'),
                       '2+', '2', 'g'),
                     '3+', '3', 'g'),
                   '4+', '4', 'g'),
                 '5+', '5', 'g'),
               '6+', '6', 'g') AS coll
      FROM s
    )
    SELECT p_partkey, word,
           head || substr(
             replace(CASE WHEN head IN ('H', 'W') THEN coll
                          ELSE substr(coll, 2) END, '0', '') || '000',
             1, 3) AS soundex
    FROM c
    """,
)
def str_soundex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """American Soundex phonetic code (NARA standard / Knuth TAOCP v3,
    public; ClickHouse ``soundex``) of every word of every part name —
    the classic fuzzy-name-matching key for entity resolution.

    Both engines run the IDENTICAL regex pipeline, chosen so every
    step exists in BOTH dialects (RE2 has no pattern backreferences,
    so the adjacent-duplicate collapse is seven per-digit ``d+ → d``
    replaces instead of ``(\\d)\\1+``): strip non-letters, uppercase,
    delete the transparent H/W (same-code letters separated by h/w
    code ONCE — the rule that makes Ashcraft A261 not A226), translate
    the code table with vowels as '0' separators (same-code letters
    separated by vowels code TWICE), collapse runs, drop the head's
    own code unless the head was H/W (deleted above — dropping would
    eat the second letter's code: Wright must stay W623), strip the
    vowel zeros, pad to head + 3 digits.

    Plan: explode + pure map-side string codegen, zero shuffles, only
    (p_partkey, p_name) read from the scan."""
    p = load_table(spark, sf_dir, "part")
    w = p.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    ).filter(F.col("word") != "")
    su = F.upper(F.regexp_replace("word", "[^A-Za-z]", ""))
    head = F.substring(su, 1, 1)
    coll = F.translate(
        F.regexp_replace(su, "[HW]", ""), _SDX_FROM, _SDX_TO
    )
    for d in "0123456":
        coll = F.regexp_replace(coll, f"{d}+", d)
    # stage the collapsed code through a projection so the seven-replace
    # chain is computed once, not re-expanded per consumer expression
    w = w.withColumn("__head", head).withColumn("__coll", coll)
    body = F.when(
        F.col("__head").isin("H", "W"), F.col("__coll")
    ).otherwise(F.substring(F.col("__coll"), 2, 1000000))
    digits = F.regexp_replace(body, "0", "")
    return w.select(
        "p_partkey",
        "word",
        F.concat(
            F.col("__head"),
            F.substring(F.concat(digits, F.lit("000")), 1, 3),
        ).alias("soundex"),
    )
