"""SURVEY §2.8 — array / map / JSON scalar families (arr_construct,
arr_explode, arr_membership, arr_transform_ho, map_funcs,
json_extract_props, json_struct_ops).

ClickHouse analog: `Array`/`Map` types, `arrayJoin` (the CH-idiomatic
UNNEST), the `arrayMap`/`arrayFilter`/`arrayReduce` higher-order
family, and `JSONExtract*` over the `events.props` JSON column.

Driver-hasher constraint: oracle-checked results must be scalar-typed,
so array outputs are serialized (`array_join`) and map outputs are
projected to scalars. DuckDB map extraction returns a LIST (probed),
so `map_funcs`' oracle states the equivalent scalar semantics in plain
SQL while the Spark side genuinely builds and queries a MapType.

Scale notes: `arr_explode` multiplies rows (fan-out ≈ tokens/row) —
at 100 TB that's the one to budget shuffle after; everything else is
a narrow codegen projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.registry import query
from etl_ch_destination_spark.schemas import PROPS_JSON


@query(
    "arr_construct",
    """
    SELECT p_partkey,
           len([p_size, p_size * 2, 0]) AS sz,
           list_extract([p_size, p_size * 2, 0], 1) AS first_el,
           array_to_string([p_size, p_size * 2, 0], ',') AS csv
    FROM part
    """,
)
def arr_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construct / size / element access (CH `array`, `length`,
    `arrayElement`). The array itself is serialized for the hasher."""
    p = load_table(spark, sf_dir, "part")
    arr = F.array(F.col("p_size"), F.col("p_size") * 2, F.lit(0))
    return p.select(
        "p_partkey",
        F.size(arr).alias("sz"),
        F.element_at(arr, 1).alias("first_el"),
        F.array_join(arr.cast("array<string>"), ",").alias("csv"),
    )


@query(
    "arr_explode",
    """
    SELECT p_partkey, unnest(string_split(p_type, ' ')) AS token
    FROM part
    """,
)
def arr_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH `arrayJoin` — unnest to rows. Fan-out is the row multiplier
    to budget at scale; posexplode/explode_outer variants in tests."""
    p = load_table(spark, sf_dir, "part")
    return p.select("p_partkey", F.explode(F.split("p_type", " ")).alias("token"))


@query(
    "arr_membership",
    """
    SELECT p_partkey,
           list_contains(string_split(p_type, ' '), 'BRASS') AS has_brass,
           CAST(list_position(string_split(p_type, ' '), 'BRASS') AS BIGINT) AS pos_brass,
           len(list_intersect(string_split(p_type, ' '), ['BRASS', 'COPPER'])) > 0 AS overlaps
    FROM part
    """,
)
def arr_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """contains / position / overlap (CH `has`, `indexOf`,
    `hasAny`). Both engines return position 0 for a missing element
    (probed), so no coalesce shim is needed."""
    p = load_table(spark, sf_dir, "part")
    words = F.split("p_type", " ")
    return p.select(
        "p_partkey",
        F.array_contains(words, "BRASS").alias("has_brass"),
        F.array_position(words, "BRASS").alias("pos_brass"),
        F.arrays_overlap(words, F.array(F.lit("BRASS"), F.lit("COPPER"))).alias("overlaps"),
    )


@query(
    "arr_transform_ho",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_words,
           array_to_string(list_transform(list_slice(string_split(text, ' '), 1, 3),
                                          x -> upper(x)), ',') AS upper3,
           len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS n_long,
           CAST(list_reduce(list_transform(string_split(text, ' '), x -> length(x)),
                            (acc, x) -> acc + x) AS INT) AS total_chars,
           list_sort(string_split(text, ' '))[1] AS first_sorted,
           len(list_distinct(string_split(text, ' '))) AS n_distinct
    FROM documents
    """,
)
def arr_transform_ho(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions ≈ CH `arrayMap`/`arrayFilter`/
    `arrayReduce`/`arraySort`/`arrayDistinct` — all JVM-side codegen
    lambdas, no Python. Spark slice(start=1, length=3) lines up with
    DuckDB list_slice(1, 3) (1-based inclusive, probed)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_join(F.transform(F.slice(words, 1, 3), lambda x: F.upper(x)), ",").alias(
            "upper3"
        ),
        F.size(F.filter(words, lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(
            F.transform(words, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
        ).alias("total_chars"),
        F.element_at(F.array_sort(words), 1).alias("first_sorted"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
    )


@query(
    "map_funcs",
    """
    SELECT event_id,
           2 AS n_keys,
           'type,uid' AS keys_csv,
           event_type AS type_val,
           CAST(user_id AS VARCHAR) AS uid_val
    FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construct/keys/lookup (CH `map`, `mapKeys`). The Spark side
    genuinely builds a MapType and queries it; DuckDB map extraction
    returns a LIST (probed), so the oracle states the equivalent scalar
    results in plain SQL. map_values/map_from_entries in tests."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.size(m).alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.element_at(m, F.lit("type")).alias("type_val"),
        F.element_at(m, F.lit("uid")).alias("uid_val"),
    )


@query(
    "json_extract_props",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
           json_extract_string(props, '$.k') IS NOT NULL AS has_k
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH `JSONExtractInt` over the events.props JSON column — both the
    path-string form (get_json_object) and the typed from_json form."""
    ev = load_table(spark, sf_dir, "events")
    typed = F.from_json("props", PROPS_JSON)
    k_path = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        k_path.alias("k_path"),
        typed.getField("k").alias("k_typed"),
        k_path.isNotNull().alias("has_k"),
    )


@query(
    "json_struct_ops",
    """
    SELECT event_id,
           CAST(to_json(struct_pack(
             k := CAST(json_extract_string(props, '$.k') AS INT),
             et := event_type
           )) AS VARCHAR) AS payload,
           CAST(json_extract_string(props, '$.k') AS INT) + 1 AS k_next
    FROM events
    """,
)
def json_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse JSON → struct, enrich, serialize back (CH `JSONExtract` +
    `toJSONString` round-trip). Both engines emit compact JSON with
    field order preserved (probed)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", PROPS_JSON).getField("k")
    payload = F.struct(k.alias("k"), F.col("event_type").alias("et"))
    return ev.select(
        "event_id",
        F.to_json(payload).alias("payload"),
        (k + 1).alias("k_next"),
    )


@query(
    "arr_zip_explode",
    """
    SELECT doc_id,
           unnest(list_transform(range(1, len(w5) + 1), x -> CAST(x AS BIGINT))) AS pos,
           unnest(w5) AS word
    FROM (
      SELECT doc_id, list_slice(string_split(text, ' '), 1, 5) AS w5
      FROM documents
    )
    """,
)
def arr_zip_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-ARRAY JOIN (CH `ARRAY JOIN arr1, arr2`): two parallel
    arrays unnested POSITIONALLY in lockstep — here each document's
    first five words with their 1-based positions. `arrays_zip` +
    one explode keeps it a single generator (never a cross product of
    the two arrays); the oracle is DuckDB's parallel multi-unnest."""
    d = load_table(spark, sf_dir, "documents")
    w5 = F.slice(F.split("text", " "), 1, 5)
    z = F.arrays_zip(
        F.sequence(F.lit(1), F.size(w5)).cast("array<bigint>").alias("pos"),
        w5.alias("word"),
    )
    return (
        d.select("doc_id", F.explode(z).alias("zc"))
        .select("doc_id", F.col("zc.pos").alias("pos"), F.col("zc.word").alias("word"))
    )


@query(
    "arr_enumerate_ranks",
    """
    WITH t AS (
      SELECT p_partkey,
             list_concat(string_split(p_type, ' '),
                         string_split(p_type, ' ')[1:1]) AS w
      FROM part
    )
    SELECT p_partkey,
           array_to_string(list_transform(range(1, len(w) + 1),
                                          i -> CAST(i AS VARCHAR)), ',') AS enum,
           array_to_string(list_transform(range(1, len(w) + 1),
             i -> CAST(len(list_filter(list_slice(w, 1, i), y -> y = w[i]))
                       AS VARCHAR)), ',') AS enum_uniq,
           array_to_string(list_transform(range(1, len(w) + 1),
             i -> CAST(len(list_distinct(list_slice(w, 1, list_position(w, w[i]))))
                       AS VARCHAR)), ',') AS enum_dense
    FROM t
    """,
)
def arr_enumerate_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``arrayEnumerate`` / ``arrayEnumerateUniq`` /
    ``arrayEnumerateDense`` — per-element position, occurrence index
    (1st/2nd/... sighting of that value), and dense first-appearance
    rank. The input array duplicates its first token (p_type words +
    word[1]) so Uniq and Dense actually diverge from Enumerate on
    every row. Results serialize to csv strings because the driver's
    hasher can't hash list cells (check_parity lint).

    Pure per-row HOF codegen — prefix scans are O(n²) per row but n is
    the token count of one value; zero shuffles, fuses with the scan
    at any scale."""
    p = load_table(spark, sf_dir, "part")
    words = F.split("p_type", " ")
    w = F.concat(words, F.slice(words, 1, 1))
    idx = F.transform(w, lambda x, i: i + 1)
    enum_uniq = F.transform(
        w,
        lambda x, i: F.size(F.filter(F.slice(w, 1, i + 1), lambda y: y == x)),
    )
    enum_dense = F.transform(
        w,
        lambda x: F.size(F.array_distinct(F.slice(w, 1, F.array_position(w, x)))),
    )
    return p.select(
        "p_partkey",
        F.array_join(idx.cast("array<string>"), ",").alias("enum"),
        F.array_join(enum_uniq.cast("array<string>"), ",").alias("enum_uniq"),
        F.array_join(enum_dense.cast("array<string>"), ",").alias("enum_dense"),
    )


ARRSET_HEAD = 12  # words drawn from each end of the document


@query(
    "arr_set_ops",
    f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    ab AS (
        SELECT doc_id,
               list_sort(list_distinct(list_slice(toks, 1, {ARRSET_HEAD}))) AS a,
               list_sort(list_distinct(
                   list_slice(toks, len(toks) - {ARRSET_HEAD - 1}, len(toks)))) AS b
        FROM t WHERE len(toks) >= {2 * ARRSET_HEAD}
    )
    SELECT doc_id,
           COALESCE(array_to_string(list_sort(list_intersect(a, b)), '|'),
                    '') AS inter,
           COALESCE(array_to_string(list_sort(list_distinct(list_cat(a, b))),
                    '|'), '') AS uni,
           COALESCE(array_to_string(
                    list_sort(list_filter(a, x -> NOT list_contains(b, x))),
                    '|'), '') AS exc,
           CAST(len(list_intersect(a, b)) AS INT) AS n_inter,
           CAST(len(list_distinct(list_cat(a, b))) AS INT) AS n_union,
           CAST(len(list_filter(a, x -> NOT list_contains(b, x))) AS INT) AS n_except
    FROM ab
    """,
)
def arr_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH `arrayIntersect` / set union / array EXCEPT (`arrayFilter`
    + `has`) — element-set algebra between two arrays, here the
    distinct first-12 vs last-12 words of each long-enough document
    (a cheap intro-vs-outro vocabulary-overlap signal).

    Both engines dedup before comparing and every output array is
    sorted, so the orderings the two engines' set primitives would
    otherwise disagree on (Spark preserves first-array order, DuckDB
    its own) never reach the hash; the arrays egress '|'-joined
    because the driver hasher takes scalars only (empty DuckDB lists
    stringify to NULL, hence the COALESCE). Purely map-side HOF
    codegen — zero shuffles, scales with the scan."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    d = d.filter(F.size(toks) >= 2 * ARRSET_HEAD).select(
        "doc_id",
        F.array_sort(
            F.array_distinct(F.slice(toks, 1, ARRSET_HEAD))
        ).alias("a"),
        F.array_sort(
            F.array_distinct(
                F.slice(toks, F.size(toks) - (ARRSET_HEAD - 1), ARRSET_HEAD)
            )
        ).alias("b"),
    )
    inter = F.array_sort(F.array_intersect("a", "b"))
    uni = F.array_sort(F.array_union("a", "b"))
    exc = F.array_sort(F.array_except("a", "b"))
    return d.select(
        "doc_id",
        F.array_join(inter, "|").alias("inter"),
        F.array_join(uni, "|").alias("uni"),
        F.array_join(exc, "|").alias("exc"),
        F.size(inter).alias("n_inter"),
        F.size(uni).alias("n_union"),
        F.size(exc).alias("n_except"),
    )


NGRAM_HEAD_CHARS = 40  # chars drawn from each end for the trigram profiles


@query(
    "str_ngram_distance",
    f"""
    WITH s AS (
        SELECT doc_id,
               lower(substr(text, 1, {NGRAM_HEAD_CHARS})) AS a,
               lower(substr(text, greatest(length(text) - {NGRAM_HEAD_CHARS - 1}, 1),
                            {NGRAM_HEAD_CHARS})) AS b
        FROM documents WHERE length(text) >= {2 * NGRAM_HEAD_CHARS}
    ),
    g AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, length(a) - 1),
                                            i -> substr(a, i, 3))) AS ga,
               list_distinct(list_transform(range(1, length(b) - 1),
                                            i -> substr(b, i, 3))) AS gb
        FROM s
    )
    SELECT doc_id,
           CAST(len(ga) AS INT) AS n_a,
           CAST(len(gb) AS INT) AS n_b,
           CAST(len(list_intersect(ga, gb)) AS INT) AS n_common,
           1.0 - CAST(len(list_intersect(ga, gb)) AS DOUBLE)
             / (len(ga) + len(gb) - len(list_intersect(ga, gb))) AS trigram_dist
    FROM g
    """,
)
def str_ngram_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH `ngramDistance`-family string similarity, recast over
    DISTINCT character trigrams (Jaccard distance) so the score is a
    pure set computation both engines express with the same HOF
    pipeline — CH's multiset symmetric-difference variant needs its
    exact 4-gram hashing internals to reproduce, while the distinct
    trigram Jaccard carries the same near/far signal and is
    bit-deterministic (integer set sizes, one final IEEE division).
    Compared strings: each document's lowercased head vs tail window
    (the intro-vs-outro repetition probe).

    Pure map-side codegen — zero shuffles, scales with the scan."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 2 * NGRAM_HEAD_CHARS
    )
    # expr-level HOFs: substr with a lambda-bound start needs SQL substr
    g = d.select(
        "doc_id",
        F.expr(
            f"array_distinct(transform(sequence(1, length(lower(substr(text, 1,"
            f" {NGRAM_HEAD_CHARS}))) - 2), i -> substr(lower(substr(text, 1,"
            f" {NGRAM_HEAD_CHARS})), i, 3)))"
        ).alias("ga"),
        F.expr(
            f"array_distinct(transform(sequence(1, length(lower(substr(text,"
            f" greatest(length(text) - {NGRAM_HEAD_CHARS - 1}, 1),"
            f" {NGRAM_HEAD_CHARS}))) - 2), i -> substr(lower(substr(text,"
            f" greatest(length(text) - {NGRAM_HEAD_CHARS - 1}, 1),"
            f" {NGRAM_HEAD_CHARS})), i, 3)))"
        ).alias("gb"),
    )
    common = F.size(F.array_intersect("ga", "gb"))
    return g.select(
        "doc_id",
        F.size("ga").alias("n_a"),
        F.size("gb").alias("n_b"),
        common.alias("n_common"),
        (
            F.lit(1.0)
            - common.cast("double")
            / (F.size("ga") + F.size("gb") - common)
        ).alias("trigram_dist"),
    )


SORTKEY_WORDS = 10


@query(
    "arr_sort_by_key",
    f"""
    WITH t AS (
        SELECT doc_id,
               list_slice(string_split(text, ' '), 1, {SORTKEY_WORDS}) AS ws
        FROM documents WHERE len(string_split(text, ' ')) >= {SORTKEY_WORDS}
    )
    SELECT doc_id,
           array_to_string(
             list_transform(
               list_sort(list_transform(
                 ws, w -> lpad(CAST(length(w) AS VARCHAR), 4, '0') || ':' || w)),
               s -> s[6:]),
             '|') AS by_len,
           array_to_string(
             list_transform(
               list_sort(list_transform(
                 ws, w -> reverse(w) || ':' || w)),
               s -> string_split(s, ':')[2]),
             '|') AS by_suffix
    FROM t
    """,
)
def arr_sort_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH `arraySort(func, arr)` — sort by a COMPUTED key, not natural
    order. Spark's array_sort comparator lambda and DuckDB's list_sort
    have incompatible surfaces, so both engines use the portable
    decorate-sort-undecorate idiom: map each element to
    "key:element", natural-sort, strip the key — byte-identical
    orderings by construction (keys are fixed-width via lpad, or
    ':'-free via reverse). Demonstrated with two keys over each
    document's first 10 words: by length (stable on word as
    tiebreak), and by SUFFIX (reversed word — the rhyme/inflection
    grouping trick).

    Pure map-side HOF codegen, zero shuffles. The ':' separator is
    safe: fixture words are alphanumeric (asserted in the pytest
    replay)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    d = d.filter(F.size(toks) >= SORTKEY_WORDS).select(
        "doc_id", F.slice(toks, 1, SORTKEY_WORDS).alias("ws")
    )
    by_len = F.array_join(
        F.transform(
            F.array_sort(
                F.transform(
                    F.col("ws"),
                    lambda w: F.concat(
                        F.lpad(F.length(w).cast("string"), 4, "0"),
                        F.lit(":"),
                        w,
                    ),
                )
            ),
            lambda s: F.substring(s, 6, 1_000_000),
        ),
        "|",
    )
    by_suffix = F.array_join(
        F.transform(
            F.array_sort(
                F.transform(
                    F.col("ws"),
                    lambda w: F.concat(F.reverse(w), F.lit(":"), w),
                )
            ),
            lambda s: F.element_at(F.split(s, ":"), 2),
        ),
        "|",
    )
    return d.select("doc_id", by_len.alias("by_len"), by_suffix.alias("by_suffix"))


CUMSUM_WORDS = 10


@query(
    "arr_cumsum_scan",
    f"""
    WITH t AS (
        SELECT doc_id,
               list_transform(
                 list_slice(string_split(text, ' '), 1, {CUMSUM_WORDS}),
                 w -> length(w)) AS lens
        FROM documents
        WHERE len(string_split(text, ' ')) >= {CUMSUM_WORDS}
    )
    SELECT doc_id,
           array_to_string(list_transform(range(1, {CUMSUM_WORDS + 1}),
             i -> CAST(list_sum(list_slice(lens, 1, i)) AS VARCHAR)), '|')
             AS cumsum,
           array_to_string(list_transform(range(1, {CUMSUM_WORDS + 1}),
             i -> CAST(CASE WHEN i = 1 THEN lens[1]
                            ELSE lens[i] - lens[i - 1] END AS VARCHAR)), '|')
             AS diffs,
           CAST(list_sum(lens) AS BIGINT) AS total
    FROM t
    """,
)
def arr_cumsum_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH `arrayCumSum` / `arrayDifference` — per-row ARRAY prefix
    scans (here over the first 10 word lengths). Neither engine has a
    scan-HOF both ways, so both spell the prefix sum as the same
    slice-and-sum comprehension (O(k²) on a k=10 array — constant per
    row) and the difference as the index comparison; every number is
    an exact small integer, serialized '|'-joined for the scalar hash
    gate.

    Pure map-side HOF codegen, zero shuffles. The row-stream cousins
    (running windows over events) live in arr_fill_compact /
    win_running_rows; this key pins the ARRAY-level semantics."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = d.filter(F.size(toks) >= CUMSUM_WORDS).select(
        "doc_id",
        F.transform(
            F.slice(toks, 1, CUMSUM_WORDS), lambda w: F.length(w)
        ).alias("lens"),
    )
    idx = F.sequence(F.lit(1), F.lit(CUMSUM_WORDS))
    cumsum = F.array_join(
        F.transform(
            idx,
            lambda i: F.aggregate(
                F.slice(F.col("lens"), 1, i), F.lit(0), lambda a, x: a + x
            ).cast("string"),
        ),
        "|",
    )
    diffs = F.array_join(
        F.transform(
            idx,
            lambda i: F.when(i == 1, F.element_at(F.col("lens"), 1))
            .otherwise(
                F.element_at(F.col("lens"), i) - F.element_at(F.col("lens"), i - 1)
            )
            .cast("string"),
        ),
        "|",
    )
    total = F.aggregate(F.col("lens"), F.lit(0), lambda a, x: a + x).cast("bigint")
    return t.select(
        "doc_id", cumsum.alias("cumsum"), diffs.alias("diffs"), total.alias("total")
    )


@query(
    "json_nested_explode",
    """
    WITH j AS (
      SELECT doc_id,
             ('{"id": ' || CAST(doc_id AS VARCHAR)
              || ', "tags": ["t' || CAST(doc_id % 5 AS VARCHAR)
              || '", "t' || CAST(doc_id % 7 AS VARCHAR)
              || '"], "meta": {"n": ' || CAST(n_chars AS VARCHAR)
              || '}}')::JSON AS payload
      FROM documents
    )
    SELECT doc_id,
           CAST(payload->'$.id' AS BIGINT) AS parsed_id,
           CAST(payload->'$.meta.n' AS BIGINT) AS meta_n,
           unnest(CAST(payload->'$.tags' AS VARCHAR[])) AS tag
    FROM j
    """,
)
def json_nested_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSON shredding — parse a document payload carrying a
    scalar, a nested object, and an ARRAY, then explode the array to
    rows: the from_json(schema) → explode pipeline every JSON-lake
    ingest runs (CH's JSONExtract*/arrayJoin). The payload derives
    deterministically from fixture columns so both engines shred the
    IDENTICAL document; Spark parses with an explicit schema (never
    inference — the engine-wide typed-ingest rule), DuckDB casts the
    JSON pointers.

    Map-side parse + explode, zero shuffles; at 100 TB from_json with
    an explicit schema is whole-stage-codegen JSON shredding, and
    unparseable rows surface as NULLs for a quarantine filter (the
    scan_csv_badrows discipline)."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.lit('{"id": '),
        F.col("doc_id").cast("string"),
        F.lit(', "tags": ["t'),
        (F.col("doc_id") % 5).cast("string"),
        F.lit('", "t'),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('"], "meta": {"n": '),
        F.col("n_chars").cast("string"),
        F.lit("}}"),
    )
    schema = "id bigint, tags array<string>, meta struct<n: bigint>"
    parsed = d.select(
        "doc_id", F.from_json(payload, schema).alias("p")
    )
    return parsed.select(
        "doc_id",
        F.col("p.id").alias("parsed_id"),
        F.col("p.meta.n").alias("meta_n"),
        F.explode("p.tags").alias("tag"),
    )


@query(
    "json_variant_type",
    """
    SELECT event_id,
           user_id AS uid,
           event_type AS etype,
           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
           CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS day
    FROM events
    """,
)
def json_variant_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT ingestion — Spark 4's open-schema type,
    the engine-native analogue of ClickHouse's JSON object column:
    each event renders to a JSON document, parses into a VARIANT
    (binary-encoded, shredded access — not string re-parsing per
    field), and typed paths extract back out via try_variant_get.
    The oracle states the round-trip CONTRACT (extraction loses
    nothing) directly over the source columns; money rides as integer
    cents so no float ever transits JSON text.

    Plan: pure map-side codegen (to_json → parse_json → variant_get
    fused into one stage) — zero shuffles; at 100 TB VARIANT columns
    land in parquet with shredded statistics, which is why this beats
    get_json_object string probing (full re-parse per access)."""
    e = load_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("user_id").alias("uid"),
            F.col("event_type").alias("etype"),
            (F.col("value").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("cents"),
            F.struct(F.date_format("ts", "yyyy-MM-dd").alias("day")).alias(
                "meta"
            ),
        )
    )
    v = e.select("event_id", F.parse_json(doc).alias("v"))
    return v.select(
        "event_id",
        F.try_variant_get("v", "$.uid", "bigint").alias("uid"),
        F.try_variant_get("v", "$.etype", "string").alias("etype"),
        F.try_variant_get("v", "$.cents", "bigint").alias("cents"),
        F.try_variant_get("v", "$.meta.day", "string").alias("day"),
    )


@query(
    "arr_topk_partial",
    """
    WITH per_order AS (
      SELECT l_orderkey,
             list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(qs) AS INT) AS n_items,
           array_to_string(list_transform(
             list_slice(list_reverse_sort(qs), 1, 3),
             x -> CAST(x AS VARCHAR)), ',') AS top3_csv,
           CAST(list_sum(list_slice(list_reverse_sort(qs), 1, 3)) AS BIGINT)
             AS top3_sum
    FROM per_order
    """,
)
def arr_topk_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``arrayPartialSort`` / top-k-of-array — the per-row
    partial sort that answers "the 3 largest line quantities of each
    order" WITHOUT ranking the whole array relationally: collect the
    order's quantities once, then slice the descending sort — all
    inside one row, no extra shuffle beyond the collect aggregate.
    Descending slice is emitted as the sorted-CSV device plus an exact
    int64 top-3 sum (collect_list order doesn't matter — the sort
    inside the row canonicalizes before slicing).

    Plan: one l_orderkey hash aggregate, then pure HOF codegen —
    at 100 TB the array stays bounded by lines-per-order (≤7 in
    TPC-H), so per-row memory is constant."""
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.collect_list(F.col("l_quantity").cast("bigint")).alias("qs")
    )
    top3 = F.slice(F.sort_array(F.col("qs"), asc=False), 1, 3)
    return per_order.select(
        "l_orderkey",
        F.size("qs").alias("n_items"),
        F.array_join(top3.cast("array<string>"), ",").alias("top3_csv"),
        F.aggregate(
            top3, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("top3_sum"),
    )
