"""SURVEY §2.8 extension — ClickHouse bit-manipulation, binary
encoding, and IPv4 scalar families (`bitAnd/bitOr/bitXor/bitNot/
bitShiftLeft/bitShiftRight/bitCount/bitTest`, `hex/unhex/base64Encode/
base64Decode`, `IPv4NumToString/IPv4StringToNum/isIPv4String`).

All three keys are integer/string-exact end to end, so each carries a
full hash oracle.

Dialect pins (probed against DuckDB 1.x):
- two's-complement `&`/`|`/`~`/`<<`/`>>` and `bit_count` agree on
  BIGINT in both engines (bit_count(-1::BIGINT) = 64 both sides);
  DuckDB spells xor as `xor(a, b)`, Spark as `^`.
- `hex()` letter case differs historically across engines → both
  sides are lower()ed before hashing; DuckDB's `unhex` returns BLOB →
  `decode()` there, `.cast("string")` here (both are the UTF-8 view).
- bitTest has no DuckDB builtin → the oracle uses the defining
  identity `(x >> n) & 1`.

Scale notes: narrow per-row projections, zero shuffles, whole-stage
codegen end to end — map-side at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_ch_destination_spark.catalog import load_table
from etl_ch_destination_spark.registry import query


@query(
    "bit_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           l_orderkey & l_partkey AS and_c,
           l_orderkey | l_partkey AS or_c,
           xor(l_orderkey, l_partkey) AS xor_c,
           ~l_suppkey AS not_c,
           CAST(l_linenumber AS BIGINT) << 4 AS shl_c,
           l_orderkey >> 3 AS shr_c,
           bit_count(l_orderkey) AS pop_c,
           CAST((l_orderkey >> 2) & 1 AS INT) AS test_c
    FROM lineitem
    """,
)
def bit_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH bit-function family on int64 keys. Two's-complement ops are
    engine-independent by definition; `bit_count` widths pinned to
    BIGINT on both sides (64-bit popcount)."""
    li = load_table(spark, sf_dir, "lineitem")
    ok = F.col("l_orderkey")
    pk = F.col("l_partkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ok.bitwiseAND(pk).alias("and_c"),
        ok.bitwiseOR(pk).alias("or_c"),
        ok.bitwiseXOR(pk).alias("xor_c"),
        F.bitwise_not(F.col("l_suppkey")).alias("not_c"),
        F.shiftleft(F.col("l_linenumber").cast("long"), 4).alias("shl_c"),
        F.shiftright(ok, 3).alias("shr_c"),
        F.bit_count(ok).cast("int").alias("pop_c"),
        F.getbit(ok, F.lit(2)).cast("int").alias("test_c"),
    )


@query(
    "enc_funcs",
    """
    SELECT p_partkey,
           lower(hex(p_name)) AS hex_c,
           decode(unhex(lower(hex(p_name)))) AS unhex_rt,
           to_base64(encode(p_brand)) AS b64_c,
           decode(from_base64(to_base64(encode(p_brand)))) AS b64_rt,
           octet_length(encode(p_name)) AS byte_len
    FROM part
    """,
)
def enc_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH hex/unhex/base64Encode/base64Decode. Round-trips prove the
    decode direction; `octet_length` pins the byte (not char) view the
    encoders operate on."""
    p = load_table(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        F.lower(F.hex(name)).alias("hex_c"),
        F.unhex(F.lower(F.hex(name))).cast("string").alias("unhex_rt"),
        F.base64(F.col("p_brand").cast("binary")).alias("b64_c"),
        F.unbase64(F.base64(F.col("p_brand").cast("binary")))
        .cast("string")
        .alias("b64_rt"),
        F.octet_length(name).cast("long").alias("byte_len"),
    )


# A deterministic synthetic IPv4 per order: 10.x.y.z from the keys.
# Built identically on both sides, then converted num->string->num to
# prove both directions of the CH IPv4 conversion pair.
_IP_NUM = "(167772160 + (o_orderkey % 256) * 65536 + (o_custkey % 256) * 256 + (o_orderkey % 251))"


@query(
    "ip_funcs",
    f"""
    WITH base AS (
        SELECT o_orderkey, {_IP_NUM} AS ip_num FROM orders
    ),
    fmt AS (
        SELECT o_orderkey, ip_num,
               printf('%d.%d.%d.%d',
                      CAST((ip_num >> 24) & 255 AS INT),
                      CAST((ip_num >> 16) & 255 AS INT),
                      CAST((ip_num >> 8) & 255 AS INT),
                      CAST(ip_num & 255 AS INT)) AS ip_str
        FROM base
    )
    SELECT o_orderkey, ip_num, ip_str,
           (CAST(string_split(ip_str, '.')[1] AS BIGINT) * 16777216
            + CAST(string_split(ip_str, '.')[2] AS BIGINT) * 65536
            + CAST(string_split(ip_str, '.')[3] AS BIGINT) * 256
            + CAST(string_split(ip_str, '.')[4] AS BIGINT)) AS ip_rt,
           ((ip_num >> 8) & 255) <= 127 AS in_lower_half,
           (o_orderkey % 300) <= 255 AS octet_valid
    FROM fmt
    """,
)
def ip_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH IPv4NumToString / IPv4StringToNum / isIPv4String over a
    synthetic 10.0.0.0/8 address derived from the order keys. The
    string build and the parse-back run through DIFFERENT expression
    paths (format vs split+fold) so the round-trip equality is a real
    proof, and `octet_valid` models the isIPv4String range check on a
    candidate octet that exceeds 255 for ~15% of rows."""
    o = load_table(spark, sf_dir, "orders")
    ip = (
        F.lit(167772160)
        + (F.col("o_orderkey") % 256) * 65536
        + (F.col("o_custkey") % 256) * 256
        + (F.col("o_orderkey") % 251)
    ).alias("ip_num")
    base = o.select("o_orderkey", ip)
    n = F.col("ip_num")
    ip_str = F.concat_ws(
        ".",
        F.shiftright(n, 24).bitwiseAND(F.lit(255)).cast("int"),
        F.shiftright(n, 16).bitwiseAND(F.lit(255)).cast("int"),
        F.shiftright(n, 8).bitwiseAND(F.lit(255)).cast("int"),
        n.bitwiseAND(F.lit(255)).cast("int"),
    )
    octets = F.split(F.col("ip_str"), r"\.")
    ip_rt = (
        octets.getItem(0).cast("long") * 16777216
        + octets.getItem(1).cast("long") * 65536
        + octets.getItem(2).cast("long") * 256
        + octets.getItem(3).cast("long")
    )
    return (
        base.withColumn("ip_str", ip_str)
        .withColumn("ip_rt", ip_rt)
        .withColumn(
            "in_lower_half",
            F.shiftright(n, 8).bitwiseAND(F.lit(255)) <= 127,
        )
        .withColumn("octet_valid", (F.col("o_orderkey") % 300) <= 255)
        .select(
            "o_orderkey", "ip_num", "ip_str", "ip_rt", "in_lower_half", "octet_valid"
        )
    )


@query(
    "str_split_tokens",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_space_tokens,
           len(list_filter(regexp_split_to_array(text, '[^A-Za-z]+'),
                           x -> x != '')) AS n_alpha_tokens,
           len(string_split(text, 'e')) AS n_parts_e,
           CASE WHEN length(text) < 3 THEN 0
                ELSE len(list_distinct(list_transform(
                         range(1, length(lower(text)) - 1),
                         i -> substr(lower(text), CAST(i AS INT), 3))))
           END AS n_char3_distinct
    FROM documents
    """,
)
def str_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse tokenizer scalar family: ``splitByChar`` (space and
    'e' separators — len(parts) = occurrences + 1 in both engines),
    ``alphaTokens`` (maximal [A-Za-z]+ runs; the empty-edge tokens the
    two regex engines disagree on are filtered on both sides), and the
    ``ngrams(3)`` distinct-char-trigram profile (the lang-id/similarity
    primitive). All counts are exact ints; zero-shuffle map-side
    codegen + one HOF per row, linear at any scale."""
    d = load_table(spark, sf_dir, "documents")
    txt = F.col("text")
    low = F.lower(txt)
    alpha = F.filter(F.split(txt, "[^A-Za-z]+"), lambda x: x != F.lit(""))
    tri = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(low) - 2),
            lambda i: low.substr(i, F.lit(3)),
        )
    )
    return d.select(
        "doc_id",
        F.size(F.split(txt, " ", -1)).cast("long").alias("n_space_tokens"),
        F.size(alpha).cast("long").alias("n_alpha_tokens"),
        F.size(F.split(txt, "e", -1)).cast("long").alias("n_parts_e"),
        F.when(F.length(txt) < 3, F.lit(0).cast("long"))
        .otherwise(F.size(tri).cast("long"))
        .alias("n_char3_distinct"),
    )


AES_KEY = "0123456789abcdef"  # 16-byte demo key (fixture-only)


@query(
    "enc_aes_roundtrip",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST((strlen(text) // 16 + 1) * 16 AS BIGINT) AS cipher_bytes,
           TRUE AS roundtrip_ok
    FROM documents
    """,
)
def enc_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``encrypt``/``decrypt`` — column-level AES, the
    at-rest-PII primitive: each document encrypts under AES-128-ECB
    with PKCS padding (``aes_encrypt``; ECB chosen HERE because it is
    deterministic — GCM salts a nonce per call, the right choice in
    production and untestable by replay) and must decrypt back
    byte-identically (``roundtrip_ok``). The ciphertext itself is
    engine-private, so the gate checks the two things that ARE
    engine-independent: the PKCS#7 length law cipher = (⌊n/16⌋+1)·16
    (the oracle computes it arithmetically) and the round trip.

    Plan: map-side JVM crypto intrinsics (Spark codegen calls the JCE
    cipher per value, no Python anywhere), zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    enc = F.expr(
        f"aes_encrypt(text, '{AES_KEY}', 'ECB', 'PKCS')"
    )
    dec = F.expr(
        f"CAST(aes_decrypt(aes_encrypt(text, '{AES_KEY}', 'ECB', 'PKCS'),"
        f" '{AES_KEY}', 'ECB', 'PKCS') AS STRING)"
    )
    return d.select(
        "doc_id",
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.octet_length(enc).cast("bigint").alias("cipher_bytes"),
        (dec == F.col("text")).alias("roundtrip_ok"),
    )
