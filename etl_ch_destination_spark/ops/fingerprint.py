"""Content fingerprinting expressions: SimHash and rolling-hash
(Rabin-Karp) document fingerprints (north-star "dedup" / "document
fingerprinting").

Both are built as PURE SQL EXPRESSIONS over higher-order array
functions — JVM codegen end to end, no Python, no shuffle — and both
use hash primitives DuckDB can reproduce bit-for-bit (md5-derived
60-bit token hashes; a 31-base polynomial over ascii codes), so even
these "exotic" operators run under the full value-hash oracle gate.
Production variants swap in xxhash64 (cheaper, same structure) where
cross-engine checkability isn't needed.

Scale notes (100 TB): cost is O(tokens × 60) / O(chars × 8) local
arithmetic per document — embarrassingly parallel, no state. The
SimHash band columns turn near-dup search into 4 exact-match
equi-joins (hamming distance ≤ d docs share ≥ 1 of d+1 bands
pigeonhole-wise), i.e. hash-shuffle joins, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIMHASH_BITS = 60  # 15 hex chars of md5 → fits signed int64
N_BANDS = 4
BAND_BITS = SIMHASH_BITS // N_BANDS  # 15
GRAM = 8  # rolling-hash character n-gram width

# per-token 60-bit hash both engines compute identically
_TOKEN_HASHES = (
    "transform(split({text}, ' '), "
    "t -> CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT))"
)

def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    out: str = "simhash",
    id_col: str = "doc_id",
) -> DataFrame:
    """Return ``(id_col, out)``: a 60-bit SimHash per document —
    per-bit majority vote over md5-derived token hashes, packed into
    one BIGINT. Join back on ``id_col`` if other columns are needed
    (callers here never do, so the join isn't paid by default).

    Shape: explode token hashes to rows, take 60 conditional SUMs in
    one hash aggregate, pack bits with a flat 60-term expression. Every
    stage is whole-stage-codegen (an earlier interpreted-HOF fold over
    per-token 60-element arrays was ~40× slower at sf0.1). Map-side
    partial aggregation collapses the exploded rows back to one row per
    document before the shuffle, so shuffle volume is O(docs × 60
    longs) regardless of document length — scale-safe at 100 TB.
    """
    bit = F.col("__h")
    votes = (
        df.select(F.col(id_col), F.explode(F.expr(_TOKEN_HASHES.format(text=text_col))).alias("__h"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(F.shiftright(bit, i).bitwiseAND(F.lit(1))).alias(f"__b{i}")
                for i in range(SIMHASH_BITS)
            ],
        )
    )
    # bit i is set iff set-votes >= unset-votes  ⟺  2·ones_i − n ≥ 0
    packed = None
    for i in range(SIMHASH_BITS):
        term = F.when(
            F.col(f"__b{i}") * 2 >= F.col("__n"), F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    return votes.select(F.col(id_col), packed.alias(out))


def band(simhash: str | Column, k: int) -> Column:
    """k-th LSH band (15 bits) of a simhash — equality bucket key for
    near-dup candidate joins."""
    c = F.col(simhash) if isinstance(simhash, str) else simhash
    return F.shiftright(c, k * BAND_BITS).bitwiseAND(F.lit((1 << BAND_BITS) - 1))


def rolling_gram_hashes(text_col: str = "text") -> Column:
    """Array of Rabin-Karp polynomial hashes (base 31, int64) over all
    character 8-grams — ((0·31+c₁)·31+c₂)… per gram, exact integer
    arithmetic both engines reproduce."""
    return F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {GRAM - 1}, 1)), "
        f"i -> aggregate(sequence(0, {GRAM - 1}), CAST(0 AS BIGINT), "
        f"(acc, j) -> acc * 31 + ascii(substr({text_col}, i + j, 1))))"
    )
