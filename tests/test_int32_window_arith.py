"""VERDICT r13 #6 — pin the int32-window-arithmetic convention.

The round-13 review caught a REAL overflow: Spark's ``row_number()``
(and ``ntile``/``rank``/``dense_rank``) return INT, so an all-int
product like ``TD_DELTA * (2 * rn - 1)`` overflows int32 under ANSI
mode once a partition holds ~2^31/(2·δ) rows (~8.39M at δ=128) —
exactly the regime a 100 TB shard hits. The fix convention: widen the
rank operand FIRST (``CAST(rn AS BIGINT)`` in expr strings; in Column
math a BIGINT co-operand also promotes the product).

This test is the repo-wide sweep, frozen: it re-derives every
arithmetic site that multiplies a rank-window alias and asserts the
set matches the audited allowlist below. A new multiply site touching
a rank alias FAILS here until a human classifies it — either widened
(extend the convention) or provably safe (document why and add it).
"""

from __future__ import annotations

import glob
import os
import re

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "etl_ch_destination_spark",
)

# Audited multiply sites: (relative path, alias, line substring) -> why safe.
ALLOWED = {
    # DuckDB oracle SQL: DuckDB's ROW_NUMBER() returns BIGINT natively,
    # so the product is 64-bit on the oracle side by construction.
    ("queries/aggregations.py", "rn", "{TD_DELTA} * (2 * rn - 1)"):
        "DuckDB oracle; ROW_NUMBER is BIGINT in DuckDB",
    ("queries/streaming_batch.py", "rn", "{TD_DELTA} * (2 * rn - 1)"):
        "DuckDB oracle; ROW_NUMBER is BIGINT in DuckDB",
    # Spark Column math where a BIGINT co-operand promotes the product:
    # k (INT row_number) * sn (BIGINT sum) -> BIGINT before multiply.
    ("queries/timeseries_extra.py", "k", "abs(n * sk - k * sn) AS dev"):
        "DuckDB oracle; and the Spark twin multiplies k by a BIGINT sum",
    ("queries/timeseries_extra.py", "k", "ORDER BY abs(n * sk - k * sn)"):
        "DuckDB oracle; same expression as the dev line",
}


def _rank_aliases(src: str) -> set[str]:
    aliases: set[str] = set()
    for m in re.finditer(
        r'\b(?:row_number|ntile|rank|dense_rank)\(\)?[^\n]*?\.alias\("(\w+)"\)', src
    ):
        aliases.add(m.group(1))
    for m in re.finditer(
        r"\b(?:ROW_NUMBER|NTILE|RANK|DENSE_RANK)\s*\([^)]*\)\s*OVER[^\n]*AS\s+(\w+)",
        src,
        re.I,
    ):
        aliases.add(m.group(1))
    return aliases


def _multiply_sites():
    found = []
    for path in glob.glob(PKG + "/**/*.py", recursive=True):
        src = open(path, encoding="utf-8").read()
        aliases = _rank_aliases(src)
        if not aliases:
            continue
        alt = "|".join(re.escape(a) for a in aliases)
        pat = re.compile(rf"\b({alt})\b\s*[*]|[*]\s*\b({alt})\b")
        rel = os.path.relpath(path, PKG)
        for i, ln in enumerate(src.split("\n"), 1):
            m = pat.search(ln)
            if not m:
                continue
            alias = m.group(1) or m.group(2)
            # widened per the convention: the rank operand is CAST to
            # BIGINT inside the same expression
            if re.search(rf"CAST\(\s*{re.escape(alias)}\s+AS\s+BIGINT\s*\)", ln, re.I):
                continue
            found.append((rel, alias, i, ln.strip()))
    return found


def test_rank_alias_products_are_widened_or_audited():
    unexplained = []
    for rel, alias, lineno, ln in _multiply_sites():
        if not any(
            rel == a_rel and alias == a_alias and frag in ln
            for (a_rel, a_alias, frag) in ALLOWED
        ):
            unexplained.append(f"{rel}:{lineno} [{alias}] {ln[:120]}")
    assert not unexplained, (
        "new rank-alias multiply site(s) — widen with CAST(x AS BIGINT) "
        "or audit into ALLOWED:\n" + "\n".join(unexplained)
    )


def test_widened_sites_still_present():
    """The two t-digest fixes must keep their explicit widening (a
    refactor silently dropping the CAST reintroduces the overflow)."""
    for rel in ("queries/aggregations.py", "queries/streaming_batch.py"):
        src = open(os.path.join(PKG, rel), encoding="utf-8").read()
        assert "CAST(rn AS BIGINT)" in src, f"{rel} lost the rn widening"
