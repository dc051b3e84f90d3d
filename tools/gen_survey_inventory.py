#!/usr/bin/env python
"""Generate the SURVEY.md §2 master operator inventory FROM the
registry (VERDICT r5 #6 / r6 #4).

SURVEY §2 is the contract a fresh context reads; its per-subsection
tables are hand-written design docs, but the *inventory* — which keys
exist, where each is implemented, and which carry a full DuckDB hash
oracle — was a hand-maintained prose paragraph that drifted as rounds
added keys. This script derives that inventory from the single source
of truth (the ``registry`` the driver itself consumes) and splices it
into SURVEY.md between sentinel comments, so the count can never
disagree with ``queries()`` again.

Per key: implementation file:line (of the registered callable),
oracle kind (hash = full DuckDB value-hash oracle; rows-only = no
SQL-expressible oracle, driver does the weaker rows-only check), and
the first docstring line as a one-line semantics summary.

Usage: python tools/gen_survey_inventory.py [--check]
  --check: exit 1 if SURVEY.md is stale instead of rewriting it
           (tests/test_inventory.py runs this so the generated block
           stays in sync with the registry mechanically).
"""

from __future__ import annotations

import argparse
import inspect
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SURVEY = os.path.join(REPO, "SURVEY.md")
BEGIN = "<!-- BEGIN GENERATED INVENTORY (tools/gen_survey_inventory.py) -->"
END = "<!-- END GENERATED INVENTORY -->"

# registration order groups by module already; give each module a
# human section label so the table reads as the §2 family layout
FAMILY = {
    "projection": "Projection / filter / predicates (§2.2)",
    "setops": "Set operations (§2.7)",
    "sorts": "Sorts, top-k, sampling (§2.6)",
    "joins": "Joins (§2.3)",
    "joins_extra": "Joins — relational extras (§2.3)",
    "aggregations": "Aggregations (§2.4)",
    "aggregations_ch": "Aggregations — ClickHouse signatures (§2.4)",
    "behavior": "Behavioral event-chain aggregates (§2.4b)",
    "windows": "Window functions (§2.5)",
    "windows_extra": "Window functions — extras (§2.5)",
    "scalars_string": "Scalar functions — string (§2.8)",
    "scalars_math": "Scalar functions — math/hash (§2.8)",
    "scalars_date": "Scalar functions — date/time (§2.8)",
    "scalars_complex": "Scalar functions — array/map/JSON (§2.8)",
    "scalars_binary": "Scalar functions — bit/enc/IP (§2.8)",
    "scd": "Slowly-changing dimensions (§2.3/§2.12)",
    "sources_sinks": "Scans, sources, sinks (§2.1)",
    "streaming_batch": "Streaming operators (§2.9)",
    "timeseries": "Time-series (§2.8/§2.10)",
    "timeseries_extra": "Time-series / calendar extras (§2.8)",
    "udfs": "UDF / UDAF / UDTF surface (§2.11)",
    "llm_text": "LLM pipeline — text quality & curation (§2.10)",
    "llm_dedup_extra": "LLM pipeline — dedup & fingerprints (§2.10b)",
    "llm_corpus": "LLM pipeline — corpus statistics & tokenization (§2.10)",
    "llm_vectors": "LLM pipeline — similarity & multimodal (§2.10)",
    "llm_training": "LLM pipeline — training-data operators (§2.10)",
    "llm_filters": "LLM pipeline — contamination, tagging & funnel (§2.10)",
    "graph": "Graph operators (§2.13)",
    "reports": "Composed reports — TPC-H part 1 (§2.12)",
    "reports_supply": "Composed reports — supply chain (§2.12)",
    "reports_behavior": "Composed reports — behavioral (§2.12)",
}


def first_doc_line(fn) -> str:
    doc = inspect.getdoc(fn) or ""
    line = doc.strip().split("\n\n")[0].replace("\n", " ").strip()
    line = re.sub(r"\s+", " ", line)
    if len(line) > 140:
        line = line[:137].rstrip() + "…"
    return line.replace("|", "\\|") or "(no docstring)"


def render() -> str:
    from etl_ch_destination_spark.registry import all_oracles, all_queries

    queries = all_queries()
    oracles = all_oracles()

    # group by implementation module, rows ordered by source line
    by_mod: dict[str, list[tuple[int, str]]] = {}
    rows: dict[str, str] = {}
    for key, fn in queries.items():
        target = inspect.unwrap(fn)
        mod = target.__module__.rsplit(".", 1)[-1]
        path = os.path.relpath(inspect.getsourcefile(target), REPO)
        line = inspect.getsourcelines(target)[1]
        kind = "hash" if key in oracles else "rows-only"
        rows[key] = (
            f"| `{key}` | {kind} | `{path}:{line}` | {first_doc_line(fn)} |"
        )
        by_mod.setdefault(mod, []).append((line, key))

    n = len(queries)
    n_hash = len([k for k in queries if k in oracles])
    rows_only = sorted(k for k in queries if k not in oracles)

    out = [
        BEGIN,
        "",
        f"**Inventory count (generated from the registry): {n} operator "
        f"keys — {n_hash} with full DuckDB hash oracles, {n - n_hash} "
        "rows-only by design** "
        f"({', '.join(f'`{k}`' for k in rows_only)}). "
        "Every key is registered in `queries()`; every hash-oracled key "
        "has a column-name-aligned `oracle_sql()` entry. Regenerate "
        "with `python tools/gen_survey_inventory.py`; "
        "`tests/test_inventory.py` fails if this block drifts from the "
        "registry.",
        "",
    ]
    for mod in sorted(by_mod, key=lambda m: FAMILY.get(m, m)):
        label = FAMILY.get(mod, f"{mod} (uncategorized)")
        out.append(f"**{label}** — `queries/{mod}.py`, "
                   f"{len(by_mod[mod])} keys")
        out.append("")
        out.append("| key | oracle | implemented at | semantics |")
        out.append("| --- | --- | --- | --- |")
        for _, key in sorted(by_mod[mod]):
            out.append(rows[key])
        out.append("")
    out.append(END)
    return "\n".join(out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    with open(SURVEY) as f:
        text = f.read()
    if BEGIN not in text or END not in text:
        print(f"SURVEY.md lacks the {BEGIN!r} sentinels", file=sys.stderr)
        return 1
    pre, rest = text.split(BEGIN, 1)
    _, post = rest.split(END, 1)
    new = pre + render() + post
    if args.check:
        if new != text:
            print(
                "SURVEY.md inventory is STALE vs the registry — run "
                "python tools/gen_survey_inventory.py",
                file=sys.stderr,
            )
            return 1
        print("SURVEY.md inventory is in sync with the registry")
        return 0
    if new != text:
        with open(SURVEY, "w") as f:
            f.write(new)
        print(f"rewrote SURVEY.md inventory ({len(render())} bytes)")
    else:
        print("SURVEY.md inventory already in sync")
    return 0


if __name__ == "__main__":
    sys.exit(main())
