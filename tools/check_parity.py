"""Local replica of the driver's correctness gate.

Runs every registered query at a scale factor and compares against its
DuckDB oracle: row count, column names/type-kinds, and exact
(bit-level for floats) order-insensitive value comparison. It also
rejects array/map/struct-typed columns in oracle-checked queries: the
driver's pandas-based hasher cannot hash list cells, so such queries
would pass a naive local comparison yet error in the driver gate
(ADVICE r1). With that lint, green here ⇒ green there.

Usage: python tools/check_parity.py [--sf /root/testdata/sf0.01] [--keys k1,k2]
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import os
import sys
import time
import traceback
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_ch_destination_spark.registry import all_oracles, all_queries
from etl_ch_destination_spark.schemas import TABLES
from etl_ch_destination_spark.session import get_spark


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_value(v):
    """Canonical comparable form; floats stay exact (bit compare via repr)."""
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v.hex())
    if isinstance(v, Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        return ("dt", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_canon_value(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _canon_value(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    return ("o", repr(v))


def _type_kind(v):
    return _canon_value(v)[0]


def compare(spark_rows, spark_cols, duck_rows, duck_cols):
    """Return list of problem strings (empty = match)."""
    problems = []
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    s_canon = sorted(tuple(_canon_value(r[i]) for i in order) for r in spark_rows)
    d_canon = sorted(tuple(_canon_value(r[i]) for i in dorder) for r in duck_rows)
    if s_canon != d_canon:
        n_bad = sum(1 for a, b in zip(s_canon, d_canon) if a != b)
        for a, b in zip(s_canon, d_canon):
            if a != b:
                problems.append(f"first differing row (col-sorted): spark={a} duck={b}")
                break
        problems.append(f"value mismatch in {n_bad}+ rows")
    # type-kind check on first non-null value per column
    for ci, col in enumerate([spark_cols[i] for i in order]):
        sk = next((_type_kind(r[order[ci]]) for r in spark_rows if r[order[ci]] is not None), None)
        dk = next((_type_kind(r[dorder[ci]]) for r in duck_rows if r[dorder[ci]] is not None), None)
        if sk is not None and dk is not None and sk != dk:
            problems.append(f"type kind differs on {col}: spark={sk} duck={dk}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--keys", default=None)
    ap.add_argument(
        "--json",
        default=None,
        help="write/merge a machine-readable per-key result map into this "
        "file (VERDICT r10 #3): {sf_name: {key: {status, spark_rows, "
        "oracle_rows, secs, problems}}}. Re-runs at other SFs merge into "
        "the same artifact.",
    )
    args = ap.parse_args()

    queries = all_queries()
    oracles = all_oracles()
    keys = args.keys.split(",") if args.keys else list(queries)

    spark = get_spark("parity-check")
    con = duck_connection(args.sf)

    import json as _json

    report: dict[str, dict] = {}

    def record(key, status, t0, s_rows=None, o_rows=None, problems=None):
        report[key] = {
            "status": status,  # pass | rows-only | fail
            "spark_rows": s_rows,
            "oracle_rows": o_rows,
            "secs": round(time.time() - t0, 2),
            "problems": problems or [],
        }

    n_pass = n_fail = n_rows_only = 0
    failures = []
    for key in keys:
        t0 = time.time()
        try:
            sdf = queries[key](spark, args.sf)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {key}: spark query raised\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(key)
            record(key, "fail", t0, problems=["spark query raised"])
            continue
        if key in oracles:
            from pyspark.sql.types import ArrayType, MapType, StructType

            complex_cols = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (ArrayType, MapType, StructType))
            ]
            if complex_cols:
                print(
                    f"FAIL {key}: oracle-checked query returns complex-typed "
                    f"columns {complex_cols} — the driver's pandas hasher "
                    f"cannot hash these; serialize to scalars"
                )
                n_fail += 1
                failures.append(key)
                record(key, "fail", t0, s_rows=len(spark_rows),
                       problems=[f"complex-typed columns {complex_cols}"])
                continue
        if key not in oracles:
            print(f"rows-only {key}: {len(spark_rows)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            if len(spark_rows) == 0:
                print(f"  WARNING {key}: 0 rows")
            record(key, "rows-only", t0, s_rows=len(spark_rows),
                   problems=["0 rows"] if not spark_rows else [])
            continue
        try:
            res = con.execute(oracles[key])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception:
            print(f"FAIL {key}: oracle SQL raised\n{traceback.format_exc()}")
            n_fail += 1
            failures.append(key)
            record(key, "fail", t0, s_rows=len(spark_rows),
                   problems=["oracle SQL raised"])
            continue
        problems = compare(spark_rows, spark_cols, duck_rows, duck_cols)
        if problems:
            print(f"FAIL {key} ({time.time()-t0:.1f}s)")
            for p in problems:
                print(f"  {p}")
            n_fail += 1
            failures.append(key)
            record(key, "fail", t0, s_rows=len(spark_rows),
                   o_rows=len(duck_rows), problems=problems)
        else:
            print(f"PASS {key}: {len(spark_rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
            record(key, "pass", t0, s_rows=len(spark_rows),
                   o_rows=len(duck_rows))

    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail of {len(keys)}")
    if failures:
        print("failing keys:", ",".join(failures))

    if args.json:
        sf_name = os.path.basename(args.sf.rstrip("/"))
        merged: dict[str, dict] = {}
        if os.path.exists(args.json):
            with open(args.json) as f:
                merged = _json.load(f)
        per_sf = merged.setdefault(sf_name, {})
        per_sf.update(report)
        # _meta summarizes the MERGED per-key map, not just this run —
        # otherwise a later single-key --keys merge would clobber the
        # full-sweep totals for its SF
        merged["_meta"] = {
            **merged.get("_meta", {}),
            sf_name: {
                "keys": len(per_sf),
                "pass": sum(r["status"] == "pass" for r in per_sf.values()),
                "rows_only": sum(
                    r["status"] == "rows-only" for r in per_sf.values()
                ),
                "fail": sum(r["status"] == "fail" for r in per_sf.values()),
            },
        }
        with open(args.json, "w") as f:
            _json.dump(merged, f, indent=1, sort_keys=True)
        print(f"wrote {args.json} [{sf_name}]")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
