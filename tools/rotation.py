"""Compute the driver-window regression cohort for a round (VERDICT r10 #2).

The driver's correctness harness samples the FIRST 50 keys of
``queries()`` each round. Never-driver-sampled keys always go first;
this tool fills the remaining slots with a DETERMINISTIC rotating
regression sample of already-sampled keys: sort by (latest round the
key earned a driver row ASCENDING, md5(key)) and take the stalest N.
Keys checked in r1-r3 have had many rounds of refactors since and are
guarded only by builder-side sweeps; this gets every key a fresh
driver row every ~8 rounds.

Usage: python tools/rotation.py [--slots N] [--repo /root/repo]
Prints the cohort as a python list literal to paste into
``queries/__init__.py`` (the rotation stays an explicit, test-pinned
key list — this tool only GENERATES it; tests/test_inventory.py
re-derives the same ordering and asserts the pasted block matches).
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import re
import sys


def driver_rows(repo: str) -> dict[str, int]:
    """key -> latest round with ANY driver row (hash or rows-only)."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for key in data:
            latest[key] = max(latest.get(key, 0), rnd)
    return latest


def regression_cohort(repo: str, slots: int, exclude: set[str]) -> list[str]:
    """The ``slots`` stalest already-sampled keys, deterministic order."""
    latest = driver_rows(repo)
    pool = [k for k in latest if k not in exclude]
    pool.sort(key=lambda k: (latest[k], hashlib.md5(k.encode()).hexdigest()))
    return pool[:slots]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=45)
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    cohort = regression_cohort(args.repo, args.slots, exclude=set())
    latest = driver_rows(args.repo)
    print("R11_REGRESSION = [")
    for k in cohort:
        print(f'    "{k}",  # last driver row: r{latest[k]}')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
