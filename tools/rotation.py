"""Compute the driver-window regression cohort for a round (VERDICT r10 #2).

The driver's correctness harness samples the FIRST 50 keys of
``queries()`` each round. Never-driver-sampled keys always go first;
this tool fills the remaining slots with a DETERMINISTIC rotating
regression sample of already-sampled keys: sort by (latest round the
key earned a driver row ASCENDING, md5(key)) and take the stalest N.
Keys checked in r1-r3 have had many rounds of refactors since and are
guarded only by builder-side sweeps; this gets every key a fresh
driver row every ~8 rounds.

The cohort for rotation round R must be derived from the CORRECTNESS
files of COMPLETED rounds only (rounds <= R-1): the driver records
round R's results AFTER round R's rotation landed, so counting the
round-R file would retroactively change the cohort it produced
(VERDICT r11 #1 — the r11 cohort "vanished" from the derivation the
moment CORRECTNESS_r11.json was written). ``driver_rows`` therefore
filters the FILE list by ``max_round`` before taking the per-key max.

Usage: python tools/rotation.py --max-round R-1 [--slots N] [--repo /root/repo]
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


def driver_rows(repo: str, max_round: int | None = None) -> dict[str, int]:
    """key -> latest round with ANY driver row (hash or rows-only).

    ``max_round`` caps the FILE list (CORRECTNESS files from rounds
    > max_round are ignored entirely), so a key re-sampled in a later
    round keeps its capped-window row instead of disappearing from the
    derivation. None = all recorded rounds.
    """
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        with open(path) as f:
            data = json.load(f)
        for key in data:
            latest[key] = max(latest.get(key, 0), rnd)
    return latest


def regression_cohort(
    repo: str, slots: int, exclude: set[str], max_round: int | None = None
) -> list[str]:
    """The ``slots`` stalest already-sampled keys, deterministic order."""
    latest = driver_rows(repo, max_round=max_round)
    pool = [k for k in latest if k not in exclude]
    pool.sort(key=lambda k: (latest[k], hashlib.md5(k.encode()).hexdigest()))
    return pool[:slots]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=45)
    ap.add_argument(
        "--max-round", type=int, default=None,
        help="derive from CORRECTNESS files of rounds <= this only "
        "(use ROTATION_ROUND-1; None = all recorded rounds)",
    )
    ap.add_argument("--name", default="REGRESSION",
                    help="variable-name suffix for the printed block")
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()

    sys.path.insert(0, args.repo)
    cohort = regression_cohort(args.repo, args.slots, exclude=set(),
                               max_round=args.max_round)
    latest = driver_rows(args.repo, max_round=args.max_round)
    print(f"{args.name} = [")
    for k in cohort:
        print(f'    "{k}",  # last driver row: r{latest[k]}')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
