"""Oracle-parity regression (SURVEY §5.3 layer 2): the same
Spark-vs-DuckDB comparison the driver gate runs, reproduced locally at
smoke scale so t2 failures never surprise. Shells tools/check_parity.py
in a fresh process (its own SparkSession, like the driver)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_full_parity_at_smoke_scale():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_parity.py"),
         "--sf", "/root/testdata/sf0.001"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    tail = "\n".join(proc.stdout.splitlines()[-8:])
    assert proc.returncode == 0, f"parity failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert ", 0 fail" in proc.stdout, tail
