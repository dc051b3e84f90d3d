"""Round-12 key gates: running-peak drawdown."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_win_drawdown_invariants_and_replay(spark, sf_dir):
    """drawdown_bp ∈ [0, 10000), 0 exactly on peak days, peak is the
    running max of the nation's daily series (replayed sequentially on
    the collected frame), and the grain is nation × order-date."""
    from etl_ch_destination_spark.queries.windows_extra import win_drawdown

    rows = win_drawdown(spark, sf_dir).collect()
    assert rows
    by_nation: dict[str, list] = {}
    for r in rows:
        assert 0 <= r["drawdown_bp"] < 10_000
        assert r["peak_cents"] >= r["rev_cents"] > 0
        if r["rev_cents"] == r["peak_cents"]:
            assert r["drawdown_bp"] == 0
        by_nation.setdefault(r["nation"], []).append(r)
    # sequential replay per nation
    for series in by_nation.values():
        series.sort(key=lambda r: r["day"])
        peak = 0
        for r in series:
            peak = max(peak, r["rev_cents"])
            assert r["peak_cents"] == peak
            assert r["drawdown_bp"] == (peak - r["rev_cents"]) * 10_000 // peak
    # grain: one row per (nation, day)
    keys = [(r["nation"], r["day"]) for r in rows]
    assert len(keys) == len(set(keys))
