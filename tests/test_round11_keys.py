"""Round-11 key gates (VERDICT r10 #5/#6/#7): DOULION approximate
triangle counting, convergence-terminated BFS (covered in
test_round10_keys/test_property updates), IVF-PQ ANN."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_triangle_approx_within_20pct_of_exact(spark, sf_dir):
    """DOULION (Tsourakakis et al., KDD'09) with p=1/4 is unbiased with
    relative std ≈ sqrt((1/p³−1)/T) ≈ 2.2% at sf0.001's T=125,968 —
    gate the md5-thresholded deterministic draw at ±20%, nine sigma
    out, so a broken sampler or scaler fails loudly while the exact
    draw stays stable by construction."""
    from etl_ch_destination_spark.queries.graph import (
        TRI_SAMPLE_DEN,
        _copurchase_edges,
        graph_triangle_approx,
        triangle_counts,
    )

    exact = (
        triangle_counts(_copurchase_edges(spark, sf_dir))
        .agg(F.expr("sum(n_triangles) div 3").alias("t"))
        .collect()[0]["t"]
    )
    row = graph_triangle_approx(spark, sf_dir).collect()[0]
    assert row["est_triangles"] == row["sampled_triangles"] * TRI_SAMPLE_DEN**3
    assert exact > 0
    rel_err = abs(row["est_triangles"] - exact) / exact
    assert rel_err <= 0.20, (row["est_triangles"], exact, rel_err)


def test_triangle_approx_sampler_rate_and_determinism(spark, sf_dir):
    """The md5-prefix edge draw keeps ~1/den of edges (binomial, gated
    at ±35% of the expectation for den=4 on ≥8k edges) and is a pure
    function of the edge: re-running yields the IDENTICAL edge set."""
    from etl_ch_destination_spark.queries.graph import (
        TRI_SAMPLE_DEN,
        _copurchase_edges,
        doulion_sampled_edges,
    )

    e = _copurchase_edges(spark, sf_dir)
    n_edges = e.count()
    s1 = {(r["u"], r["v"]) for r in doulion_sampled_edges(e).collect()}
    s2 = {(r["u"], r["v"]) for r in doulion_sampled_edges(e).collect()}
    assert s1 == s2
    expect = n_edges / TRI_SAMPLE_DEN
    assert 0.65 * expect <= len(s1) <= 1.35 * expect, (len(s1), expect)
