"""Library-operator invariants (SURVEY §5.3 layer 4): dedup
idempotence/determinism, ASOF correctness vs a range-join reference,
salted join ≡ plain join, bucketed global rank ≡ naive enumeration."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import rows_set


def _events(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table

    return load_table(spark, sf_dir, "events")


def test_latest_by_key_idempotent(spark, sf_dir):
    from etl_ch_destination_spark.ops.dedup import latest_by_key

    ev = _events(spark, sf_dir)
    order = [F.desc("ts"), F.desc("event_id")]
    once = latest_by_key(ev, ["user_id"], order)
    twice = latest_by_key(once, ["user_id"], order)
    assert rows_set(once) == rows_set(twice)


def test_latest_by_key_deterministic_under_partitioning(spark, sf_dir):
    from etl_ch_destination_spark.ops.dedup import latest_by_key

    ev = _events(spark, sf_dir)
    order = [F.desc("ts"), F.desc("event_id")]
    a = latest_by_key(ev.repartition(3), ["user_id"], order)
    b = latest_by_key(ev.repartition(17, "event_type"), ["user_id"], order)
    assert rows_set(a) == rows_set(b)


def test_asof_join_matches_range_join_reference(spark, sf_dir):
    """ASOF = argmax over the range-join candidates; the window idiom
    must reproduce that exactly (incl. unmatched lefts as nulls)."""
    from etl_ch_destination_spark.ops.asof import asof_join
    from etl_ch_destination_spark.ops.dedup import latest_by_key

    ev = _events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purch = latest_by_key(
        ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value"),
        ["user_id", "ts"],
        [F.desc("event_id")],
    ).select("user_id", F.col("ts").alias("pts"), F.col("value").alias("pval"))

    got = asof_join(views, purch, keys=["user_id"], ts="ts", right_ts="pts",
                    right_cols=["pval"], how="left")

    # reference: range join + keep max matching pts per left row
    cand = views.join(
        purch,
        (views.user_id == purch.user_id) & (purch.pts <= views.ts),
        "left",
    ).select(views.event_id, purch.pts, purch.pval)
    ref = latest_by_key(cand, ["event_id"], [F.desc_nulls_last("pts")])

    got_sel = got.select("event_id", F.col("asof_ts").alias("pts"), F.col("asof_pval").alias("pval"))
    assert rows_set(got_sel) == rows_set(ref)


def test_asof_result_subset_of_range_join(spark, sf_dir):
    """SURVEY §5.3 invariant: every ASOF match is a valid range-join pair."""
    from etl_ch_destination_spark.ops.asof import asof_join
    from etl_ch_destination_spark.ops.dedup import latest_by_key

    ev = _events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purch = latest_by_key(
        ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id"),
        ["user_id", "ts"],
        [F.desc("event_id")],
    ).select("user_id", F.col("ts").alias("pts"))
    got = asof_join(views, purch, keys=["user_id"], ts="ts", right_ts="pts",
                    right_cols=[], how="inner")
    violations = got.filter(F.col("asof_ts") > F.col("ts")).count()
    assert violations == 0


def test_salted_join_equals_plain_join(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.ops.salting import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    salted = salted_join(li, s, "l_suppkey", "s_suppkey",
                         salt_cols=["l_orderkey", "l_linenumber"], n_salts=4)
    plain = li.join(s, li.l_suppkey == s.s_suppkey)
    cols = ["l_orderkey", "l_linenumber", "s_suppkey", "s_nationkey"]
    assert rows_set(salted, cols) == rows_set(plain, cols)


def test_global_rank_matches_naive_enumeration(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.ops.rank import with_global_rank

    c = load_table(spark, sf_dir, "customer")
    order = [F.desc_nulls_last("c_acctbal"), F.asc("c_custkey")]
    ranked = with_global_rank(c, order, lead="c_acctbal", descending=True, name="pos")
    got = {r["c_custkey"]: r["pos"] for r in ranked.collect()}
    naive = c.orderBy(*order).collect()
    for i, r in enumerate(naive, start=1):
        assert got[r["c_custkey"]] == i


def test_union_all_count_additivity(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F")
    b = o.filter(F.col("o_orderstatus") != "F")
    assert a.count() + b.count() == a.unionByName(b).count() == o.count()


def test_rollup_grand_total_equals_global(spark, sf_dir):
    from etl_ch_destination_spark.catalog import load_table

    c = load_table(spark, sf_dir, "customer")
    rolled = (
        c.rollup("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("c_mktsegment").isNull())
        .collect()
    )
    assert len(rolled) == 1 and rolled[0]["n"] == c.count()


def test_asof_join_matches_pandas_merge_asof_both_directions(spark, sf_dir):
    """ops/asof.asof_join must agree with pandas.merge_asof row-for-row
    in both directions, with and without a tolerance."""
    import pandas as pd

    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.ops.asof import asof_join
    from etl_ch_destination_spark.ops.dedup import latest_by_key

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purch = latest_by_key(
        ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        ),
        ["user_id", "ts"],
        [F.desc("event_id")],
    ).select("user_id", "ts", "value")

    lp = views.toPandas().sort_values("ts").reset_index(drop=True)
    rp = purch.toPandas().sort_values("ts").reset_index(drop=True)

    for direction, tol, strict in [
        ("backward", None, False),
        ("forward", None, False),
        ("forward", 7200, False),
        ("nearest", None, False),
        ("nearest", 3600, False),
        # strict=True ↔ pandas allow_exact_matches=False (the r7
        # ClickHouse strict-comparator ASOF form)
        ("backward", None, True),
        ("forward", None, True),
        ("backward", 7200, True),
        ("nearest", None, True),
    ]:
        got = asof_join(
            views, purch, keys=["user_id"], ts="ts",
            direction=direction, tolerance_seconds=tol, strict=strict,
        ).toPandas()
        want = pd.merge_asof(
            lp, rp, on="ts", by="user_id", direction=direction,
            tolerance=pd.Timedelta(seconds=tol) if tol else None,
            allow_exact_matches=not strict,
            suffixes=("", "_r"),
        )
        g = got.sort_values("event_id").reset_index(drop=True)
        w = want.sort_values("event_id").reset_index(drop=True)
        assert list(g["event_id"]) == list(w["event_id"])
        assert g["asof_value"].fillna(-1).tolist() == w["value"].fillna(-1).tolist(), (
            direction,
            tol,
            strict,
        )


def test_connected_components_vs_union_find(spark):
    """large-star/small-star must label every node with its component
    minimum — checked against a driver-side union-find on a graph with
    a long chain (worst case for naive flooding), a clique, an
    isolated edge, and a random part (fixed seed)."""
    import random

    from etl_ch_destination_spark.ops.components import connected_components

    rng = random.Random(42)
    edges = [(i, i + 1) for i in range(100, 120)]          # chain
    edges += [(a, b) for a in range(200, 206) for b in range(a + 1, 206)]  # clique
    edges += [(300, 301)]                                   # isolated pair
    nodes = list(range(400, 440))
    edges += [tuple(rng.sample(nodes, 2)) for _ in range(30)]  # random

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.component for r in connected_components(df, exact_convergence=True).collect()}
    assert got == want

    # the fused variant (both stars per round, one distinct) must
    # produce the identical label map — the label is a pure function
    # of the graph, whichever contraction order reaches the fixed point
    stats: dict = {}
    got_fused = {
        r.node: r.component
        for r in connected_components(
            df, exact_convergence=True, variant="fused", stats=stats
        ).collect()
    }
    assert got_fused == want
    assert stats["rounds"] >= 1


def test_stage_local_and_durable_variants(spark, tmp_path):
    """ops/staging.stage: default = localCheckpoint (lineage truncated,
    same rows); with spark.etl_ch.staging.dir set = durable parquet
    round-trip (same rows, files actually on disk)."""
    from etl_ch_destination_spark.ops.staging import STAGING_DIR_CONF, stage

    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    want = rows_set(df)

    local = stage(df)
    assert rows_set(local) == want
    assert local.rdd.getNumPartitions() >= 1  # checkpointed RDD is live

    staging_root = str(tmp_path / "staging")
    spark.conf.set(STAGING_DIR_CONF, staging_root)
    try:
        durable = stage(df, label="t")
        assert rows_set(durable) == want
        import glob

        files = glob.glob(f"{staging_root}/t-*/*.parquet")
        assert files, "durable stage() left no parquet on disk"
        # unique subdirectory per call: a second stage() cannot collide
        durable2 = stage(df, label="t")
        assert rows_set(durable2) == want
        assert len(glob.glob(f"{staging_root}/t-*")) == 2
    finally:
        spark.conf.unset(STAGING_DIR_CONF)


def test_staging_pipeline_reclaims_superseded_tables(spark, tmp_path):
    """ADVICE r7 (medium): iterative callers must not accumulate one
    durable staging table per round. StagingPipeline(keep=k) deletes
    the oldest table once more than k exist, while the newest k stay
    readable; localCheckpoint mode is unaffected."""
    import glob

    from etl_ch_destination_spark.ops.staging import (
        STAGING_DIR_CONF,
        StagingPipeline,
    )

    df = spark.range(50).selectExpr("id", "id * 3 AS v")
    want = rows_set(df)

    # local mode: identical to stage(), nothing on disk to manage
    pipe = StagingPipeline(keep=1)
    assert rows_set(pipe.stage(df)) == want

    staging_root = str(tmp_path / "staging")
    spark.conf.set(STAGING_DIR_CONF, staging_root)
    try:
        pipe = StagingPipeline(keep=1)
        pipe.stage(df, label="r")
        pipe.stage(df, label="r")
        last = pipe.stage(df, label="r")
        # only the newest table survives 3 rounds at keep=1 ...
        assert len(glob.glob(f"{staging_root}/r-*")) == 1
        # ... and it is the one the returned frame reads
        assert rows_set(last) == want

        pipe2 = StagingPipeline(keep=2)
        a = pipe2.stage(df, label="s")
        b = pipe2.stage(df, label="s")
        pipe2.stage(df, label="s")
        assert len(glob.glob(f"{staging_root}/s-*")) == 2
        # keep=2 exists for CC's exact-convergence audit: the PREVIOUS
        # round must still be readable after the new one materializes
        assert rows_set(b) == want
        del a
    finally:
        spark.conf.unset(STAGING_DIR_CONF)


def test_durable_staging_pipelines_match_local(spark, sf_dir, tmp_path):
    """The 100 TB configuration (spark.etl_ch.staging.dir set → every
    stage() call becomes a durable parquet staging table) must produce
    EXACTLY the frames the localCheckpoint default produces, on the
    real pipelines that route through stage(): MinHash near-dup pair
    generation and connected-components labeling."""
    from etl_ch_destination_spark.catalog import load_table
    from etl_ch_destination_spark.ops.components import connected_components
    from etl_ch_destination_spark.ops.neardup import near_duplicate_pairs
    from etl_ch_destination_spark.ops.staging import STAGING_DIR_CONF

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs_local = near_duplicate_pairs(docs)
    labels_local = rows_set(
        connected_components(pairs_local, "id_a", "id_b")
    )
    pairs_set_local = rows_set(pairs_local)

    spark.conf.set(STAGING_DIR_CONF, str(tmp_path / "staging"))
    try:
        pairs_durable = near_duplicate_pairs(docs)
        assert rows_set(pairs_durable) == pairs_set_local
        labels_durable = rows_set(
            connected_components(pairs_durable, "id_a", "id_b")
        )
        assert labels_durable == labels_local
        import glob

        staged = glob.glob(str(tmp_path / "staging" / "*"))
        assert staged, "durable mode wrote no staging tables"
    finally:
        spark.conf.unset(STAGING_DIR_CONF)
