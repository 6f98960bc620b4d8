from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle


def test_uniques_over_time(spark):
    assert_matches_oracle(spark, "uniques_over_time")


def test_bounce_rate(spark):
    assert_matches_oracle(spark, "bounce_rate")


def test_dedup_events(spark):
    assert_matches_oracle(spark, "dedup_events")


def test_normalize_urls(spark):
    assert_matches_oracle(spark, "normalize_urls")


def test_user_id_normalization(spark):
    assert_matches_oracle(spark, "user_id_normalization")


def test_normalized_events(spark):
    assert_matches_oracle(spark, "normalized_events")


def test_sf001_sweep(spark):
    for name in ("uniques_over_time", "bounce_rate", "user_id_normalization"):
        assert_matches_oracle(spark, name, SF_CORRECT)


def test_uniques_hll_close_to_exact(spark):
    """The HLL tolerance contract: exact counts match the exact
    query and every bucket's sketch estimate is in-tolerance (the
    within_5pct flag the oracle asserts)."""
    from big_data_code_spark.plans.registry import QUERIES

    exact = {
        (r["event_type"], r["granularity"], r["bucket"]): r["unique_visitors"]
        for r in QUERIES["uniques_over_time"](spark, SF_SMOKE).collect()
    }
    est = QUERIES["uniques_over_time_hll"](spark, SF_SMOKE).collect()
    assert len(est) == len(exact)
    for r in est:
        k = (r["event_type"], r["granularity"], r["bucket"])
        assert r["exact_uniques"] == exact[k]
        assert r["within_5pct"] is True


def test_connected_components_cycle(spark):
    """A pure cycle (worst case for min propagation) converges in
    O(log n) contraction rounds."""
    from big_data_code_spark.operators.graph import connected_components

    n = 101
    edges = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    out = connected_components(edges)
    rows = out.collect()
    assert len(rows) == n
    assert {r["component"] for r in rows} == {0}


def test_connected_components_forest(spark):
    from big_data_code_spark.operators.graph import connected_components

    # two chains + an isolated pair
    data = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (20, 21)]
    edges = spark.createDataFrame(data, ["src", "dst"])
    out = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_self_loop_singleton(spark):
    """A node whose only edge is a self-loop is still a (singleton)
    component — the raw endpoints seed the label frame, not the
    self-loop-filtered edge list."""
    from big_data_code_spark.operators.graph import connected_components

    data = [(1, 2), (7, 7), (3, 3), (3, 4)]
    edges = spark.createDataFrame(data, ["src", "dst"])
    out = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 7: 7, 3: 3, 4: 3}


def test_uniques_normalized_oracle_and_reduction(spark):
    """The composed view (equiv CC → rewrite ids → uniques) matches
    its recursive-CTE oracle, and merging equiv classes strictly
    reduces total distinct visitors vs the raw view."""
    from pyspark.sql import functions as F

    from big_data_code_spark.plans.registry import QUERIES
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "uniques_over_time_normalized", SF_SMOKE)
    raw = (
        QUERIES["uniques_over_time"](spark, SF_SMOKE)
        .agg(F.sum("unique_visitors"))
        .first()[0]
    )
    norm = (
        QUERIES["uniques_over_time_normalized"](spark, SF_SMOKE)
        .agg(F.sum("unique_visitors"))
        .first()[0]
    )
    assert norm < raw
