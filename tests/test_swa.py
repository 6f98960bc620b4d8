from __future__ import annotations

from tests.conftest import SF_CORRECT, assert_matches_oracle


def test_pageviews_over_time_matches_oracle(spark):
    assert_matches_oracle(spark, "pageviews_over_time")


def test_pageviews_over_time_sf001(spark):
    assert_matches_oracle(spark, "pageviews_over_time", SF_CORRECT)


def test_granularity_semantics(spark):
    """h/d/w/m buckets follow the reference's integer-division chain."""
    from big_data_code_spark.plans.registry import QUERIES

    df = QUERIES["pageviews_over_time"](spark, SF_CORRECT)
    rows = df.collect()
    grans = {r["granularity"] for r in rows}
    assert grans == {"h", "d", "w", "m"}
    # totals must be identical across granularities
    totals = {}
    for r in rows:
        totals.setdefault(r["granularity"], 0)
        totals[r["granularity"]] += r["total_views"]
    assert len(set(totals.values())) == 1
