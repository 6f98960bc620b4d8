"""Advanced capability tests: JSON extraction, as-of join, exact
percentiles, pivot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle

ADVANCED_QUERIES = (
    "props_json_extract",
    "asof_last_event_value",
    "value_percentiles",
    "user_event_pivot",
    "hourly_gap_fill",
    "hourly_locf",
    "sales_grouping_sets",
    "log_compaction",
    "funnel_conversion",
    "person_purge",
    "user_value_windows",
    "rolling_7d_revenue",
    "cohort_retention",
    "dq_checks",
    "hourly_anomalies",
    "sales_cube",
    "value_histogram",
    "monthly_daily_corr",
    "funnel_3step",
)


@pytest.mark.parametrize("name", ADVANCED_QUERIES)
def test_oracle_smoke(spark, name):
    assert_matches_oracle(spark, name, SF_SMOKE)


@pytest.mark.parametrize("name", ("asof_last_event_value",))
def test_oracle_sf001(spark, name):
    assert_matches_oracle(spark, name, SF_CORRECT)


def test_asof_join_semantics(spark):
    """Hand-checkable as-of cases: inclusive tie, gap, no-match."""
    from big_data_code_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 4, "b"), (2, 7, "c"), (3, 1, "d")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 10, 200.0), (1, 11, 300.0), (2, 6, 400.0)],
        "k long, t long, v double",
    )
    out = {
        r["tag"]: (r["asof_ts"], r["asof_v"])
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t", value_cols=["v"]
        ).collect()
    }
    assert out["a"] == (10, 200.0)  # tie at t=10 is inclusive
    assert out["b"] == (4, None) or out["b"][1] is None  # no right row ≤ 4
    assert out["c"] == (6, 400.0)
    assert out["d"][1] is None  # key with no right rows at all


def test_asof_join_single_shuffle(spark):
    """The as-of join must be one window sort, not a range join or
    a python UDF."""
    from big_data_code_spark.plans.registry import QUERIES

    plan = (
        QUERIES["asof_last_event_value"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pivot_no_python_and_counts(spark):
    from big_data_code_spark.plans.registry import QUERIES

    df = QUERIES["user_event_pivot"](spark, SF_SMOKE)
    total = df.select(
        sum(F.sum(c) for c in df.columns if c.startswith("n_")).alias("s")
    ).first()["s"]
    from big_data_code_spark.sources.tables import load_table

    assert total == load_table(spark, SF_SMOKE, "events").count()


@pytest.mark.parametrize(
    "name", ("user_event_unpivot", "scd2_customer_updates", "events_near_pairs",
             "value_tier_lookup")
)
def test_pattern_oracles(spark, name):
    assert_matches_oracle(spark, name, SF_SMOKE)


def test_scd2_invariants(spark):
    """SCD2 apply: exactly one open version per key; changed keys
    carry a closed original + a new open row with the new value."""
    from big_data_code_spark.plans.registry import QUERIES

    dim = QUERIES["scd2_customer_updates"](spark, SF_SMOKE)
    open_per_key = (
        dim.where(F.col("is_current"))
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") != 1)
        .count()
    )
    assert open_per_key == 0
    changed = dim.where(F.col("c_custkey") % 5 == 0)
    closed = changed.where(~F.col("is_current"))
    fresh = changed.where(F.col("is_current"))
    assert closed.count() == fresh.count() > 0
    joined = closed.alias("o").join(fresh.alias("n"), "c_custkey").select(
        (F.col("n.acctbal") - F.col("o.acctbal")).alias("delta")
    )
    assert all(abs(r["delta"] - 100.0) < 1e-6 for r in joined.collect())


def test_scd2_inserts_brand_new_keys(spark):
    """An update for a key absent from the dimension becomes a new
    open row; NULL attribute values mean no-change (never close the
    current version)."""
    from big_data_code_spark.operators.cdc import scd2_apply

    current = spark.createDataFrame(
        [(1, "a", 100, None, True), (2, "b", 100, None, True)],
        "k int, attr string, valid_from long, valid_to long, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(3, "c"), (2, None)], "k int, attr string"
    )
    out = scd2_apply(current, updates, "k", ["attr"], batch_ts=200)
    rows = {(r["k"], r["attr"], r["valid_from"], r["is_current"]) for r in out.collect()}
    assert rows == {
        (1, "a", 100, True),   # untouched
        (2, "b", 100, True),   # NULL update ⇒ no change, stays open
        (3, "c", 200, True),   # brand-new key inserted open
    }


def test_scd2_duplicate_key_batch_keeps_single_open_row(spark):
    """A batch replaying the same key (new or existing) twice is
    reduced to ONE row per key before the merge, preserving the
    SCD2 single-open-row invariant (deterministic winner = greatest
    tracked struct)."""
    from big_data_code_spark.operators.cdc import scd2_apply

    current = spark.createDataFrame(
        [(1, "a", 100, None, True)],
        "k int, attr string, valid_from long, valid_to long, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(3, "c1"), (3, "c2"), (1, "x"), (1, "z")], "k int, attr string"
    )
    out = scd2_apply(current, updates, "k", ["attr"], batch_ts=200)
    open_rows = [
        (r["k"], r["attr"]) for r in out.where(F.col("is_current")).collect()
    ]
    assert sorted(open_rows) == [(1, "z"), (3, "c2")]  # one open row per key
    # key 1's old version is closed exactly once
    closed = out.where(~F.col("is_current")).collect()
    assert [(r["k"], r["attr"], r["valid_to"]) for r in closed] == [(1, "a", 200)]


def test_approx_quantile_close_to_exact(spark):
    """approx_percentile within 2% of the exact interpolated value
    (the scale path for percentile queries)."""
    from big_data_code_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    rows = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("exact"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("approx"),
    ).collect()
    for r in rows:
        assert abs(r["approx"] - r["exact"]) <= 0.02 * abs(r["exact"]) + 1e-9


def test_locf_fills_gaps_with_last_observation(spark):
    """Every gap hour carries the most recent observed value; no
    NULLs survive (spines start at each key's first observation)."""
    from big_data_code_spark.plans.registry import QUERIES

    df = QUERIES["hourly_locf"](spark, SF_SMOKE).persist()
    assert df.where(F.col("filled_value").isNull()).count() == 0
    gaps = df.where("was_gap").count()
    assert gaps > 0, "test data must contain empty hours"
    # a gap hour's value equals the previous non-gap hour's value
    rows = df.orderBy("event_type", "hour_bucket").collect()
    last_obs = {}
    for r in rows:
        if r["was_gap"]:
            assert r["filled_value"] == last_obs[r["event_type"]]
        else:
            last_obs[r["event_type"]] = r["filled_value"]
    df.unpersist()


def test_grouping_sets_single_expand_aggregate(spark):
    """The three grouping sets must compile to ONE Expand + hash
    aggregate pipeline, not a union of three aggregations."""
    from big_data_code_spark.plans.registry import QUERIES

    plan = (
        QUERIES["sales_grouping_sets"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in plan
    assert plan.count("Union") == 0


def test_log_compaction_one_row_per_key(spark):
    """Compaction emits exactly one (latest) record per live key."""
    from big_data_code_spark.plans.registry import QUERIES
    from big_data_code_spark.sources.tables import load_table

    out = QUERIES["log_compaction"](spark, SF_SMOKE)
    keys = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_type").distinct().count()
    assert out.count() == keys
    assert out.groupBy("user_id", "event_type").count().where("count > 1").count() == 0


def test_person_purge_removes_requesters_only(spark):
    """Purged users contribute zero facts; everyone else's counts
    are untouched (the recompute is exact, not approximate)."""
    from big_data_code_spark.plans.registry import QUERIES
    from big_data_code_spark.sources.tables import load_table

    events = load_table(spark, SF_SMOKE, "events")
    requesters = {
        r["user_id"]
        for r in events.where("event_type = 'error' AND value < 0.5")
        .select("user_id").distinct().collect()
    }
    assert requesters, "test data must contain deletion requests"
    purged = QUERIES["person_purge"](spark, SF_SMOKE)
    purged_total = purged.agg(F.sum("cnt").alias("s")).collect()[0]["s"]
    expected = events.where(~F.col("user_id").isin(list(requesters))).count()
    assert purged_total == expected


def test_funnel_rate_bounds(spark):
    """Conversion counts never exceed signup counts; rates in [0,1]."""
    from big_data_code_spark.plans.registry import QUERIES

    bad = (
        QUERIES["funnel_conversion"](spark, SF_SMOKE)
        .where("n_converted > n_signups OR conversion_rate < 0 OR conversion_rate > 1")
        .count()
    )
    assert bad == 0


def test_window_breadth_single_window_operator(spark):
    """lag/lead/percent_rank/cume_dist/ntile over the same spec must
    collapse into ONE Window operator (one shuffle + one sort)."""
    from big_data_code_spark.plans.registry import QUERIES

    plan = (
        QUERIES["user_value_windows"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") == 1


def test_purge_and_q2_broadcast_not_shuffle(spark):
    """The purge set and the per-part min table are small by
    construction — both must broadcast (anti/equi), never shuffle
    the fact side a second time."""
    from big_data_code_spark.plans.registry import QUERIES

    purge_plan = (
        QUERIES["person_purge"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in purge_plan and "LeftAnti" in purge_plan

    q2_plan = (
        QUERIES["q2_min_cost_supplier"](spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in q2_plan
    assert "SortMergeJoin" not in q2_plan


def test_cohort_week0_full_retention(spark):
    """Offset-0 retention is 1.0 for every cohort (the first-
    activity week is itself an active week), and retention never
    exceeds 1."""
    from big_data_code_spark.plans.registry import QUERIES

    df = QUERIES["cohort_retention"](spark, SF_SMOKE).persist()
    w0 = df.where("week_offset = 0")
    assert w0.count() > 0
    assert w0.where("retention != 1.0 OR n_active != n_cohort").count() == 0
    assert df.where("retention > 1.0").count() == 0
    df.unpersist()


def test_dq_checks_clean_feed_passes(spark):
    """The synthetic orders feed is clean: every constraint passes
    and the audit is a single scan of orders (no self-joins)."""
    from big_data_code_spark.plans.registry import QUERIES

    df = QUERIES["dq_checks"](spark, SF_SMOKE)
    rows = {r["check_name"]: r for r in df.collect()}
    assert len(rows) == 6
    assert all(r["passed"] for r in rows.values())
    assert rows["row_count"]["metric"] > 0


# ------------------------------------------------- r7 wave 2: clickstream


def test_top_event_transitions_oracle_and_shares(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "top_event_transitions", SF_SMOKE)
    from big_data_code_spark.plans.advanced import top_event_transitions

    rows = sorted(
        top_event_transitions(spark, SF_SMOKE).collect(),
        key=lambda r: r["rank"],
    )
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    counts = [r["n_transitions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # transitions = events - users-with-events (each user's first
    # event opens no transition)
    from big_data_code_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(counts) == ev.count() - n_users


def test_trending_events_decay_oracle_and_bounds(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "trending_events_decay", SF_SMOKE)
    from big_data_code_spark.plans.advanced import trending_events_decay

    rows = trending_events_decay(spark, SF_SMOKE).collect()
    for r in rows:
        # each event contributes (0, 1] -> score bounded by count
        assert 0.0 < r["decay_score"] <= r["n_events"]
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_abtest_value_ztest_oracle_and_recompute(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "abtest_value_ztest", SF_SMOKE)
    import math

    from big_data_code_spark.plans.advanced import abtest_value_ztest
    from big_data_code_spark.sources.tables import load_table

    row = abtest_value_ztest(spark, SF_SMOKE).collect()[0]
    ev = [
        (r["user_id"], r["value"])
        for r in load_table(spark, SF_SMOKE, "events")
        .where("event_type = 'purchase'")
        .collect()
    ]
    a = [round(v * 1e6) for u, v in ev if u % 2 == 0]
    b = [round(v * 1e6) for u, v in ev if u % 2 == 1]
    assert (row["n_a"], row["n_b"]) == (len(a), len(b))
    assert abs(row["mean_a"] - sum(a) / 1e6 / len(a)) < 1e-9
    # independent z recompute on the same fixed-point grid
    sa = [round((v) * (v) * 1e6) for u, v in ev if u % 2 == 0]
    sb = [round((v) * (v) * 1e6) for u, v in ev if u % 2 == 1]
    ma, mb = sum(a) / 1e6 / len(a), sum(b) / 1e6 / len(b)
    va = sum(sa) / 1e6 / len(a) - ma * ma
    vb = sum(sb) / 1e6 / len(b) - mb * mb
    z = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
    assert abs(row["z_score"] - z) < 1e-9


# ------------------------------------------------- r7 wave 3


def test_sessionize_events_oracle_and_recount(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "sessionize_events", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        SESSION_GAP_US,
        sessionize_events,
    )
    from big_data_code_spark.sources.tables import load_table

    rows = sessionize_events(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    assert all(r["duration_s"] >= 0 for r in rows)
    # pure-Python resession of the busiest user
    busiest = max(
        ((r["user_id"], r["n_events"]) for r in rows), key=lambda t: t[1]
    )[0]
    evs = sorted(
        (
            (r["ts"], r["event_id"])
            for r in ev.where(F.col("user_id") == busiest).collect()
        ),
    )
    n_sessions, prev = 0, None
    for ts, _eid in evs:
        us = int(ts.timestamp() * 1_000_000)
        if prev is None or us - prev > SESSION_GAP_US:
            n_sessions += 1
        prev = us
    assert n_sessions == sum(1 for r in rows if r["user_id"] == busiest)


def test_session_paths_topk_oracle_and_bounds(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "session_paths_topk", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        EVENT_TYPES,
        session_paths_topk,
        sessionize_events,
    )

    rows = sorted(
        session_paths_topk(spark, SF_SMOKE).collect(), key=lambda r: r["rank"]
    )
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    n_sessions = sessionize_events(spark, SF_SMOKE).count()
    assert sum(counts) <= n_sessions
    for r in rows:
        steps = r["path"].split(">")
        assert 1 <= len(steps) <= 3
        assert all(s in EVENT_TYPES for s in steps)


def test_market_basket_lift_oracle_and_recount(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "market_basket_lift", SF_SMOKE)
    from big_data_code_spark.plans.advanced import market_basket_lift
    from big_data_code_spark.sources.tables import load_table

    rows = market_basket_lift(spark, SF_SMOKE).collect()
    assert all(0 < r["support"] <= 1 for r in rows)
    assert all(r["lift"] > 0 for r in rows)
    assert all(r["brand_a"] < r["brand_b"] for r in rows)
    # independent recount of the top pair
    top = min(rows, key=lambda r: r["rank"])
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_brand")
    baskets = {}
    for r in (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .collect()
    ):
        baskets.setdefault(r["l_orderkey"], set()).add(r["p_brand"])
    n_pair = sum(
        1
        for b in baskets.values()
        if top["brand_a"] in b and top["brand_b"] in b
    )
    assert n_pair == top["n_pair"]
    assert max(
        (
            sum(1 for b in baskets.values() if x in b and y in b)
            for x in {v for s in baskets.values() for v in s}
            for y in {v for s in baskets.values() for v in s}
            if x < y
        )
    ) == top["n_pair"]


def test_rfm_segments_oracle_and_partition(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "rfm_segments", SF_SMOKE)
    from big_data_code_spark.plans.advanced import rfm_segments
    from big_data_code_spark.sources.tables import load_table

    rows = rfm_segments(spark, SF_SMOKE).collect()
    orders = load_table(spark, SF_SMOKE, "orders")
    assert sum(r["n_customers"] for r in rows) == (
        orders.select("o_custkey").distinct().count()
    )
    for r in rows:
        assert 1 <= r["r_score"] <= 4
        assert 1 <= r["f_score"] <= 4
        assert 1 <= r["m_score"] <= 4
        assert r["segment"] in {
            "champion",
            "loyal",
            "at_risk",
            "hibernating",
            "other",
        }
        assert r["avg_monetary"] > 0


def test_value_mad_outliers_oracle_and_median(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "value_mad_outliers", SF_SMOKE)
    import statistics

    from big_data_code_spark.plans.advanced import value_mad_outliers
    from big_data_code_spark.sources.tables import load_table

    rows = {r["event_type"]: r for r in value_mad_outliers(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").collect()
    vals = [r["value"] for r in ev if r["event_type"] == "click"]
    r = rows["click"]
    assert abs(r["med"] - statistics.median(vals)) < 1e-6
    devs = [abs(v - r["med"]) for v in vals]
    assert abs(r["mad"] - statistics.median(devs)) < 1e-6
    assert r["n_events"] == len(vals)
    assert 0 <= r["outlier_share"] <= 1


def test_sessionize_incremental_equals_full_rebuild(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "sessionize_incremental", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        sessionize_events,
        sessionize_incremental,
    )

    inc = sessionize_incremental(spark, SF_SMOKE)
    full = sessionize_events(spark, SF_SMOKE)
    # batch ∪ master ≡ full rebuild (minus the provenance flag)
    cols = full.columns
    assert sorted(
        tuple(r[c] for c in cols) for r in inc.select(*cols).collect()
    ) == sorted(tuple(r[c] for c in cols) for r in full.collect())
    rows = inc.collect()
    # the 24 h window touches SOME but not ALL users
    n_rec = sum(1 for r in rows if r["recomputed"])
    assert 0 < n_rec < len(rows)


def test_shipping_latency_percentiles_oracle_and_recompute(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "shipping_latency_percentiles", SF_SMOKE)
    import statistics

    from big_data_code_spark.plans.advanced import (
        shipping_latency_percentiles,
    )
    from big_data_code_spark.sources.tables import load_table

    rows = {
        r["o_orderpriority"]: r
        for r in shipping_latency_percentiles(spark, SF_SMOKE).collect()
    }
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).collect()
    by_prio = {}
    for r in j:
        lat = (r["l_shipdate"] - r["o_orderdate"]).days
        by_prio.setdefault(r["o_orderpriority"], []).append(lat)
    for prio, lats in by_prio.items():
        row = rows[prio]
        assert row["n_lineitems"] == len(lats)
        assert row["min_days"] == min(lats)
        assert row["max_days"] == max(lats)
        assert abs(row["p50_days"] - statistics.median(lats)) < 1e-6
        assert row["min_days"] <= row["p50_days"] <= row["max_days"]


def test_lambda_merged_sessions_equals_full_and_stitches(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    # the oracle IS the full-rebuild SQL - this assert is the
    # batch + speed = rebuild proof
    assert_matches_oracle(spark, "lambda_merged_sessions", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        lambda_merged_sessions,
        sessionize_events,
    )

    full = sessionize_events(spark, SF_SMOKE)
    merged = lambda_merged_sessions(spark, SF_SMOKE)
    cols = full.columns
    assert sorted(
        tuple(r[c] for c in cols) for r in merged.collect()
    ) == sorted(tuple(r[c] for c in cols) for r in full.collect())


def test_lambda_merged_sessions_stitches_spanning_session(spark):
    """Force a session that SPANS the batch/speed boundary and
    check the stitch fuses it into one full-rebuild-identical row
    (at sf0.001/sf0.01 the 24 h cutoff happens to fall in a gap for
    every user, so this path needs a constructed frame; sf0.1 DOES
    exercise it end-to-end - 2 fused sessions, see the probe)."""
    import datetime as dt

    from big_data_code_spark.plans.advanced import (
        SESSION_INCR_WINDOW_US,
        _lambda_sessions_from_events,
        _session_rollup,
        _sessionize_frame,
    )

    t0 = dt.datetime(2024, 1, 1)
    day_us = SESSION_INCR_WINDOW_US

    def ev(eid, uid, off_us):
        return (eid, uid, t0 + dt.timedelta(microseconds=off_us), off_us)

    # max ts at offset 2*day -> cutoff at offset day. User 1 has
    # events 10 min either side of the cutoff (gap 20 min < 30 min:
    # MUST fuse) plus an older separate session; user 2 only speed.
    rows = [
        ev(1, 1, day_us - 7_200_000_000),   # separate batch session
        ev(2, 1, day_us - 600_000_000),
        ev(3, 1, day_us + 600_000_000),     # fuses with event 2
        ev(4, 2, 2 * day_us),               # speed-only user, max ts
    ]
    frame = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, us long"
    ).select("user_id", "ts", "event_id", "us")
    out = sorted(
        (
            (r["user_id"], r["session_id"], r["n_events"], r["duration_s"])
            for r in _lambda_sessions_from_events(frame).collect()
        )
    )
    full = sorted(
        (
            (r["user_id"], r["session_id"], r["n_events"], r["duration_s"])
            for r in _session_rollup(_sessionize_frame(frame)).collect()
        )
    )
    assert out == full
    # user 1: two sessions, the second FUSED across the boundary
    assert out == [(1, 1, 1, 0), (1, 2, 2, 1200), (2, 1, 1, 0)]


def test_time_to_first_purchase_oracle_and_recompute(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "time_to_first_purchase", SF_SMOKE)
    import statistics

    from big_data_code_spark.plans.advanced import time_to_first_purchase
    from big_data_code_spark.sources.tables import load_table

    row = time_to_first_purchase(spark, SF_SMOKE).collect()[0]
    ev = load_table(spark, SF_SMOKE, "events").collect()
    signup, purch = {}, {}
    for r in ev:
        us = int(r["ts"].timestamp() * 1_000_000)
        if r["event_type"] == "signup":
            signup[r["user_id"]] = min(signup.get(r["user_id"], us), us)
    for r in ev:
        us = int(r["ts"].timestamp() * 1_000_000)
        u = r["user_id"]
        if r["event_type"] == "purchase" and u in signup and us >= signup[u]:
            purch[u] = min(purch.get(u, us), us)
    lats = [
        (purch[u] - signup[u]) // 86_400_000_000 for u in purch
    ]
    assert row["n_signups"] == len(signup)
    assert row["n_converted"] == len(lats)
    assert row["conversion_rate"] == len(lats) / len(signup)
    assert abs(row["p50_days"] - statistics.median(lats)) < 1e-6


def test_fuzzy_name_match_oracle_and_recall(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "fuzzy_name_match", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        FUZZY_MAX_DIST,
        fuzzy_name_match,
    )
    from big_data_code_spark.sources.tables import load_table

    rows = fuzzy_name_match(spark, SF_SMOKE).collect()
    assert rows, "the 8x8 name grid must contain near matches"
    assert all(0 < r["dist"] <= FUZZY_MAX_DIST for r in rows)
    assert all(r["name_a"] < r["name_b"] for r in rows)
    # blocking recall vs naive all-pairs: every true lev<=2 pair
    # SHARING a first or last token is found (the documented recall
    # contract of the two blocking passes)
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    names = sorted(
        r["name"]
        for r in load_table(spark, SF_SMOKE, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .collect()
    )
    got = {(r["name_a"], r["name_b"]): r["dist"] for r in rows}
    for na, nb in itertools.combinations(names, 2):
        shares_block = (
            na.split(" ")[0] == nb.split(" ")[0]
            or na.split(" ")[-1] == nb.split(" ")[-1]
        )
        d = lev(na, nb)
        if shares_block and 0 < d <= FUZZY_MAX_DIST:
            assert got[(na, nb)] == d


def test_kanonymity_report_oracle_and_ladder(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "kanonymity_report", SF_SMOKE)
    from big_data_code_spark.plans.advanced import kanonymity_report
    from big_data_code_spark.sources.tables import load_table

    rows = {r["level"]: r for r in kanonymity_report(spark, SF_SMOKE).collect()}
    assert set(rows) == {0, 1, 2}
    # coarsening can only merge classes: fewer classes, bigger min,
    # no more suppression
    assert rows[0]["n_classes"] <= rows[1]["n_classes"] <= rows[2]["n_classes"]
    assert rows[0]["min_class"] >= rows[1]["min_class"]
    assert rows[1]["min_class"] >= rows[2]["min_class"]
    assert rows[0]["n_below_k"] <= rows[1]["n_below_k"] <= rows[2]["n_below_k"]
    n_cust = load_table(spark, SF_SMOKE, "customer").count()
    for r in rows.values():
        assert 0 <= r["suppressed_share"] <= 1
        assert r["n_below_k"] <= n_cust


def test_dau_mau_stickiness_oracle_and_bounds(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "dau_mau_stickiness", SF_SMOKE)
    from big_data_code_spark.plans.advanced import dau_mau_stickiness

    rows = dau_mau_stickiness(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # avg daily uniques can never exceed weekly uniques
        assert 0 < r["stickiness"] <= 1
        assert r["avg_dau"] <= r["wau"]
        assert 1 <= r["days_observed"] <= 7
        # Monday-aligned: epoch day 4 (1970-01-05) was a Monday
        assert (r["week_start_day"] - 4) % 7 == 0


def test_pareto_user_concentration_oracle_and_monotone(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "pareto_user_concentration", SF_SMOKE)
    from big_data_code_spark.plans.advanced import pareto_user_concentration
    from big_data_code_spark.sources.tables import load_table

    rows = sorted(
        pareto_user_concentration(spark, SF_SMOKE).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(10))
    ev = load_table(spark, SF_SMOKE, "events")
    assert sum(r["n_events"] for r in rows) == ev.count()
    assert sum(r["n_users"] for r in rows) == ev.select("user_id").distinct().count()
    # decile 0 holds the heaviest users: per-user mean share decreasing
    means = [r["n_events"] / r["n_users"] for r in rows]
    assert all(a >= b for a, b in zip(means, means[1:]))
    assert abs(rows[-1]["cum_share"] - 1.0) < 1e-9
    cums = [r["cum_share"] for r in rows]
    assert all(a <= b + 1e-12 for a, b in zip(cums, cums[1:]))


def test_seasonal_hourly_anomalies_oracle_and_loo(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "seasonal_hourly_anomalies", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        SEASONAL_MIN_OBS,
        seasonal_hourly_anomalies,
    )

    rows = seasonal_hourly_anomalies(spark, SF_SMOKE).collect()
    assert rows
    # pure-Python leave-one-out recheck of one populated slot
    import math
    from collections import defaultdict

    slots = defaultdict(list)
    for r in rows:
        slots[(r["event_type"], r["hour_bucket"] % 168)].append(r)
    key, members = max(slots.items(), key=lambda kv: len(kv[1]))
    assert len(members) - 1 >= SEASONAL_MIN_OBS
    for target in members:
        rest = [m["cnt"] for m in members if m is not target]
        mu = sum(rest) / len(rest)
        var = sum((x - mu) ** 2 for x in rest) / (len(rest) - 1)
        if var > 0:
            z = (target["cnt"] - mu) / math.sqrt(var)
            assert abs(target["zscore"] - z) < 1e-4


def test_psi_value_drift_oracle_and_mass(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "psi_value_drift", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        PSI_N_BINS,
        psi_value_drift,
    )
    from big_data_code_spark.sources.tables import load_table

    rows = sorted(psi_value_drift(spark, SF_SMOKE).collect(), key=lambda r: r["bin"])
    assert [r["bin"] for r in rows] == list(range(PSI_N_BINS))
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    assert sum(r["n_p1"] + r["n_p2"] for r in rows) == n_orders
    # smoothed probabilities are distributions
    assert abs(sum(r["p1"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["p2"] for r in rows) - 1.0) < 1e-9
    # identical-distribution sanity: PSI of a period against itself is 0
    for r in rows:
        if r["n_p1"] == r["n_p2"] and r["p1"] == r["p2"]:
            assert r["psi_contrib"] == 0.0


def test_markov_attribution_oracle_and_recompute(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "markov_attribution", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        MARKOV_CHANNELS,
        MARKOV_STEPS,
        _markov_transition_counts,
        markov_attribution,
    )

    rows = {r["channel"]: r for r in markov_attribution(spark, SF_SMOKE).collect()}
    assert set(rows) == set(MARKOV_CHANNELS)
    p_base = next(iter(rows.values()))["p_conv_base"]
    assert 0 < p_base <= 1
    shares = [r["attribution_share"] for r in rows.values() if r["attribution_share"] is not None]
    if shares:
        assert abs(sum(shares) - 1.0) < 1e-9
    for r in rows.values():
        # removal can only destroy conversion paths, never create them
        assert r["p_conv_removed"] <= r["p_conv_base"] + 1e-12
        assert r["removal_effect"] is None or r["removal_effect"] >= 0

    # pure-Python propagation over the same transition counts
    counts = {
        (r["src"], r["dst"]): r["cnt"]
        for r in _markov_transition_counts(spark, SF_SMOKE).collect()
    }

    def p_conv(counts, removed=None):
        cnt = dict(counts)
        if removed is not None:
            red = {}
            for (s, d), c in cnt.items():
                d2 = "NULL" if d == removed else d
                red[(s, d2)] = red.get((s, d2), 0) + c
            cnt = red
        cnt[("CONV", "CONV")] = cnt.get(("CONV", "CONV"), 0) + 1
        cnt[("NULL", "NULL")] = cnt.get(("NULL", "NULL"), 0) + 1
        tot = {}
        for (s, d), c in cnt.items():
            tot[s] = tot.get(s, 0) + c
        v = {"START": 1.0}
        for _ in range(MARKOV_STEPS):
            nv = {}
            for (s, d), c in cnt.items():
                if s in v:
                    nv[d] = nv.get(d, 0.0) + v[s] * (c / tot[s])
            v = nv
        return v.get("CONV", 0.0)

    assert abs(p_conv(counts) - p_base) < 1e-6
    for c in MARKOV_CHANNELS:
        assert abs(p_conv(counts, removed=c) - rows[c]["p_conv_removed"]) < 1e-6


def test_churn_weekly_oracle_and_recount(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "churn_weekly", SF_SMOKE)
    from big_data_code_spark.plans.advanced import churn_weekly
    from big_data_code_spark.sources.tables import load_table

    rows = churn_weekly(spark, SF_SMOKE).collect()
    assert rows
    # pure-Python recount from (user, week) activity
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "ts").collect()
    act = {}
    for r in ev:
        week = (int(r["ts"].timestamp()) // 86400 + 3) // 7
        act.setdefault(week, set()).add(r["user_id"])
    last = max(act)
    for r in rows:
        week = (r["week_start_day"] + 3) // 7
        assert week < last
        assert r["n_active"] == len(act[week])
        churned = len(act[week] - act.get(week + 1, set()))
        assert r["n_churned"] == churned


def test_new_vs_returning_and_wow_oracles(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "new_vs_returning_daily", SF_SMOKE)
    assert_matches_oracle(spark, "wow_growth", SF_SMOKE)
    from big_data_code_spark.plans.advanced import new_vs_returning_daily
    from big_data_code_spark.sources.tables import load_table

    rows = sorted(new_vs_returning_daily(spark, SF_SMOKE).collect(),
                  key=lambda r: r["day"])
    # first day: everyone is new; totals = distinct users over time
    assert rows[0]["n_new"] == rows[0]["n_active"]
    ev = load_table(spark, SF_SMOKE, "events")
    assert sum(r["n_new"] for r in rows) == ev.select("user_id").distinct().count()
    for r in rows:
        assert r["n_new"] + r["n_returning"] == r["n_active"]


def test_ewma_daily_forecast_oracle_and_fold(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "ewma_daily_forecast", SF_SMOKE)
    from big_data_code_spark.plans.advanced import ewma_daily_forecast
    from big_data_code_spark.sources.tables import load_table

    rows = {r["event_type"]: r for r in ewma_daily_forecast(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "ts").collect()
    daily = {}
    for r in ev:
        day = int(r["ts"].timestamp()) // 86400
        key = (r["event_type"], day)
        daily[key] = daily.get(key, 0) + 1
    for et, row in rows.items():
        xs = [cnt for (t, _d), cnt in sorted(daily.items()) if t == et]
        s = None
        for x in xs:
            s = float(x) if s is None else s * 0.5 + x * 0.5
        assert row["ewma_forecast"] == s  # alpha=1/2 folds are exact
        assert row["days_observed"] == len(xs)


def test_entity_resolution_clusters_oracle_and_transitivity(spark):
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "entity_resolution_clusters", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        entity_resolution_clusters,
        fuzzy_name_match,
    )

    rows = entity_resolution_clusters(spark, SF_SMOKE).collect()
    assert rows
    canon = {r["name"]: r["canonical_name"] for r in rows}
    sizes = {}
    for r in rows:
        sizes.setdefault(r["canonical_name"], set()).add(r["name"])
        assert r["canonical_name"] <= r["name"]  # min-name labeling
    for r in rows:
        assert r["cluster_size"] == len(sizes[r["canonical_name"]])
        assert r["cluster_size"] >= 2  # only matched names cluster
    # every matched pair landed in one cluster (transitive closure)
    for p in fuzzy_name_match(spark, SF_SMOKE).collect():
        assert canon[p["name_a"]] == canon[p["name_b"]]
    # pure-Python union-find recheck
    parent = {}
    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for p in fuzzy_name_match(spark, SF_SMOKE).collect():
        ra, rb = find(p["name_a"]), find(p["name_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for n in parent:
        groups.setdefault(find(n), set()).add(n)
    want = {min(g | {root}): (g | {root}) for root, g in
            ((r, {n for n in parent if find(n) == r}) for r in set(map(find, parent)))}
    got = {c: names for c, names in sizes.items()}
    assert got == {min(v): v for v in want.values()}


def test_ks_source_drift_oracle_and_recompute(spark):
    """Oracle match + exact-rational KS recompute per source."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "ks_source_drift", SF_SMOKE)
    from big_data_code_spark.plans.advanced import ks_source_drift
    from big_data_code_spark.sources.tables import load_table

    docs = [
        (r["source"], r["n_chars"])
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("source", "n_chars")
        .collect()
    ]
    ref = min(s for s, _ in docs)
    from collections import Counter

    by_src: dict = {}
    for s, v in docs:
        by_src.setdefault(s, Counter())[v] += 1
    vals = sorted({v for _, v in docs})
    want = {}
    for s, cnt in by_src.items():
        if s == ref:
            continue
        na = sum(cnt.values())
        nr = sum(by_src[ref].values())
        ca = cb = 0
        dnum = 0
        for v in vals:
            ca += cnt.get(v, 0)
            cb += by_src[ref].get(v, 0)
            dnum = max(dnum, abs(ca * nr - cb * na))
        want[s] = (na, nr, dnum / (na * nr))
    got = {
        r["source"]: (r["n_src"], r["n_ref"], r["ks_d"])
        for r in ks_source_drift(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert ref not in got
    assert all(0.0 <= d <= 1.0 for _, _, d in got.values())


def test_benford_digit_audit_oracle_and_shares(spark):
    """Oracle match + full 5×9 grid; observed shares sum to 1 per
    priority and the expected Benford shares sum to ~1."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "benford_digit_audit", SF_SMOKE)
    from big_data_code_spark.plans.advanced import benford_digit_audit

    rows = benford_digit_audit(spark, SF_SMOKE).collect()
    prios = {r["o_orderpriority"] for r in rows}
    assert len(rows) == 9 * len(prios)
    for p in prios:
        obs = sum(r["share"] for r in rows if r["o_orderpriority"] == p)
        exp = sum(
            r["expected_share"] for r in rows if r["o_orderpriority"] == p
        )
        assert abs(obs - 1.0) < 1e-9
        assert abs(exp - 1.0) < 1e-5  # 9 terms on the 1e-6 round grid
    assert all(1 <= r["digit"] <= 9 for r in rows)


def test_item_item_cosine_oracle_and_recompute(spark):
    """Oracle match + full pure-Python recompute of the top-5
    neighbor lists from the raw lineitem baskets."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "item_item_cosine", SF_SMOKE)
    from big_data_code_spark.plans.advanced import item_item_cosine
    from big_data_code_spark.sources.tables import load_table

    import math
    from collections import Counter
    from itertools import combinations

    baskets: dict = {}
    for r in (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    ):
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    cnt: Counter = Counter()
    pair: Counter = Counter()
    for items in baskets.values():
        for i in items:
            cnt[i] += 1
        for a, b in combinations(sorted(items), 2):
            pair[(a, b)] += 1
            pair[(b, a)] += 1
    want: dict = {}
    for item in cnt:
        nb = [
            (n_ab / math.sqrt(cnt[a] * cnt[b]), -b, n_ab, b)
            for (a, b), n_ab in pair.items()
            if a == item
        ]
        nb.sort(key=lambda t: (-t[0], -t[1]))
        for rank, (cos, _, n_ab, b) in enumerate(nb[:5], 1):
            want[(item, rank)] = (b, n_ab, cos)
    got = {
        (r["item"], r["rank"]): (r["neighbor"], r["n_pair"], r["cosine"])
        for r in item_item_cosine(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_open_orders_over_time_oracle_and_conservation(spark):
    """Oracle match + conservation: every order opens once and
    closes once, so Σopened = Σclosed = |orders| and the running
    concurrency ends at exactly 0."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "open_orders_over_time", SF_SMOKE)
    from big_data_code_spark.plans.advanced import open_orders_over_time
    from big_data_code_spark.sources.tables import load_table

    rows = sorted(
        open_orders_over_time(spark, SF_SMOKE).collect(),
        key=lambda r: r["day"],
    )
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    n_shippable = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    assert sum(r["opened"] for r in rows) == n_orders
    # orders with no lineitems never close — permanent backlog
    assert sum(r["closed"] for r in rows) == n_shippable
    assert rows[-1]["open_orders"] == n_orders - n_shippable
    assert all(r["open_orders"] >= 0 for r in rows)
    # running sum really is cumulative
    run = 0
    for r in rows:
        run += r["opened"] - r["closed"]
        assert r["open_orders"] == run


def test_revenue_trend_ols_oracle_and_recompute(spark):
    """Oracle match + exact-integer OLS recompute for every
    nation."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "revenue_trend_ols", SF_SMOKE)
    from big_data_code_spark.plans.advanced import revenue_trend_ols
    from big_data_code_spark.sources.tables import load_table

    import math
    from collections import Counter

    orders = load_table(spark, SF_SMOKE, "orders").collect()
    cust = {
        r["c_custkey"]: r["c_nationkey"]
        for r in load_table(spark, SF_SMOKE, "customer").collect()
    }
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in load_table(spark, SF_SMOKE, "nation").collect()
    }
    weekly: Counter = Counter()
    for r in orders:
        day = r["o_orderdate"].timestamp() // 86400  # tests run UTC
        x = int(day + 3) // 7
        # Spark round() is HALF_UP on positive doubles
        y = int(math.floor(r["o_totalprice"] + 0.5))
        weekly[(nat[cust[r["o_custkey"]]], x)] += y
    want = {}
    by_nation: dict = {}
    for (nation, x), y in weekly.items():
        by_nation.setdefault(nation, []).append((x, y))
    for nation, pts in by_nation.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        want[nation] = (n, slope, (sy - slope * sx) / n)
    got = {
        r["nation"]: (r["n_weeks"], r["slope"], r["intercept"])
        for r in revenue_trend_ols(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_ldiversity_report_oracle_and_recompute(spark):
    """Oracle match + pure-Python l-diversity recompute."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "ldiversity_report", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        L_DIVERSE,
        ldiversity_report,
    )
    from big_data_code_spark.sources.tables import load_table

    import math

    cust = load_table(spark, SF_SMOKE, "customer").collect()

    def sens(bal):
        return max(-1, min(3, math.floor(bal / 2500)))

    def level(keyfn):
        classes: dict = {}
        for r in cust:
            classes.setdefault(keyfn(r), set()).add(sens(r["c_acctbal"]))
        ls = [len(v) for v in classes.values()]
        below = sum(1 for l in ls if l < L_DIVERSE)
        return (len(ls), min(ls), below, (len(ls) - below) / len(ls))

    want = {
        1: level(lambda r: (r["c_nationkey"], r["c_mktsegment"])),
        0: level(lambda r: r["c_mktsegment"]),
    }
    got = {
        r["level"]: (r["n_classes"], r["min_l"], r["n_below_l"], r["diverse_share"])
        for r in ldiversity_report(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_chi2_segment_priority_oracle_and_margins(spark):
    """Oracle match + margin identities: expected sums to observed
    sums per segment and per priority (independence model preserves
    margins)."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "chi2_segment_priority", SF_SMOKE)
    from big_data_code_spark.plans.advanced import chi2_segment_priority

    rows = chi2_segment_priority(spark, SF_SMOKE).collect()
    assert len({r["chi2_total"] for r in rows}) == 1
    assert rows[0]["chi2_total"] >= 0
    segs = {r["c_mktsegment"] for r in rows}
    for s in segs:
        obs = sum(r["observed"] for r in rows if r["c_mktsegment"] == s)
        exp = sum(r["expected"] for r in rows if r["c_mktsegment"] == s)
        assert abs(obs - exp) < 1e-6 * obs
    # contributions re-sum to the reported total on the same grid
    tot = sum(round(r["contrib"] * 1e6) for r in rows) / 1e6
    assert tot == rows[0]["chi2_total"]


def test_trimmed_mean_oracle_and_recompute(spark):
    """Oracle match + exact recompute; trimmed mean sits inside the
    trimmed range and the trim drops 2·floor(5% n) rows."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "trimmed_mean_order_values", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        TRIM_FRAC_PCT,
        trimmed_mean_order_values,
    )
    from big_data_code_spark.sources.tables import load_table

    import math

    by_p: dict = {}
    for r in load_table(spark, SF_SMOKE, "orders").collect():
        cents = int(math.floor(r["o_totalprice"] * 100 + 0.5))
        by_p.setdefault(r["o_orderpriority"], []).append(
            (cents, r["o_orderkey"])
        )
    got = {
        r["o_orderpriority"]: r
        for r in trimmed_mean_order_values(spark, SF_SMOKE).collect()
    }
    for p, vals in by_p.items():
        vals.sort()
        n = len(vals)
        cut = n * TRIM_FRAC_PCT // 100
        kept = [c for c, _ in vals[cut : n - cut]]
        r = got[p]
        assert r["n_orders"] == n
        assert r["n_trimmed"] == n - 2 * cut == len(kept)
        assert r["mean_value"] == sum(c for c, _ in vals) / n / 100.0
        assert r["trimmed_mean_value"] == sum(kept) / len(kept) / 100.0


def test_cross_device_sessions_oracle_and_stitch_bound(spark):
    """Oracle match + the stitch bound: canonical-person sessions
    never exceed raw sessions globally, and the stitched total
    matches an independent sessionize over mapped ids."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "cross_device_sessions", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        SESSION_GAP_US,
        cross_device_sessions,
    )
    from big_data_code_spark.plans.swa import user_id_normalization
    from big_data_code_spark.sources.tables import load_table

    rows = cross_device_sessions(spark, SF_SMOKE).collect()
    raw = sum(r["n_sessions_raw"] for r in rows)
    stitched = sum(r["n_sessions_stitched"] for r in rows)
    assert 0 < stitched <= raw
    # independent recount of the stitched total in pure Python
    mapping = {
        r["user_id"]: r["canonical_id"]
        for r in user_id_normalization(spark, SF_SMOKE).collect()
    }
    ev = sorted(
        (
            mapping.get(r["user_id"], r["user_id"]),
            int(r["ts"].timestamp() * 1_000_000),
            r["event_id"],
        )
        for r in load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    n = 0
    last: dict = {}
    for uid, us, _ in ev:
        if uid not in last or us - last[uid] > SESSION_GAP_US:
            n += 1
        last[uid] = us
    assert n == stitched


def test_revenue_pattern_match_oracle_and_recompute(spark):
    """Oracle match + pure-Python Pearson recompute over the
    kilodollar daily series; r ∈ [-1, 1] and ranks are dense."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "revenue_pattern_match", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        PATTERN_DAYS,
        PATTERN_TOPK,
        revenue_pattern_match,
    )
    from big_data_code_spark.sources.tables import load_table

    import math
    from collections import defaultdict

    cents = defaultdict(int)
    for r in load_table(spark, SF_SMOKE, "orders").collect():
        day = int(r["o_orderdate"].timestamp() // 86400)  # tests run UTC
        cents[day] += int(math.floor(r["o_totalprice"] + 0.5))
    kd = {d: int(math.floor(v / 1000 + 0.5)) for d, v in cents.items()}
    days = sorted(kd)
    wins = {}
    for d in days:
        span = [d + i for i in range(PATTERN_DAYS)]
        if all(x in kd for x in span):
            wins[d] = [kd[x] for x in span]
    qd = max(wins)
    qv = wins[qd]
    n = PATTERN_DAYS

    def pearson(a, b):
        sa, sb = sum(a), sum(b)
        saa = sum(x * x for x in a)
        sbb = sum(x * x for x in b)
        sab = sum(x * y for x, y in zip(a, b))
        da, db = n * saa - sa * sa, n * sbb - sb * sb
        if da <= 0 or db <= 0:
            return None
        return float(n * sab - sa * sb) / math.sqrt(float(da) * float(db))

    cands = [
        (d, pearson(v, qv))
        for d, v in wins.items()
        if d + PATTERN_DAYS - 1 < qd
    ]
    cands = [(d, r) for d, r in cands if r is not None]
    cands.sort(key=lambda t: (-t[1], t[0]))
    want = {d: (r, i + 1) for i, (d, r) in enumerate(cands[:PATTERN_TOPK])}
    got = {
        r["day"]: (r["r"], r["rank"])
        for r in revenue_pattern_match(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert all(-1.0 - 1e-12 <= r <= 1.0 + 1e-12 for r, _ in got.values())
    assert sorted(rk for _, rk in got.values()) == list(
        range(1, len(got) + 1)
    )


def test_itemcf_eval_oracle_and_recompute(spark):
    """Oracle match + full pure-Python recompute of hit-rate@5 from
    the raw lineitem baskets (train/test split, co-occurrence
    cosine top-5, held-out hit check)."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "itemcf_eval", SF_SMOKE)
    from big_data_code_spark.plans.advanced import ITEMCF_TEST_MOD, itemcf_eval
    from big_data_code_spark.sources.tables import load_table

    import math
    from collections import Counter

    train: dict = {}
    test: dict = {}
    for r in (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    ):
        tgt = test if r["l_orderkey"] % ITEMCF_TEST_MOD == 0 else train
        tgt.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    cnt: Counter = Counter()
    pair: Counter = Counter()
    for items in train.values():
        for i in items:
            cnt[i] += 1
        for a in items:
            for b in items:
                if a != b:
                    pair[(a, b)] += 1
    recs: dict = {}
    for item in cnt:
        nb = sorted(
            (
                (-(n / math.sqrt(cnt[a] * cnt[b])), b)
                for (a, b), n in pair.items()
                if a == item
            ),
        )[:5]
        recs[item] = {b for _, b in nb}
    n_test = sum(len(v) for v in test.values())
    n_hit = sum(
        1
        for order, items in test.items()
        for i in items
        if recs.get(i, set()) & (items - {i})
    )
    row = itemcf_eval(spark, SF_SMOKE).collect()[0]
    assert (row["n_test_pairs"], row["n_hit_pairs"]) == (n_test, n_hit)
    assert row["hit_rate"] == n_hit / n_test
    assert 0 < row["hit_rate"] < 1


def test_transition_entropy_oracle_and_recompute(spark):
    """Oracle match + grid-exact recompute from the transition
    matrix; 0 ≤ normalized_entropy ≤ 1."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "transition_entropy", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        top_event_transitions,
        transition_entropy,
    )

    import math
    from collections import defaultdict

    cells: dict = defaultdict(dict)
    for r in top_event_transitions(spark, SF_SMOKE).collect():
        cells[r["prev_type"]][r["next_type"]] = r["n_transitions"]

    def rnd(x, p):
        m = 10 ** p
        return math.floor(x * m + 0.5) / m if x >= 0 else -math.floor(
            -x * m + 0.5
        ) / m

    want = {}
    for prev, nxt in cells.items():
        ntot = sum(nxt.values())
        tot = 0
        for n in nxt.values():
            t = rnd(-(n / ntot) * math.log(n / ntot), 6)
            tot += int(math.floor(t * 1e6 + 0.5)) if t >= 0 else -int(
                math.floor(-t * 1e6 + 0.5)
            )
        h = tot / 1e6
        norm = h / rnd(math.log(len(nxt)), 6) if len(nxt) > 1 else 0.0
        want[prev] = (ntot, len(nxt), h, norm)
    got = {
        r["prev_type"]: (
            r["n_total"],
            r["n_next_types"],
            r["entropy_nats"],
            r["normalized_entropy"],
        )
        for r in transition_entropy(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert all(0.0 <= v[3] <= 1.0 + 1e-9 for v in got.values())


def test_join_skew_report_oracle_and_recompute(spark):
    """Oracle match + exact recompute of every stat for one key."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "join_skew_report", SF_SMOKE)
    from big_data_code_spark.plans.advanced import join_skew_report
    from big_data_code_spark.sources.tables import load_table

    from collections import Counter

    counts = Counter(
        r["l_orderkey"]
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey")
        .collect()
    )
    row = {
        r["join_key"]: r for r in join_skew_report(spark, SF_SMOKE).collect()
    }["lineitem.l_orderkey"]
    ns = sorted(counts.values())
    assert row["n_rows"] == sum(ns)
    assert row["n_keys"] == len(ns)
    assert row["max_per_key"] == ns[-1]
    assert row["mean_per_key"] == sum(ns) / len(ns)
    assert row["skew_factor"] == ns[-1] / (sum(ns) / len(ns))
    assert row["skew_factor"] >= 1.0


def test_touch_attribution_oracle_and_recompute(spark):
    """Oracle match + pure-Python first/last-touch recompute from
    the sessionized stream; credit mass = converting sessions on
    both axes."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "touch_attribution", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        SESSION_GAP_US,
        touch_attribution,
    )
    from big_data_code_spark.sources.tables import load_table

    from collections import Counter

    ev = sorted(
        (
            r["user_id"],
            int(r["ts"].timestamp() * 1_000_000),  # tests run UTC
            r["event_id"],
            r["event_type"],
        )
        for r in load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    sessions: dict = {}
    last: dict = {}
    sid: dict = {}
    for uid, us, eid, et in ev:
        if uid not in last or us - last[uid] > SESSION_GAP_US:
            sid[uid] = sid.get(uid, 0) + 1
        last[uid] = us
        sessions.setdefault((uid, sid[uid]), []).append((us, eid, et))
    first_c: Counter = Counter()
    last_c: Counter = Counter()
    n_conv = 0
    for evs in sessions.values():
        purchases = [e for e in evs if e[2] == "purchase"]
        if not purchases:
            continue
        n_conv += 1
        p = min(purchases)[:2]
        pre = [e for e in evs if (e[0], e[1]) < p]
        first_c[min(pre)[2] if pre else "direct"] += 1
        last_c[max(pre)[2] if pre else "direct"] += 1
    got = {
        r["channel"]: (r["n_first_touch"], r["n_last_touch"])
        for r in touch_attribution(spark, SF_SMOKE).collect()
    }
    want = {
        ch: (first_c.get(ch, 0), last_c.get(ch, 0))
        for ch in set(first_c) | set(last_c)
    }
    assert got == want
    assert sum(v[0] for v in got.values()) == n_conv
    assert sum(v[1] for v in got.values()) == n_conv


def test_bootstrap_ci_order_value_oracle_and_recompute(spark):
    """Oracle match + pure-Python Poisson-bootstrap recompute (same
    md5 uniforms, same CDF thresholds) and CI sanity: lo ≤ mean ≤
    hi, interval non-degenerate."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "bootstrap_ci_order_value", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        BOOTSTRAP_B,
        bootstrap_ci_order_value,
    )
    from big_data_code_spark.sources.tables import load_table

    import hashlib
    import math

    orders = [
        (r["o_orderkey"], int(math.floor(r["o_totalprice"] * 100 + 0.5)))
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    ]
    cdf = (
        0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
        0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    )

    def weight(key, b):
        h = hashlib.md5(f"boot:{key}:{b}".encode()).hexdigest()[:13]
        u = int(h, 16) / 4503599627370496
        for w, c in enumerate(cdf):
            if u < c:
                return w
        return 6

    means = []
    for b in range(BOOTSTRAP_B):
        sw = swc = 0
        for k, c in orders:
            w = weight(k, b)
            sw += w
            swc += w * c
        means.append(swc / sw / 100.0)
    means.sort()

    def pctl(xs, p):  # percentile ≡ quantile_cont (linear interp)
        i = (len(xs) - 1) * p
        lo, hi = int(math.floor(i)), int(math.ceil(i))
        return xs[lo] + (xs[hi] - xs[lo]) * (i - lo)

    row = bootstrap_ci_order_value(spark, SF_SMOKE).collect()[0]
    assert row["n_orders"] == len(orders)
    assert row["n_replicates"] == BOOTSTRAP_B
    assert row["mean_value"] == sum(c for _, c in orders) / len(orders) / 100.0
    assert abs(row["ci_lo"] - pctl(means, 0.025)) < 1e-9
    assert abs(row["ci_hi"] - pctl(means, 0.975)) < 1e-9
    assert row["ci_lo"] < row["mean_value"] < row["ci_hi"]
    assert row["ci_hi"] - row["ci_lo"] > 0


def test_supplier_reliability_wilson_oracle_and_recompute(spark):
    """Oracle match + pure-Python Wilson recompute; the bound never
    exceeds the raw rate, and the ranking differs from raw-rate
    order somewhere (the uncertainty penalty does real work)."""
    from tests.conftest import SF_SMOKE, assert_matches_oracle

    assert_matches_oracle(spark, "supplier_reliability_wilson", SF_SMOKE)
    from big_data_code_spark.plans.advanced import (
        LATE_SHIP_DAYS,
        supplier_reliability_wilson,
    )
    from big_data_code_spark.sources.tables import load_table

    import math
    from collections import Counter

    od = {
        r["o_orderkey"]: int(r["o_orderdate"].timestamp() // 86400)
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    }
    n: Counter = Counter()
    late: Counter = Counter()
    for r in (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_suppkey", "l_orderkey", "l_shipdate")
        .collect()
    ):
        if r["l_orderkey"] not in od:
            continue
        n[r["l_suppkey"]] += 1
        sd = int(r["l_shipdate"].timestamp() // 86400)
        if sd - od[r["l_orderkey"]] > LATE_SHIP_DAYS:
            late[r["l_suppkey"]] += 1
    z = 1.959963984540054

    def wilson(k, m):
        p = (m - k) / float(m)
        return (
            p + z * z / (2.0 * m)
            - z * math.sqrt(p * (1.0 - p) / m + z * z / (4.0 * m * m))
        ) / (1.0 + z * z / m)

    got = {
        r["l_suppkey"]: r
        for r in supplier_reliability_wilson(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(n)
    for s_, m in n.items():
        r = got[s_]
        assert (r["n_shipments"], r["n_late"]) == (m, late.get(s_, 0))
        assert abs(r["wilson_lb"] - wilson(late.get(s_, 0), m)) < 1e-12
        assert r["wilson_lb"] <= r["on_time_rate"] + 1e-12
    by_bound = sorted(got.values(), key=lambda r: (-r["wilson_lb"], r["l_suppkey"]))
    by_rate = sorted(got.values(), key=lambda r: (-r["on_time_rate"], r["l_suppkey"]))
    assert [r["l_suppkey"] for r in by_bound] == [
        r["l_suppkey"] for r in sorted(got.values(), key=lambda r: r["rank"])
    ]
    assert [r["l_suppkey"] for r in by_bound] != [
        r["l_suppkey"] for r in by_rate
    ]


def test_two_pass_ranks_matches_plain_windows(spark):
    """r8: `operators/ranking.two_pass_ranks` must be bit-identical
    to the Window formulation it replaces — global + partitioned
    row_number, group counts, and inclusive running sums — and its
    plan must (a) persist the range-partitioned frame (slice
    agreement between the count pass and the local pass: the
    correctness persist the module docstring explains) and (b) emit
    only audit-recognizable windows (partitioned OR ordered by the
    __tpr_pid slice id) plus bounded offsets-frame windows."""
    from pyspark.sql.window import Window

    from big_data_code_spark.cacheutil import release_persisted
    from big_data_code_spark.operators.ranking import PID, two_pass_ranks

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "event_type", "user_id", "value"
    )
    order = [F.desc("value"), F.col("event_id")]
    got = two_pass_ranks(
        ev,
        order,
        [
            {
                "partition": (),
                "rank": "rg",
                "n": "ng",
                "cumsum": [("user_id", "csg")],
            },
            {
                "partition": ("event_type",),
                "rank": "rp",
                "n": "np",
                "cumsum": [("user_id", "csp")],
            },
        ],
        buckets=7,  # force rows to straddle slice boundaries
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan  # the correctness persist
    for part, order_spec in __import__(
        "tests.test_tpch", fromlist=["_window_nodes"]
    )._window_nodes(plan):
        assert PID in part or PID in order_spec, (part, order_spec)

    wg = Window.orderBy(F.desc("value"), "event_id")
    wp = Window.partitionBy("event_type").orderBy(
        F.desc("value"), "event_id"
    )
    exp = ev.select(
        "event_id",
        F.row_number().over(wg).cast("long").alias("rg"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("ng"),
        F.sum("user_id")
        .over(wg.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("csg"),
        F.row_number().over(wp).cast("long").alias("rp"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .cast("long")
        .alias("np"),
        F.sum("user_id")
        .over(wp.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("csp"),
    )
    cols = ["rg", "ng", "csg", "rp", "np", "csp"]
    g = {r["event_id"]: tuple(r[c] for c in cols) for r in got.collect()}
    e = {r["event_id"]: tuple(r[c] for c in cols) for r in exp.collect()}
    assert g == e
    release_persisted()


def test_gini_and_hill_semantics(spark):
    """r8: the concentration pair — Gini matches a brute-force
    python computation exactly; Hill's alpha is positive-finite on
    the heavy-ish synthetic activity and its threshold really is
    the (k+1)-th order statistic."""
    from collections import Counter

    from big_data_code_spark.plans.advanced import (
        HILL_TOP_K,
        gini_user_concentration,
        hill_tail_index,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    counts = Counter(r["user_id"] for r in ev.select("user_id").collect())
    xs = sorted(counts.values())
    n, s = len(xs), sum(xs)
    brute = (2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * s) / (
        n * s
    )
    row = gini_user_concentration(spark, SF_SMOKE).collect()[0]
    assert row["n_users"] == n and row["n_events"] == s
    assert abs(row["gini"] - brute) < 1e-12
    assert 0.0 <= row["gini"] < 1.0

    h = hill_tail_index(spark, SF_SMOKE).collect()[0]
    desc = sorted(xs, reverse=True)
    k_eff = min(HILL_TOP_K, n - 1)
    assert h["k"] == k_eff
    assert h["x_threshold"] == desc[k_eff]  # the (k_eff+1)-th stat
    assert h["alpha_inv"] >= 0.0
    if h["alpha_inv"] > 0:
        assert h["alpha"] > 0.0


# ------------------------------------------------------ r9: CUPED + CUSUM


def test_cuped_abtest_oracle_and_moment_identity(spark):
    """Oracle match at smoke + correctness SF, plus an independent
    brute-force recompute of theta and the adjusted z from the raw
    per-user x/y — validates the moment-identity variance
    var(Y-θX) = var(Y)+θ²var(X)-2θcov against a literal Y_adj."""
    import statistics
    from collections import defaultdict

    from big_data_code_spark.plans.advanced import cuped_abtest

    assert_matches_oracle(spark, "cuped_abtest", SF_SMOKE)
    assert_matches_oracle(spark, "cuped_abtest", SF_CORRECT)

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    xs, ys = defaultdict(float), defaultdict(float)
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        day = int(r["ts"].replace(tzinfo=__import__("datetime").timezone.utc)
                  .timestamp() // 86400)
        v = round(r["value"] * 1e6)
        if day % 2 == 0:
            xs[r["user_id"]] += v
        else:
            ys[r["user_id"]] += v
    users = sorted(set(xs) | set(ys))
    x = [xs.get(u, 0.0) / 1e6 for u in users]
    y = [ys.get(u, 0.0) / 1e6 for u in users]
    n = len(users)
    mx, my = sum(x) / n, sum(y) / n
    cov = sum(a * b for a, b in zip(x, y)) / n - mx * my
    varx = sum(a * a for a in x) / n - mx * mx
    theta = cov / varx
    row = cuped_abtest(spark, SF_SMOKE).collect()[0]
    assert abs(row["theta"] - theta) < 1e-4
    # literal adjusted metric per arm vs the engine's moment chain
    adj = {u: yy - theta * (xx - mx) for u, xx, yy in zip(users, x, y)}
    arm_a = [adj[u] for u in users if u % 2 == 0]
    arm_b = [adj[u] for u in users if u % 2 == 1]
    assert row["n_a"] == len(arm_a) and row["n_b"] == len(arm_b)
    da = statistics.pvariance(arm_a)
    db = statistics.pvariance(arm_b)
    z = (statistics.mean(arm_a) - statistics.mean(arm_b)) / (
        (da / len(arm_a) + db / len(arm_b)) ** 0.5
    )
    assert abs(row["z_cuped"] - z) < 1e-3
    # at the 50-user smoke SF the pre/post correlation is noise, so
    # the pooled theta may slightly INCREASE an arm's variance —
    # only the upper bound is structural there; the real-signal
    # check is at sf0.01, where CUPED must actually pay
    assert row["var_reduction"] < 1.0
    row_c = cuped_abtest(spark, SF_CORRECT).collect()[0]
    assert 0.0 < row_c["var_reduction"] < 1.0


def test_cusum_changepoint_oracle_and_recursion_identity(spark):
    """Oracle match, plus the window identity
    S_t = C_t - min(0, min_{s<=t} C_s) recomputed as the textbook
    recursion S_t = max(0, S_{t-1} + z_t - k) per event_type."""
    from big_data_code_spark.plans.advanced import (
        CUSUM_SLACK,
        cusum_changepoint,
    )

    assert_matches_oracle(spark, "cusum_changepoint", SF_SMOKE)
    assert_matches_oracle(spark, "cusum_changepoint", SF_CORRECT)

    rows = cusum_changepoint(spark, SF_SMOKE).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert len(by_type) == 5
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r["day_id"])
        counts = [r["n_events"] for r in rs]
        nd = len(counts)
        mean = sum(counts) / nd
        var = sum(c * c for c in counts) / nd - mean * mean
        std = var**0.5
        sp = sn = 0.0
        for r, c in zip(rs, counts):
            z = (c - mean) / std
            # quantize exactly like the plan (1e-6 grid integers)
            sp = max(0.0, sp + round((z - CUSUM_SLACK) * 1e6))
            sn = max(0.0, sn - round((z + CUSUM_SLACK) * 1e6))
            assert abs(r["cusum_pos"] - sp / 1e6) < 1e-9, (et, r)
            assert abs(r["cusum_neg"] - sn / 1e6) < 1e-9, (et, r)
            assert r["cusum_pos"] >= 0.0 and r["cusum_neg"] >= 0.0


def test_srm_check_oracle_and_semantics(spark):
    """Oracle match + chi² recomputed from the distinct-user arm
    sizes; the synthetic parity split must NOT trip the alarm."""
    from big_data_code_spark.plans.advanced import srm_check

    assert_matches_oracle(spark, "srm_check", SF_SMOKE)
    assert_matches_oracle(spark, "srm_check", SF_CORRECT)

    row = srm_check(spark, SF_SMOKE).collect()[0]
    users = {
        r["user_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id")
        .collect()
    }
    n_a = sum(1 for u in users if u % 2 == 0)
    n_b = len(users) - n_a
    assert (row["n_a"], row["n_b"]) == (n_a, n_b)
    chi2 = (n_a - n_b) ** 2 / len(users)
    assert abs(row["chi2"] - chi2) < 1e-12
    assert row["srm_detected"] == (chi2 > 3.841459)


def test_ewma_backtest_mape_oracle_and_brute(spark):
    """Oracle match + a brute-force Python recompute of the prefix
    folds and MAPE/naive-MAPE for every type."""
    from collections import defaultdict

    from big_data_code_spark.plans.advanced import ewma_backtest_mape

    assert_matches_oracle(spark, "ewma_backtest_mape", SF_SMOKE)
    assert_matches_oracle(spark, "ewma_backtest_mape", SF_CORRECT)

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").collect()
    daily: dict = defaultdict(lambda: defaultdict(int))
    import datetime

    for r in ev:
        d = int(
            r["ts"].replace(tzinfo=datetime.timezone.utc).timestamp() // 86400
        )
        daily[r["event_type"]][d] += 1
    rows = {r["event_type"]: r for r in ewma_backtest_mape(spark, SF_SMOKE).collect()}
    for et, by_day in daily.items():
        xs = [float(v) for _, v in sorted(by_day.items())]
        if len(xs) < 2:
            assert et not in rows
            continue
        s_ape = s_nape = 0
        mae = 0.0
        for t in range(1, len(xs)):
            f = xs[0]
            for v in xs[1:t]:
                f = f * 0.5 + v * 0.5
            mae += abs(xs[t] - f)
            s_ape += round(abs(xs[t] - f) / xs[t] * 1e6)
            s_nape += round(abs(xs[t] - xs[t - 1]) / xs[t] * 1e6)
        n = len(xs) - 1
        r = rows[et]
        assert r["n_evals"] == n
        assert abs(r["mae"] - mae / n) < 1e-9
        assert abs(r["mape"] - s_ape / 1e6 / n) < 1e-12
        assert abs(r["naive_mape"] - s_nape / 1e6 / n) < 1e-12
        assert r["beats_naive"] == (s_ape < s_nape)


def test_survival_km_ship_lag_oracle_and_brute(spark):
    """Oracle parity at both SFs, plus a full brute-force KM
    recompute from the raw orders/lineitem rows (durations,
    censoring, risk sets, product-limit with the plan's exact
    1e-9 integer quantization) and the estimator invariants:
    S nonincreasing in [0,1], H nondecreasing, risk-set
    conservation Σ(d+c) = n_total."""
    import datetime
    import math

    from big_data_code_spark.plans.advanced import (
        KM_CUTOFF_DAY,
        survival_km_ship_lag,
    )

    assert_matches_oracle(spark, "survival_km_ship_lag", SF_SMOKE)
    assert_matches_oracle(spark, "survival_km_ship_lag", SF_CORRECT)

    rows = sorted(
        survival_km_ship_lag(spark, SF_SMOKE).collect(),
        key=lambda r: r["t_day"],
    )
    assert rows

    def day(d):
        return (
            d.replace(tzinfo=datetime.timezone.utc).timestamp() // 86400
        )

    orders = {
        r["o_orderkey"]: int(day(r["o_orderdate"]))
        for r in spark.read.parquet(f"{SF_SMOKE}/orders.parquet").collect()
    }
    ends = {}
    for r in (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg({"l_shipdate": "max"})
        .collect()
    ):
        ends[r["l_orderkey"]] = int(day(r["max(l_shipdate)"]))

    durs = []
    for ok, start in orders.items():
        if start > KM_CUTOFF_DAY:
            continue
        end = ends.get(ok)
        if end is not None and end <= KM_CUTOFF_DAY:
            durs.append((max(end - start, 0), 1))
        else:
            durs.append((KM_CUTOFF_DAY - start, 0))
    total = len(durs)
    assert sum(r["d_events"] + r["c_censored"] for r in rows) == total

    grain: dict[int, list[int]] = {}
    for t, e in durs:
        g = grain.setdefault(t, [0, 0])
        g[0] += e
        g[1] += 1 - e
    at_risk = total
    ln_acc = 0
    hz_acc = 0
    dead = False
    prev_surv = 1.0
    for r in rows:
        t = r["t_day"]
        d, c = grain[t]
        assert (r["d_events"], r["c_censored"], r["n_risk"]) == (d, c, at_risk)
        hz_acc += round(d / at_risk * 1e9)
        if d >= at_risk:
            dead = True
        else:
            ln_acc += round(math.log((at_risk - d) / at_risk) * 1e9)
        surv = 0.0 if dead else round(math.exp(ln_acc / 1e9), 6)
        assert r["surv"] == pytest.approx(surv, abs=1e-12)
        assert r["na_cumhaz"] == pytest.approx(round(hz_acc / 1e9, 6), abs=1e-12)
        assert 0.0 <= r["surv"] <= prev_surv + 1e-12
        prev_surv = r["surv"]
        at_risk -= d + c
    assert at_risk == 0


def test_events_near_pairs_capped_oracle_brute_and_uncapped_identity(spark):
    """Oracle parity at both SFs for the r10 successor-scan
    re-contract, a brute-force recompute of the capped counts from
    the raw events (sort per type by (us, eid), walk cap+1
    successors), and the coverage identity: wherever the cap does
    NOT bind, pairs-assigned-to-earlier-endpoint must equal the
    uncapped query's exact in-window pair count."""
    from big_data_code_spark.plans.advanced import (
        NEAR_PAIRS_EVENT_CAP,
        RANGE_JOIN_WINDOW_SECS,
        events_near_pairs,
        events_near_pairs_capped,
    )

    assert_matches_oracle(spark, "events_near_pairs_capped", SF_SMOKE)
    assert_matches_oracle(spark, "events_near_pairs_capped", SF_CORRECT)

    rows = {
        r["event_type"]: r
        for r in events_near_pairs_capped(spark, SF_SMOKE).collect()
    }
    from big_data_code_spark.functions.timebuckets import epoch_us
    from big_data_code_spark.sources.tables import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", "event_id", epoch_us(F.col("ts")).alias("us"))
        .collect()
    )
    w = RANGE_JOIN_WINDOW_SECS * 1_000_000
    cap = NEAR_PAIRS_EVENT_CAP
    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r["event_type"], []).append((r["us"], r["event_id"]))
    uncapped = {
        r["event_type"]: r["n_pairs"]
        for r in events_near_pairs(spark, SF_SMOKE).collect()
    }
    for et, es in by_type.items():
        es.sort()
        n_pairs = n_with = n_at = 0
        exact_pairs = 0
        for i, (us_a, _) in enumerate(es):
            hits = 0
            for j in range(i + 1, len(es)):
                if es[j][0] - us_a <= w:
                    hits += 1
                else:
                    break
            exact_pairs += hits
            n_pairs += min(hits, cap)
            n_with += 1 if hits >= 1 else 0
            n_at += 1 if hits >= cap + 1 else 0
        # a type with zero in-window successors emits no row (both
        # engines agree — the groupBy sees no hits)
        got = rows.get(et)
        got_t = (
            (
                got["n_pairs_capped"],
                got["n_events_with_partners"],
                got["n_events_at_cap"],
            )
            if got is not None
            else (0, 0, 0)
        )
        assert got_t == (n_pairs, n_with, n_at)
        # earlier-endpoint assignment covers every unordered pair
        # exactly once — when no event hits the cap the capped count
        # IS the exact pair mass (cross-plan identity vs the
        # uncapped query's all-pairs join)
        assert exact_pairs == uncapped.get(et, 0)
        if n_at == 0:
            assert n_pairs == uncapped.get(et, 0)


def test_holt_backtest_model_select_oracle_and_brute(spark):
    """Oracle parity at both SFs plus a full Python recompute of
    all three backtests (persistence / EWMA / Holt α=1/2 β=1/4)
    from the raw daily counts, with the plan's exact 1e-6 term
    quantization and tie-break rules."""
    from big_data_code_spark.plans.advanced import (
        holt_backtest_model_select,
    )

    assert_matches_oracle(spark, "holt_backtest_model_select", SF_SMOKE)
    assert_matches_oracle(spark, "holt_backtest_model_select", SF_CORRECT)

    rows = {
        r["event_type"]: r
        for r in holt_backtest_model_select(spark, SF_SMOKE).collect()
    }
    daily: dict[str, dict[int, int]] = {}
    for r in (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
        )
        .collect()
    ):
        d = daily.setdefault(r["event_type"], {})
        d[r["day"]] = d.get(r["day"], 0) + 1
    for et, dd in daily.items():
        xs = [float(dd[k]) for k in sorted(dd)]
        if len(xs) < 3:
            assert et not in rows
            continue
        sn = se = sh = 0
        for t in range(3, len(xs) + 1):
            x = xs[t - 1]
            # naive
            sn += round(abs(x - xs[t - 2]) / x * 1e6)
            # ewma alpha=1/2 over strict prefix
            e = xs[0]
            for v in xs[1 : t - 1]:
                e = e * 0.5 + v * 0.5
            se += round(abs(x - e) / x * 1e6)
            # holt: init at element 2
            l, b = xs[1], xs[1] - xs[0]
            for v in xs[2 : t - 1]:
                ln = 0.5 * v + 0.5 * (l + b)
                b = 0.25 * (ln - l) + 0.75 * b
                l = ln
            sh += round(abs(x - (l + b)) / x * 1e6)
        n = len(xs) - 2
        got = rows[et]
        assert got["n_evals"] == n
        assert got["naive_mape"] == pytest.approx(sn / 1e6 / n, abs=1e-12)
        assert got["ewma_mape"] == pytest.approx(se / 1e6 / n, abs=1e-12)
        assert got["holt_mape"] == pytest.approx(sh / 1e6 / n, abs=1e-12)
        best = (
            "naive"
            if sn <= se and sn <= sh
            else ("ewma" if se <= sh else "holt")
        )
        assert got["best_model"] == best
