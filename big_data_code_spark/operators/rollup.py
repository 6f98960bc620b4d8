"""Multi-granularity time rollup.

Parity: `pageviewBatchView` (`BatchWorkflow.java:284-302`) — the
reference aggregates to hourly counts first, then re-aggregates the
hourly result at h/d/w/m granularities. We keep that two-level
shape on purpose: at 100 TB the only shuffle over the full fact
table is the finest-granularity hash aggregate (with map-side
partial agg); the granularity fan-out (×4 via explode) runs over
the already-tiny hourly rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.timebuckets import emit_granularities, hour_bucket


def hourly_counts(
    df: DataFrame,
    key: str | Column,
    ts: str | Column,
    key_name: str = "key",
) -> DataFrame:
    """Count rows per (key, hour_bucket) — the finest-granularity
    partial the batch view is maintained at. The ONLY full-fact-table
    shuffle in the rollup family happens here (hash agg with map-side
    combine)."""
    key_col = F.col(key) if isinstance(key, str) else key
    ts_col = F.col(ts) if isinstance(ts, str) else ts
    return (
        df.select(key_col.alias(key_name), hour_bucket(ts_col).alias("hour_bucket"))
        .groupBy(key_name, "hour_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_hourly(base: DataFrame, delta: DataFrame, key_name: str = "key") -> DataFrame:
    """Merge a new batch's hourly partials into an existing hourly
    view by summing per (key, hour) — incremental view maintenance:
    count is algebraic, so ``merge(hourly(A), hourly(B)) ≡
    hourly(A ∪ B)`` and the merge shuffle is sized by the hourly
    view, not the fact table."""
    return (
        base.unionByName(delta)
        .groupBy(key_name, "hour_bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def rollup_from_hourly(
    hourly: DataFrame,
    agg: Column,
    key_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """Re-aggregate an hourly partial table at h/d/w/m granularities
    (×4 explode over the already-tiny hourly rollup)."""
    return (
        hourly.select(
            key_name,
            F.explode(emit_granularities(F.col("hour_bucket"))).alias("gb"),
            "cnt",
        )
        .select(key_name, F.col("gb.granularity").alias("granularity"), F.col("gb.bucket").alias("bucket"), "cnt")
        .groupBy(key_name, "granularity", "bucket")
        .agg(agg.alias(value_name))
    )


def multi_granularity_rollup(
    df: DataFrame,
    key: str | Column,
    ts: str | Column,
    agg: Column,
    key_name: str = "key",
    value_name: str = "value",
) -> DataFrame:
    """Aggregate ``agg`` per (key, granularity, bucket) at h/d/w/m.

    ``agg`` must be an algebraic aggregate over the hourly partials
    (e.g. ``F.sum("cnt")`` after we computed hourly ``cnt``) — the
    hourly level always uses count(*); callers needing other hourly
    measures should pre-aggregate themselves.
    """
    return rollup_from_hourly(
        hourly_counts(df, key, ts, key_name), agg, key_name, value_name
    )
