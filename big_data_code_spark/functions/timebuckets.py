"""Time-bucket expressions.

Mirrors the reference's bucket semantics exactly
(`BatchWorkflow.java:235-275` ToHourBucket / EmitGranularities):
hour = epoch_secs / 3600; day = hour / 24; week = day / 7;
month = day / 28 (a 4-week "month" — intentional parity quirk).

All pure Column expressions → stay inside whole-stage codegen.
Sessions pin timeZone=UTC so ``unix_timestamp`` is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HOUR_SECS = 3600

GRANULARITIES = ("h", "d", "w", "m")


def hour_bucket(ts: Column) -> Column:
    """Hour bucket from a timestamp column (epoch seconds // 3600)."""
    return (F.unix_timestamp(ts) / F.lit(HOUR_SECS)).cast("bigint")


def bucket_for(granularity: str, hour: Column) -> Column:
    """Coarsen an hour bucket to the given granularity."""
    day = (hour / 24).cast("bigint")
    if granularity == "h":
        return hour
    if granularity == "d":
        return day
    if granularity == "w":
        return (day / 7).cast("bigint")
    if granularity == "m":
        return (day / 28).cast("bigint")
    raise ValueError(f"unknown granularity {granularity!r}")


def emit_granularities(hour: Column) -> Column:
    """Array of (granularity, bucket) structs for one hour bucket —
    explode to fan a row out to h/d/w/m, like EmitGranularities."""
    return F.array(
        *[
            F.struct(
                F.lit(g).alias("granularity"),
                bucket_for(g, hour).alias("bucket"),
            )
            for g in GRANULARITIES
        ]
    )
