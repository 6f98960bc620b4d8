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


def _epoch_ntz() -> Column:
    # built lazily — a Column literal needs an active SparkContext
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def epoch_us(ts: Column | str) -> Column:
    """Epoch microseconds from a timestamp column, timezone-free.

    The driver tables store timestamps as parquet ``timestamp[us]``
    (no tz), which Spark reads as TIMESTAMP_NTZ — ``unix_micros``
    rejects that type, and casting NTZ→LTZ would drag the session
    time zone into the result. Wall-clock difference from the NTZ
    epoch matches DuckDB's ``epoch_us`` bit-for-bit under any
    session tz.
    """
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_diff("MICROSECOND", _epoch_ntz(), ts.cast("timestamp_ntz"))


def us_to_ts(us: Column) -> Column:
    """Inverse of `epoch_us`: epoch microseconds → TIMESTAMP_NTZ."""
    return F.timestamp_add("MICROSECOND", us.cast("bigint"), _epoch_ntz())


def ntz_to_ltz(ts: Column | str) -> Column:
    """TIMESTAMP_NTZ → TIMESTAMP (LTZ) at the same UTC instant,
    independent of the session time zone. Needed at streaming
    ingress only: ``withWatermark`` rejects NTZ event time, so
    streams carry LTZ internally (every epoch function on LTZ —
    ``unix_micros``, ``unix_timestamp``, ``window`` alignment — is
    epoch-anchored and therefore tz-free). A plain NTZ→LTZ cast or
    ``to_utc_timestamp`` would shift by the session tz offset.
    """
    return F.timestamp_micros(epoch_us(ts))


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
