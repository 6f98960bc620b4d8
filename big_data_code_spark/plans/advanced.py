"""Advanced / semi-structured capabilities: JSON extraction, as-of
join, exact percentiles, pivot — each with a DuckDB oracle.

The events stream links to orders via ``user = o_custkey % 150``
(the test tables carry no explicit FK between them); the mapping is
declared identically in the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.tables import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def props_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull ``$.k`` out of the JSON
    props column JVM-side, then aggregate per event_type — the
    scan reads only (event_type, props)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.count(F.when(F.col("k") > 50, 1)).alias("k_over_50"),
        )
    )


PROPS_JSON_EXTRACT_SQL = """
SELECT event_type,
       CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS k_sum,
       CAST(count(CASE WHEN json_extract(props, '$.k')::BIGINT > 50
                       THEN 1 END) AS BIGINT) AS k_over_50
FROM events
GROUP BY 1
"""


def asof_last_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each order picks up the last event value of its
    user at/before the order date (`operators/asof.py`; oracle =
    DuckDB's native ASOF JOIN)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 150).alias("user_id"),
        "o_orderdate",
    )
    # unique per (user, ts): max value among same-timestamp events
    events = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    out = asof_join(
        orders, events, on="user_id", left_ts="o_orderdate", right_ts="ts",
        value_cols=["value"],
    )
    return out.select(
        "o_orderkey",
        "user_id",
        F.unix_micros("asof_ts").alias("asof_ts_us"),
        F.round("asof_value", 4).alias("last_event_value"),
    )


ASOF_LAST_EVENT_VALUE_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey % 150 AS user_id, o_orderdate
  FROM orders
),
e AS (
  SELECT user_id, ts, max(value) AS value
  FROM events
  GROUP BY 1, 2
)
SELECT o.o_orderkey, o.user_id,
       epoch_us(e.ts) AS asof_ts_us,
       round(e.value, 4) AS last_event_value
FROM o ASOF LEFT JOIN e
  ON o.user_id = e.user_id AND e.ts <= o.o_orderdate
"""


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) of event value per
    type — Spark ``percentile`` ≡ SQL ``quantile_cont``."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
        F.round(F.min("value"), 4).alias("v_min"),
        F.round(F.max("value"), 4).alias("v_max"),
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(min(value), 4) AS v_min,
       round(max(value), 4) AS v_max
FROM events
GROUP BY 1
"""


def user_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts, one column per event type
    (explicit value list → no extra distinct pass, deterministic
    schema)."""
    events = load_table(spark, sf_dir, "events")
    out = (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in EVENT_TYPES],
    )


USER_EVENT_PIVOT_SQL = """
SELECT user_id,
       CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
       CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
       CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
       CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
       CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view
FROM events
GROUP BY 1
"""


def hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-spine resampling: per event_type, one row for EVERY hour
    between the type's first and last event, zero-filled where no
    events landed — the gap-filling join every time-series rollup
    needs before charting/windowing.

    Spine = sequence(min_hour, max_hour) exploded per key (tiny:
    keys × hours), left-joined to the hourly aggregate. No shuffle
    touches raw facts beyond the one hourly rollup.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hour_bucket"),
    ).agg(F.count(F.lit(1)).alias("n_views"))
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("hour_bucket").alias("lo"), F.max("hour_bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi")).alias("hour_bucket"),
        )
    )
    return spine.join(hourly, ["event_type", "hour_bucket"], "left").select(
        "event_type",
        "hour_bucket",
        F.coalesce("n_views", F.lit(0)).cast("long").alias("n_views"),
    )


HOURLY_GAP_FILL_SQL = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
         CAST(count(*) AS BIGINT) AS n_views
  FROM events
  GROUP BY 1, 2
),
spine AS (
  SELECT event_type, unnest(generate_series(min(hour_bucket), max(hour_bucket)))
           AS hour_bucket
  FROM hourly
  GROUP BY event_type
)
SELECT s.event_type, s.hour_bucket,
       COALESCE(h.n_views, 0) AS n_views
FROM spine s
LEFT JOIN hourly h
  ON s.event_type = h.event_type AND s.hour_bucket = h.hour_bucket
"""
