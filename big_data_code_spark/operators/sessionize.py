"""Sessionization / visit analysis via window functions.

Parity: `AnalyzeVisits` (`BatchWorkflow.java:507-534`) — within a
(domain, user) the reference sorts pageviews by timestamp, starts a
new *visit* when the gap to the previous pageview exceeds 15
minutes, and counts a visit as a *bounce* when it contains exactly
one pageview.

Spark-first: no per-group Python buffer — a `lag` + running-sum
window assigns session ids in one shuffle (partitioned by the
session keys), and the per-session / per-key rollups are ordinary
hash aggregates. At 100 TB the single sort-based shuffle on
(domain, user) is the lower bound for this semantics; AQE handles
hot users.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VISIT_GAP_SECS = 15 * 60  # BatchWorkflow.java:508 VISIT_LENGTH_SECS


def with_session_ids(
    df: DataFrame,
    keys: Sequence[str],
    ts: str = "ts",
    gap_secs: int = VISIT_GAP_SECS,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign 0-based session ids per key group.

    A new session starts when the gap from the previous event in the
    same key group is > ``gap_secs`` (strict, like the reference).
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts))
    epoch = F.unix_timestamp(F.col(ts))
    prev = F.lag(epoch).over(w)
    is_new = F.when(prev.isNull() | ((epoch - prev) > gap_secs), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(
            Window.partitionBy(*keys).orderBy(F.col(ts)).rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1,
    )


def visit_stats(
    df: DataFrame,
    group_key: str,
    user_key: str,
    ts: str = "ts",
    gap_secs: int = VISIT_GAP_SECS,
) -> DataFrame:
    """(group_key, num_visits, num_bounces) — bouncesView parity
    (`BatchWorkflow.java:536-559`), generalized over any keys."""
    sessions = with_session_ids(df, [group_key, user_key], ts, gap_secs)
    per_session = sessions.groupBy(group_key, user_key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_session.groupBy(group_key).agg(
        F.count(F.lit(1)).alias("num_visits"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias("num_bounces"),
    )
