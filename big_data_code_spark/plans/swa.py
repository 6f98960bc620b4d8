"""SuperWebAnalytics batch-layer views over the driver test tables.

The ``events`` table plays the pageview stream: ``event_type`` is
the page/"url" dimension, ``user_id`` the PersonID, ``ts`` the
pedigree timestamp. Each query here mirrors a view built by the
reference batch layer (`BatchWorkflow.java`), with the DuckDB
oracle SQL alongside.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rollup import multi_granularity_rollup
from ..sources.tables import load_table


def pageviews_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pageview counts per page at h/d/w/m granularities.

    Parity: `pageviewBatchView` (`BatchWorkflow.java:284-302`).
    """
    events = load_table(spark, sf_dir, "events")
    return multi_granularity_rollup(
        events,
        key="event_type",
        ts="ts",
        agg=F.sum("cnt"),
        key_name="event_type",
        value_name="total_views",
    )


PAGEVIEWS_OVER_TIME_SQL = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
         count(*) AS cnt
  FROM events
  GROUP BY 1, 2
),
fanned AS (
  SELECT event_type,
         g.granularity,
         CASE g.granularity
           WHEN 'h' THEN hour_bucket
           WHEN 'd' THEN hour_bucket // 24
           WHEN 'w' THEN (hour_bucket // 24) // 7
           ELSE (hour_bucket // 24) // 28
         END AS bucket,
         cnt
  FROM hourly
  CROSS JOIN (VALUES ('h'), ('d'), ('w'), ('m')) AS g(granularity)
)
SELECT event_type, granularity, bucket,
       CAST(sum(cnt) AS BIGINT) AS total_views
FROM fanned
GROUP BY 1, 2, 3
"""
