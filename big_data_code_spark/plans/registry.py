"""Central registry: query name → (spark callable, oracle SQL).

The driver consumes this via ``__spark_entry__.queries()`` /
``oracle_sql()``. Every SQL-expressible query has a DuckDB oracle;
approximate / stateful ops register with ``None`` oracle (driver
falls back to a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import swa

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {
    "pageviews_over_time": swa.pageviews_over_time,
}

ORACLES: dict[str, str] = {
    "pageviews_over_time": swa.PAGEVIEWS_OVER_TIME_SQL,
}
