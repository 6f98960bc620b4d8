"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (multi-granularity
pageviews-over-time rollup) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the full registry from
``big_data_code_spark.plans``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_code_spark.plans.registry import ORACLES, QUERIES
from big_data_code_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return QUERIES["pageviews_over_time"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, sql in ORACLES.items() if sql is not None}
