"""Loaders for the driver-generated parquet tables.

Plain ``spark.read.parquet`` so Catalyst keeps full pushdown /
pruning freedom; no caching here — callers decide lifetime.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at any realistic SF
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Timestamps in the driver tables are parquet timestamp[us]
    # with no tz (isAdjustedToUTC=false) → Spark reads TIMESTAMP_NTZ,
    # which is the canonical timestamp type of this engine: every
    # bucket / epoch computation is pure wall-clock arithmetic, so
    # results never depend on spark.sql.session.timeZone (DuckDB's
    # TIMESTAMP has identical semantics). Older data generations
    # stored TIMESTAMP(NANOS), which Spark only reads under the
    # legacy flag; set it best-effort so both layouts load on any
    # externally-built session (the correctness driver hands us one).
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # legacy NANOS layout: ts arrives as bigint nanos — truncate
        # to µs with integer division (ns epochs overflow a double's
        # 53-bit mantissa; DuckDB truncates ns→µs the same way) and
        # rebuild the NTZ timestamp tz-free.
        from pyspark.sql import functions as F

        from ..functions.timebuckets import us_to_ts

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", us_to_ts(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
