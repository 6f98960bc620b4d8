"""Bucketed table layout — co-located joins without a shuffle.

At 100 TB the orders⋈lineitem join is the dominant shuffle. Writing
both fact tables bucketed (hash-partitioned into files) by the join
key lets Spark run a sort-merge join with NO exchange on either
side — the bucketing metadata proves co-location at plan time.
`tests/test_bucketing.py` asserts the Exchange-free plan.

This is the Spark-native equivalent of the reference's pail
vertical partitioning taken one step further: partition layout as a
*contract* the optimizer can exploit, not just a pruning hint.
Bucketed tables require the session catalog (``saveAsTable``), so
writers take a table name, not a path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet
    table. Sorting within buckets lets sort-merge joins skip their
    sort too."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
