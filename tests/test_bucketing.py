"""Bucketed-table co-located join: the orders⋈lineitem shuffle
disappears when both sides are bucketed on the join key."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from big_data_code_spark.sources.bucketing import read_table, write_bucketed
    from big_data_code_spark.sources.tables import load_table

    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem",
        "o_orderkey", n_buckets=8,
    )
    try:
        bo, bl = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")
        # force SMJ so the co-location (not a broadcast) is what's tested
        joined = bo.hint("merge").join(bl, "o_orderkey").groupBy(
            "o_orderpriority"
        ).agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # no shuffle below the join: both scans are bucket-aligned
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan[:2000]

        # same query on plain (non-bucketed) tables DOES shuffle both sides
        plain = (
            load_table(spark, SF_SMOKE, "orders")
            .hint("merge")
            .join(
                load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
                    "l_orderkey", "o_orderkey"
                ),
                "o_orderkey",
            )
            .groupBy("o_orderpriority")
            .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        )
        plain.collect()
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(o_orderkey" in plain_plan

        # and the results are identical
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
