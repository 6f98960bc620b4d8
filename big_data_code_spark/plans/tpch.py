"""Relational operator coverage on the TPC-H-ish tables.

These queries exist to prove the engine's core relational surface
(scan/filter pushdown, partial hash aggregation, broadcast +
shuffle joins, sort/limit, window functions, semi/anti joins,
rollup) with DuckDB oracles. Shapes follow the public TPC-H
specification queries, adapted to the driver's reduced schemas.

Scale notes: dimension joins (region/nation/supplier) broadcast;
fact-fact joins (orders⋈lineitem) shuffle on the join key with AQE
deciding final partitioning; every filter is expressed on base
columns so Catalyst pushes it into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: single-pass partial-aggregated rollup over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       sum(l_extendedprice) AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
       avg(l_quantity) AS avg_qty,
       avg(l_extendedprice) AS avg_price,
       avg(l_discount) AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: customer⋈orders⋈lineitem, agg, top-10 by revenue."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") > F.lit("1995-03-15"))
        .join(
            orders.where(F.col("o_orderdate") < F.lit("1995-03-15")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cust.where(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join; dims broadcast, facts shuffle once."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dims = (
        nation.join(F.broadcast(region.where(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        li.join(orders.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        ), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(dims), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg — pushdown showcase."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"))
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def top_users_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window rank: top-3 users by event count per event_type
    (deterministic tiebreak on user_id). The per-type grain is
    user-sized (grows with the corpus) over ~5 types, so the rank
    is the two-pass partition-offset rank (r8 latent-family sweep)
    — a plain partitioned window would sort n_users/5 per task."""
    from ..operators.ranking import two_pass_ranks

    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        two_pass_ranks(
            counts,
            [F.desc("n_events"), F.asc("user_id")],
            [{"partition": ("event_type",), "rank": "rank"}],
        )
        .where(F.col("rank") <= 3)
        .select("event_type", "user_id", "n_events", F.col("rank").cast("int").alias("rank"))
    )


TOP_USERS_SQL = """
WITH counts AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n_events
  FROM events
  GROUP BY 1, 2
)
SELECT event_type, user_id, n_events,
       CAST(row_number() OVER (PARTITION BY event_type
                               ORDER BY n_events DESC, user_id) AS INT) AS rank
FROM counts
QUALIFY rank <= 3
"""


def running_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window: per event_type, running sum of daily value."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.round(F.sum("value"), 4).alias("day_value"))
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.withColumn("running_value", F.round(F.sum("day_value").over(w), 4)).select(
        "event_type", F.col("day").cast("string").alias("day"), "day_value", "running_value"
    )


RUNNING_DAILY_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         round(sum(value), 4) AS day_value
  FROM events
  GROUP BY 1, 2
)
SELECT event_type, CAST(day AS VARCHAR) AS day, day_value,
       round(sum(day_value) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS UNBOUNDED PRECEDING), 4)
         AS running_value
FROM daily
"""


def customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no orders in 1995 (the unfiltered
    anti join is vacuous at small SF — every customer has *some*
    order — so the check is scoped to a year to verify real rows)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    o95 = orders.where(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    return cust.join(o95, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


CUSTOMERS_NO_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
"""


def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over nation→mktsegment order revenue."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    joined = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.rollup("n_name", "c_mktsegment")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_sales"),
             F.count(F.lit(1)).alias("n_orders"))
    )


SALES_ROLLUP_SQL = """
SELECT n_name, c_mktsegment,
       round(sum(o_totalprice), 2) AS total_sales,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, c_mktsegment)
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders in a quarter with
    at least one lineitem shipped after the order date, counted per
    priority (adapted to the reduced schema: the spec's
    commitdate<receiptdate predicate becomes shipdate>orderdate)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer,
    top 20 — fact⋈fact shuffle join + broadcast dim + agg + top-N."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate — revenue from orders
    of less than 20% of a part's average quantity. The correlated
    subquery becomes a per-part aggregate joined back (what Catalyst
    would decorrelate to anyway)."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(part_avg, F.col("l_partkey") == F.col("pk"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem l1
WHERE l_quantity < (SELECT 0.2 * avg(l_quantity)
                    FROM lineitem l2
                    WHERE l2.l_partkey = l1.l_partkey)
"""


def viewers_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators over the events stream: users who viewed but
    never purchased (EXCEPT) and users who both viewed and signed
    up (INTERSECT), labeled in one relation."""
    events = load_table(spark, sf_dir, "events")

    def users_of(etype: str) -> DataFrame:
        return events.where(F.col("event_type") == etype).select("user_id").distinct()

    except_rel = users_of("view").exceptAll(users_of("purchase")).distinct()
    intersect_rel = users_of("view").intersect(users_of("signup"))
    return (
        except_rel.select("user_id", F.lit("view_not_purchase").alias("relation"))
        .unionByName(
            intersect_rel.select("user_id", F.lit("view_and_signup").alias("relation"))
        )
    )


VIEWERS_SET_OPS_SQL = """
SELECT user_id, 'view_not_purchase' AS relation
FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
      EXCEPT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
UNION ALL
SELECT user_id, 'view_and_signup' AS relation
FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
"""


def rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: customers with above-average account
    balance — the global aggregate broadcast against the table."""
    cust = load_table(spark, sf_dir, "customer")
    avg_bal = cust.agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
    )


RICH_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
"""


def sql_interface_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text interface: the ONE query text `Q1_SQL` runs
    verbatim on BOTH engines — here through `spark.sql` over a
    registered view (Catalyst parses/optimizes it into the same
    plan shape as the DataFrame `q1_pricing_summary`), and in the
    oracle through DuckDB. Proves a SQL-speaking reference user can
    hand this engine their query text unchanged — the dialect
    subset the repo's oracles are written in is runnable on Spark
    directly.
    """
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(Q1_SQL)
