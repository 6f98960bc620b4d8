"""Simulate the correctness driver locally.

Builds a PLAIN SparkSession (deliberately NOT ``session.get_spark`` —
the real driver hands ``queries()`` callables an externally-built
session with default confs, which is exactly the path that broke
round 1), runs registry queries at sf0.01, and compares each against
its DuckDB oracle the same way the driver does: sort columns by
name, compare row multisets.

Usage::

    python tools/driver_check.py            # first 50 entries
    python tools/driver_check.py --all      # every entry
    python tools/driver_check.py q1_pricing_summary bounce_rate
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

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


def plain_session() -> SparkSession:
    # mimic the driver: master + a couple of generic confs only; no
    # repo-side tuning so queries must be robust on a stock session.
    return (
        SparkSession.builder.master("local[32]")
        .appName("driver-check")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )


def main() -> None:
    from big_data_code_spark.plans.registry import ORACLES, QUERIES

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    check_all = "--all" in sys.argv
    names = args or list(QUERIES)[: None if check_all else 50]
    if args:
        names = args

    spark = plain_session()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    from big_data_code_spark.cacheutil import release_persisted

    none_safe = lambda t: tuple((v is None, str(type(v)), str(v)) for v in t)  # noqa: E731
    n_pass = n_fail = n_noracle = 0
    for name in names:
        release_persisted()  # drop plan-internal caches between queries
        t0 = time.perf_counter()
        try:
            sdf = QUERIES[name](spark, SF_DIR)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = sdf.columns
            sql = ORACLES.get(name)
            if sql is None:
                n_noracle += 1
                print(f"NO-ORACLE {name}: rows={len(spark_rows)} ({time.perf_counter()-t0:.1f}s)")
                continue
            res = con.sql(sql)
            duck_cols = res.columns
            duck_rows = [tuple(r) for r in res.fetchall()]
            ok_cols = sorted(spark_cols) == sorted(duck_cols)
            sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
            didx = [duck_cols.index(c) for c in sorted(duck_cols)]
            s = sorted((tuple(row[i] for i in sidx) for row in spark_rows), key=none_safe)
            d = sorted((tuple(row[i] for i in didx) for row in duck_rows), key=none_safe)
            if ok_cols and s == d:
                n_pass += 1
                print(f"PASS      {name}: rows={len(s)} ({time.perf_counter()-t0:.1f}s)")
            else:
                n_fail += 1
                diff = None
                if ok_cols:
                    diff = next(((a, b) for a, b in zip(s, d) if a != b), ("len", (len(s), len(d))))
                print(f"FAIL      {name}: cols_ok={ok_cols} rows={len(s)}/{len(d)} diff={diff}")
        except Exception:
            n_fail += 1
            print(f"ERROR     {name}:")
            traceback.print_exc()
    print(f"\n{n_pass} pass / {n_fail} fail / {n_noracle} no-oracle of {len(names)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
