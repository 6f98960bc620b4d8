"""Per-query optimization probe (r10).

For each named registry query (or --top N slowest by the committed
BENCH_LEDGER): build the frame exactly as bench.py does, capture
``explain('formatted')`` to a file, then time ``reps`` noop-sink
passes and report per-pass wall plus the Spark job/stage counts the
pass generated (statusTracker deltas) — the cheap local stand-ins
for the UI's job/stage view, since the UI is disabled in bench runs.

Usage::

    python tools/profile_query.py q1_pricing_summary dedup_keep_best
    python tools/profile_query.py --top 30
    python tools/profile_query.py --top 30 --plandir plans/r10 --suffix _before
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_code_spark.cacheutil import release_persisted
from big_data_code_spark.plans.registry import QUERIES
from big_data_code_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    plandir = None
    suffix = "_before"
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "2"))
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--top":
            i += 1
            n = int(args[i])
            ledger = json.load(
                open(os.path.join(os.path.dirname(__file__), "..", "BENCH_LEDGER.json"))
            )["best_sec"]
            ranked = sorted(ledger.items(), key=lambda kv: -kv[1])
            names.extend(k for k, _ in ranked[:n] if k in QUERIES)
        elif a == "--plandir":
            i += 1
            plandir = args[i]
        elif a == "--suffix":
            i += 1
            suffix = args[i]
        else:
            names.append(a)
        i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    st = spark.sparkContext.statusTracker()

    # warm like bench.py
    QUERIES["q6_forecast_revenue"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        df = QUERIES[name](spark, sf_dir)
        if plandir:
            os.makedirs(plandir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plandir, f"{name}{suffix}.txt"), "w") as f:
                f.write(plan)
        release_persisted()
        # bench.py times CONSTRUCTION + noop together (eager
        # checkpoints inside builders are part of the measured cost)
        # — replicate that here.
        passes = []
        njobs = 0
        for p in range(reps):
            group = f"prof-{name}-{p}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            passes.append(round(time.perf_counter() - t0, 3))
            njobs = len(st.getJobIdsForGroup(group) or [])
            release_persisted()
        results[name] = {"passes": passes, "jobs_last_pass": njobs}
        print(f"{name}: {passes} jobs={njobs}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
