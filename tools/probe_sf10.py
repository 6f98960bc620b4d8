"""sf10 probe (r6 — VERDICT r5 #2): time the heaviest data-bound
registry queries at a 100-tile corpus (~sf10, 100x sf0.1) and print
per-query wall seconds, so the scaling table has a decade-spanning
third point (sf0.1 → sf1 → sf10) for the operators where
super-linearity would actually show.

Prereq::

    python tools/gen_sf.py 100 /tmp/sf10

Usage::

    python tools/probe_sf10.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: The 10 heaviest data-bound queries per the r5 verdict's ask.
DEFAULT_PROBE = (
    "exact_substring_dedup",
    "streaming_ingest_dedup",
    "gopher_repetition_rules",
    "dedup_semantic_final",
    "training_corpus_final",
    "benchmark_contamination",
    "unigram_logprob",
    "substring_dedup_apply",
    "dedup_corpus_final",
    "bm25_search",
    # r7: the derived-parameter re-contracts + the graph family
    # (VERDICT r6 #1/#2 asked for these decade rows explicitly)
    "semdedup_kmeans",
    "knn_graph",
    "triangle_count_knn",
    "label_propagation_knn",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    names = tuple(sys.argv[2:]) or DEFAULT_PROBE
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from big_data_code_spark.cacheutil import release_persisted
    from big_data_code_spark.plans.registry import PARITY_TWINS, QUERIES
    from big_data_code_spark.session import tune_session

    # demoted parity twins (e.g. the flat semdedup_kmeans, r9) stay
    # probe-able so their scaling numbers can keep being measured
    lookup = dict(QUERIES)
    lookup.update({k: fn for k, (fn, _) in PARITY_TWINS.items()})

    tune_session(spark)
    out = {}
    for name in names:
        release_persisted()
        t0 = time.time()
        lookup[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        out[name] = round(time.time() - t0, 3)
        print(f"# {name}: {out[name]}s", flush=True)
    import json

    print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
