"""sf100 probe for the SCALE worst-10 (r10 — VERDICT r9 #3).

The r9 SCALE table's worst-10 ratios sit on 0.5-3.5s sf0.1 walls
where fixed overheads dominate; this probe gives each of them a
REAL two-decade row: cold+warm wall at a 100-tile corpus (~sf10)
and a 1000-tile corpus (~sf100), decade ratio = warm(sf100) /
warm(sf10) for 10x the data.

`events_near_pairs` (uncapped) is NOT walled at sf100: it is
OUTPUT-bound — pair mass grows with density^2 inside the fixed
calendar (the documented tiling artifact; real corpora grow in
span). Instead the probe records the exact in-window pair MASS at
each SF (computed from per-second counts — never materializing
pairs), which is the row count ANY engine must emit; the registered
production lever is `events_near_pairs_capped` (n*cap output),
which IS walled here.

Prereq::

    python tools/gen_sf.py 100  /tmp/sf10  events documents
    python tools/gen_sf.py 1000 /tmp/sf100 events documents

Usage::

    python tools/probe_r10_sf100.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE = (
    "events_near_pairs_capped",
    "substring_dedup_apply",
    "decontaminate_corpus",
    "chunk_lang_mix",
    "doc_repetition",
    "benchmark_contamination",
    "quality_logit_calibration",
    "gopher_repetition_rules",
    "char_entropy",
)

SFS = {"sf10": "/tmp/sf10", "sf100": "/tmp/sf100"}


def pair_mass(sf_dir: str, window_secs: int) -> int:
    """Exact same-type in-window pair count from per-second counts:
    pairs = sum_t [C(c_t,2) + c_t * sum_{t < t' <= t+w} c_{t'}] —
    calendar-bounded work, no pair materialization."""
    con = duckdb.connect()
    return con.execute(
        f"""
        WITH c AS (
          SELECT event_type t, epoch(ts)::BIGINT s, count(*)::BIGINT n
          FROM '{sf_dir}/events.parquet' GROUP BY 1, 2
        )
        SELECT SUM(a.n * (a.n - 1) / 2)
             + COALESCE(SUM(cross_n), 0)
        FROM c a LEFT JOIN LATERAL (
          SELECT SUM(b.n * a.n) AS cross_n FROM c b
          WHERE b.t = a.t AND b.s > a.s AND b.s <= a.s + {window_secs}
        ) ON true
        """
    ).fetchone()[0]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PROBE_r10_sf100.json"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from big_data_code_spark.cacheutil import release_persisted
    from big_data_code_spark.plans.advanced import RANGE_JOIN_WINDOW_SECS
    from big_data_code_spark.plans.registry import QUERIES
    from big_data_code_spark.session import tune_session

    tune_session(spark)
    result: dict = {
        "protocol": (
            "cold+warm wall per query per SF, local[32]; "
            "sf10 = 100-tile, sf100 = 1000-tile gen_sf corpora "
            "(events+documents); decade = warm(sf100)/warm(sf10) "
            "for 10x data"
        ),
        "queries": {},
    }
    for name in PROBE:
        row = {}
        for sf, sf_dir in SFS.items():
            walls = []
            for _ in range(2):
                release_persisted()
                t0 = time.time()
                QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                walls.append(round(time.time() - t0, 3))
            row[sf] = walls
            print(f"# {name} {sf}: {walls}", flush=True)
        row["decade_ratio_warm"] = round(row["sf100"][1] / row["sf10"][1], 3)
        result["queries"][name] = row
        json.dump(result, open(out_path, "w"), indent=1)
    # events_near_pairs: output-mass evidence instead of a wall
    masses = {
        sf: int(pair_mass(sf_dir, RANGE_JOIN_WINDOW_SECS))
        for sf, sf_dir in SFS.items()
    }
    result["events_near_pairs_output_mass"] = {
        **masses,
        "note": (
            "exact distinct in-window same-type pairs any engine must "
            "emit; density^2 growth inside the fixed tiled calendar — "
            "output-bound by construction, production lever is the "
            "registered events_near_pairs_capped (n*cap output)"
        ),
    }
    json.dump(result, open(out_path, "w"), indent=1)
    print(json.dumps(result["events_near_pairs_output_mass"]))
    spark.stop()


if __name__ == "__main__":
    main()
