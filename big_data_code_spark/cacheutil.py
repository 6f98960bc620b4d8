"""Tracking for DataFrames persisted inside lazily-returned plans.

Operators like `operators.dedup.minhash_lsh_pairs` persist an
intermediate (the signature table) that several branches of the
returned — still lazy — plan consume. The operator cannot unpersist
it before the caller materializes the plan, so Spark's CacheManager
would otherwise hold the blocks for the session lifetime. Harness
loops that run many queries in one session (bench.py,
tools/driver_check.py) call `release_persisted()` after
materializing each query; long-lived services can do the same at
their own batch boundaries. A plan re-run after release simply
recomputes (and re-registers) its cache — correctness never depends
on the cache being present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def track_persisted(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for later release."""
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every tracked DataFrame; returns how many."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n


def evict_superseded(cache: dict, key: tuple) -> None:
    """For build-once serve-many index caches keyed
    (applicationId, (sf_dir, mtime, size)): unpersist + drop entries
    for the SAME (application, sf_dir) whose corpus fingerprint
    differs from ``key``'s — a regenerated corpus (new mtime/size)
    must not leave the old materialized frame pinned for the session
    lifetime, and a multi-SF sweep holds at most one live frame per
    sf_dir (r7 advice #3)."""
    app, (sf_dir, _, _) = key
    stale = [k for k in cache if k[0] == app and k[1][0] == sf_dir and k != key]
    for k in stale:
        try:
            # NOTE (r10 advice): the three DataFrame caches store
            # localCheckpoint-ed frames, for which unpersist() is a
            # no-op — the checkpoint RDD's blocks are freed later by
            # Python GC + the ContextCleaner once the dict entry (the
            # last reference) is dropped here. Eviction is therefore
            # prompt for the dict and eventual for the blocks; a
            # regenerated corpus never sees stale RESULTS (the key
            # changed), it only leaves the old blocks to the cleaner.
            cache.pop(k).unpersist()
        except Exception:
            pass  # session stopped — blocks already gone
