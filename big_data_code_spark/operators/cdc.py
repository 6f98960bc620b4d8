"""Slowly-changing-dimension (SCD2) apply — CDC merge without Delta.

``scd2_apply(current, updates)`` emulates ``MERGE INTO`` on plain
parquet: rows whose tracked attributes changed get their current
version closed (valid_to = batch ts, is_current = false) and a new
open version appended; unchanged rows pass through untouched.

Shape: one broadcast-or-shuffle join of current⋈updates on the key
plus a union — no window needed because ``current`` holds exactly
one open version per key (the invariant the operator preserves).
At 100 TB the dimension is small relative to facts; the join
broadcasts and the rewrite is a single pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    batch_ts: int,
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    ``current`` columns: key, tracked..., valid_from, valid_to,
    is_current (open rows have valid_to null / is_current true).
    ``updates`` columns: key, tracked... (new attribute values).
    Returns the new full dimension (closed history + open rows).

    NULL semantics (explicit contract): a NULL in an update's
    tracked column means "no new value for this attribute" (the
    partial-update CDC convention), NOT "set the attribute to
    NULL" — so an attribute changing *to* NULL is never treated as
    a change. Feeds that need NULL-able attributes should encode an
    explicit sentinel. Keys present in ``updates`` but absent from
    ``current`` are inserted as brand-new open rows
    (valid_from = batch_ts).

    Duplicate-key batches: the batch is reduced to ONE row per key
    before the merge (field-wise lexicographic greatest of the
    tracked struct — deterministic), preserving the SCD2
    single-open-row invariant even when a feed replays the same key
    twice in one batch. CDC feeds with a real ordering column
    (sequence number, LSN) should pre-deduplicate on it instead —
    "greatest attributes" is a tiebreak, not a time order.
    """
    upd = (
        updates.select(
            F.col(key),
            F.struct(*[F.col(c).alias(f"_new_{c}") for c in tracked]).alias("_s"),
        )
        .groupBy(key)
        .agg(F.max("_s").alias("_s"))
        .select(key, "_s.*")
    )
    joined = current.join(F.broadcast(upd), key, "left")
    change = F.lit(False)
    for c in tracked:
        change = change | (
            ~F.col(f"_new_{c}").eqNullSafe(F.col(c)) & F.col(f"_new_{c}").isNotNull()
        )
    changed_open = F.col("is_current") & change

    # 1) history + unchanged open rows (changed open rows get closed)
    kept = joined.select(
        key,
        *tracked,
        "valid_from",
        F.when(changed_open, F.lit(batch_ts)).otherwise(F.col("valid_to")).alias(
            "valid_to"
        ),
        F.when(changed_open, F.lit(False)).otherwise(F.col("is_current")).alias(
            "is_current"
        ),
    )
    # 2) new open versions for changed keys
    fresh = (
        joined.where(changed_open)
        .select(
            key,
            *[F.col(f"_new_{c}").alias(c) for c in tracked],
            F.lit(batch_ts).alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    # 3) keys new to the dimension: insert as open rows. Anti join is
    #    on the (broadcast-small) update batch, so this costs one more
    #    broadcast pass over the dimension keys — not a new shuffle.
    inserted = (
        upd.join(current.select(key).distinct(), key, "left_anti")
        .select(
            key,
            *[F.col(f"_new_{c}").alias(c) for c in tracked],
            F.lit(batch_ts).alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return kept.unionByName(fresh).unionByName(inserted)
