"""Multi-dimensional data layout: Z-order (Morton) clustering.

At 100 TB, file-level min/max pruning is the difference between
scanning terabytes and scanning gigabytes. Sorting the fact table
on ONE column gives perfect pruning on that column and none on any
other; interleaving the bits of two (or more) range-bucketed keys —
the classic Z-order curve — gives *good* pruning on every
participating column from a single layout. Delta/Iceberg expose
this as OPTIMIZE ZORDER BY; plain Spark + parquet gets the same
effect with a computed morton column + ``repartitionByRange`` +
``sortWithinPartitions``: each output file then covers a small
hyper-rectangle of the key space, so parquet row-group/file
statistics prune scans filtered on either dimension.

Everything here is pure column expressions — no UDFs, no shuffle
beyond the one range repartition the layout itself requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i = bit i of ``a``, bit 2i+1 = bit i of ``b``.

    Inputs must already be range-bucketed to [0, 2**bits); use
    `to_bucket` for arbitrary domains.
    """
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return z


def to_bucket(col: Column, lo: Column, hi: Column, bits: int = 16) -> Column:
    """Rank a value into [0, 2**bits) given its column min/max —
    the range-bucketing step before interleaving."""
    n = (1 << bits) - 1
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col - lo).cast("double") / span).otherwise(F.lit(0.0))
    return F.least(F.floor(frac * n).cast("long"), F.lit(n))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet Z-ordered on (col_a, col_b).

    One pass: compute global min/max of both columns (tiny agg),
    bucket + interleave into a morton key, range-partition on it
    (each task gets one contiguous Z-range → one tight file), sort
    within partitions so row groups inside a file are tight too.
    """
    stats = df.select(
        F.min(col_a).alias("a_lo"), F.max(col_a).alias("a_hi"),
        F.min(col_b).alias("b_lo"), F.max(col_b).alias("b_hi"),
    ).first()
    z = morton_interleave(
        to_bucket(F.col(col_a), F.lit(stats["a_lo"]), F.lit(stats["a_hi"]), bits),
        to_bucket(F.col(col_b), F.lit(stats["b_lo"]), F.lit(stats["b_hi"]), bits),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
