"""Training-shard export sink — the artifact end of the corpus
pipeline (r8): `corpus_shuffle` assigns every document a
deterministic (shard, pos) and `sequence_packing` packs each
language stream; this sink WRITES the result so a training loader
can stream each shard in exact serving order without sorting at
read time.

Reference parity: the reference's terminal artifact is the
ElephantDB domain written by `BatchWorkflow.java:341-426` (sharded,
each shard internally ordered for its store); this is the same
shape for a training corpus — one directory per shard, rows inside
in stream order.

100 TB shape: ONE shuffle (repartition by shard id), an in-task
sort of shard-local rows (each shard is corpus/n_shards — size
shards so this fits an executor; at 100 TB you run thousands of
shards), and a partitioned parquet write. No global sort, no
driver involvement. Loaders read shard directories independently —
the layout IS the parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def export_training_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    order_cols: tuple[str, ...] = ("pos",),
) -> None:
    """Write ``df`` as ``out_dir/<shard_col>=N/*.parquet`` with the
    rows of each shard in ``order_cols`` order.

    `repartition(shard)` puts each shard's rows in exactly one task;
    `sortWithinPartitions` orders them; the partitioned write emits
    one file per (task, shard) — so every shard directory holds its
    rows in exact stream order (parquet preserves row order within a
    file, and each shard is one file here). Verified by the
    roundtrip test: read-back per shard is monotone in ``order_cols``
    with nothing lost or duplicated.
    """
    (
        df.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, *order_cols)
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .option("compression", "zstd")
        .parquet(out_dir)
    )
