"""Approximate-nearest-neighbor search over embedding columns.

- `cosine_topk`: brute-force baseline — broadcast the (small) query
  set against the full corpus, cosine via ``zip_with`` +
  ``aggregate`` (sequential double accumulation, which the DuckDB
  oracle reproduces exactly), window top-k. One broadcast join + one
  shuffle on query id: the right shape for "k queries vs 100 TB of
  vectors".
- `lsh_ann`: the scale path — random-hyperplane (SimHash-for-
  vectors) signatures, banded bucket join to generate candidates,
  exact cosine only within buckets. Hyperplanes are derived
  deterministically from md5 so results are reproducible run-to-run.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double dot product (oracle-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    da, db = _as_double(a), _as_double(b)
    return dot(da, db) / (norm(da) * norm(db))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Returns (q_id, rank, vec_id, sim); ties broken by vec_id asc so
    the output is fully deterministic.
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    )
    sim = cosine(F.col(vec_col), F.col("q_vec")).alias("sim")
    scored = corpus.select(id_col, vec_col).crossJoin(q).select("q_id", id_col, sim)
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", id_col, "sim")
    )


def hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 — reproducible without
    any RNG state, same idea as the md5-seeded minhash family."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"plane:{j}:{i}".encode()).digest()[0]
            row.append(1.0 if h % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: bit j = 1 iff vec · plane_j > 0."""
    dv = _as_double(vec)
    bits = [
        F.when(
            dot(dv, F.array(*[F.lit(w) for w in plane])) > 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    n_bands: int = 4,
) -> DataFrame:
    """Bucketed ANN: exact cosine only among candidates sharing at
    least one LSH band with the query. Recall is tested against
    `cosine_topk` (`tests/test_llm.py`).

    Returns (q_id, rank, vec_id, sim) — rank over retrieved
    candidates only.
    """
    planes = hyperplanes(dim, n_planes)
    rows = n_planes // n_bands
    sig = lsh_signature(F.col(vec_col), planes)

    def banded(df: DataFrame, id_alias: str) -> DataFrame:
        bands = F.array(
            *[
                F.concat(F.lit(f"{b}:"), F.substring(F.col("sig"), b * rows + 1, rows))
                for b in range(n_bands)
            ]
        )
        return (
            df.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias(f"{id_alias}_vec"), sig.alias("sig"))
            .select(id_alias, f"{id_alias}_vec", F.explode(bands).alias("bk"))
        )

    cand = (
        banded(corpus, "c_id")
        .join(F.broadcast(banded(queries, "q_id")), "bk")
        .select("q_id", "q_id_vec", "c_id", "c_id_vec")
        .distinct()
    )
    scored = cand.select(
        "q_id",
        F.col("c_id").alias(id_col),
        cosine(F.col("c_id_vec"), F.col("q_id_vec")).alias("sim"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "rank", id_col, "sim")
    )


def cosine_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All vector pairs with cosine ≥ threshold (embedding near-dup
    detection). Brute-force all-pairs — correct at any SF and the
    oracle-checkable baseline; at cluster scale the same predicate
    runs inside `lsh_ann_topk`'s band buckets instead (candidates
    only), which `tests/test_llm.py` shows recovers the true
    neighbors.

    Returns (vec_id_a, vec_id_b, cos) with vec_id_a < vec_id_b.

    Norms are computed ONCE per vector before the pair join (a
    scalar column, so the O(n²) stage does one dot product + one
    divide per pair instead of three dots). The formula stays
    ``dot/(na*nb)`` — bit-identical to the oracle's expression since
    the hoisted norm has the same double value it would compute
    inline.
    """
    dv = _as_double(F.col(vec_col))
    with_norm = vectors.select(
        F.col(id_col).alias("id"), dv.alias("v"), norm(dv).alias("nrm")
    )
    a = with_norm.select(
        F.col("id").alias("vec_id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    b = with_norm.select(
        F.col("id").alias("vec_id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    pairs = a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return pairs.select("vec_id_a", "vec_id_b", cos.alias("cos")).where(
        F.col("cos") >= threshold
    )
