"""Deduplication operators for large document corpora.

Four escalating strategies, all declarative DataFrame plans:

- exact: one hash-aggregate on ``md5(text)`` — a single shuffle on
  the 16-byte digest, never on the document body.
- n-gram Jaccard: shingle explode → self-join on a 64-bit shingle
  hash → intersection counts. The join key is ``xxhash64`` of the
  shingle so the shuffle moves 8-byte ints, not strings.
- MinHash + LSH: fixed-width signatures (md5-seeded, so the DuckDB
  oracle can reproduce them bit-for-bit) + banded bucket join. This
  is the 100 TB path: candidate generation touches only
  ``n_bands`` short keys per doc, never the O(n²) pair space.
- SimHash: 64-bit weighted fingerprint per document; near-dup ⇔
  small Hamming distance. Computed fully JVM-side with
  ``aggregate``/``zip_with`` over the token array.

Scale notes: every self-join here is preceded by an explode whose
output is immediately reduced to (id, key) pairs — column pruning
keeps document bodies out of the shuffle. LSH band keys are md5
digests (fixed 32 bytes); AQE handles hot buckets (stop-shingle
skew) at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import seeded_md5, tokenize, word_shingles

N_MINHASHES = 16
LSH_BANDS = 4
LSH_ROWS = N_MINHASHES // LSH_BANDS


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group identical texts by content hash; keep the smallest id.

    Returns (content_hash, keeper_doc_id, n_copies).
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _shingle_table(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle_hash) pairs — shingles hashed to int64 immediately
    so all downstream shuffles move 8-byte keys."""
    sh = word_shingles(tokenize(F.col(text_col)), n)
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .select("id", F.xxhash64("shingle").alias("sh"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """All-pairs n-gram Jaccard similarity ≥ threshold.

    |A∩B| via self-join on shingle hash, |A∪B| = |A|+|B|−|A∩B|.
    Returns (doc_id_a, doc_id_b, jaccard) with doc_id_a < doc_id_b.
    """
    ex = _shingle_table(docs, id_col, text_col, n)
    sizes = ex.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_id_a"), F.col("b.id").alias("doc_id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("id").alias("doc_id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("doc_id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select("doc_id_a", "doc_id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = N_MINHASHES,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc minhash signature: sig[j] = min over shingles of
    ``md5("j:" || shingle)``. md5 hex strings order identically in
    any engine, which is what makes the DuckDB oracle exact.

    Returns (id, sig: array<string>); docs with no shingles dropped.
    """
    sh = word_shingles(tokenize(F.col(text_col)), shingle_n)
    with_sh = docs.select(F.col(id_col).alias("id"), sh.alias("shingles")).where(
        F.size("shingles") > 0
    )
    def min_hash(j: int) -> Column:
        # NB: a two-arg lambda would be treated by F.transform as
        # (element, index) — bind the seed via closure instead.
        return F.array_min(F.transform(F.col("shingles"), lambda s: seeded_md5(j, s)))

    sig = F.array(*[min_hash(j) for j in range(n_hashes)])
    return with_sh.select("id", sig.alias("sig"))


def _band_keys(sig: Column, n_bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> Column:
    """One md5 bucket key per band, with the band index embedded so a
    single equality join covers (band, key)."""
    keys = [
        F.concat(
            F.lit(f"{b}:"),
            F.md5(
                F.concat_ws(
                    "|", *[F.element_at(sig, b * rows + r + 1) for r in range(rows)]
                )
            ),
        )
        for b in range(n_bands)
    ]
    return F.array(*keys)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate pairs from banded LSH, filtered by estimated
    Jaccard (fraction of equal signature components).

    Returns (doc_id_a, doc_id_b, est_jaccard), doc_id_a < doc_id_b.
    """
    sigs = minhash_signatures(docs, id_col, text_col)
    bands = sigs.select("id", F.explode(_band_keys(F.col("sig"))).alias("bk"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.bk") == F.col("b.bk")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("doc_id_a"), F.col("b.id").alias("doc_id_b"))
        .distinct()
    )
    sa = sigs.select(F.col("id").alias("doc_id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("doc_id_b"), F.col("sig").alias("sig_b"))
    n_eq = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = n_eq / F.lit(float(N_MINHASHES))
    return (
        cand.join(sa, "doc_id_a")
        .join(sb, "doc_id_b")
        .select("doc_id_a", "doc_id_b", est.alias("est_jaccard"))
        .where(F.col("est_jaccard") >= threshold)
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash fingerprint, entirely JVM-side.

    For each token (weight = occurrence count is implicit: duplicate
    tokens contribute once per occurrence), add +1/−1 per bit of
    ``xxhash64(token)``; fingerprint bit i = 1 iff the sum > 0.

    Returns (id, fingerprint: bigint). Near-dup docs land within a
    few bits of Hamming distance (`hamming64`).
    """
    def mask(i: int) -> int:
        # bit 63 as a *signed* 64-bit literal (1<<63 overflows long)
        return (1 << i) if i < 63 else -(1 << 63)

    toks = tokenize(F.col(text_col))
    zero64 = F.array_repeat(F.lit(0).cast("long"), 64)

    def bit_votes(t: Column) -> Column:
        h = F.xxhash64(t)
        return F.array(
            *[
                F.when(h.bitwiseAND(F.lit(mask(i))) != 0, F.lit(1).cast("long"))
                .otherwise(F.lit(-1).cast("long"))
                for i in range(64)
            ]
        )

    sums = F.aggregate(
        toks, zero64, lambda acc, t: F.zip_with(acc, bit_votes(t), lambda a, v: a + v)
    )
    with_sums = docs.select(F.col(id_col).alias("id"), sums.alias("sums"))
    fp_terms = F.array(
        *[
            F.when(F.element_at(F.col("sums"), i + 1) > 0, F.lit(mask(i)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            for i in range(64)
        ]
    )
    fingerprint = F.aggregate(
        fp_terms, F.lit(0).cast("long"), lambda acc, v: acc.bitwiseOR(v)
    )
    return with_sums.select("id", fingerprint.alias("fingerprint"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))
