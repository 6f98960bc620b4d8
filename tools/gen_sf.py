"""Generate larger scale factors by key-offset tiling of sf0.1.

The driver's testdata is read-only and its generator is not in the
repo, so scaling evidence (sf0.1 → sf1) uses TILING: N shifted
copies of every sf0.1 table with disjoint key ranges. Tile 0 is the
original data unchanged; tiles 1..N-1 offset every entity key into
its own range, so per-tile distributions — group sizes, join fan-in,
selectivities — are EXACTLY the sf0.1 ones and global volume is N×.

Two columns get per-tile transforms so similarity workloads scale
linearly instead of quadratically (10 byte-identical copies of every
document would put 10 copies in every LSH bucket → 100× candidate
pairs, which benchmarks the tiling artifact, not the engine):

- document text: a per-tile consonant substitution cipher (length-
  and structure-preserving, so shingles differ across tiles but
  text-stats shapes stay comparable);
- embeddings: rotate the vector by `tile` positions (norm-
  preserving; within-tile geometry identical to sf0.1).

Master/batch semantics of doc_id (>= 1M = incremental batch) are
preserved per tile.

Usage::

    python tools/gen_sf.py [N] [out_dir] [table ...]
    # default 10 /tmp/sf1, all tables; name tables to generate a
    # subset (sf100 probes only need events + documents — r10)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

CONSONANTS = "bcdfghjklmnpqrstvwz"
VOWELS = "aeiou"


def cipher_pair(tile: int) -> tuple[str, str]:
    """Per-tile AFFINE permutation of the 19-consonant alphabet
    (both cases): consonant j → consonant (a·j + b) mod 19 with
    a = 1 + tile//19, b = tile%19. 19 is prime, so every a in
    1..18 is a unit and the map is a bijection; distinct (a, b) ⇒
    distinct permutation, supporting up to 18·19 = 342 tiles.

    r6 fix: the original pure ROTATION (a=1) family has only 19
    members, so a 100-tile sf10 corpus put ~5.3 tiles on IDENTICAL
    text — window document frequencies multiplied ~6× and the
    substring-dedup probe measured a (6·df)² pair blow-up that was
    pure tiling artifact (194× wall at 10× data on the broken
    corpus; see SURVEY §12 for the clean-corpus numbers).
    Tiles 0-18 keep the original rotations
    (a=1), so N ≤ 19 corpora are bit-identical to earlier rounds'.
    """
    n = len(CONSONANTS)
    cons_idx, vowel_idx = tile % (n * (n - 1)), tile // (n * (n - 1))
    a, b = 1 + cons_idx // n, cons_idx % n
    lo = "".join(CONSONANTS[(a * j + b) % n] for j in range(n))
    # r10 (sf100 = 1000 tiles > the 342-member consonant family):
    # compose a second AFFINE permutation over the 5 vowels (5 is
    # prime → 4·5 = 20 members; 342·20 = 6840 tiles total).
    # vowel_idx = 0 (a=1, b=0) is the identity, so every corpus of
    # ≤ 342 tiles is bit-identical to earlier rounds'.
    m = len(VOWELS)
    va, vb = 1 + vowel_idx // m, vowel_idx % m
    assert va < m, f"tile {tile} exceeds the {n * (n - 1) * m * (m - 1)}-tile cipher family"
    vlo = "".join(VOWELS[(va * j + vb) % m] for j in range(m))
    return (
        CONSONANTS + CONSONANTS.upper() + VOWELS + VOWELS.upper(),
        lo + lo.upper() + vlo + vlo.upper(),
    )


def main() -> None:
    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    only = set(sys.argv[3:])  # empty ⇒ all tables
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # a 1000-tile UNION ALL nests past DuckDB's default parser depth
    con.execute(f"SET max_expression_depth TO {max(1000, 10 * n_tiles)}")

    def copy(table: str, select_for_tile) -> None:
        if only and table not in only:
            return
        parts = " UNION ALL ".join(select_for_tile(i) for i in range(n_tiles))
        con.execute(
            f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    src = lambda t: f"'{SRC}/{t}.parquet'"  # noqa: E731

    # dimension tables: single copy (shared across tiles, like
    # region/nation in TPC-H at any SF)
    for t in ("region", "nation"):
        if only and t not in only:
            continue
        con.execute(
            f"COPY (SELECT * FROM {src(t)}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    copy(
        "customer",
        lambda i: f"""SELECT c_custkey + {i * 1000000} AS c_custkey, c_name,
            c_nationkey, c_acctbal, c_mktsegment FROM {src('customer')}""",
    )
    copy(
        "supplier",
        lambda i: f"""SELECT s_suppkey + {i * 100000} AS s_suppkey, s_name,
            s_nationkey, s_acctbal FROM {src('supplier')}""",
    )
    copy(
        "part",
        lambda i: f"""SELECT p_partkey + {i * 1000000} AS p_partkey, p_name,
            p_brand, p_type, p_size, p_retailprice FROM {src('part')}""",
    )
    copy(
        "orders",
        lambda i: f"""SELECT o_orderkey + {i * 10000000} AS o_orderkey,
            o_custkey + {i * 1000000} AS o_custkey, o_orderstatus,
            o_totalprice, o_orderdate, o_orderpriority FROM {src('orders')}""",
    )
    copy(
        "lineitem",
        lambda i: f"""SELECT l_orderkey + {i * 10000000} AS l_orderkey,
            l_partkey + {i * 1000000} AS l_partkey,
            l_suppkey + {i * 100000} AS l_suppkey, l_linenumber, l_quantity,
            l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
            l_shipdate FROM {src('lineitem')}""",
    )
    copy(
        "events",
        lambda i: f"""SELECT CAST(event_id AS BIGINT) + {i * 10000000}
              AS event_id, ts,
            CAST(user_id AS BIGINT) + {i * 10000000} AS user_id,
            event_type, value, props
            FROM {src('events')}""",
    )

    def doc_tile(i: int) -> str:
        frm, to = cipher_pair(i)
        # doc_id >= 1M marks the incremental batch — keep the flag
        # per tile by offsetting inside each range
        new_id = (
            f"CASE WHEN doc_id >= 1000000 "
            f"THEN 1000000 + {i * 50000} + (CAST(doc_id AS BIGINT) - 1000000) "
            f"ELSE {i * 50000} + CAST(doc_id AS BIGINT) END"
        )
        return f"""SELECT {new_id} AS doc_id,
            translate(text, '{frm}', '{to}') AS text, lang, source, n_chars
            FROM {src('documents')}"""

    copy("documents", doc_tile)

    copy(
        "embeddings",
        lambda i: f"""SELECT vec_id + {i * 100000} AS vec_id,
            list_concat(embedding[{i % 64 + 1}:], embedding[:{i % 64}])
              AS embedding,
            label FROM {src('embeddings')}""",
    )


if __name__ == "__main__":
    main()
