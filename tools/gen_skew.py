"""Plant a boilerplate preamble on a share of documents (r6 —
VERDICT r5 #8: the stop-window semantics are proved at 80 docs in
`tests/test_llm.py`; this makes the same skew testable AT BENCH
SCALE).

Takes an existing testdata dir (sf0.1 or a /tmp tiling), prepends a
fixed ~40-word boilerplate preamble (cookie banner + copyright — the
classic web-corpus duplicated chrome) to every doc_id divisible by
`share` (default 20 → 5% of the corpus shares ~35 hot stride-1
8-token windows, each with document frequency ≫ SUBSTR_STOP_DF).
Every other table is hard-linked unchanged, so any registry query
runs against the skewed dir.

What the two substring operators should do on this corpus:
- `exact_substring_dedup`: the preamble windows blow past the
  stop-df ceiling and are dropped BEFORE the pair join — wall time
  stays within ~2x of the clean corpus instead of exploding on a
  (0.05 N)^2 pair expansion landing on single join keys;
- `substring_dedup_apply`: no ceiling, catches the mass duplicate —
  every planted doc loses the preamble span (first occurrence wins),
  with cost linear in planted docs.

Usage::

    python tools/gen_skew.py [src_dir] [out_dir] [share]
    # defaults: /root/testdata/sf0.1 /tmp/sf0.1_skew 20
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "embeddings",
)

#: ~40 words / ~35 stride-1 8-token windows of pure boilerplate.
PREAMBLE = (
    "this site uses cookies to improve your browsing experience "
    "by continuing to use this site you agree to our use of cookies "
    "please review our privacy policy and our terms of service for "
    "details about how we collect and process your personal data "
    "copyright all rights reserved"
)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.1_skew"
    share = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            try:
                os.link(f"{src}/{t}.parquet", dst)
            except OSError:  # cross-device: fall back to a copy
                import shutil

                shutil.copyfile(f"{src}/{t}.parquet", dst)
    con = duckdb.connect()
    con.execute(
        f"""COPY (
          SELECT doc_id,
                 CASE WHEN doc_id % {share} = 0
                      THEN '{PREAMBLE} ' || text ELSE text END AS text,
                 lang, source,
                 CASE WHEN doc_id % {share} = 0
                      THEN n_chars + {len(PREAMBLE) + 1}
                      ELSE n_chars END AS n_chars
          FROM '{src}/documents.parquet'
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)"""
    )
    n, planted = con.execute(
        f"SELECT count(*), sum(CASE WHEN doc_id % {share} = 0 THEN 1 ELSE 0 END)"
        f" FROM '{out}/documents.parquet'"
    ).fetchone()
    print(f"documents: {n} rows, {planted} planted ({100.0 * planted / n:.1f}%)")


if __name__ == "__main__":
    main()
