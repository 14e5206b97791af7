#!/usr/bin/env python3
"""Local scale-growth fixtures: replicate sf0.1 documents/embeddings k-fold.

Usage: python3 tools/gen_scale.py <k> <outDir>   (e.g. 3 localdata/sf0.3)

Copies are NOT near-duplicates of their originals: every token of copy
c>0 is prefixed with "c{c}x" so cross-copy n-gram overlap is zero and the
corpus's near-dup cluster structure scales LINEARLY with k (each copy
mirrors the original's internal pair structure). Naive replication would
make each doc a near-dup of its k-1 copies and grow candidate pairs
quadratically in k — measuring that would benchmark the fixture, not the
operator. doc_id/vec_id are offset per copy to stay unique; embeddings
get a deterministic per-copy jitter so copies aren't exact duplicates.
"""
import sys

import duckdb

k = int(sys.argv[1])
out = sys.argv[2]
src = "/root/testdata/sf0.1"

import os

os.makedirs(out, exist_ok=True)
con = duckdb.connect()

copies = " UNION ALL ".join(
    f"""
    SELECT doc_id + {c} * 1000000 AS doc_id,
           {'text' if c == 0 else
            f"'c{c}x' || replace(text, ' ', ' c{c}x')"} AS text,
           lang, source, n_chars
    FROM read_parquet('{src}/documents.parquet')"""
    for c in range(k))
con.execute(f"COPY ({copies}) TO '{out}/documents.parquet' (FORMAT PARQUET)")

vcopies = " UNION ALL ".join(
    f"""
    SELECT vec_id + {c} * 1000000 AS vec_id,
           list_transform(embedding, x -> CAST(x + {c} * 1e-3 AS FLOAT)) AS embedding,
           label
    FROM read_parquet('{src}/embeddings.parquet')"""
    for c in range(k))
con.execute(f"COPY ({vcopies}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")

for t in ("documents", "embeddings"):
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
    print(f"{out}/{t}.parquet: {n} rows")
