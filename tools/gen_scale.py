#!/usr/bin/env python3
"""Local scale-growth fixtures: replicate sf0.1 documents/embeddings k-fold.

Usage: python3 tools/gen_scale.py <k> <outDir>   (e.g. 3 localdata/sf0.3)

Copies are NOT near-duplicates of their originals — in either modality —
so the corpus's near-dup cluster structure scales LINEARLY with k (each
copy mirrors the original's internal pair structure) and the measurement
benchmarks the operator, not the fixture. Naive replication would make
each doc/vector a near-dup of its k-1 copies and grow candidate pairs
quadratically in k.

 - documents: every token of copy c>0 is prefixed with "c{c}x", so
   cross-copy n-gram overlap is zero; n_chars is recomputed from the
   rewritten text so the column stays self-consistent (any query
   aggregating n_chars measures the text it describes).
 - embeddings: copy c>0 applies a SIGNED CYCLIC PERMUTATION (rotate
   positions by 7c, flip signs by a deterministic md5 parity per (c, dim)).
   A signed permutation is orthogonal, so every intra-copy pairwise cosine
   is preserved EXACTLY (reordering and negating components is lossless in
   IEEE arithmetic — unlike the old additive jitter, which also left every
   copy a cosine near-dup of its original); cross-copy cosines collapse to
   ~N(0, 1/dims) — measured max 0.63 at x3, zero leakage at real near-dup
   thresholds (>= 0.7). At x42's deliberately low 0.45 verify threshold a
   thin tail survives (686 of 8M cross-copy pairs at x3, 0.009%) — it
   perturbs a few cluster memberships, not the candidate volume that
   drives cost.

doc_id/vec_id are offset per copy to stay unique.
"""
import os
import sys

import duckdb

k = int(sys.argv[1])
out = sys.argv[2]
src = "/root/testdata/sf0.1"

os.makedirs(out, exist_ok=True)
con = duckdb.connect()


def doc_select(c: int) -> str:
    text = ("text" if c == 0 else
            f"'c{c}x' || replace(text, ' ', ' c{c}x')")
    return f"""
    SELECT doc_id + {c} * 1000000 AS doc_id,
           {text} AS text,
           lang, source,
           CAST(length({text}) AS INT) AS n_chars
    FROM read_parquet('{src}/documents.parquet')"""


def vec_select(c: int) -> str:
    if c == 0:
        emb = "embedding"
    else:
        # out[i] = sign(c, i) * in[(i + 7c) mod 64]: orthogonal, exact in FP
        emb = f"""list_transform(generate_series(0, 63), i ->
               CAST(embedding[((i + {7 * c}) % 64) + 1] *
                    (CASE WHEN CAST('0x' || substr(md5('rot{c}:' || CAST(i AS VARCHAR)), 1, 2) AS INT) % 2 = 0
                          THEN 1.0 ELSE -1.0 END) AS FLOAT))"""
    return f"""
    SELECT vec_id + {c} * 1000000 AS vec_id,
           {emb} AS embedding,
           label
    FROM read_parquet('{src}/embeddings.parquet')"""


copies = " UNION ALL ".join(doc_select(c) for c in range(k))
con.execute(f"COPY ({copies}) TO '{out}/documents.parquet' (FORMAT PARQUET)")

vcopies = " UNION ALL ".join(vec_select(c) for c in range(k))
con.execute(f"COPY ({vcopies}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")

for t in ("documents", "embeddings"):
    n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
    print(f"{out}/{t}.parquet: {n} rows")
