#!/usr/bin/env python3
"""Deterministic sf1 fixture derivation (10x the sf0.1 gate scale) for
the scale-sensitive dedup/similarity/text families.

The driver generates /root/testdata/sf{0.001,0.01,0.1}; there is no
sf1 and testdata is read-only, so this derives one from sf0.1 into a
repo-local directory. Replication is DETERMINISTIC (no RNG) and
structure-preserving:

- documents: 10 replicas; replica k shifts doc_id by k*N and suffixes
  every token with "_k" (k>0), so each replica is shingle-disjoint
  from every other — the near-dup pair graph of the corpus is exactly
  10 disjoint copies of the sf0.1 graph (pair volume grows linearly
  with the corpus, the realistic scale shape), while the doc COUNT
  driving band-capacity sizing (simBandBits) grows 10x. n_chars is
  recomputed from the rewritten text.
- embeddings: 10 replicas; replica k shifts vec_id by k*M and adds a
  deterministic per-(row,dim) float jitter (k>0), so replicas occupy
  the same region of the space (IVF cell balance is stressed at 10x
  occupancy) without being exact cosine twins of their source. The
  fixed ANN ground-truth ids (vec_id < 10) and the quantizer sample
  (vec_id < 8) sit in replica 0, unchanged.
- all other tables are copied verbatim so check_oracle.py's view
  registration and Tables.load keep working.

Oracle parity is unaffected by HOW values are generated: Spark and
DuckDB both read the same parquet bytes this script writes.

Usage: python3 scripts/gen_sf1.py [src_dir] [dst_dir]
"""
import shutil
import sys
from pathlib import Path

import duckdb

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
DST = Path(sys.argv[2] if len(sys.argv) > 2 else "target/sf1")
REPLICAS = 10

COPY_TABLES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events"]


def main():
    DST.mkdir(parents=True, exist_ok=True)
    for t in COPY_TABLES:
        shutil.copyfile(SRC / f"{t}.parquet", DST / f"{t}.parquet")

    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
    n_vecs = con.execute(
        f"SELECT count(*) FROM '{SRC}/embeddings.parquet'").fetchone()[0]

    doc_parts = []
    for k in range(REPLICAS):
        if k == 0:
            doc_parts.append(
                f"SELECT doc_id, text, lang, source, n_chars "
                f"FROM '{SRC}/documents.parquet'")
        else:
            doc_parts.append(f"""
              SELECT doc_id + {k * n_docs} AS doc_id,
                     array_to_string(
                       list_transform(string_split(text, ' '),
                                      t -> t || '_{k}'), ' ') AS text,
                     lang, source || '_{k}' AS source,
                     CAST(length(array_to_string(
                       list_transform(string_split(text, ' '),
                                      t -> t || '_{k}'), ' ')) AS BIGINT)
                       AS n_chars
              FROM '{SRC}/documents.parquet'""")
    con.execute(
        f"COPY ({' UNION ALL '.join(doc_parts)} ORDER BY doc_id) "
        f"TO '{DST}/documents.parquet' (FORMAT PARQUET)")

    vec_parts = []
    for k in range(REPLICAS):
        if k == 0:
            vec_parts.append(
                f"SELECT vec_id, embedding, label "
                f"FROM '{SRC}/embeddings.parquet'")
        else:
            # jitter is a fixed function of (vec_id, k, dim): replicas
            # stay near their source cell but are not cosine-identical
            vec_parts.append(f"""
              SELECT vec_id + {k * n_vecs} AS vec_id,
                     CAST(list_transform(embedding,
                       (x, i) -> x + CAST(((vec_id * 31 + i * 7 + {k} * 13)
                                           % 97 - 48) AS FLOAT) / 1000.0)
                       AS FLOAT[]) AS embedding,
                     label
              FROM '{SRC}/embeddings.parquet'""")
    con.execute(
        f"COPY ({' UNION ALL '.join(vec_parts)} ORDER BY vec_id) "
        f"TO '{DST}/embeddings.parquet' (FORMAT PARQUET)")

    print(f"sf1 at {DST}: documents={n_docs * REPLICAS} "
          f"embeddings={n_vecs * REPLICAS}")


if __name__ == "__main__":
    main()
