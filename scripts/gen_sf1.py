#!/usr/bin/env python3
"""Deterministic sf1 fixture derivation (10x the sf0.1 gate scale) for
the FULL registry — dedup/similarity/text families AND the
relational/event tables.

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
- customer/supplier/part/orders/lineitem/events: 10 replicas with
  key-space shifts that preserve referential integrity — replica k's
  orders reference replica k's customers, its lineitems replica k's
  orders/parts/suppliers, so every join's fan-out profile (incl. the
  engineered event-key skew) is exactly the sf0.1 profile at 10x
  volume. Shift strides are max(key)+1 (keys need not be dense).
  Non-key columns ride verbatim: values, dates, and timestamps keep
  their ranges, so date filters select 10x rows and time windows see
  10x density — the realistic scale shape for a growing business.
- region/nation are copied verbatim: TPC-H holds the geography
  dimensions CONSTANT across scale factors, and so does this.

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

COPY_TABLES = ["region", "nation"]

# table -> (columns in schema order, {column -> stride table}) where a
# "stride table" means: replica k adds k * (max(key of that table) + 1).
SHIFT_TABLES = {
    "customer": (["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                  "c_mktsegment"],
                 {"c_custkey": "customer"}),
    "supplier": (["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
                 {"s_suppkey": "supplier"}),
    "part": (["p_partkey", "p_name", "p_brand", "p_type", "p_size",
              "p_retailprice"],
             {"p_partkey": "part"}),
    "orders": (["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority"],
               {"o_orderkey": "orders", "o_custkey": "customer"}),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                  "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                  "l_returnflag", "l_linestatus", "l_shipdate"],
                 {"l_orderkey": "orders", "l_partkey": "part",
                  "l_suppkey": "supplier"}),
    "events": (["event_id", "ts", "user_id", "event_type", "value", "props"],
               {"event_id": "events_id", "user_id": "events_user"}),
}

# key column whose max defines each stride
STRIDE_KEY = {
    "customer": ("customer", "c_custkey"),
    "supplier": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "orders": ("orders", "o_orderkey"),
    "events_id": ("events", "event_id"),
    "events_user": ("events", "user_id"),
}


def main():
    DST.mkdir(parents=True, exist_ok=True)
    for t in COPY_TABLES:
        shutil.copyfile(SRC / f"{t}.parquet", DST / f"{t}.parquet")

    con0 = duckdb.connect()
    strides = {
        name: con0.execute(
            f"SELECT max({key}) + 1 FROM '{SRC}/{tbl}.parquet'"
        ).fetchone()[0]
        for name, (tbl, key) in STRIDE_KEY.items()
    }

    for tbl, (cols, shifts) in SHIFT_TABLES.items():
        parts = []
        for k in range(REPLICAS):
            sel = ", ".join(
                f"{c} + {k * strides[shifts[c]]} AS {c}" if c in shifts and k
                else c
                for c in cols)
            parts.append(f"SELECT {sel} FROM '{SRC}/{tbl}.parquet'")
        order = cols[0]
        con0.execute(
            f"COPY ({' UNION ALL '.join(parts)} ORDER BY {order}) "
            f"TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)")

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
