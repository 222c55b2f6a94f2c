#!/usr/bin/env python3
"""Derive an N× scale point from driver testdata for scaling probes.

Usage: python3 tools/make_scale_dir.py <srcSfDir> <outDir> [copies=3]

Stacks `copies` structure-preserving replicas of the driver's parquet
tables so the six scale-path queries see N× the rows with the SAME
per-copy candidate structure (the point is to measure engine scaling,
not to inflate near-dup density):

- documents: every token suffixed `_cK` in copy K — shingle/fingerprint
  spaces of different copies are disjoint, so exact/MinHash/containment
  pair counts scale exactly N×, never N².
- embeddings: copy K circular-shifts each vector by 8·K components —
  norms (and within-copy cosines) are preserved, cross-copy cosines are
  decorrelated, so ANN pair structure scales N×.
- part: brand suffixed per copy (blocking keys stay copy-local);
  lineitem/customer: plain key offsets (graph becomes N disjoint
  components; band join just sees N× probe rows).
- nation: dimension table, single copy (band definitions unchanged).

Derived data lives under the repo (never /root/testdata) and exists
only for BENCH scaling tables — correctness always runs on driver data.
"""
import os
import sys

import duckdb

OFF = 10_000_000


def main(src, out, copies=3):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def stack(table, select_fmt):
        parts = [select_fmt.format(k=k, off=k * OFF, cip=cipher(k),
                                   src=f"'{src}/{table}.parquet'")
                 for k in range(copies)]
        sql = " UNION ALL ".join(parts)
        con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    # Copy decorrelation must hold at the CHARACTER level, not just the
    # token level: the engine's containment/incremental paths shingle
    # over char 5-grams, and the earlier token-SUFFIX scheme left
    # cross-copy texts sharing most of their char-grams ("table_c1" vs
    # "table_c2" differ only in grams touching the final digit), so the
    # band join saw quadratic cross-copy candidates (the 3x probe's
    # phantom 18x on dedup_incr_minhash). A per-copy letter-rotation
    # cipher (translate a..z -> rotated alphabet; copy 0 = identity)
    # makes every char-gram, word-shingle, and fingerprint copy-local
    # while preserving lengths, token boundaries, and distinctness.
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def cipher(k):
        rot = k % 26
        return alpha[rot:] + alpha[:rot]

    stack("documents",
          "SELECT doc_id + {off} AS doc_id, "
          f"translate(text, '{alpha}', '{{cip}}') AS text, "
          "lang, source || '_{k}' AS source, n_chars FROM {src}")
    stack("embeddings",
          "SELECT vec_id + {off} AS vec_id, "
          "CASE WHEN {k} = 0 THEN embedding ELSE "
          "list_concat(embedding[1 + ({k} * 8) % len(embedding):], "
          "embedding[1:({k} * 8) % len(embedding)])::FLOAT[] END AS embedding, "
          "label FROM {src}")
    stack("part",
          "SELECT p_partkey + {off} AS p_partkey, p_name, "
          "CASE WHEN {k} = 0 THEN p_brand ELSE p_brand || '#{k}' END AS p_brand, "
          "p_type, p_size, p_retailprice FROM {src}")
    stack("lineitem",
          "SELECT l_orderkey + {off} AS l_orderkey, "
          "l_partkey + {off} AS l_partkey, l_suppkey + {off} AS l_suppkey, "
          "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
          "l_returnflag, l_linestatus, l_shipdate FROM {src}")
    stack("customer",
          "SELECT c_custkey + {off} AS c_custkey, c_name, c_nationkey, "
          "c_acctbal, c_mktsegment FROM {src}")
    # events: key-offset per copy (CDC/privacy keys stay copy-local);
    # timestamps unchanged -> 3x event density in the same window, the
    # realistic scale direction for a stream
    stack("events",
          "SELECT event_id + {off} AS event_id, ts, "
          "user_id + {off} AS user_id, event_type, value, props FROM {src}")
    stack("orders",
          "SELECT o_orderkey + {off} AS o_orderkey, "
          "o_custkey + {off} AS o_custkey, o_orderstatus, o_totalprice, "
          "o_orderdate, o_orderpriority FROM {src}")
    con.execute(
        f"COPY (SELECT * FROM '{src}/nation.parquet') "
        f"TO '{out}/nation.parquet' (FORMAT PARQUET)")
    print("nation: 1 copy")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 3)
