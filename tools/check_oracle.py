#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the sf parquet tables
as DuckDB views, runs each oracle SQL, and compares against the
parquet the Spark Verify main wrote: columns sorted by name, rows
sorted by all columns, values hashed. Exact compare; prints per-query
verdict + first diff.
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rel):
    # Render every column to VARCHAR inside DuckDB BEFORE converting to
    # pandas. rel.df() coerces DECIMAL to float64, which hid the round-7
    # events_ewma_hourly divergence (Spark wrote DECIMAL(,9) that the
    # driver's rendered-value hash saw as "2.205204000" while the oracle
    # DOUBLE rendered "2.205204" — numerically equal, hash-unequal).
    # Casting to VARCHAR first keeps the rendered form type-faithful, so
    # a green local check now predicts a green driver gate.
    proj = ", ".join(f'"{c}"::VARCHAR AS "{c}"' for c in sorted(rel.columns))
    df = rel.project(proj).df()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir, skip=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # local-iteration filter: a skip entry "only:a,b" restricts the run
    # to queries whose name contains one of the substrings instead
    only = None
    for s in skip:
        if s.startswith("only:"):
            only = s[5:].split(",")
    for name, sql in sorted(oracle.items()):
        if only is not None and not any(sub in name for sub in only):
            continue
        if name in skip:
            print(f"SKIP {name}")
            continue
        try:
            exp = normalize(con.sql(sql))
            got = normalize(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        neq = (exp.astype(str) != got.astype(str))
        if neq.any().any():
            bad = neq.any(axis=1)
            i = bad[bad].index[0]
            print(f"FAIL {name}: first diff row {i}:\n  exp {exp.loc[i].to_dict()}\n  got {got.loc[i].to_dict()}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(exp)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    arg3 = sys.argv[3] if len(sys.argv) > 3 else ""
    # an "only:a,b" arg is one filter spec, not a comma list of skips
    skips = {arg3} if arg3.startswith("only:") else \
        set(arg3.split(",")) if arg3 else ()
    sys.exit(main(sys.argv[1], sys.argv[2], skips))
