#!/usr/bin/env python3
"""Robustness sweep → driver-visible JSON artifact.

Usage: python3 tools/sweep.py <sfDir> <verifyOutDir> <out.json>

Replays every oracle SQL in DuckDB against the Verify dump at
<verifyOutDir> (produced by `runMain graft.Verify <sfDir> <dir>`) and
writes one JSON object per query:
  {"status": "pass" | "fail" | "rows_only" | "missing",
   "rows": <spark row count or null>, "detail": <first diff, fails only>}
Registered queries with no oracle entry are recorded as rows_only with
their row count (0 rows is only an error if the query errored — the
Verify main already deletes the output dir on failure, which shows up
here as status=missing).
"""
import glob
import json
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rel):
    df = rel.df()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir, out_dir, out_json):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted({os.path.basename(d)
                    for d in glob.glob(f"{out_dir}/*") if os.path.isdir(d)}
                   | set(oracle))
    report = {}
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            report[name] = {"status": "missing", "rows": None}
            n_fail += 1
            continue
        try:
            got = normalize(con.sql(f"SELECT * FROM '{qdir}/*.parquet'"))
        except Exception as e:
            report[name] = {"status": "fail", "rows": None,
                            "detail": f"spark output unreadable: {e}"}
            n_fail += 1
            continue
        if name not in oracle:
            report[name] = {"status": "rows_only", "rows": len(got)}
            n_rows_only += 1
            continue
        try:
            exp = normalize(con.sql(oracle[name]))
        except Exception as e:
            report[name] = {"status": "fail", "rows": len(got),
                            "detail": f"oracle errored: {e}"}
            n_fail += 1
            continue
        if list(exp.columns) != list(got.columns):
            report[name] = {"status": "fail", "rows": len(got),
                            "detail": f"columns exp={list(exp.columns)} got={list(got.columns)}"}
            n_fail += 1
        elif len(exp) != len(got):
            report[name] = {"status": "fail", "rows": len(got),
                            "detail": f"rows exp={len(exp)} got={len(got)}"}
            n_fail += 1
        elif (exp.astype(str) != got.astype(str)).any().any():
            neq = (exp.astype(str) != got.astype(str)).any(axis=1)
            i = neq[neq].index[0]
            report[name] = {"status": "fail", "rows": len(got),
                            "detail": f"first diff row {i}: exp={exp.loc[i].to_dict()} got={got.loc[i].to_dict()}"}
            n_fail += 1
        else:
            report[name] = {"status": "pass", "rows": len(got)}
            n_pass += 1
    summary = {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
               "n_rows_only": n_rows_only, "queries": report}
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"== {n_pass} pass / {n_rows_only} rows_only / {n_fail} fail → {out_json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:4]))
