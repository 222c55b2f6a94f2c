#!/usr/bin/env python3
"""Robustness-sweep artifact: per-query verdict at a given SF, as JSON.

Usage: python3 tools/sweep.py <sfDir> <verifyOutDir> <dest.json>

Runs the same compare as tools/check_oracle.py (DuckDB replay of every
oracle SQL vs the parquet graft.Verify wrote), then records queries
that have output but no oracle entry as "rows_only" with their row
counts. The JSON is the driver-visible form of the sweep that used to
live only in SURVEY prose.
"""
import json
import os
import subprocess
import sys

import duckdb


def main(sf_dir, out_dir, dest, skip=""):
    p = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "check_oracle.py"),
         sf_dir, out_dir, skip],
        capture_output=True, text=True)
    queries = {}
    for line in p.stdout.splitlines():
        if line.startswith("PASS "):
            queries[line.split()[1]] = {"verdict": "pass"}
        elif line.startswith("SKIP "):
            # oracle replay infeasible at this SF (O(n^2)/recursive-CTE
            # anchor forms that cost >10 min or OOM DuckDB — the engine
            # side still ran; its output is counted under rows_only
            # below if the directory exists)
            queries[line.split()[1]] = {"verdict": "oracle_skipped_at_sf"}
        elif line.startswith("FAIL "):
            name = line.split()[1].rstrip(":")
            queries[name] = {"verdict": "fail",
                             "detail": line.split(":", 1)[1].strip()[:200]}
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for d in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, d)
        if os.path.isdir(path) and d not in oracle:
            try:
                n = con.sql(f"SELECT count(*) FROM '{path}/*.parquet'").fetchone()[0]
                queries[d] = {"verdict": "rows_only", "rows": n}
            except Exception as e:
                queries[d] = {"verdict": "err", "detail": str(e)[:200]}
    counts = {}
    for v in queries.values():
        counts[v["verdict"]] = counts.get(v["verdict"], 0) + 1
    out = {"sf_dir": sf_dir, "n_queries": len(queries),
           "counts": counts, "queries": queries}
    json.dump(out, open(dest, "w"), indent=1, sort_keys=True)
    print(f"wrote {dest}: {counts}")
    return 1 if counts.get("fail") or counts.get("err") else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:5]))
