#!/usr/bin/env python3
"""Robustness-sweep artifact: per-query verdict at a given SF, as JSON.

Usage: python3 tools/sweep.py <sfDir> <verifyOutDir> <dest.json> \
           [skip] [fallbackSfDir] [fallbackOutDir]

Runs the same compare as tools/check_oracle.py (DuckDB replay of every
oracle SQL vs the parquet graft.Verify wrote), then records queries
that have output but no oracle entry as "rows_only" with their row
counts. The JSON is the driver-visible form of the sweep that used to
live only in SURVEY prose.

Queries whose oracle replay is infeasible at the sweep SF (the
recursive-CTE / O(n^2) DuckDB anchors that exceed 10 min there) are
passed in `skip` — but they are NOT left unverified: when
fallbackSfDir/fallbackOutDir point at a smaller SF's testdata and
Verify output, each skipped query is oracle-checked THERE and recorded
with a per-query "checked_at_sf" annotation, so a single sweep
artifact covers every oracle at some SF (r7 verdict item 6).
"""
import json
import os
import subprocess
import sys

import duckdb


def run_check(sf_dir, out_dir, skip):
    p = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "check_oracle.py"),
         sf_dir, out_dir, skip],
        capture_output=True, text=True)
    verdicts = {}
    for line in p.stdout.splitlines():
        if line.startswith("PASS "):
            verdicts[line.split()[1]] = {"verdict": "pass"}
        elif line.startswith("SKIP "):
            verdicts[line.split()[1]] = {"verdict": "oracle_skipped_at_sf"}
        elif line.startswith("FAIL "):
            name = line.split()[1].rstrip(":")
            verdicts[name] = {"verdict": "fail",
                              "detail": line.split(":", 1)[1].strip()[:200]}
    return verdicts


def main(sf_dir, out_dir, dest, skip="", fb_sf_dir="", fb_out_dir=""):
    queries = run_check(sf_dir, out_dir, skip)
    skipped = sorted(n for n, v in queries.items()
                     if v["verdict"] == "oracle_skipped_at_sf")
    if skipped and fb_sf_dir and fb_out_dir:
        # re-check ONLY the skipped oracles at the fallback SF; the
        # "only:" filter is substring-based, so restrict updates to the
        # skipped set afterwards
        fb = run_check(fb_sf_dir, fb_out_dir, "only:" + ",".join(skipped))
        for name in skipped:
            if name in fb:
                v = dict(fb[name])
                v["checked_at_sf"] = fb_sf_dir
                queries[name] = v
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
    sys.exit(main(*sys.argv[1:7]))
