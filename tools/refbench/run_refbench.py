#!/usr/bin/env python3
"""Head-to-head single-node ingest throughput: the reference CLI
(node /root/reference/index.js, run verbatim under the public-API
shims in tools/refbench/shims — each shim is FASTER than the real
npm package, so the comparison is biased toward the reference) vs
graft.ingest.CollimateCli on identical CSV files exported from the
driver's parquet testdata.

Usage: python3 tools/refbench/run_refbench.py [sf_dir] [out.json]

For each table we record, per engine: end-to-end wall seconds
(median of N), and the engine's own printed phase timers (parse /
type-scan / column-fill / write). The JVM+Spark session startup is
reported separately (wall - phases) rather than hidden: the
reference pays ~0.05 s of node startup, Spark pays ~6-8 s once per
process — a fixed cost that amortizes over a real ingest session,
but the end-to-end number still includes it.
"""
import json
import os
import re
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SHIMS = os.path.join(REPO, "tools", "refbench", "shims")
REF = "/root/reference/index.js"

TABLES = ["customer", "orders", "lineitem", "lineitem_x10"]
RUNS = 3

PHASE_RE = re.compile(r"done! \((\d+) ms\)")


def export_csvs(sf_dir, workdir):
    import duckdb
    paths = {}
    for t in TABLES:
        dst = os.path.join(workdir, f"{t}.csv")
        if t == "lineitem_x10":
            # the crossover probe: 10x self-union with shifted keys —
            # the whole-file-in-RAM reference degrades superlinearly
            # (GC pressure on tens of millions of JS cell objects)
            # while the streaming scan scales by core count
            src = os.path.join(sf_dir, "lineitem.parquet")
            cols = [r[0] for r in duckdb.sql(
                f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
            sel = ", ".join(
                "l_orderkey + 6000000*r AS l_orderkey" if c == "l_orderkey"
                else c for c in cols)
            duckdb.sql(f"COPY (SELECT {sel} FROM '{src}', range(10) t(r)) "
                       f"TO '{dst}' (HEADER, DELIMITER ',')")
        else:
            src = os.path.join(sf_dir, f"{t}.parquet")
            duckdb.sql(f"COPY (SELECT * FROM '{src}') TO '{dst}' "
                       f"(HEADER, DELIMITER ',')")
        paths[t] = dst
    return paths


def run_reference(csv_path, workdir):
    env = dict(os.environ, NODE_PATH=SHIMS, NODE_OPTIONS="--no-deprecation")
    t0 = time.time()
    out = subprocess.run(
        ["node", REF, "-d", "-i", "-v", csv_path],
        cwd=workdir, env=env, capture_output=True, text=True, check=True)
    wall = time.time() - t0
    phases = [int(m) / 1000.0 for m in PHASE_RE.findall(out.stdout)]
    return wall, sum(phases), phases


def run_ours(csv_path, out_dir):
    t0 = time.time()
    out = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "run_main.sh"),
         "graft.ingest.CollimateCli", "-d", "-i", "-v", csv_path, out_dir],
        cwd=REPO, capture_output=True, text=True, check=True)
    wall = time.time() - t0
    phases = [int(m) / 1000.0 for m in PHASE_RE.findall(out.stdout)]
    return wall, sum(phases), phases


def median_runs(fn, *args):
    walls, phase_sums, phase_lists = [], [], []
    for _ in range(RUNS):
        w, p, pl = fn(*args)
        walls.append(w)
        phase_sums.append(p)
        phase_lists.append(pl)
    i = walls.index(sorted(walls)[len(walls) // 2])
    return {
        "wall_sec_median": round(statistics.median(walls), 3),
        "wall_sec_runs": [round(w, 3) for w in walls],
        "phases_sec_sum_median": round(statistics.median(phase_sums), 3),
        "phases_sec": [round(x, 3) for x in phase_lists[i]],
    }


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "REFBENCH.json"
    result = {"sf_dir": sf_dir, "runs_per_cell": RUNS,
              "bias_note": "shims (moment/csv-parse/yargs) are minimal "
              "reimplementations faster than the real npm packages; the "
              "reference's numbers are therefore LOWER bounds on its real "
              "cost", "tables": {}}
    with tempfile.TemporaryDirectory() as workdir:
        csvs = export_csvs(sf_dir, workdir)
        for t in TABLES:
            rows = sum(1 for _ in open(csvs[t])) - 1
            mb = round(os.path.getsize(csvs[t]) / 1e6, 1)
            print(f"== {t}: {rows} rows, {mb} MB ==", flush=True)
            ref = median_runs(run_reference, csvs[t], workdir)
            print(f"  reference: wall {ref['wall_sec_median']}s "
                  f"phases {ref['phases_sec_sum_median']}s", flush=True)
            ours = median_runs(run_ours, csvs[t],
                               os.path.join(workdir, f"out_{t}"))
            print(f"  graft:     wall {ours['wall_sec_median']}s "
                  f"phases {ours['phases_sec_sum_median']}s", flush=True)
            result["tables"][t] = {
                "rows": rows, "csv_mb": mb,
                "reference": ref, "graft": ours,
                "phase_ratio_graft_over_ref": round(
                    ours["phases_sec_sum_median"] /
                    max(ref["phases_sec_sum_median"], 1e-9), 2),
            }
    json.dump(result, open(out_path, "w"), indent=1)
    print(json.dumps({k: {"ref_phases": v["reference"]["phases_sec_sum_median"],
                          "graft_phases": v["graft"]["phases_sec_sum_median"],
                          "ratio": v["phase_ratio_graft_over_ref"]}
                      for k, v in result["tables"].items()}, indent=1))


if __name__ == "__main__":
    main()
