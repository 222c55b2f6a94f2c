#!/usr/bin/env python3
"""Assemble BENCH_SCALE_r{N}.json from two Bench detail artifacts.

Usage: python3 tools/assemble_scale.py <detail3x.json> <detail10x.json> \
           <out.json> ["note text"] [skew_probe.json] [extra_probes.json]

extra_probes.json (r14+): a JSON object of additional probe records
merged into the artifact verbatim — e.g. {"incr_candidates_probe":
[<graft.Profile incr_candidates record at 1x/3x/10x>, ...]} so the
candidate-volume scale curve is a committed number.

Reads the per-query medians from the two Bench runs (3x and 10x scale
dirs — 3.33x data between them), computes the per-query ratio, and
writes the round's scale artifact in the BENCH_SCALE_r08 shape:
queries (3x), queries_10x, ratio_10x_over_3x_data_3p33x, plus spill
columns so "zero spill" is a recorded claim, not a memory.

Per r12 verdict asks 5+6 the artifact also carries:
- runs_10x: runs-per-row for the 10x leg (from sec_shufw_runs), plus a
  median_of_2_rows_over_5s_10x list that must stay EMPTY — Bench's
  topUpRuns guarantees it, and this records the guarantee held.
- skew_probe_10x: the quota_skew Profile record (WindowGroupLimit
  on/off wall + shuffle bytes on a 100%-skew corpus), re-measured every
  round instead of the r12 one-off.
"""
import json
import sys


def main(p3, p10, out, note="", skew=None, extra=None):
    d3 = json.load(open(p3))
    d10 = json.load(open(p10))
    q3, q10 = d3["queries"], d10["queries"]
    ratios = {k: (round(q10[k] / q3[k], 2) if q3.get(k, 0) > 0 else None)
              for k in sorted(q3) if k in q10}
    runs10 = {k: len(v) for k, v in
              sorted(d10.get("sec_shufw_runs", {}).items())}
    thin = sorted(k for k, v in q10.items()
                  if v > 5.0 and runs10.get(k, 3) < 3)
    doc = {
        "metric": "total",
        "note": note,
        "queries": {k: q3[k] for k in sorted(q3)},
        "queries_10x": {k: q10[k] for k in sorted(q10)},
        "ratio_10x_over_3x_data_3p33x": ratios,
        "spill_mb_3x": d3.get("spill_mb", {}),
        "spill_mb_10x": d10.get("spill_mb", {}),
        "shuffle_write_mb_10x": d10.get("shuffle_write_mb", {}),
        "runs_10x": runs10,
        "median_of_2_rows_over_5s_10x": thin,
        "run_meta_3x": {k: d3.get(k) for k in
                        ("pid", "lock_contended", "other_graft_jvms")},
        "run_meta_10x": {k: d10.get(k) for k in
                         ("pid", "lock_contended", "other_graft_jvms")},
    }
    if skew:
        doc["skew_probe_10x"] = json.load(open(skew))
    if extra:
        doc.update(json.load(open(extra)))
    json.dump(doc, open(out, "w"), indent=1)
    worst = sorted((v, k) for k, v in ratios.items() if v)[-8:]
    print("worst ratios:", worst)
    sp = {k: v for k, v in doc["spill_mb_10x"].items() if v}
    print("10x spill nonzero:", sp or "none")
    if thin:
        print("WARNING median-of-2 rows over 5s in the 10x leg:", thin)


if __name__ == "__main__":
    main(*sys.argv[1:])
