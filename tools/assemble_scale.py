#!/usr/bin/env python3
"""Assemble BENCH_SCALE_r{N}.json from two Bench detail artifacts.

Usage: python3 tools/assemble_scale.py <detail3x.json> <detail10x.json> \
           <out.json> ["note text"]

Reads the per-query medians from the two Bench runs (3x and 10x scale
dirs — 3.33x data between them), computes the per-query ratio, and
writes the round's scale artifact in the BENCH_SCALE_r08 shape:
queries (3x), queries_10x, ratio_10x_over_3x_data_3p33x, plus spill
columns so "zero spill" is a recorded claim, not a memory.
"""
import json
import sys


def main(p3, p10, out, note=""):
    d3 = json.load(open(p3))
    d10 = json.load(open(p10))
    q3, q10 = d3["queries"], d10["queries"]
    ratios = {k: (round(q10[k] / q3[k], 2) if q3.get(k, 0) > 0 else None)
              for k in sorted(q3) if k in q10}
    doc = {
        "metric": "total",
        "note": note,
        "queries": {k: q3[k] for k in sorted(q3)},
        "queries_10x": {k: q10[k] for k in sorted(q10)},
        "ratio_10x_over_3x_data_3p33x": ratios,
        "spill_mb_3x": d3.get("spill_mb", {}),
        "spill_mb_10x": d10.get("spill_mb", {}),
        "shuffle_write_mb_10x": d10.get("shuffle_write_mb", {}),
        "run_meta_3x": {k: d3.get(k) for k in
                        ("pid", "lock_contended", "other_graft_jvms")},
        "run_meta_10x": {k: d10.get(k) for k in
                         ("pid", "lock_contended", "other_graft_jvms")},
    }
    json.dump(doc, open(out, "w"), indent=1)
    worst = sorted((v, k) for k, v in ratios.items() if v)[-8:]
    print("worst ratios:", worst)
    sp = {k: v for k, v in doc["spill_mb_10x"].items() if v}
    print("10x spill nonzero:", sp or "none")


if __name__ == "__main__":
    main(*sys.argv[1:])
