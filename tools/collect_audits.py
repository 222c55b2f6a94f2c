#!/usr/bin/env python3
"""Collect the audit_* guard metrics into one committed JSON artifact.

Usage: python3 tools/collect_audits.py <verify_out_dir> <out_json> \
           [prior_json] [extra_verify_dir]

The optional extra_verify_dir (e.g. the sf0.1 sweep output) contributes
a supplementary `headlines_extra` map — recall/agreement values at the
bigger SF, where cluster-count artifacts of the tiny gate corpus (IVF
recall at 500 docs) wash out.

The ~27 `audit_*` queries are the recall/agreement/error guards behind
the rows-only (no-oracle) query families — ANN recall vs the exact
twin, LSH bucket caps, sketch error, stream≡batch agreement. Their
values previously lived only in run output and SURVEY prose; this tool
freezes them per round so drift (e.g. audit_pq_recall 0.96 → 0.8) is a
mechanical diff for the driver and the judge (r12 verdict ask 3).

For every `audit_*` directory under the Verify output dir the full
row set is recorded (they are all tiny — single-row metrics or a
9-digit Benford table). Single-row numeric columns are additionally
lifted into a flat `headline` map, and when a prior artifact is given,
shared headline metrics are compared: |delta| > 0.02 is flagged as
drifted, everything else listed as stable.
"""
import json
import math
import os
import sys

import duckdb


def collect(verify_dir):
    audits = {}
    for name in sorted(os.listdir(verify_dir)):
        if not name.startswith("audit_"):
            continue
        path = os.path.join(verify_dir, name)
        if not os.path.isdir(path):
            continue
        rel = duckdb.sql(f"SELECT * FROM '{path}/*.parquet'")
        cols = rel.columns
        rows = rel.fetchall()
        ent = {"columns": cols,
               "rows": [[None if (isinstance(v, float) and math.isnan(v))
                         else v for v in r] for r in rows]}
        if len(rows) == 1:
            ent["headline"] = {
                c: v for c, v in zip(cols, rows[0])
                if isinstance(v, (int, float)) and not isinstance(v, bool)
                and not (isinstance(v, float) and math.isnan(v))}
        audits[name] = ent
    return audits


def main():
    verify_dir, out_json = sys.argv[1], sys.argv[2]
    prior_json = sys.argv[3] if len(sys.argv) > 3 else None
    extra_dir = sys.argv[4] if len(sys.argv) > 4 else None
    audits = collect(verify_dir)
    art = {"verify_dir": verify_dir, "n_audits": len(audits),
           "audits": audits}
    if extra_dir:
        art["extra_verify_dir"] = extra_dir
        art["headlines_extra"] = {
            name: ent["headline"]
            for name, ent in collect(extra_dir).items()
            if "headline" in ent}
    if prior_json and os.path.exists(prior_json):
        with open(prior_json) as f:
            prior = json.load(f)
        drifted, stable = {}, []
        for name, ent in audits.items():
            ph = prior.get("audits", {}).get(name, {}).get("headline", {})
            ch = ent.get("headline", {})
            for metric in sorted(set(ph) & set(ch)):
                d = ch[metric] - ph[metric]
                if abs(d) > 0.02:
                    drifted[f"{name}.{metric}"] = [ph[metric], ch[metric]]
                else:
                    stable.append(f"{name}.{metric}")
        art["vs_prior"] = {"prior": prior_json, "drifted": drifted,
                           "n_stable": len(stable),
                           "class": "signal" if drifted else "stable"}
    with open(out_json, "w") as f:
        json.dump(art, f, indent=1, sort_keys=True)
    vs = art.get("vs_prior", {}).get("class", "no-prior")
    print(f"{out_json}: {len(audits)} audits, vs_prior={vs}")
    for k, (p, c) in art.get("vs_prior", {}).get("drifted", {}).items():
        print(f"  DRIFT {k}: {p} -> {c}")


if __name__ == "__main__":
    main()
