#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the sf parquet tables
as DuckDB views, runs each oracle SQL, and compares against the
parquet the Spark Verify main wrote. Three legs per query:

1. Type lint: DESCRIBE the oracle SQL and fail if any output column
   has a type outside Spark's rendering set. DuckDB promotes bare
   integer sum() to HUGEINT (int128); a generic harness materializes
   HUGEINT through pandas as float64, rendering "979.0" where Spark's
   BIGINT renders "979" — hash-unequal with rows+schema equal. That
   class shipped green locally for two rounds (r8/r9: six red driver
   rows) because leg 2 alone normalizes it. Any oracle must CAST such
   aggregates to BIGINT.
2. VARCHAR leg: render both sides to VARCHAR inside DuckDB, then
   compare. Type-faithful for DECIMAL scale (caught the round-7
   events_ewma_hourly DECIMAL(,9)-vs-DOUBLE divergence that .df()
   float64 coercion hides).
3. Generic-renderer leg: render both sides through .df() (pandas) the
   way a generic harness would, then compare as strings. Catches the
   HUGEINT class directly (float64 "979.0" vs int64 "979") and any
   future type whose dataframe rendering diverges from Spark's.
   Both sides go through the identical duckdb->pandas pipeline, so a
   mismatch here is a real type-contract violation, not noise.

Exact compare; prints per-query verdict + first diff.
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Types whose DuckDB pandas rendering matches Spark's rendering of the
# corresponding Spark type. Anything else (HUGEINT, UHUGEINT, UBIGINT,
# interval, ...) has no Spark equivalent with the same rendered form
# and must be CAST in the oracle SQL.
SPARK_RENDERABLE = (
    "BOOLEAN", "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "FLOAT", "DOUBLE", "DECIMAL", "VARCHAR", "DATE", "TIMESTAMP",
    "BLOB",
)


def lint_types(con, sql):
    """Return the list of (column, type) pairs whose oracle output type
    is outside Spark's rendering set (e.g. HUGEINT from a bare integer
    sum())."""
    bad = []
    for row in con.sql(f"DESCRIBE {sql}").fetchall():
        col, typ = row[0], row[1]
        base = typ.split("(")[0].strip().upper()
        if base.endswith("[]"):  # list of a renderable base type is fine
            base = base[:-2]
        if base not in SPARK_RENDERABLE:
            bad.append((col, typ))
    return bad


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


def normalize_generic(rel):
    # Second comparison leg: materialize through .df() the way a generic
    # dataframe harness would (HUGEINT -> float64 -> "979.0"), then
    # stringify. Stringify BEFORE sorting so array/list columns stay
    # sortable.
    df = rel.df()
    df = df[sorted(df.columns)].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def first_diff(exp, got):
    neq = (exp.astype(str) != got.astype(str))
    bad = neq.any(axis=1)
    i = bad[bad].index[0]
    return i, exp.loc[i].to_dict(), got.loc[i].to_dict()


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
            bad_types = lint_types(con, sql)
        except Exception as e:
            print(f"FAIL {name}: DESCRIBE lint error: {e}")
            n_fail += 1
            continue
        if bad_types:
            print(f"FAIL {name}: oracle output types outside Spark's "
                  f"rendering set (CAST them): {bad_types}")
            n_fail += 1
            continue
        try:
            # materialize the oracle ONCE (CTAS keeps HUGEINT etc.
            # faithfully); both comparison legs then read the temp
            # tables instead of re-executing the SQL
            con.execute(f"CREATE OR REPLACE TEMP TABLE _exp AS {sql}")
            con.execute(f"CREATE OR REPLACE TEMP TABLE _got AS "
                        f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            exp = normalize(con.sql("SELECT * FROM _exp"))
            got = normalize(con.sql("SELECT * FROM _got"))
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
        if (exp.astype(str) != got.astype(str)).any().any():
            i, e, g = first_diff(exp, got)
            print(f"FAIL {name}: first diff row {i}:\n  exp {e}\n  got {g}")
            n_fail += 1
            continue
        # leg 3: generic pandas rendering of both sides
        try:
            exp_g = normalize_generic(con.sql("SELECT * FROM _exp"))
            got_g = normalize_generic(con.sql("SELECT * FROM _got"))
        except Exception as e:
            print(f"FAIL {name}: generic-render leg error: {e}")
            n_fail += 1
            continue
        # a length mismatch here is unreachable today (both legs read the
        # same length-checked temp tables), but if normalize_generic ever
        # drops rows it must FAIL loudly, not silently pass the leg
        if len(exp_g) != len(got_g):
            print(f"FAIL {name}: generic-render leg row count "
                  f"exp={len(exp_g)} got={len(got_g)}")
            n_fail += 1
            continue
        if (exp_g.astype(str) != got_g.astype(str)).any().any():
            i, e, g = first_diff(exp_g, got_g)
            print(f"FAIL {name}: generic-render diff row {i} "
                  f"(VARCHAR leg passed — type rendering divergence):\n"
                  f"  exp {e}\n  got {g}")
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
