#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <verify_out_dir> [sf_dir]

Reads each <out>/<name> spark parquet result + <out>/oracle_sql.json,
runs the oracle in DuckDB over views named after the testdata tables,
and compares: columns sorted by name, rows sorted by all columns,
exact match for non-floats, both exact-bits and 1e-9-relative report
for floats (so we can see the margin the driver's hash compare has).
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(pd.read_parquet(f"{out}/{name}"))
            exp = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} duck={len(exp)}"); n_fail += 1; continue
        bad = None; max_rel = 0.0; exact = True
        for c in got.columns:
            g, e = got[c], exp[c]
            if g.dtype.kind == "f" or e.dtype.kind == "f":
                ga = g.astype(float).to_numpy(); ea = e.astype(float).to_numpy()
                both_nan = [(isinstance(x, float) and math.isnan(x)) and (isinstance(y, float) and math.isnan(y)) for x, y in zip(ga, ea)]
                for x, y, bn in zip(ga, ea, both_nan):
                    if bn: continue
                    if x != y:
                        exact = False
                        denom = max(abs(x), abs(y), 1e-300)
                        rel = abs(x - y) / denom
                        max_rel = max(max_rel, rel)
                        if rel > 1e-9: bad = f"col {c}: {x} != {y} (rel {rel:.2e})"; break
            else:
                ge = g.where(pd.notna(g), None); ee = e.where(pd.notna(e), None)
                neq = [(x, y) for x, y in zip(ge.tolist(), ee.tolist()) if x != y and not (x is None and y is None)]
                if neq: bad = f"col {c}: e.g. {neq[0][0]!r} != {neq[0][1]!r} ({len(neq)} cells)"
            if bad: break
        if bad:
            print(f"FAIL {name}: {bad}"); n_fail += 1
        else:
            tag = "exact" if exact else f"float-close (max_rel {max_rel:.2e})"
            print(f"PASS {name}: {len(got)} rows [{tag}]"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
