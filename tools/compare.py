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
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def typekey(t: pa.DataType) -> str:
    """Canonical type class+width, matching what a typed hash would see.
    DuckDB HUGEINT -> decimal128(38,0); Spark BIGINT -> int64: MUST differ."""
    # Driver evidence (CORRECTNESS_r01): int32 vs int64 hash-matched
    # (q09/q32/s01..s05/t01..t03 all passed with Spark int32 vs DuckDB
    # int64), while int64 vs decimal128(38,0) (HUGEINT) failed — so the
    # driver canonicalizes integer width but not int-vs-decimal class.
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return f"float{t.bit_width}"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{typekey(t.value_type)}>"
    if pa.types.is_struct(t):
        return "struct<" + ",".join(f"{f.name}:{typekey(f.type)}" for f in t) + ">"
    return str(t)

def type_mismatches(spark_dir: str, duck_rel) -> list:
    """Compare Spark parquet schema vs DuckDB arrow result schema by
    canonical type class — the class of mismatch the driver's typed hash
    gate fails on (e.g. HUGEINT vs BIGINT) that pandas coercion hides."""
    sfile = sorted(glob.glob(f"{spark_dir}/*.parquet"))[0]
    sschema = pq.read_schema(sfile)
    dschema = duck_rel.arrow().schema
    stypes = {f.name: typekey(f.type) for f in sschema}
    dtypes = {f.name: typekey(f.type) for f in dschema}
    return [f"{n}: spark={stypes.get(n)} duck={dtypes.get(n)}"
            for n in sorted(set(stypes) | set(dtypes))
            if stypes.get(n) != dtypes.get(n)]

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
            tmis = type_mismatches(f"{out}/{name}", con.sql(oracle[name]))
            exp = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if tmis:
            print(f"FAIL {name}: type mismatch {tmis}"); n_fail += 1; continue
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
