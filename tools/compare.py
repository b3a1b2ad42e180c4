#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark side), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir
parquet tables, and compares rows / schema / sorted-value hash the way
the driver does (columns sorted by name before hashing).
"""
import json, sys, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    bad = 0
    for name, sql in sorted(oracle.items()):
        if only and not any(name.startswith(o) for o in only):
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            sp_cols = [d[0] for d in sp.description]
            sp_rows = sp.fetchall()
            oc = con.execute(sql)
            oc_cols = [d[0] for d in oc.description]
            oc_rows = oc.fetchall()
            rows_ok = len(sp_rows) == len(oc_rows)
            schema_ok = sorted(sp_cols) == sorted(oc_cols)
            hash_ok = (schema_ok and
                       table_hash(sp_cols, sp_rows) == table_hash(oc_cols, oc_rows))
            ok = rows_ok and schema_ok and hash_ok
            bad += 0 if ok else 1
            print(f"{'PASS' if ok else 'FAIL'} {name} rows={len(sp_rows)}/{len(oc_rows)}"
                  f" schema={schema_ok} hash={hash_ok}")
        except Exception as e:
            bad += 1
            print(f"ERR  {name}: {e}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
