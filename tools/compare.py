#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [queryPrefix ...]

Reads each <verifyOutDir>/<name> parquet (Spark side), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir
parquet tables, and compares rows / schema / sorted-value hash the way
the driver does (columns sorted by name before hashing).

Two disciplines learned from driver rounds:
- TYPE CLASSES are compared (DuckDB DESCRIBE on both sides): a bare
  sum() in an oracle returns HUGEINT where Spark writes BIGINT — both
  fetch as Python ints and would hash equal here, but the driver's
  typed compare fails (the round-1 red wave). Mismatches print as
  typeclash even when values agree.
- Floats hash via repr() (shortest round-trip, full precision): every
  gated query rounds explicitly, so exact-bits equality is the
  contract; truncated formatting would hide engine drift the driver's
  hash would catch.
"""
import json, sys, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for r in [row] for i in order)
                   for row in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def typeclass(duck_type):
    """Collapse DuckDB type names into the classes the driver's typed
    compare distinguishes."""
    t = duck_type.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t == "HUGEINT" or t.startswith("DECIMAL"):
        return "decimal"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    if "TIMESTAMP" in t or t == "DATE":
        return "time"
    return "str"


def col_types(con, sql):
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return {r[0]: typeclass(r[1]) for r in rows}


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
            sp_sql = f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            sp = con.execute(sp_sql)
            sp_cols = [d[0] for d in sp.description]
            sp_rows = sp.fetchall()
            oc = con.execute(sql)
            oc_cols = [d[0] for d in oc.description]
            oc_rows = oc.fetchall()
            rows_ok = len(sp_rows) == len(oc_rows)
            schema_ok = sorted(sp_cols) == sorted(oc_cols)
            sp_t = col_types(con, f"({sp_sql})")
            oc_t = col_types(con, f"({sql})")
            clashes = sorted(c for c in sp_t
                             if c in oc_t and sp_t[c] != oc_t[c])
            types_ok = not clashes
            hash_ok = (schema_ok and
                       table_hash(sp_cols, sp_rows) == table_hash(oc_cols, oc_rows))
            ok = rows_ok and schema_ok and hash_ok and types_ok
            bad += 0 if ok else 1
            extra = "" if types_ok else " typeclash=" + ",".join(
                f"{c}({sp_t[c]}|{oc_t[c]})" for c in clashes)
            print(f"{'PASS' if ok else 'FAIL'} {name} rows={len(sp_rows)}/{len(oc_rows)}"
                  f" schema={schema_ok} hash={hash_ok}{extra}")
        except Exception as e:
            bad += 1
            print(f"ERR  {name}: {e}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
