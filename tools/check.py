#!/usr/bin/env python3
"""Local replica of the driver's t2 oracle gate (dev tool only — the Scala
library does not depend on this). Runs graft.Verify's parquet output against
SparkEntry.oracleSql in DuckDB over the same testdata, compares exactly.

Usage: python3 tools/check.py <outDir> <sfDir> [query ...]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, math
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows by stringified values (driver sorts
    # columns by name before hashing; row sort makes compare order-free)
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(out, key=lambda r: tuple(str(x) for x in r)), [cols[i] for i in idx]

def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # exact: driver hash-compares
    return a == b or str(a) == str(b)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sp = con.execute(f"SELECT * FROM read_parquet({files!r})")
            sp_cols = [d[0] for d in sp.description]; sp_rows = sp.fetchall()
            du = con.execute(sql)
            du_cols = [d[0] for d in du.description]; du_rows = du.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1; continue
        if sorted(sp_cols) != sorted(du_cols):
            print(f"FAIL {name}: cols spark={sorted(sp_cols)} duck={sorted(du_cols)}")
            n_fail += 1; continue
        a, cols = canon(sp_rows, sp_cols)
        b, _ = canon(du_rows, du_cols)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); n_fail += 1; continue
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b))
               if not all(eq(u, v) for u, v in zip(x, y))][:3]
        if bad:
            print(f"FAIL {name}: {len(bad)}+ row diffs; cols={cols}")
            for i, x, y in bad:
                print(f"  row {i}:\n    spark={x}\n    duck ={y}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
