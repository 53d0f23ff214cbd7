#!/usr/bin/env python3
"""Local oracle check: mirrors the driver's DuckDB compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB with
views named after the parquet tables in <sfDir>, read the Spark result parquet
from <verifyOutDir>/<name>/, and compare as sorted row multisets (columns
sorted by name, rows sorted). Reports exact match / near-miss (float eps) /
mismatch per query.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, list):
        return ("l", tuple(norm(x) for x in v))
    return (type(v).__name__, v)

def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [c for c in sorted(cols)], out

def close(a, b):
    if a == b:
        return True
    if a[0] == "f" and b[0] == "f" and isinstance(a[1], float) and isinstance(b[1], float):
        return abs(a[1] - b[1]) <= 1e-9 * max(1.0, abs(a[1]), abs(b[1]))
    return False

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            oc = con.execute(sql)
            ocols = [d[0] for d in oc.description]
            orows = oc.fetchall()
            sc = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in sc.description]
            srows = sc.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        oc2, orws = rows_key(ocols, orows)
        sc2, srws = rows_key(scols, srows)
        if oc2 != sc2:
            print(f"FAIL {name}: columns differ oracle={oc2} spark={sc2}")
            n_bad += 1
            continue
        if len(orws) != len(srws):
            print(f"FAIL {name}: rows oracle={len(orws)} spark={len(srws)}")
            n_bad += 1
            continue
        if orws == srws:
            print(f"OK   {name} ({len(srws)} rows)")
            n_ok += 1
            continue
        # find first diff
        diff = [(o, s) for o, s in zip(orws, srws) if o != s]
        near = all(len(o) == len(s) and all(close(a, b) for a, b in zip(o, s))
                   for o, s in diff)
        tag = "NEAR" if near else "FAIL"
        print(f"{tag} {name}: {len(diff)}/{len(srws)} rows differ; first: oracle={diff[0][0]} spark={diff[0][1]}")
        n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
