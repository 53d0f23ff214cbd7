#!/usr/bin/env python3
"""Local oracle check: mirrors the driver's DuckDB compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--rerun <dir2>] [query ...]

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB with
views named after the parquet tables in <sfDir>, read the Spark result parquet
from <verifyOutDir>/<name>/, and compare as sorted row multisets (columns
sorted by name, rows sorted). Reports exact match / near-miss (float eps) /
mismatch per query.

With --rerun <dir2> (a SECOND Verify dump of the same queries), every query
directory present in <verifyOutDir> but ABSENT from oracle_sql.json — the
"rows-only by design" set (xxhash64 / sketch / sampling internals DuckDB
cannot mirror) — is compared against its rerun twin as sorted row multisets.
That turns "rows-only" from a declared property into an actively checked
determinism contract: two independent engine runs must agree bit-for-bit.
"""
import json, math, os, sys
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

def nested_cols(description):
    """Columns whose DuckDB type is nested (list/struct/map/array).

    The driver's pandas comparer requires FLAT top-level schemas on BOTH
    sides; OutputShapeSpec lints the Spark side, but an oracle returning
    `list(...)` without `array_to_string` would until now only surface as
    a hash mismatch at driver time. Lint it here on every run instead
    (r15 verdict optional #6)."""
    bad = []
    for d in description:
        t = str(d[1]).upper()
        if "[]" in t or t.startswith(("STRUCT", "MAP", "LIST", "ARRAY", "UNION")):
            bad.append((d[0], str(d[1])))
    return bad

def check_rows_only(con, out_dir, rerun_dir, oracle, only):
    """Compare no-oracle query outputs across two Verify dumps."""
    n_ok = n_bad = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}") and d not in oracle)
    for name in names:
        if only and name not in only:
            continue
        if not os.path.isdir(f"{rerun_dir}/{name}"):
            print(f"FAIL {name} [rows-only]: missing from rerun dir {rerun_dir}")
            n_bad += 1
            continue
        try:
            a = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            acols = [d[0] for d in a.description]
            arows = a.fetchall()
            b = con.execute(f"SELECT * FROM '{rerun_dir}/{name}/*.parquet'")
            bcols = [d[0] for d in b.description]
            brows = b.fetchall()
        except Exception as e:
            print(f"FAIL {name} [rows-only]: {e}")
            n_bad += 1
            continue
        ac, ar = rows_key(acols, arows)
        bc, br = rows_key(bcols, brows)
        if ac != bc:
            print(f"FAIL {name} [rows-only]: columns differ {ac} vs {bc}")
            n_bad += 1
        elif ar != br:
            print(f"FAIL {name} [rows-only]: {len(ar)} vs {len(br)} rows, "
                  f"nondeterministic output")
            n_bad += 1
        else:
            print(f"OK   {name} [rows-only] ({len(ar)} rows, deterministic)")
            n_ok += 1
    return n_ok, n_bad

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    rerun_dir = None
    if "--rerun" in rest:
        i = rest.index("--rerun")
        if i + 1 >= len(rest):
            sys.exit("usage: check.py <sfDir> <outDir> [--rerun <dir2>] [query ...]")
        rerun_dir = rest[i + 1]
        rest = rest[:i] + rest[i + 2:]
    only = set(rest)
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
            bad_shape = nested_cols(oc.description)
            ocols = [d[0] for d in oc.description]
            orows = oc.fetchall()
            sc = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in sc.description]
            srows = sc.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if bad_shape:
            print(f"FAIL {name} [shape]: oracle returns nested column(s) "
                  f"{bad_shape} — driver comparer requires flat schemas "
                  f"(serialize with array_to_string/to_json in the SQL)")
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
    if rerun_dir:
        ro_ok, ro_bad = check_rows_only(con, out_dir, rerun_dir, oracle, only)
        n_ok += ro_ok
        n_bad += ro_bad
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
