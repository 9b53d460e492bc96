#!/usr/bin/env python3
"""Local pre-verification of the DuckDB-oracle gate (driver t2 emulation).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Reads oracle_sql.json from verifyOutDir, runs each SQL in DuckDB against
the sfDir parquet tables, loads the Spark result parquet, sorts columns by
name (mirroring the driver's hash), and diffs values cell-by-cell.
"""
import json, sys, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            ddf = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
        dcols = sorted(ddf.column_names)
        scols = sorted(sdf.column_names)
        if dcols != scols:
            print(f"FAIL {name}: columns duckdb={dcols} spark={scols}")
            n_fail += 1
            continue
        if ddf.num_rows != sdf.num_rows:
            print(f"FAIL {name}: rows duckdb={ddf.num_rows} spark={sdf.num_rows}")
            n_fail += 1
            continue
        drows = [[r[c] for c in dcols] for r in ddf.to_pylist()]
        srows = [[r[c] for c in scols] for r in sdf.to_pylist()]
        bad = 0
        for i, (dr, sr) in enumerate(zip(drows, srows)):
            for c, dv, sv in zip(dcols, dr, sr):
                if norm(dv) != norm(sv):
                    if bad < 3:
                        print(f"  {name} row {i} col {c}: duckdb={dv!r} spark={sv!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells / {ddf.num_rows} rows")
            n_fail += 1
        else:
            print(f"PASS {name} ({ddf.num_rows} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
