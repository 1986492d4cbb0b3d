#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads each <outDir>/<name> parquet dir written by graft.Verify, runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against the testdata
tables, and compares values with columns sorted by name and rows sorted by
all columns (mirroring the driver's hash compare).
"""
import sys, json, glob, os
import duckdb

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def norm(df):
    # normalize dtypes the way a value-hash would: ints widened, floats kept
    import pandas as pd
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for name in Tables:
        p = f"{sf_dir}/{name}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").df()))
            want = norm(canon(con.execute(sql).df()))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
        elif not got.equals(want):
            neq = (got != want) & ~(got.isna() & want.isna())
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {bad.sum()} mismatched rows; first:")
            print(got[bad].head(3))
            print(want[bad].head(3))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

Tables = "region nation customer supplier part orders lineitem events documents embeddings".split()

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
