#!/usr/bin/env python3
"""Local pre-verification: mimic the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs <outDir>/oracle_sql.json's
SQL in DuckDB with views over <sfDir>/*.parquet, and compares as multisets:
sort columns by name, sort rows, compare values exactly.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to naive
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        # DTYPE-STRICT (r17): the driver's hash is dtype-sensitive (DuckDB
        # HUGEINT vs Spark int64 reads as a hash mismatch even when every
        # value is equal), so the local proxy must fail on dtype drift too.
        dtype_mismatch = [
            (c, str(g[c].dtype), str(e[c].dtype))
            for c in g.columns if str(g[c].dtype) != str(e[c].dtype)
        ]
        eq = g.equals(e)
        if not eq:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
                eq = True
            except AssertionError as ae:
                msg = str(ae).split("\n")[0:6]
                print(f"FAIL {name}: {msg}")
        if eq and dtype_mismatch:
            print(f"FAIL {name}: values equal but DTYPE mismatch {dtype_mismatch}")
            n_fail += 1
        elif eq:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
