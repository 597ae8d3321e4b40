#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB with every <sfDir>/*.parquet registered
as a view, sorts columns by name and rows by all columns, and compares.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype('datetime64[us]')
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype('int64')
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace('.parquet', '')
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_nooracle = 0
    for d in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, d)
        if not os.path.isdir(path):
            continue
        got = pd.read_parquet(path)
        if d not in oracle:
            n_nooracle += 1
            print(f"ROWSONLY {d}: rows={len(got)} {'OK' if len(got) > 0 else 'EMPTY!'}")
            continue
        try:
            exp = con.execute(oracle[d]).df()
        except Exception as e:
            print(f"FAIL {d}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {d}: columns differ spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1
        elif len(g) != len(e):
            print(f"FAIL {d}: rowcount spark={len(g)} duck={len(e)}")
            n_fail += 1
        else:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                              check_exact=False, rtol=1e-6, atol=1e-9)
                print(f"PASS {d} ({len(g)} rows)")
                n_pass += 1
            except AssertionError as ex:
                print(f"FAIL {d}: {str(ex)[:500]}")
                n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_nooracle} rows-only")
    return 1 if n_fail else 0

if __name__ == '__main__':
    sys.exit(main(sys.argv[1], sys.argv[2]))
