#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet and compare with the Verify.scala parquet
dumps (columns sorted by name, values compared exactly).

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        try:
            expected = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            n_fail += 1
            continue
        try:
            actual = norm(duckdb.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf())
        except Exception as e:
            print(f"[MISSING] {name}: {e}")
            n_fail += 1
            continue
        if list(expected.columns) != list(actual.columns):
            print(f"[SCHEMA] {name}: oracle={list(expected.columns)} engine={list(actual.columns)}")
            n_fail += 1
            continue
        if len(expected) != len(actual):
            print(f"[ROWS] {name}: oracle={len(expected)} engine={len(actual)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(expected, actual, check_dtype=False, check_exact=True)
            n_pass += 1
            print(f"[PASS] {name} ({len(actual)} rows)")
        except AssertionError as e:
            print(f"[VALUES] {name}: {str(e).splitlines()[-1] if str(e) else e}")
            # show first mismatching cells
            for c in expected.columns:
                neq = ~(expected[c].eq(actual[c]) | (expected[c].isna() & actual[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"    col={c} row={i}: oracle={expected[c][i]!r} engine={actual[c][i]!r} (n_mismatch={int(neq.sum())})")
            n_fail += 1
    # queries without oracle → rows-only check
    import os
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = duckdb.sql(f"SELECT COUNT(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
                print(f"[ROWS-ONLY] {name}: {n} rows")
                n_skip += 1
            except Exception as e:
                print(f"[ROWS-ONLY-ERR] {name}: {e}")
                n_fail += 1
    print(f"\npass={n_pass} fail={n_fail} rows_only={n_skip}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
