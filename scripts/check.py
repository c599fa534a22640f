#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (graft.Verify output), runs the
matching SQL from oracle_sql.json in DuckDB against <sfDir>/*.parquet
(registered as views by table name), sorts columns by name, and compares
row count, schema (column names), and values.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _is_null(v) -> bool:
    # Scalar-safe null test (None/NaN/NaT/NA): pd.isna on a numpy array or
    # list returns an array, whose truth value is ambiguous — treat any
    # non-scalar as non-null and let str() render it.
    if v is None:
        return True
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        # Stringify EVERY value (driver hashes stringified values): this
        # catches dtype drift the values-only compare missed — e.g. DuckDB
        # sum(int) -> HUGEINT -> float64 prints "3.0" while Spark's bigint
        # prints "3" (the round-1 q_ext_sessionize hash mismatch).
        df[c] = df[c].apply(lambda v: None if _is_null(v) else str(v))
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = norm(pd.concat([pd.read_parquet(p) for p in sorted(files)]))
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only: {len(got)})")
            continue
        try:
            want = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: schema {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except AssertionError as e:
            msg = str(e).splitlines()
            print(f"FAIL {name}: value mismatch: " + " | ".join(msg[:4]))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} outputs")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
