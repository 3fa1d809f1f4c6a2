#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query...]

Reads each <out_dir>/<name> parquet (Spark result), runs the matching
oracle SQL from <out_dir>/oracle_sql.json in DuckDB over the sf_dir
parquet tables, and compares: row count, column names (sorted), and a
hash of all values with columns sorted by name (rows sorted too, to be
order-insensitive like the driver presumably is — we additionally check
exact ordered equality and report both).
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        # duckdb may give decimal/float where spark gives float
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        ok = True
        msgs = []
        if list(s.columns) != list(d.columns):
            ok = False
            msgs.append(f"cols spark={list(s.columns)} duck={list(d.columns)}")
        elif len(s) != len(d):
            ok = False
            msgs.append(f"rows spark={len(s)} duck={len(d)}")
        else:
            s2 = s.sort_values(by=list(s.columns)).reset_index(drop=True)
            d2 = d.sort_values(by=list(d.columns)).reset_index(drop=True)
            try:
                pd.testing.assert_frame_equal(s2, d2, check_dtype=False,
                                              check_exact=True)
            except AssertionError as e:
                ok = False
                msgs.append(f"values differ: {str(e)[:400]}")
            if ok:
                try:
                    pd.testing.assert_frame_equal(s, d, check_dtype=False,
                                                  check_exact=True)
                except AssertionError:
                    msgs.append("NOTE: equal as sets, ordering differs")
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(s)} rows)" +
                  ("  " + "; ".join(msgs) if msgs else ""))
        else:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(msgs))
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
