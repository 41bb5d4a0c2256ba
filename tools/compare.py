#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB oracle check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
Reads each <out>/<name> parquet dir + <out>/oracle_sql.json, runs the
oracle SQL in DuckDB over views named after the tables in sfDir, and
compares (rows, schema names, values) after sorting columns by name.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64[ns,"):
            df[c] = df[c].dt.tz_localize(None)
        if str(df[c].dtype).startswith(("datetime64[us", "datetime64[ms")):
            df[c] = df[c].astype("datetime64[ns]")
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, bytes)).any():
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, bytes) else v)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        try:
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        eq = got.equals(want)
        if not eq:
            # find first differing cell for diagnostics
            diff_msg = ""
            for c in got.columns:
                neq = ~(got[c].eq(want[c]) | (got[c].isna() & want[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    diff_msg = (f"col={c} row={i} got={got[c][i]!r} "
                                f"want={want[c][i]!r} "
                                f"dtypes={got[c].dtype}/{want[c].dtype}")
                    break
            print(f"FAIL {name}: values differ: {diff_msg}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    # rows-only entries (queries without oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            rows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWS {name}: {rows}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
