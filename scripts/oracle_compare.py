#!/usr/bin/env python3
"""Compare a graft.Verify output directory against its DuckDB oracle SQL.

Usage: python3 scripts/oracle_compare.py <verify_out_dir> <sf_dir>

Replicates the driver's hash-compare semantics: for each query in
<out>/oracle_sql.json, load <out>/<query>/*.parquet and the oracle SQL result
(with one view per <sf_dir>/<stem>.parquet, as the driver sets up), sort
columns by name, cast everything to str, sort rows, compare frames.
Prints one line per query and a final tally; exit 1 on any mismatch.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        stem = os.path.basename(p)[: -len(".parquet")]
        duckdb.sql(f"CREATE OR REPLACE VIEW {stem} AS SELECT * FROM read_parquet('{p}')")
    bad = []
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"{name}: MISSING parquet output")
            bad.append(name)
            continue
        try:
            got = duckdb.sql(
                "SELECT * FROM read_parquet([" + ",".join(f"'{p}'" for p in files) + "])"
            ).df()
            want = duckdb.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ERROR {e}")
            bad.append(name)
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"{name}: SCHEMA mismatch {list(g.columns)} vs {list(w.columns)}")
            bad.append(name)
        elif len(g) != len(w):
            print(f"{name}: ROWS mismatch {len(g)} vs {len(w)}")
            bad.append(name)
        elif not g.equals(w):
            neq = (g != w).any(axis=1)
            print(f"{name}: VALUE mismatch on {int(neq.sum())} rows; first:")
            print(pd.concat([g[neq].head(3), w[neq].head(3)], keys=["spark", "oracle"]))
            bad.append(name)
        else:
            print(f"{name}: OK ({len(g)} rows)")
    print(f"\n{len(oracle) - len(bad)}/{len(oracle)} green" + (f"; MISMATCH: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
