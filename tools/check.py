#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over views
of <sfDir>/*.parquet, canonicalizes both sides (columns sorted by
name, rows sorted by all columns), and compares values exactly.
"""
import glob
import json
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # stringify for a stable total order (mirrors hash-of-values compare)
    s = df.astype(str)
    order = s.sort_values(by=list(s.columns)).index
    return df.loc[order].reset_index(drop=True)


def main() -> int:
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pq.read_table(f).to_pandas()
                                  for f in files])
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            print(f"FAIL {name}: columns spark={sorted(spark_df.columns)} "
                  f"duck={sorted(duck_df.columns)}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        eq = a.astype(str).eq(b.astype(str)).all().all()
        if not eq:
            diff = (~a.astype(str).eq(b.astype(str))).any(axis=1)
            print(f"FAIL {name}: {int(diff.sum())}/{len(a)} rows differ; "
                  "first diff:")
            i = diff.idxmax()
            print("  spark:", a.loc[i].to_dict())
            print("  duck :", b.loc[i].to_dict())
            n_fail += 1
            continue
        dtypes_note = ""
        for c in a.columns:
            if str(a[c].dtype) != str(b[c].dtype):
                dtypes_note += f" [dtype {c}: {a[c].dtype} vs {b[c].dtype}]"
        print(f"OK   {name}: {len(a)} rows{dtypes_note}")
    print(f"{len(oracle) - n_fail}/{len(oracle)} queries match")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
