#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each Verify output
parquet, run the matching oracle SQL in DuckDB over the sf parquet tables,
and compare (columns sorted by name, rows sorted by all columns, exact
values). Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} != {want.shape}")
            n_fail += 1
            continue
        dt_mismatch = [(c, str(got[c].dtype), str(want[c].dtype))
                       for c in got.columns if got[c].dtype != want[c].dtype]
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            ok = True
            detail = ""
        except AssertionError as e:
            ok = False
            detail = str(e).replace("\n", " | ")[:400]
        if ok and not dt_mismatch:
            print(f"PASS {name} ({got.shape[0]} rows)")
            n_pass += 1
        elif ok:
            print(f"WARN {name}: values match, dtypes differ {dt_mismatch}")
            n_pass += 1
        else:
            print(f"FAIL {name}: {detail}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
