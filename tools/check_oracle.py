#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against the DuckDB oracle SQL and compare (columns sorted by name, rows as a
multiset). Usage: check_oracle.py <sfDir> <verifyOutDir>."""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            want = canon(con.sql(sql).df())
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
                failed += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} != {len(want)}")
                failed += 1
                continue
            eq = got.equals(want)
            if not eq:
                # locate first differing cell for debugging
                diff = (got != want) & ~(got.isna() & want.isna())
                cells = diff.to_numpy().nonzero()
                i, j = cells[0][0], cells[1][0]
                print(f"FAIL {name}: value mismatch at row {i} col {got.columns[j]}: "
                      f"spark={got.iat[i, j]!r} duckdb={want.iat[i, j]!r}")
                failed += 1
            else:
                print(f"OK   {name} ({len(got)} rows)")
        except Exception as e:
            print(f"ERROR {name}: {e}")
            failed += 1
    print(f"{'PASS' if failed == 0 else 'FAIL'}: {len(oracle) - failed}/{len(oracle)} matched")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
