#!/usr/bin/env python3
"""Driver-style correctness record: per-query rows/schema/hash match vs the
DuckDB oracle, written as JSON (the CORRECTNESS_sf*.json format). Usage:
    python3 tools/correctness_json.py <sf_dir> <verify_out_dir> <out_json>
"""
import json
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "tools")
from check_oracle import TABLES, canon  # noqa: E402


def main(sf_dir: str, out_dir: str, out_json: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    rec, failed = {}, 0
    import time
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        row = {"rows_match": False, "schema_match": False, "hash_match": False,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            want = canon(con.sql(sql).df())
            row["spark_rows"] = int(len(got))
            row["oracle_rows"] = int(len(want))
            row["rows_match"] = len(got) == len(want)
            row["schema_match"] = list(got.columns) == list(want.columns)
            row["hash_match"] = (row["rows_match"] and row["schema_match"]
                                 and got.equals(want))
        except Exception as e:  # noqa: BLE001
            row["err"] = str(e)[:300]
        if not row["hash_match"]:
            failed += 1
        rec[name] = row
        print(f"[oracle] {name} {time.time() - t0:6.1f}s hash={row['hash_match']}"
              + (f" err={row['err']}" if row["err"] else ""), flush=True)
    json.dump(rec, open(out_json, "w"), indent=1)
    n = len(oracle)
    print(f"{'PASS' if failed == 0 else 'FAIL'}: {n - failed}/{n} hash-matched -> {out_json}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
