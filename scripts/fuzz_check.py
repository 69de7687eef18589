#!/usr/bin/env python3
"""Replay graft.Fuzz queries in DuckDB and hash-compare against the
Spark results (same normalization as oracle_check). Usage:

    sbt "runMain graft.Fuzz /root/testdata/sf0.01 /tmp/fuzz_out 200"
    python3 scripts/fuzz_check.py /root/testdata/sf0.01 /tmp/fuzz_out
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(__file__))
from oracle_check import TABLES, normalize


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    queries = json.load(open(f"{out_dir}/fuzz_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(queries.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"SKIP {name}: no spark output")
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if g == e:
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: {len(g)} vs {len(e)} rows\n  sql: {sql}")
            for a, b in zip(g, e):
                if a != b:
                    print(f"  spark : {a}\n  duckdb: {b}")
                    break
    print(f"\nfuzz: {n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
