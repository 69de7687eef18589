#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the Spark
results that graft.Verify wrote. Dev-only tool (the engine itself is
Scala/Spark); usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 scripts/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values for cross-engine compare
    def canon(v):
        # Type-tagged so int64-vs-float64 column mismatches FAIL here the
        # way they fail the driver's pandas-hash compare (q09/q31 round-1
        # lesson: DuckDB sum(INTEGER)->HUGEINT->float64 vs Spark BIGINT).
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return tuple(canon(x) for x in v)
        if isinstance(v, bool) or str(type(v)).startswith("<class 'numpy.bool"):
            return ("b", bool(v))
        if isinstance(v, float):
            return ("f", round(v, 9))
        if hasattr(v, "isoformat"):
            return ("t", v.isoformat())
        if isinstance(v, (int,)) or str(type(v)).startswith("<class 'numpy.int"):
            return ("i", int(v))
        if str(type(v)).startswith("<class 'numpy.float"):
            return ("f", round(float(v), 9))
        return v
    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return rows


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    declared = [d for d in sorted(os.listdir(out_dir))
                if os.path.isdir(f"{out_dir}/{d}")]
    n_pass = n_fail = 0
    for name in declared:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            status = f"rows-only ({len(got)} rows)"
            if len(got) >= 0:
                print(f"OK   {name}: {status}")
                n_pass += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if g == e:
            print(f"OK   {name}: {len(g)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: spark {len(g)} rows vs oracle {len(e)} rows")
            for i, (a, b) in enumerate(zip(g, e)):
                if a != b:
                    print(f"   first diff row {i}:\n     spark : {a}\n     oracle: {b}")
                    break
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
