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


# DuckDB restatements of graft.sql.SqlFunctions' kernel formulas (the
# q40/q55 oracle fragments as reusable macros) — the kernel-function
# fuzz class calls these names in both engines.
POS = "('good','great','excellent','fast','happy','love','best','success','win','improve','easy','clean')"
NEG = "('bad','slow','terrible','fail','error','hate','worst','broken','bug','crash','hard','dirty')"
STOP = ("('the','a','an','and','or','of','to','in','is','are','was','for','on',"
        "'with','as','by','at','it','that','this','be')")
MACROS = [
    r"CREATE MACRO __gtoks(t) AS "
    r"list_filter(string_split_regex(lower(trim(CAST(t AS VARCHAR))), '\s+'), x -> len(x) > 0)",
    "CREATE MACRO estimate_tokens(t) AS CAST(ceil(length(CAST(t AS VARCHAR)) / 4.0) AS BIGINT)",
    "CREATE MACRO token_count(t) AS CAST(len(__gtoks(t)) AS INT)",
    f"CREATE MACRO sentiment_score(t) AS round("
    f"(len(list_filter(__gtoks(t), x -> x IN {POS}))"
    f" - len(list_filter(__gtoks(t), x -> x IN {NEG}))) * 1.0"
    f" / greatest(len(list_filter(__gtoks(t), x -> x IN {POS}))"
    f" + len(list_filter(__gtoks(t), x -> x IN {NEG})), 1), 4)",
    f"CREATE MACRO quality_score(t) AS round("
    f"least(len(__gtoks(t)) / 50.0, 1.0) * 0.4"
    f" + least((CASE WHEN len(__gtoks(t)) = 0 THEN 0.0"
    f"   ELSE len(list_filter(__gtoks(t), x -> x IN {STOP})) * 1.0 / len(__gtoks(t)) END) * 4.0, 1.0) * 0.3"
    f" + greatest(0.0, 1.0 - (CASE WHEN len(CAST(t AS VARCHAR)) = 0 THEN 0.0"
    f"   ELSE len(regexp_replace(CAST(t AS VARCHAR), '[^[:punct:]]', '', 'g')) * 1.0 / len(CAST(t AS VARCHAR)) END) * 5.0) * 0.3, 4)",
    "CREATE MACRO __h_de(t) AS len(list_filter(__gtoks(t), x -> x IN "
    "('der','die','das','und','ein','eine','ist','von','mit','für')))",
    f"CREATE MACRO __h_en(t) AS len(list_filter(__gtoks(t), x -> x IN {STOP}))",
    "CREATE MACRO __h_es(t) AS len(list_filter(__gtoks(t), x -> x IN "
    "('el','la','de','que','y','en','un','una','por','con','para','es')))",
    "CREATE MACRO __h_fr(t) AS len(list_filter(__gtoks(t), x -> x IN "
    "('le','la','de','et','un','une','pour','dans','est','que','au')))",
    "CREATE MACRO lang_id(t) AS (CASE"
    " WHEN greatest(__h_de(t), __h_en(t), __h_es(t), __h_fr(t)) = 0 THEN 'und'"
    " WHEN __h_de(t) >= __h_en(t) AND __h_de(t) >= __h_es(t) AND __h_de(t) >= __h_fr(t) THEN 'de'"
    " WHEN __h_en(t) >= __h_es(t) AND __h_en(t) >= __h_fr(t) THEN 'en'"
    " WHEN __h_es(t) >= __h_fr(t) THEN 'es'"
    " ELSE 'fr' END)",
]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    for m in MACROS:
        con.execute(m)
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
