#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (dev tool only; the
Scala library has no Python dependency).

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each <outDir>/<name> parquet dumped by graft.Verify, runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
same fixture tables, and compares after sorting columns by name:
schema (column names), row count, and exact values.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        if only and name not in only: continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = canon(pq.read_table(files[0]).to_pandas())
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); n_noracle += 1
            if len(got) == 0: print(f"  WARN {name}: 0 rows")
            continue
        try:
            exp = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        ok = True
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); ok = False
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); ok = False
        else:
            for c in got.columns:
                g, e = got[c], exp[c]
                try:
                    if g.dtype != e.dtype:
                        # the driver gate hash-compares typed values; a dtype
                        # drift here can pass locally yet fail there
                        print(f"  WARN {name}: col {c} dtype {g.dtype} vs {e.dtype}")
                    geq = (g.values == e.values) | (pd.isna(g.values) & pd.isna(e.values))
                    if not np.all(geq):
                        bad = np.where(~geq)[0][:5]
                        print(f"FAIL {name}: col {c} differs at rows {bad.tolist()}")
                        for i in bad[:3]:
                            print(f"    row {i}: got={g.iloc[i]!r} exp={e.iloc[i]!r}")
                        ok = False
                except Exception as ex:
                    print(f"FAIL {name}: col {c} compare error {ex}"); ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
            if len(got) == 0: print(f"  WARN {name}: 0 rows on both sides")
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
