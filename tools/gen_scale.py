#!/usr/bin/env python3
"""Synthesize a larger-scale fixture from an existing one (round-8
verdict task #1: the 10x shadow-bench fixture).

Model: "more data, same shape" — the source tables are unioned FACTOR
times with dense-key remapping (copy i offsets every key column by
i * per-table cardinality, exploiting the fixtures' dense 0..N-1 key
space, NOTES.md REST-mechanics #6), so referential integrity, value
distributions, and per-key group sizes are preserved while key
cardinality and row count scale linearly. region/nation stay fixed
(TPC-H semantics: dimension tables do not scale). Text/embedding
payloads are copied verbatim — the cross-copy duplicates are a feature
for the dedup operators (each source doc becomes a FACTOR-clique).

Output layout: <dst>/<table>.parquet is a DIRECTORY of one part file
per copy, so a Spark scan gets FACTOR-way split parallelism instead of
one giant file. Tables.load reads directories transparently.

Usage: tools/gen_scale.py SRC_SF_DIR DST_SF_DIR [FACTOR=10]
(tooling only — driver-side duckdb, same as tools/check.py; the
library itself never depends on this)
"""
import os
import shutil
import sys

import duckdb

# key columns to offset, as (table -> {column: cardinality_table})
# where cardinality_table names the table whose row count defines the
# offset stride (the FK stride must match the PK stride it references)
KEYS = {
    "customer":   {"c_custkey": "customer"},
    "supplier":   {"s_suppkey": "supplier"},
    "part":       {"p_partkey": "part"},
    "orders":     {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem":   {"l_orderkey": "orders", "l_partkey": "part",
                   "l_suppkey": "supplier"},
    "events":     {"event_id": "events", "user_id": None},  # None: distinct count
    "documents":  {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
FIXED = ["region", "nation"]  # dimensions: copied once, never scaled


def main(src: str, dst: str, factor: int) -> None:
    con = duckdb.connect()
    os.makedirs(dst, exist_ok=True)

    def count(table: str) -> int:
        return con.execute(
            f"SELECT COUNT(*) FROM '{src}/{table}.parquet'").fetchone()[0]

    strides = {t: count(t) for t in KEYS}
    # user_id is a non-PK dense key: stride = its own cardinality so
    # per-user event counts stay constant while user count scales
    user_stride = con.execute(
        f"SELECT COUNT(DISTINCT user_id) FROM '{src}/events.parquet'"
    ).fetchone()[0]

    for t in FIXED:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"{t}: copied (fixed dimension)")

    for t, keys in KEYS.items():
        outdir = f"{dst}/{t}.parquet"
        if os.path.isdir(outdir):
            shutil.rmtree(outdir)
        os.makedirs(outdir)
        cols = [c[0] for c in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        for i in range(factor):
            sel = []
            for c in cols:
                if c in keys:
                    stride = user_stride if keys[c] is None else strides[keys[c]]
                    sel.append(f"{c} + {i * stride} AS {c}")
                else:
                    sel.append(c)
            con.execute(
                f"COPY (SELECT {', '.join(sel)} FROM '{src}/{t}.parquet') "
                f"TO '{outdir}/part-{i:05d}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM '{outdir}/*.parquet'").fetchone()[0]
        print(f"{t}: {strides[t]} -> {n} rows ({factor} parts)")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, dst, factor)
