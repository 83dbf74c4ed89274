#!/usr/bin/env python3
"""Synthesize a larger scale-factor directory by replicating a source SF
N times with coherent key shifts.

Dims that facts join on (supplier, part, customer) shift their primary
keys by the same per-copy stride as the fact foreign keys, so join
selectivity, modulo-filter proportions, and per-key group sizes are
preserved — the scaled run stresses VOLUME, not accidentally-changed
semantics. nation/region stay fixed (TPC-H semantics). Variant-id
offsets used by the dedup queries (+1_000_000) stay inside one copy's
band (stride 10_000_000), so planted near-duplicate structure scales
linearly too.

Usage: python3 tools/gen_scale.py <srcDir> <dstDir> [copies=10]
"""
import os
import sys

import duckdb

STRIDE = 10_000_000

# table -> columns to shift by copy_index * STRIDE
SHIFTS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    src, dst = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, shifted in SHIFTS.items():
        src_file = f"{src}/{table}.parquet"
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src_file}'").fetchall()]
        if not shifted:  # fixed dims: straight copy
            con.sql(f"COPY (SELECT * FROM '{src_file}') TO '{dst}/{table}.parquet'")
            continue
        parts = []
        for i in range(copies):
            sel = ", ".join(
                f"{c} + {i * STRIDE} AS {c}" if c in shifted
                # events.ts is nanosecond-int64 in the driver testdata;
                # DuckDB would rewrite it as a naive TIMESTAMP — keep the
                # ns-as-BIGINT encoding so the ingestion path stays identical
                else f"CAST(epoch_ns({c}) AS BIGINT) AS {c}"
                if (table, c) == ("events", "ts") else c
                for c in cols)
            parts.append(f"SELECT {sel} FROM '{src_file}'")
        con.sql(f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/{table}.parquet'")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
