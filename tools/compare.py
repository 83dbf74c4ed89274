#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle and compare rows / schema / values.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        # The DRIVER's harness sorts rows via pandas, which cannot hash
        # list/array cells (q45 failed there in round 4 while passing here
        # because this function stringified lists). Mirror the driver: an
        # array-typed output column is a contract violation, fail loudly.
        raise TypeError(
            "array-typed output column — the driver's pandas compare cannot "
            "hash arrays; flatten to scalar columns")
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        try:
            want = con.sql(oracles[name])
            wcols = sorted(want.columns)
            wrows = [tuple(norm(v) for v in row) for row in
                     con.sql(f"SELECT {','.join(wcols)} FROM want").fetchall()]
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols = sorted(got.columns)
            grows = [tuple(norm(v) for v in row) for row in
                     con.sql(f"SELECT {','.join(gcols)} FROM got").fetchall()]
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if wcols != gcols:
            print(f"FAIL {name}: cols oracle={wcols} spark={gcols}")
            n_fail += 1
            continue
        if len(wrows) != len(grows):
            print(f"FAIL {name}: rows oracle={len(wrows)} spark={len(grows)}")
            n_fail += 1
            continue
        # order-insensitive compare (both sides sorted the same way anyway)
        if sorted(wrows) != sorted(grows):
            sw, sg = sorted(wrows), sorted(grows)
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(sw, sg)) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows of {len(sw)}; first:")
            for i, a, b in diffs[:3]:
                print(f"  row {i} cols={wcols}\n   oracle: {a}\n   spark:  {b}")
            n_fail += 1
            continue
        print(f"OK {name} ({len(grows)} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
