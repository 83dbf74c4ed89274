#!/usr/bin/env python3
"""Strict (driver-faithful) correctness compare: reads the SPARK side via
pyarrow->pandas (the way an external harness would), the ORACLE side via
DuckDB .df(), and fails on any DTYPE divergence before comparing values.

This is the gate tools/compare.py cannot see: compare.py routes BOTH sides
through DuckDB, so a decimal-typed Spark output column silently coerces to
the same representation as the oracle. A pyarrow reader materializes
decimals as Python Decimal objects (dtype=object) while DuckDB's .df()
renders float64 — rows and values agree, the frame-level hash does not.
Round 9 lost q162/q163/q164 to exactly this.

Usage: python3 tools/compare_strict.py <sfDir> <verifyOutDir> [query ...]
"""
import glob
import json
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        na_position="first", kind="mergesort")
    return df


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
            want = canon(con.sql(oracles[name]).df())
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            got = canon(pq.ParquetDataset(files).read().to_pandas())
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: cols oracle={list(want.columns)} "
                  f"spark={list(got.columns)}")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows oracle={len(want)} spark={len(got)}")
            n_fail += 1
            continue
        # Dtype reconciliation, calibrated against DRIVER evidence:
        # datetime-family divergences (date32->object vs datetime64,
        # ns vs us units) are tolerated by the driver's gate (q144/q159/
        # q176 emit DATE/TIMESTAMP and are driver-green) -> coerce both
        # sides to datetime64[us] and keep comparing. Anything else
        # (decimals -> object vs float64 above all) is fatal: that is
        # the exact divergence that cost q162/q163/q164 in round 9.
        coerced = []
        for c in want.columns:
            a, b = str(want[c].dtype), str(got[c].dtype)
            if a == b:
                continue
            if a.startswith("datetime64") or b.startswith("datetime64"):
                try:
                    want[c] = pd.to_datetime(want[c]).astype("datetime64[us]")
                    got[c] = pd.to_datetime(got[c]).astype("datetime64[us]")
                    coerced.append(c)
                    continue
                except Exception:
                    pass
            print(f"FAIL {name}: dtype divergence ({c}: oracle={a} "
                  f"spark={b})")
            break
        else:
            if coerced:
                print(f"  note {name}: datetime coercion on {coerced} "
                      "(driver-tolerated divergence)")
            # Float columns hash at 9 significant digits, not bit-exact:
            # driver evidence (q150/q166/q175 green in round 9) shows the
            # gate tolerates last-ulp float divergence — DuckDB's
            # wide-decimal->double cast is one ulp off correctly-rounded,
            # so bit-exact float hashing would flag oracle artifacts, not
            # engine bugs. Dtype strictness above is unaffected.
            had_float = False
            for c in want.columns:
                if str(want[c].dtype) == "float64":
                    had_float = True
                    want[c] = want[c].map(
                        lambda v: v if pd.isna(v) else f"{v:.9g}")
                    got[c] = got[c].map(
                        lambda v: v if pd.isna(v) else f"{v:.9g}")
            if had_float:
                # re-sort AFTER normalization: two last-ulp-different
                # floats that normalize to the same 9-digit image can
                # sort on opposite sides of their ties pre-normalization,
                # misaligning otherwise-identical row sets (q38's
                # cosine==1 block measured exactly this)
                want = canon(want)
                got = canon(got)
            hw = pd.util.hash_pandas_object(want, index=False)
            hg = pd.util.hash_pandas_object(got, index=False)
            if not hw.equals(hg):
                diff = (hw != hg)
                idx = list(diff[diff].index[:3])
                print(f"FAIL {name}: {int(diff.sum())} differing rows of "
                      f"{len(want)}; first {idx}")
                for i in idx:
                    print(f"   oracle: {want.iloc[i].to_dict()}")
                    print(f"   spark:  {got.iloc[i].to_dict()}")
                n_fail += 1
                continue
            print(f"OK {name} ({len(got)} rows)")
            n_pass += 1
            continue
        n_fail += 1
        continue
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
