#!/usr/bin/env python3
"""Local pre-check mirroring the driver's DuckDB oracle compare.

Dev tooling only (not part of the shipped Scala library). Usage:
    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out [query...]
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # canonicalize dtypes for compare: timestamps -> ns, floats stay float64
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"{name}: FAIL (no spark output)"); fails += 1; continue
        s = canon(pq.read_table(spark_files[0]).to_pandas())
        try:
            d = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"{name}: FAIL (oracle error: {e})"); fails += 1; continue
        ok_rows = len(s) == len(d)
        ok_cols = list(s.columns) == list(d.columns)
        ok_vals = False
        detail = ""
        if ok_rows and ok_cols:
            try:
                for c in s.columns:
                    sc, dc = s[c], d[c]
                    if str(sc.dtype).startswith("datetime") or str(dc.dtype).startswith("datetime"):
                        sc = pd.to_datetime(sc); dc = pd.to_datetime(dc)
                    eq = (sc.isna() & dc.isna()) | (sc == dc)
                    if not eq.all():
                        bad = (~eq).idxmax()
                        detail = f" col={c} row={bad} spark={sc[bad]!r} duck={dc[bad]!r} (spark_dtype={s[c].dtype}, duck_dtype={d[c].dtype})"
                        raise ValueError
                ok_vals = True
            except ValueError:
                pass
            except Exception as e:
                detail = f" cmp error: {e}"
        st = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if st == "FAIL":
            fails += 1
            if not ok_rows: detail = f" rows spark={len(s)} duck={len(d)}" + detail
            if not ok_cols: detail = f" cols spark={list(s.columns)} duck={list(d.columns)}" + detail
        print(f"{name}: {st} ({len(s)} rows){detail}")
    # queries without oracle: rows-only
    qdirs = {os.path.basename(x) for x in glob.glob(f"{out_dir}/q*") if os.path.isdir(x)}
    for name in sorted(qdirs - set(oracle)):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        n = sum(pq.ParquetFile(f).metadata.num_rows for f in files) if files else 0
        print(f"{name}: rows-only ({n} rows)")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
