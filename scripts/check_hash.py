#!/usr/bin/env python3
"""Pandas-dtype replica of the driver hash gate. Simulate the driver's pandas-based hash compare:
spark side read via pandas.read_parquet, oracle via duckdb .df(),
columns sorted by name, rows sorted, values hashed."""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = {n for n in os.environ.get("CHECK_ONLY", "").split(",") if n}
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    nfail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"MISS {name}")
            nfail += 1
            continue
        try:
            sdf = pd.concat([pd.read_parquet(f) for f in files])
            ddf = con.execute(oracle[name]).df()
            cols = sorted(sdf.columns)
            if cols != sorted(ddf.columns):
                print(f"COLS {name}: spark={cols} duck={sorted(ddf.columns)}")
                nfail += 1
                continue
            sdf = sdf[cols].sort_values(cols).reset_index(drop=True)
            ddf = ddf[cols].sort_values(cols).reset_index(drop=True)
            if len(sdf) != len(ddf):
                print(f"ROWS {name}: {len(sdf)} vs {len(ddf)}")
                nfail += 1
                continue
            h1 = pd.util.hash_pandas_object(sdf, index=False).sum()
            h2 = pd.util.hash_pandas_object(ddf, index=False).sum()
            if h1 != h2:
                dt = {c: (str(sdf[c].dtype), str(ddf[c].dtype)) for c in cols
                      if str(sdf[c].dtype) != str(ddf[c].dtype)}
                print(f"HASH {name}: dtype-mismatches={dt}")
                # show first differing cell if dtypes equal
                if not dt:
                    for c in cols:
                        neq = (sdf[c] != ddf[c])
                        try:
                            neq = neq & ~(sdf[c].isna() & ddf[c].isna())
                        except Exception:
                            pass
                        if neq.any():
                            i = neq.idxmax()
                            print(f"   first diff col={c} row={i}: "
                                  f"{sdf[c][i]!r} vs {ddf[c][i]!r}")
                            break
                nfail += 1
            else:
                print(f"PASS {name}")
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__} {e}")
            nfail += 1
    print(f"\n{nfail} failures / {len(oracle)} oracle queries")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
