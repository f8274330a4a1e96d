#!/usr/bin/env python3
"""Local oracle check mimicking the driver's t2 gate: run DuckDB on
oracle_sql.json over the sf tables, compare against the Verify parquet
dumps (columns sorted by name, rows sorted, exact value compare with a
float report)."""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return duckdb.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"MISSING  {name}: no spark result parquet"); n_bad += 1; continue
        try:
            duck_df = con.execute(sql).fetchdf()
            # canonicalization gate: the driver's hasher serializes
            # dtypes, and Spark never emits int128/decimal — an oracle
            # typing a column HUGEINT (uncast integer sum) or DECIMAL
            # (bare decimal literal) hash-mismatches even when every
            # value is equal (the r12 q_host_rank class)
            for cname, ctype, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
                if "HUGEINT" in ctype or "DECIMAL" in ctype:
                    print(f"DTYPE    {name}.{cname}: oracle types it {ctype}; "
                          f"CAST it (AS BIGINT / AS DOUBLE)")
                    n_bad += 1
        except Exception as e:
            print(f"SQLERR   {name}: {e}"); n_bad += 1; continue
        # -0.0 leaks through round() and hashes differently from +0.0:
        # both engines must normalize (x + 0.0) before emitting
        for side, df in (("spark", spark_df), ("duck", duck_df)):
            for c in df.columns:
                if df[c].dtype.kind == "f":
                    v = df[c].values
                    negz = (v == 0.0) & np.signbit(v)
                    if negz.any():
                        print(f"NEGZERO  {name}.{c} ({side}): {int(negz.sum())} "
                              f"-0.0 values; normalize with + 0.0")
                        n_bad += 1
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"SCHEMA   {name}: spark={list(a.columns)} duck={list(b.columns)}"); n_bad += 1; continue
        if len(a) != len(b):
            print(f"ROWS     {name}: spark={len(a)} duck={len(b)}"); n_bad += 1; continue
        bad_cols = []
        for c in a.columns:
            x, y = a[c], b[c]
            if x.dtype.kind == "f" or y.dtype.kind == "f":
                xv = x.astype(float).values; yv = y.astype(float).values
                both_nan = np.isnan(xv) & np.isnan(yv)
                exact = (xv == yv) | both_nan
                if not exact.all():
                    close = np.isclose(xv, yv, rtol=1e-9, atol=1e-12) | both_nan
                    tag = "float-close" if close.all() else "FLOAT-DIFF"
                    bad_cols.append((c, tag, int((~exact).sum())))
            else:
                neq = ~((x.values == y.values) | (pd.isna(x).values & pd.isna(y).values))
                if neq.any():
                    bad_cols.append((c, "DIFF", int(neq.sum())))
                    i = int(np.argmax(neq))
                    print(f"    first diff {name}.{c} row{i}: spark={x.iloc[i]!r} duck={y.iloc[i]!r}")
        if bad_cols:
            print(f"VALUES   {name}: {bad_cols}"); n_bad += 1
        else:
            print(f"OK       {name}  rows={len(a)}"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"))
