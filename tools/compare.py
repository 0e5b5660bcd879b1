#!/usr/bin/env python3
"""Local approximation of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <outDir>
Reads each <outDir>/<name> parquet (Spark result), runs the oracle SQL
from <outDir>/oracle_sql.json in DuckDB against the sfDir tables, and
compares: row count, column names, and exact values (columns sorted by
name, rows sorted by all columns). Strictest plausible interpretation —
if this passes, the driver's hash compare should too.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types: decimals->float is NOT done (keep exact); timestamps -> ns
    array_cols = []
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]")
        if df[c].dtype == object:
            # the driver does NOT tuple-ize: array cells crash its pandas sort
            # (round-1 q_tokens/q_split). Record and tuple-ize so we can both
            # flag the column and still diff values.
            if df[c].apply(lambda v: isinstance(v, (list, np.ndarray))).any():
                array_cols.append(c)
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df, array_cols

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        # read the Spark output with pyarrow (like the driver), NOT through
        # DuckDB: DuckDB coerces parquet DECIMAL to float64, which masked the
        # round-2 q_type_convs decimal-vs-float representation mismatch
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracle:
            results[name] = f"rows-only ({len(spark_df)} rows)" + (" EMPTY!" if len(spark_df)==0 else "")
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        (a, a_arrays), (b, _) = norm(spark_df), norm(duck_df)
        if a_arrays:
            results[name] = f"ARRAY_COLS {a_arrays}: driver's pandas sort crashes on array cells — stringify"
            continue
        if list(a.columns) != list(b.columns):
            results[name] = f"COLS_MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWCOUNT spark={len(a)} duck={len(b)}"
            continue
        bad = []
        # the driver's hash is dtype/representation-sensitive (round-1
        # q_profile/q_rollup: DuckDB HUGEINT vs Spark BIGINT hash-mismatched
        # despite equal values) — flag any dtype divergence
        for c in a.columns:
            if str(a[c].dtype) != str(b[c].dtype):
                bad.append(f"DTYPE {c}: spark={a[c].dtype} duck={b[c].dtype}")
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                eq = (av.values == bv.values) | (pd.isna(av).values & pd.isna(bv).values)
            except Exception:
                eq = np.array([x == y or (pd.isna(x) and pd.isna(y)) for x, y in zip(av, bv)])
            if not eq.all():
                i = int(np.argmin(eq))
                bad.append(f"{c}[row{i}]: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
        results[name] = "OK" if not bad else "VALUES: " + "; ".join(bad[:3])
    npass = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only ("))
    for k, v in results.items():
        flag = "PASS" if (v == "OK" or (v.startswith("rows-only") and "EMPTY" not in v)) else "FAIL"
        print(f"{flag}  {k}: {v}")
    print(f"== {npass}/{len(results)}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
