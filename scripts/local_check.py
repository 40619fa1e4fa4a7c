#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run its oracle SQL (oracle_sql.json) in DuckDB over the same
parquet tables and compare rows/schema/values after sorting columns by name
and rows by all columns. Usage:
  python3 scripts/local_check.py <verifyOutDir> <sfDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    unknown = only - set(oracles)
    if unknown:
        print(f"ERROR: no oracle for requested quer{'y' if len(unknown)==1 else 'ies'}: "
              f"{sorted(unknown)} (rows-only or misspelled)")
        n_fail += len(unknown)
    for name in sorted(oracles):
        if only and name not in only:
            continue
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"{name}: NO SPARK OUTPUT"); n_fail += 1; continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        rows = len(spark_df) == len(oracle_df)
        schema = sorted(spark_df.columns) == sorted(oracle_df.columns)
        match = False
        near_only = True  # every float diff within 1e-12 (diagnostic only)
        detail = ""
        if rows and schema:
            a, b = canon(spark_df), canon(oracle_df)
            try:
                match = True
                for c in a.columns:
                    av, bv = a[c].values, b[c].values
                    if np.issubdtype(a[c].dtype, np.floating):
                        # the driver gate hashes values EXACTLY (bitwise) —
                        # exactness stays the gate here for parity; a
                        # tolerance-only diff is reported as NEAR so an
                        # fp-summation-order mismatch is distinguishable
                        # from a real wrong answer
                        ok = np.allclose(av.astype(float), bv.astype(float),
                                         rtol=0, atol=0, equal_nan=True)
                        if not ok and not np.allclose(
                                av.astype(float), bv.astype(float),
                                rtol=1e-12, atol=0, equal_nan=True):
                            near_only = False
                    else:
                        ok = (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all()
                        if not ok:
                            near_only = False
                    if not ok:
                        match = False
                        bad = np.where(pd.Series(av).astype(str).values
                                       != pd.Series(bv).astype(str).values)[0][:3]
                        detail += f" col={c} first_diffs={[(av[i], bv[i]) for i in bad]}"
            except Exception as e:
                match, detail, near_only = False, f" cmp_err={e}", False
        status = "PASS" if (rows and schema and match) else "FAIL"
        if status == "FAIL" and rows and schema and near_only and detail:
            detail = " [NEAR: fp-only diffs within rtol=1e-12 — summation-order," \
                     " not a wrong answer; driver's exact-hash gate may still fail]" + detail
        if status == "PASS": n_pass += 1
        else:
            n_fail += 1
            detail = (f" rows={len(spark_df)}/{len(oracle_df)}"
                      f" schema_spark={sorted(spark_df.columns)}"
                      f" schema_oracle={sorted(oracle_df.columns)}" + detail)
        print(f"{name}: {status}{detail if status == 'FAIL' else ''}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
