#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare with the Verify parquet dump
(columns sorted by name, rows sorted, values hashed). Dev tool only — the
shipped Scala library does not depend on this."""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats -> float64, timestamps -> iso str
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(6)
        elif s.dtype == object:
            df[c] = s.apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                            str(type(v)).endswith("ndarray'>") else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"MISSING {name}: no spark output"); n_bad += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"ERROR {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA-MISMATCH {name}: spark={list(got.columns)} duck={list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"ROWS-MISMATCH {name}: spark={len(got)} duck={len(want)}")
            n_bad += 1; continue
        if not got.equals(want):
            neq = (got != want).any(axis=1)
            print(f"VALUE-MISMATCH {name}: {int(neq.sum())}/{len(got)} rows differ")
            print("  spark:", got[neq].head(3).to_dict("records"))
            print("  duck :", want[neq].head(3).to_dict("records"))
            n_bad += 1; continue
        print(f"OK {name} ({len(got)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
