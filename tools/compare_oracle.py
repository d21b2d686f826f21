#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf dir's parquet tables and compare with the Verify output
parquet (columns sorted by name, rows sorted, values hashed)."""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: timestamps -> iso strings, floats -> rounded repr
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        # normalize widths but NOT kinds: the driver's hash stringifies values,
        # so int32 vs int64 agree ('5'=='5') while int64 vs float64 do not
        # ('5' != '5.0') — e.g. DuckDB HUGEINT->float64 must stay a failure.
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (e.g. the Inflate output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING  {name}: no spark output"); n_bad += 1; continue
        try:
            ora = con.execute(sql).df()
        except Exception as e:
            print(f"ORAFAIL  {name}: {e}"); n_bad += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(spark_files)])
        a, b = norm(got), norm(ora)
        if list(a.columns) != list(b.columns):
            print(f"SCHEMA   {name}: spark={list(a.columns)} oracle={list(b.columns)}"); n_bad += 1; continue
        if len(a) != len(b):
            print(f"ROWS     {name}: spark={len(a)} oracle={len(b)}"); n_bad += 1; continue
        try:
            # dtype-strict: the driver's hash is representation-sensitive
            # (int64 vs float64 of identical values mismatches), so the local
            # gate must be too.
            pd.testing.assert_frame_equal(a, b, check_dtype=True, check_exact=False, rtol=0, atol=1e-9)
            print(f"OK       {name} ({len(a)} rows)"); n_ok += 1
        except AssertionError as e:
            print(f"VALUES   {name}: {str(e).splitlines()[-1] if str(e) else 'diff'}")
            mism = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if mism[c].any()]
            for c in bad_cols[:3]:
                i = mism[c].idxmax()
                print(f"         col={c} row={i}: spark={a[c][i]!r} oracle={b[c][i]!r}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
                  sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"))
