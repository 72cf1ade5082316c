#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB-oracle compare loop.

NOT part of the graft library (the Scala engine has no python deps) — this
runs driver-side tooling (duckdb/pandas, available in this container) to
check `Verify` output before committing. Usage:

    python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime") or df[c].dtype == object:
            # normalize dates/timestamps/decimals to strings for comparison
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype("datetime64[us]").astype(str)
            else:
                df[c] = df[c].astype(str)
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    return df


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # optional argv[3:]: restrict the compare to named queries (pairs with
    # Verify's SPARK_GRAFT_VERIFY_ONLY subset dumps); full runs stay strict
    if len(sys.argv) > 3:
        oracle = {k: v for k, v in oracle.items() if k in set(sys.argv[3:])}
    n_bad = 0
    for name in sorted(oracle):
        try:
            files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: load error {e}")
            n_bad += 1
            continue
        status = []
        if list(spark_df.columns) != list(duck_df.columns):
            status.append(f"schema {list(spark_df.columns)} vs {list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            status.append(f"rows {len(spark_df)} vs {len(duck_df)}")
        elif any(spark_df[c].dtype != duck_df[c].dtype for c in spark_df.columns):
            # the driver's value hash is dtype-sensitive: a DuckDB HUGEINT
            # (sum of BIGINT) arrives as float64 and hash-mismatches Spark's
            # int64 even when every value is equal — flag it here so local
            # green predicts driver green (cast the oracle, don't coerce)
            bad = [f"{c}: {spark_df[c].dtype} vs {duck_df[c].dtype}"
                   for c in spark_df.columns
                   if spark_df[c].dtype != duck_df[c].dtype]
            status.append(f"dtype mismatch (driver hash would fail): {'; '.join(bad)}")
        else:
            neq = (spark_df != duck_df)
            # NaN == NaN for our purposes
            for c in spark_df.columns:
                if spark_df[c].dtype.kind == "f":
                    neq[c] &= ~(spark_df[c].isna() & duck_df[c].isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                status.append(f"{int(bad.sum())} value diffs; first at row {i}: "
                              f"{spark_df.loc[i].to_dict()} vs {duck_df.loc[i].to_dict()}")
        if status:
            print(f"FAIL  {name}: {'; '.join(status)}")
            n_bad += 1
        else:
            print(f"OK    {name} ({len(spark_df)} rows)")
    # rows-only queries (no oracle): check >0 rows
    for path in sorted(glob.glob(f"{outdir}/*/")):
        name = path.rstrip("/").split("/")[-1]
        if name in oracle:
            continue
        files = sorted(glob.glob(f"{path}/*.parquet"))
        if not files:
            print(f"FAIL  {name}: no parquet output")
            n_bad += 1
            continue
        n = sum(len(pd.read_parquet(f)) for f in files)
        print(f"{'OK   ' if n > 0 else 'FAIL '} {name} (rows-only, {n} rows)")
        if n == 0:
            n_bad += 1
    print(f"{'ALL GREEN' if n_bad == 0 else f'{n_bad} FAILURES'}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
