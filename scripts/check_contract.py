"""Local twin of the driver's CORRECTNESS check: run each queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, schema
width, and an order-insensitive value hash (columns sorted by name, rows
sorted, values stringified with float rounding)."""
import sys, time

sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from dynaalign_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None
# Data-dependent oracles (IVF centroids, the Louvain golden) must track the
# SAME corpus this checker registers, or drop to rows-only (ADVICE r03 #1).
import os  # noqa: E402

os.environ["DYNA_ORACLE_SF_DIR"] = SF_DIR

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(9)
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"{name:24s} SPARK-ERROR {type(e).__name__}: {str(e)[:200]}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:24s} DUCKDB-ERROR {type(e).__name__}: {str(e)[:200]}")
            fails.append(name)
            continue
        ok_rows = len(sdf) == len(odf)
        ns, no = norm(sdf), norm(odf)
        ok_schema = list(ns.columns) == list(no.columns)
        ok_vals = ok_rows and ok_schema and ns.equals(no)
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "MISMATCH"
        print(
            f"{name:24s} {status}  rows {len(sdf)}/{len(odf)} "
            f"schema={'ok' if ok_schema else (list(ns.columns), list(no.columns))} "
            f"vals={'ok' if ok_vals else 'DIFF'} ({time.time()-t0:.1f}s)"
        )
        if status != "OK":
            fails.append(name)
            if ok_schema and ok_rows and not ok_vals:
                diff = (ns != no).any(axis=1)
                print(ns[diff].head(3).to_string())
                print(no[diff].head(3).to_string())
    spark.stop()
    print("FAILS:", fails if fails else "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
