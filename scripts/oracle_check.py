#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf dir, canonicalize (sort columns by name, sort rows), and
compare row counts + values.

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(sorted(v, key=str)) if isinstance(v, (list, tuple))
                else str(v) if isinstance(v, dict) else v
            )
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        if name not in oracles:
            print(f"{name:28s} no_oracle")
            continue
        try:
            sdf = canon(fn(spark, SF).toPandas())
            odf = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"{name:28s} ERR {type(e).__name__}: {str(e)[:200]}")
            fails += 1
            continue
        rows_ok = len(sdf) == len(odf)
        cols_ok = list(sdf.columns) == list(odf.columns)
        vals_ok = False
        if rows_ok and cols_ok:
            try:
                pd.testing.assert_frame_equal(
                    sdf, odf, check_dtype=False, check_exact=False, rtol=1e-6
                )
                vals_ok = True
            except AssertionError as e:
                vals_ok = False
                detail = str(e).splitlines()[:6]
        status = "OK" if (rows_ok and cols_ok and vals_ok) else "MISMATCH"
        print(f"{name:28s} {status}  spark={len(sdf)} oracle={len(odf)} "
              f"cols_ok={cols_ok}")
        if status != "OK":
            fails += 1
            if rows_ok and cols_ok:
                print("   " + "\n   ".join(detail))
            elif not cols_ok:
                print(f"   spark cols:  {list(sdf.columns)}")
                print(f"   oracle cols: {list(odf.columns)}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
