"""Local replica of the driver's correctness gate: run every
__spark_entry__ query and its DuckDB oracle side-by-side, compare
row count, schema (column names), and order-insensitive values.

Usage: python -m tests.gate [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.astype({c: "string" for c in df.columns})
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def run(sf_dir: str, only: list[str] | None = None) -> bool:
    import __spark_entry__ as entry
    from cuphic_spark.session import get_spark

    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    ok = True
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            ok = False
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            ok = False
            continue
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"FAIL {name}: schema {sorted(sdf.columns)} vs "
                  f"{sorted(ddf.columns)}")
            ok = False
            continue
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rows {len(sdf)} vs {len(ddf)}")
            ok = False
            continue
        cs, cd = canon(sdf), canon(ddf)
        if not cs.equals(cd):
            neq = (cs != cd).any(axis=1)
            print(f"FAIL {name}: value mismatch in {int(neq.sum())} rows")
            print("  spark:", cs[neq].head(3).to_dict("records"))
            print("  duck :", cd[neq].head(3).to_dict("records"))
            ok = False
            continue
        print(f"OK   {name}: {len(sdf)} rows")
    return ok


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args else "/root/testdata/sf0.001"
    only = args[1:] or None
    sys.exit(0 if run(sf, only) else 1)
