"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it
against the matching ``oracle_sql()`` via DuckDB: row count, column-name
set, and order-insensitive value comparison on name-sorted columns.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.astype(object).where(pd.notnull(df), None)
    return df.sort_values(by=list(df.columns), key=lambda s: s.map(repr)).reset_index(
        drop=True
    )


def main() -> None:
    import __spark_entry__ as entry

    from theoremkb_spark.session import get_spark

    spark = get_spark("check_oracles", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        sdf = fn(spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(sdf)} rows")
            continue
        ddf = con.execute(oracles[name]).df()
        status = []
        if len(sdf) != len(ddf):
            status.append(f"rowcount {len(sdf)} != {len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            status.append(f"cols {sorted(sdf.columns)} != {sorted(ddf.columns)}")
        if not status:
            a, b = canon(sdf), canon(ddf)
            neq = (a.map(repr) != b.map(repr)).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                status.append(
                    f"values differ at row {i}:\n  spark={a.iloc[i].to_dict()}\n  duck ={b.iloc[i].to_dict()}"
                )
        if status:
            failures.append(name)
            print(f"{name:28s} FAIL  " + "; ".join(status))
        else:
            print(f"{name:28s} OK    {len(sdf)} rows")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
