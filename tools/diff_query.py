"""Print the first differing cells between a declared query and its oracle.

Usage: python tools/diff_query.py w07_groups_frame p13_cast ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df):
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("diff_query")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    for name in sys.argv[1:]:
        print(f"\n=== {name} ===")
        sdf = canon(qs[name](spark, SF_DIR).toPandas())
        ddf = canon(con.execute(osql[name]).fetchdf())
        if list(sdf.columns) != list(ddf.columns):
            print("COLUMNS differ:", list(sdf.columns), "vs", list(ddf.columns))
            continue
        if len(sdf) != len(ddf):
            print("ROWS differ:", len(sdf), "vs", len(ddf))
            continue
        shown = 0
        for col in sdf.columns:
            a, b = sdf[col].tolist(), ddf[col].tolist()
            for i, (x, y) in enumerate(zip(a, b)):
                if repr(x) != repr(y):
                    print(f"  [{col}][{i}] spark={x!r} ({type(x).__name__}) "
                          f"oracle={y!r} ({type(y).__name__})")
                    shown += 1
                    if shown >= 8:
                        break
            if shown >= 8:
                break
        if not shown:
            print("  identical under repr")


if __name__ == "__main__":
    main()
