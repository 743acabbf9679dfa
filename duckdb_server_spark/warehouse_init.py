"""Init-phase warehouse preparation (the `setup-duckdb` analog,
k8s/main.yaml:100-141).

The reference splits its lifecycle into an init phase that may write (the
setup container creates the .db file, installs extensions, creates views)
and a serve phase that is read-only (`?access_mode=read_only`,
main.go:61). This module is the write phase for the Spark engine: copy /
re-layout source tables (local, s3a://, any Hadoop FS) into the warehouse
directory the server then serves read-only.

Re-layout, not byte-copy: each table is round-tripped through the Spark
reader/writer, so the init phase is also where partitioning and file
sizing for the serve workload happen (`--partition-by`, `--max-records`).
"""

from __future__ import annotations

import argparse
import os


def main(argv: list[str] | None = None) -> None:
    from duckdb_server_spark.session import get_spark

    parser = argparse.ArgumentParser(description="Prepare the parquet warehouse")
    parser.add_argument("--source", required=True, help="dir/URI of <table>.parquet")
    parser.add_argument("--dest", required=True, help="warehouse output directory")
    parser.add_argument(
        "--tables",
        default="region,nation,customer,supplier,part,orders,lineitem,"
        "events,documents,embeddings",
    )
    parser.add_argument("--partition-by", default="", help="table:col,table:col")
    parser.add_argument("--max-records", type=int, default=5_000_000,
                        help="maxRecordsPerFile for the serve layout")
    args = parser.parse_args(argv)

    part_by = dict(
        item.split(":", 1) for item in args.partition_by.split(",") if ":" in item
    )
    spark = get_spark(app_name="dss-warehouse-init")
    for name in [x.strip() for x in args.tables.split(",") if x.strip()]:
        src = os.path.join(args.source, f"{name}.parquet")
        dst = os.path.join(args.dest, f"{name}.parquet")
        writer = (
            spark.read.parquet(src)
            .write.mode("overwrite")
            .option("maxRecordsPerFile", args.max_records)
        )
        if name in part_by:
            writer = writer.partitionBy(part_by[name])
        writer.parquet(dst)
        print(f"wrote {dst}", flush=True)


if __name__ == "__main__":
    main()
