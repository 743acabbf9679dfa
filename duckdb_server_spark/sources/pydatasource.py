"""Custom Python data source (PySpark 4 `DataSource` API).

The reference's extension mechanism lets DuckDB mount new table
functions at startup (`LOAD` loop, main.go:77-105; `http_client`
community extension, k8s/main.yaml:111). PySpark 4's answer is the
Python DataSource API: a reader class registered once on the session,
then usable as `spark.read.format(name)` — with *partition planning in
the source*, so reads parallelize across executors instead of funneling
through the driver (the scalable version of the driver-side
`requests → createDataFrame` fallback in catalog/remote_sources.py).
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FORMAT_NAME = "docs_jsonl"


class DocsJsonlDataSource(DataSource):
    """Reads a JSON-lines file of document records. Options:
    ``path`` (required), ``partitions`` (reader parallelism, default 4)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "doc_id bigint, lang string, n_chars bigint"

    def reader(self, schema) -> "DocsJsonlReader":
        return DocsJsonlReader(self.options)


class DocsJsonlReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.path = options["path"]
        self.num_partitions = int(options.get("partitions", "4"))

    def partitions(self):
        # Planned source-side: each InputPartition becomes one Spark
        # task (for a real remote service: one shard / page range each).
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        idx = partition.value
        with open(self.path, encoding="utf-8") as fh:
            for i, line in enumerate(fh):
                if i % self.num_partitions != idx:
                    continue
                rec = json.loads(line)
                yield (rec["doc_id"], rec["lang"], rec["n_chars"])


def register(spark) -> None:
    """Idempotent session registration (the `LOAD extension` analog)."""
    spark.dataSource.register(DocsJsonlDataSource)
