"""Round 17 optimization pins (optimization round 2 of 2).

Each test freezes the decision/semantics of an r17 optimization so a
later refactor cannot silently regress it:

- ``spread_small_scan``'s file-probe replacement makes the same
  repartition decisions as the old ``df.rdd.getNumPartitions()`` probe
  on the test corpus (VERDICT r16 item 7);
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from duckdb_server_spark.operators import _parse_bytes, spread_small_scan

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def test_parse_bytes_spark_conf_forms():
    assert _parse_bytes("134217728b") == 128 * 1024 * 1024
    assert _parse_bytes("128m") == 128 * 1024 * 1024
    assert _parse_bytes("128MB") == 128 * 1024 * 1024
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("4096") == 4096
    assert _parse_bytes("16k") == 16384


def test_spread_small_scan_repartitions_single_file_corpus(spark):
    """The pinned corpus decision (VERDICT r16 item 7): every test
    parquet is one small file, so the scan must be spread to
    defaultParallelism — the same decision the old RDD probe made."""
    path = os.path.join(SF_DIR, "documents.parquet")
    if not (os.path.exists(path) or glob.glob(path + "/*")):
        pytest.skip("test corpus not present")
    df = spark.read.parquet(path).select("doc_id", "text")
    out = spread_small_scan(df)
    par = spark.sparkContext.defaultParallelism
    assert "Exchange" in out._jdf.queryExecution().executedPlan().toString() or (
        out is not df
    )
    # the old probe decided repartition(par); the new one must agree
    assert out.rdd.getNumPartitions() == par
    # and the rows are unchanged
    assert out.count() == df.count()


def test_spread_small_scan_noop_on_wide_input(spark, tmp_path):
    """An input with at least one file per core is already wide: no
    repartition, no added Exchange."""
    par = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "wide.parquet")
    spark.range(0, 10_000).repartition(par + 2).write.parquet(p)
    df = spark.read.parquet(p)
    out = spread_small_scan(df)
    assert out is df


def test_spread_small_scan_non_file_source_left_alone(spark):
    df = spark.range(0, 100)
    assert spread_small_scan(df) is df
