"""Remote-source tests: S8 config plumbing, S9 fetch, S10 federation."""

from __future__ import annotations

from duckdb_server_spark.sources.remote import configure_s3


def test_configure_s3_sets_hadoop_confs(spark):
    """S8 (CREATE SECRET analog, k8s/main.yaml:115-125): the s3a configs
    land in the Hadoop configuration the parquet scans read."""
    configure_s3(
        spark,
        access_key="ak",
        secret_key="sk",
        endpoint="http://minio.local:9000",
        path_style=True,
    )
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    assert conf.get("fs.s3a.access.key") == "ak"
    assert conf.get("fs.s3a.secret.key") == "sk"
    assert conf.get("fs.s3a.endpoint") == "http://minio.local:9000"
    assert conf.get("fs.s3a.path.style.access") == "true"
